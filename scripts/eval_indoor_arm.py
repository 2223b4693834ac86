"""Evaluate ONE descriptor checkpoint under the indoor fragment-registration
protocol (single arm of fullscale_indoor.py phase_eval — same export, RANSAC,
gates, and ElasticReconstruction-lite scoring, without re-running the
untrained control every time). Used for the round-5 descriptor-quality A/Bs
(CGF radius / training length). One JSON line.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fullscale_indoor import (_ckpt_dir, _det_ckpt, _eval_arm,  # noqa: E402
                              _scene_names, _scenenn_root)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_indoor_r5")
    ap.add_argument("--desc-ckpt", required=True,
                    help="descriptor checkpoint (.msgpack) to evaluate")
    ap.add_argument("--tag", required=True,
                    help="output tag: features_<tag>/ logs_<tag>/")
    ap.add_argument("--max-trials", type=int, default=1000)
    ap.add_argument("--num-keypoints", type=int, default=512)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--override", action="append", default=[])
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from usip_tpu.config import get_config

    over = {"data.dataroot": _scenenn_root(args.root),
            "train.batch_size": 4, "train.name": "indoor_eval"}
    for kv in args.override:
        k, v = kv.split("=", 1)
        try:
            over[k] = json.loads(v)
        except json.JSONDecodeError:
            over[k] = v
    cfg = get_config("scenenn", role="descriptor", **over)

    res = _eval_arm(cfg, args.root, _det_ckpt(args.root), args.desc_ckpt,
                    args.tag, _scene_names(args.root), args.max_trials,
                    args.num_keypoints)
    print(json.dumps({"phase": "eval_arm", "tag": args.tag,
                      "desc_ckpt": args.desc_ckpt, **res}))


if __name__ == "__main__":
    main()
