"""Indoor-protocol diagnostics: separate keypoint geometry from descriptor
quality when fragment-registration recall is low.

Given an exported feature tree (``features_<tag>/<scene>/<i>.bin`` from
``fullscale_indoor.py eval`` / run_export_fragments) and the generated gt
(``match3d/gt/<scene>-evaluation/gt.log|info``), per gt pair this reports:

  * keypoint repeatability: fraction of fragment-i keypoints whose
    gt-aligned NN among fragment-j keypoints is < ``--radius`` (the
    eval_rep.m metric transplanted to the indoor fragments);
  * oracle-descriptor registration: descriptors replaced by gt-aligned
    keypoint COORDINATES (frame i), i.e. perfect geometric descriptors —
    if registration recall is high here, keypoint geometry supports the
    protocol and the real descriptors are the gap; if it is ~0, the
    exported keypoints themselves are not repeatable across fragments.

CPU-only, reads .bin/.npy/.log files; prints one JSON line.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from usip_tpu.eval import indoor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_indoor_r5")
    ap.add_argument("--tag", default="trained")
    ap.add_argument("--desc-len", type=int, default=128)
    ap.add_argument("--radius", type=float, default=0.2)
    ap.add_argument("--max-trials", type=int, default=1000)
    args = ap.parse_args()

    frag_root = os.path.join(args.root, "match3d", "fragments")
    gt_root = os.path.join(args.root, "match3d", "gt")
    feat_root = os.path.join(args.root, f"features_{args.tag}")
    scenes = sorted(os.listdir(frag_root))

    out = {"tag": args.tag, "scenes": {}}
    for scene in scenes:
        pc_dir = os.path.join(frag_root, scene)
        n_frag = len([f for f in os.listdir(pc_dir) if f.endswith(".npy")])
        frags = []
        for i in range(n_frag):
            pc = np.load(os.path.join(pc_dir, f"{i}.npy"))
            kp, desc = indoor.load_fragment_features(
                os.path.join(feat_root, scene, f"{i}.bin"), args.desc_len)
            frags.append((pc, kp, desc))
        gt = indoor.load_log(os.path.join(gt_root, f"{scene}-evaluation",
                                          "gt.log"))
        gt_info = indoor.load_info(os.path.join(gt_root,
                                                f"{scene}-evaluation",
                                                "gt.info"))

        reps, oracle_entries = [], []
        for idx, e in enumerate(gt):
            pc1, kp1, _ = frags[e.i]
            pc2, kp2, _ = frags[e.j]
            kp2_in_1 = kp2 @ e.trans[:3, :3].T + e.trans[:3, 3]
            d2 = (np.sum(kp1 ** 2, 1)[:, None]
                  + np.sum(kp2_in_1 ** 2, 1)[None]
                  - 2 * kp1 @ kp2_in_1.T)
            nn = np.sqrt(np.maximum(d2.min(axis=1), 0))
            reps.append(float((nn < args.radius).mean()))

            # oracle descriptors: gt-aligned coordinates, tiled to 6 dims
            od1 = np.tile(kp1, (1, 2))
            od2 = np.tile(kp2_in_1, (1, 2))
            reg = indoor.register_fragments(
                pc1, pc2, kp1, od1, kp2, od2,
                max_trials=args.max_trials, seed=idx)
            if (reg.ratio_aligned[0] > 0.23 and reg.inlier_ratio > 0.025):
                oracle_entries.append(indoor.LogEntry(
                    e.i, e.j, n_frag, reg.trans, reg.num_inliers,
                    reg.inlier_ratio, reg.information))

        res = indoor.evaluate_scene(oracle_entries, gt, gt_info)
        out["scenes"][scene] = {
            "gt_pairs": len(gt),
            "kp_repeatability_mean": float(np.mean(reps)),
            "kp_repeatability_min": float(np.min(reps)),
            "oracle": res._asdict(),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
