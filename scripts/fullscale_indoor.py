"""Full-scale INDOOR quality run: the complete USIP indoor pipeline — lite
detector + global-context descriptor (CGF loss) trained at the scenenn preset
on a synthetic SceneNN tree, then 3DMatch-style fragment registration ->
recall/precision through eval/indoor.py (the ElasticReconstruction lite
protocol, eval_indoor/fullEvaluation.m:1-12 + 3dmatch/register2Fragments.m).

Phases (run separately so the long trains can sit in the background):

  python scripts/fullscale_indoor.py gen        --root /tmp/synth_indoor
  python scripts/fullscale_indoor.py train-det  --root /tmp/synth_indoor
  python scripts/fullscale_indoor.py train-desc --root /tmp/synth_indoor
  python scripts/fullscale_indoor.py eval       --root /tmp/synth_indoor

``eval`` exports per-fragment keypoint+descriptor features (trained AND
untrained/random-init descriptor on the same trained keypoints), registers
gated fragment pairs per scene, and prints one JSON line with
recall/precision for both arms (reference bar: evaluate.m:42-43).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def _scenenn_root(root):
    return os.path.join(root, "scenenn")


def _m3d_root(root):
    return os.path.join(root, "match3d")


def _scene_names(root):
    frag_root = os.path.join(_m3d_root(root), "fragments")
    return sorted(os.listdir(frag_root))


def phase_gen(args):
    from usip_tpu.data.synthetic import (build_synthetic_match3d_fragments,
                                         build_synthetic_scenenn_tree)
    counts = build_synthetic_scenenn_tree(
        _scenenn_root(args.root), train_frames=args.frames,
        test_frames=max(args.frames // 3, 8), seed=0)
    frags = build_synthetic_match3d_fragments(
        _m3d_root(args.root), scenes=args.scenes,
        fragments_per_scene=args.fragments, seed=1)
    print(json.dumps({"phase": "gen", "root": args.root,
                      "scenenn": counts, "match3d": frags}))


def _ckpt_dir(root):
    return os.path.join(root, "ckpt")


def phase_train_det(args):
    """Lite detector at the scenenn preset (reference scenenn/train_detector.py
    + the indoor RPN_DetectorLite selection, keypoint_detector.py:19-22)."""
    from usip_tpu.cli import main as cli_main
    argv = ["train-detector", "--dataset", "scenenn", "--lite",
            "--dataroot", _scenenn_root(args.root),
            "--name", "indoor", "--epochs", str(args.epochs),
            "--checkpoints-dir", _ckpt_dir(args.root),
            "--override", "train.log_every=10"]
    if args.platform:
        argv += ["--platform", args.platform]
    for kv in getattr(args, "override", None) or []:
        argv += ["--override", kv]
    cli_main(argv)


def _det_ckpt(root):
    ckpt = os.path.join(_ckpt_dir(root), "indoor", "best.msgpack")
    if not os.path.exists(ckpt):
        ckpt = os.path.join(_ckpt_dir(root), "indoor", "last.msgpack")
    return ckpt


def phase_train_desc(args):
    """Indoor descriptor: global-context widths + CGF loss on the frozen lite
    detector (scenenn/train_descriptor.py; ModelDescriptorIndoor analog)."""
    from usip_tpu.cli import main as cli_main
    argv = ["train-descriptor", "--dataset", "scenenn",
            "--dataroot", _scenenn_root(args.root),
            "--name", "indoor", "--epochs", str(args.epochs),
            "--checkpoints-dir", _ckpt_dir(args.root),
            "--detector-checkpoint", _det_ckpt(args.root),
            "--override", "train.log_every=10"]
    if args.platform:
        argv += ["--platform", args.platform]
    for kv in getattr(args, "override", None) or []:
        argv += ["--override", kv]
    cli_main(argv)


def _parse_overrides(args):
    out = {}
    for kv in getattr(args, "override", None) or []:
        k, v = kv.split("=", 1)
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v
    return out


def _eval_arm(cfg, root, det_ckpt, desc_ckpt, tag, scenes, max_trials,
              desired):
    from usip_tpu.eval import indoor
    from usip_tpu.eval.export_runner import run_export_fragments

    pc_root = os.path.join(_m3d_root(root), "fragments")
    gt_root = os.path.join(_m3d_root(root), "gt")
    result_root = os.path.join(root, f"features_{tag}")
    log_dir = os.path.join(root, f"logs_{tag}")
    os.makedirs(log_dir, exist_ok=True)
    stats = run_export_fragments(cfg, det_ckpt, desc_ckpt, pc_root,
                                 result_root, scenes, desired_num=desired)
    logs = {}
    for scene in scenes:
        pc_dir = os.path.join(pc_root, scene)
        n_frag = len([f for f in os.listdir(pc_dir) if f.endswith(".npy")])
        fragments = []
        for i in range(n_frag):
            pc = np.load(os.path.join(pc_dir, f"{i}.npy"))
            kp, desc = indoor.load_fragment_features(
                os.path.join(result_root, scene, f"{i}.bin"),
                cfg.descriptor.descriptor_len)
            fragments.append((pc, kp, desc))
        gt = indoor.load_log(os.path.join(gt_root, f"{scene}-evaluation",
                                          "gt.log"))
        # lite protocol: overlapped (gt) pairs only (fullEvaluation.m:6)
        entries = indoor.run_scene_registration(
            fragments, pairs=[(e.i, e.j) for e in gt], max_trials=max_trials)
        log_path = os.path.join(log_dir, f"{scene}.log")
        indoor.write_log_my(log_path, entries)
        logs[scene] = log_path
    per_scene = indoor.evaluate_scenes(logs, gt_root)
    summary = indoor.summarize(per_scene)
    return {"frames": stats["frames"],
            "per_scene": {s: r._asdict() for s, r in per_scene.items()},
            **summary}


def phase_eval(args):
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from usip_tpu.config import get_config
    from usip_tpu.train.checkpoint import save_checkpoint
    from usip_tpu.train.descriptor_loop import init_descriptor_state

    over = {"data.dataroot": _scenenn_root(args.root),
            "train.batch_size": 4, "train.name": "indoor_eval"}
    over.update(_parse_overrides(args))
    cfg = get_config("scenenn", role="descriptor", **over)

    det_ckpt = _det_ckpt(args.root)
    desc_dir = os.path.join(_ckpt_dir(args.root), "indoor_descriptor")
    desc_ckpt = os.path.join(desc_dir, "best.msgpack")
    if not os.path.exists(desc_ckpt):
        desc_ckpt = os.path.join(desc_dir, "last.msgpack")
    scenes = _scene_names(args.root)

    results = {"phase": "eval", "scenes": scenes}
    results["trained_desc"] = _eval_arm(
        cfg, args.root, det_ckpt, desc_ckpt, "trained", scenes,
        args.max_trials, args.num_keypoints)

    _, dstate = init_descriptor_state(cfg, seed=321)
    upath = os.path.join(_ckpt_dir(args.root), "untrained_desc.msgpack")
    save_checkpoint(upath, dstate)
    results["untrained_desc"] = _eval_arm(
        cfg, args.root, det_ckpt, upath, "untrained", scenes,
        args.max_trials, args.num_keypoints)
    print(json.dumps(results))


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="phase", required=True)
    g = sub.add_parser("gen")
    g.add_argument("--frames", type=int, default=48)
    g.add_argument("--scenes", type=int, default=2)
    # 16 views around the ring: skip-2/skip-3 pairs still overlap >30%, so
    # the eval's non-adjacent (j-i>1) recall set is populated (a ring of 8
    # leaves almost only adjacent gt pairs, which evaluate_scene excludes
    # per mrEvaluateRegistrationMy.m)
    g.add_argument("--fragments", type=int, default=16)
    g.set_defaults(fn=phase_gen)
    td = sub.add_parser("train-det")
    td.add_argument("--epochs", type=int, default=40)
    td.set_defaults(fn=phase_train_det)
    tc = sub.add_parser("train-desc")
    tc.add_argument("--epochs", type=int, default=30)
    tc.set_defaults(fn=phase_train_desc)
    e = sub.add_parser("eval")
    e.add_argument("--max-trials", type=int, default=1000)
    # export every SOM proposal (scenenn node_num=512, options_detector.py:34)
    # — at room scale 256 keypoints leave the gt-aligned NN spacing above the
    # 0.2 m inlier threshold, capping RANSAC below the writeLog gates
    e.add_argument("--num-keypoints", type=int, default=512)
    e.set_defaults(fn=phase_eval)
    for p in (g, td, tc, e):
        p.add_argument("--root", default="/tmp/synth_indoor")
        p.add_argument("--platform", default=None,
                       choices=["cpu", "tpu", "axon"],
                       help="force a jax platform (cpu for TPU-less smoke)")
        p.add_argument("--override", action="append", default=[],
                       help="dotted config override (repeatable; lets the "
                            "protocol run at reduced scale for CPU smoke)")
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
