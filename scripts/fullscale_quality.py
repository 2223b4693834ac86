"""Full-scale quality run: train the ACTUAL kitti preset (N=16384, M=512,
c1=128/c2=512, bf16 + bucketed-FPS defaults, device_sampling) on a synthetic
KITTI-style disk tree, export keypoints with the export tool, and run the full
kitti repeatability protocol including the cam->velodyne --coord-fix; A/B the
bf16 + bucketed-FPS inference defaults against fp32/exact at this scale
(round-2 VERDICT ask #4).

Phases (run separately so the long train can sit in the background):

  python scripts/fullscale_quality.py gen    --root /tmp/synth_kitti
  python scripts/fullscale_quality.py train  --root /tmp/synth_kitti --epochs 40
  python scripts/fullscale_quality.py eval   --root /tmp/synth_kitti

``eval`` prints one JSON line with repeatability for: trained/defaults,
trained/fp32+exact-FPS, untrained/defaults, random keypoints.

Round-3 extension — the COMPLETE pipeline (the reference's headline KITTI
protocol, evaluate_kitti.m: detector keypoints + descriptors + 1-NN matching +
RANSAC registration success rate):

  python scripts/fullscale_quality.py train-desc --root /tmp/synth_kitti
  python scripts/fullscale_quality.py eval-reg   --root /tmp/synth_kitti

``eval-reg`` exports keypoint+descriptor .bin trees with the trained detector
and A/Bs the trained descriptor against an untrained (random-init) one through
`run_registration` (RTE<=2 m, RRE<=5 deg success, coord-fixed).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def phase_gen(args):
    from usip_tpu.data.synthetic import build_synthetic_kitti_tree
    counts = build_synthetic_kitti_tree(
        args.root, frames_per_seq=args.frames, test_frames_per_seq=args.test_frames,
        spacing=1.5, seed=0)
    print(json.dumps({"phase": "gen", "root": args.root, "counts": counts}))


def _parse_overrides(args):
    out = {}
    for kv in getattr(args, "override", None) or []:
        k, v = kv.split("=", 1)
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v
    return out


def _cfg(args, **extra):
    from usip_tpu.config import get_config
    over = {"data.dataroot": args.root, "train.batch_size": 8,
            "train.checkpoint_dir": os.path.join(args.root, "ckpt"),
            "train.name": "fullscale"}
    over.update(_parse_overrides(args))
    over.update(extra)
    return get_config("kitti", **over)


def phase_train(args):
    from usip_tpu.cli import main as cli_main
    argv = ["train-detector", "--dataset", "kitti", "--dataroot", args.root,
            "--name", "fullscale", "--epochs", str(args.epochs),
            "--checkpoints-dir", os.path.join(args.root, "ckpt"),
            "--override", "train.log_every=20"]
    if getattr(args, "platform", None):
        argv += ["--platform", args.platform]
    for kv in getattr(args, "override", None) or []:
        argv += ["--override", kv]
    cli_main(argv)


def _export_and_rep(cfg, checkpoint, out_dir, gt, calib_root, rng_seed=0,
                    desired=128, inlier_radius=0.5):
    import jax

    from usip_tpu.data.eval_loaders import KittiTestFrames
    from usip_tpu.eval.eval_runner import make_coord_fix, run_repeatability
    from usip_tpu.eval.export_runner import run_export

    sn = cfg.detector.surface_normal_len
    ds = KittiTestFrames(
        cfg.data, txt_root=os.path.join(cfg.data.dataroot, "kitti-reg-test"),
        numpy_root=os.path.join(cfg.data.dataroot, "data_odometry_velodyne",
                                "numpy"), seqs=(9, 10), sn_len=sn,
        seed=rng_seed)
    stats = run_export(cfg, checkpoint, out_dir, desired_num=desired,
                       dataset=ds, method="model" if checkpoint else "random")
    fix = make_coord_fix("kitti", calib_root)
    mean, arr = run_repeatability(out_dir, out_dir, gt,
                                  inlier_radius=inlier_radius, coord_fix=fix)
    return {"frames": stats["frames"], "repeatability": float(mean),
            "pairs": len(arr)}


def phase_eval(args):
    from usip_tpu.eval.eval_runner import load_kitti_gt_table
    from usip_tpu.train.checkpoint import save_checkpoint
    from usip_tpu.train.loop import init_detector_state

    gt = []
    for seq in (9, 10):
        gt.extend(load_kitti_gt_table(
            os.path.join(args.root, "kitti-reg-test"), seq))
    calib_root = os.path.join(args.root, "calib")
    ckpt = os.path.join(args.root, "ckpt", "fullscale", "best.msgpack")
    if not os.path.exists(ckpt):
        ckpt = os.path.join(args.root, "ckpt", "fullscale", "last.msgpack")

    results = {"phase": "eval", "pairs": len(gt)}

    # 1. trained model, shipped defaults (bf16 trunk, bucketed FPS t=2)
    cfg = _cfg(args)
    results["trained_defaults"] = _export_and_rep(
        cfg, ckpt, os.path.join(args.root, "kp_default"), gt, calib_root)

    # 2. trained model, fp32 + exact FPS (the parity-exact inference path)
    cfg_exact = _cfg(args, **{"detector.compute_dtype": "float32",
                              "data.fps_parallel": 1})
    results["trained_fp32_exact"] = _export_and_rep(
        cfg_exact, ckpt, os.path.join(args.root, "kp_exact"), gt, calib_root)

    # 3. untrained (random-init) detector, defaults — the learning delta
    cfg_u = _cfg(args)
    _, state = init_detector_state(cfg_u, seed=123)
    upath = os.path.join(args.root, "ckpt", "untrained.msgpack")
    save_checkpoint(upath, state)
    results["untrained_defaults"] = _export_and_rep(
        cfg_u, upath, os.path.join(args.root, "kp_untrained"), gt, calib_root)

    # 4. random keypoints baseline
    results["random_keypoints"] = _export_and_rep(
        _cfg(args), None, os.path.join(args.root, "kp_random"), gt,
        calib_root)

    d = results["trained_defaults"]["repeatability"]
    e = results["trained_fp32_exact"]["repeatability"]
    results["default_vs_exact_delta"] = d - e
    print(json.dumps(results))


def _detector_ckpt(root):
    ckpt = os.path.join(root, "ckpt", "fullscale", "best.msgpack")
    if not os.path.exists(ckpt):
        ckpt = os.path.join(root, "ckpt", "fullscale", "last.msgpack")
    return ckpt


def phase_train_desc(args):
    """Train the kitti-preset descriptor on the frozen full-scale detector
    (reference: kitti/train_descriptor.py — frozen detector + scan triplet /
    pose-distance negative mining). ``--desc-name`` trains an alternate arm
    (e.g. the CGF keypoint triplet via
    ``--desc-name cgf --override descriptor.use_cgf_loss=true``)."""
    from usip_tpu.cli import main as cli_main
    argv = ["train-descriptor", "--dataset", "kitti", "--dataroot", args.root,
            "--name", args.desc_name, "--epochs", str(args.epochs),
            "--checkpoints-dir", os.path.join(args.root, "ckpt"),
            "--detector-checkpoint", _detector_ckpt(args.root),
            "--override", "train.log_every=20"]
    for kv in getattr(args, "override", None) or []:
        argv += ["--override", kv]
    cli_main(argv)


def _export_and_reg(cfg, det_ckpt, desc_ckpt, out_root, gt, calib_root,
                    desired=128, max_trials=10000, frame_yaw_seed=None):
    from usip_tpu.data.eval_loaders import KittiTestFrames
    from usip_tpu.eval.eval_runner import make_coord_fix, run_registration
    from usip_tpu.eval.export_runner import run_export_with_descriptors

    sn = cfg.detector.surface_normal_len
    ds = KittiTestFrames(
        cfg.data, txt_root=os.path.join(cfg.data.dataroot, "kitti-reg-test"),
        numpy_root=os.path.join(cfg.data.dataroot, "data_odometry_velodyne",
                                "numpy"), seqs=(9, 10), sn_len=sn, seed=0)
    kp_dir = os.path.join(out_root, "keypoints")
    desc_dir = os.path.join(out_root, "descriptors")
    stats = run_export_with_descriptors(
        cfg, detector_checkpoint=det_ckpt, descriptor_checkpoint=desc_ckpt,
        kp_out=kp_dir, desc_out=desc_dir, desired_num=desired, dataset=ds,
        frame_yaw_seed=frame_yaw_seed)
    res = run_registration(kp_dir, desc_dir, gt,
                           desc_dim=cfg.descriptor.descriptor_len,
                           max_trials=max_trials,
                           coord_fix=make_coord_fix("kitti", calib_root))
    return {"frames": stats["frames"], **res._asdict()}


def phase_eval_reg(args):
    """Full-pipeline registration A/B: trained vs untrained descriptor, both on
    the trained detector's keypoints (evaluate_kitti.m protocol: 1-NN matching
    -> RANSAC -> success iff RTE<=2 m and RRE<=5 deg)."""
    from usip_tpu.eval.eval_runner import load_kitti_gt_table
    from usip_tpu.train.checkpoint import save_checkpoint
    from usip_tpu.train.descriptor_loop import init_descriptor_state

    gt = []
    for seq in (9, 10):
        gt.extend(load_kitti_gt_table(
            os.path.join(args.root, "kitti-reg-test"), seq))
    calib_root = os.path.join(args.root, "calib")
    det_ckpt = _detector_ckpt(args.root)
    desc_dir = os.path.join(args.root, "ckpt",
                            f"{args.desc_name}_descriptor")
    desc_ckpt = os.path.join(desc_dir, "best.msgpack")
    if not os.path.exists(desc_ckpt):
        desc_ckpt = os.path.join(desc_dir, "last.msgpack")

    cfg = _cfg(args)
    trained_dir = (os.path.join(args.root, f"reg_trained_{args.desc_name}")
                   if args.desc_name != "fullscale"
                   else os.path.join(args.root, "reg_trained"))
    results = {"phase": "eval-reg", "pairs": len(gt),
               "desc_name": args.desc_name}
    results["trained_desc"] = _export_and_reg(
        cfg, det_ckpt, desc_ckpt, trained_dir, gt, calib_root)

    # untrained (random-init) descriptor on the same trained keypoints —
    # isolates what descriptor learning adds to the end metric
    _, dstate = init_descriptor_state(cfg, seed=321)
    upath = os.path.join(args.root, "ckpt", "untrained_desc.msgpack")
    save_checkpoint(upath, dstate)
    results["untrained_desc"] = _export_and_reg(
        cfg, det_ckpt, upath, os.path.join(args.root, "reg_untrained"),
        gt, calib_root)

    # pure-random descriptor floor: same trained keypoints, descriptors
    # replaced by random unit vectors — matching is chance, so this bounds
    # what keypoint geometry alone contributes to RANSAC success
    results["random_desc_floor"] = _random_desc_arm(
        args, cfg, gt, calib_root, kp_dir=os.path.join(trained_dir,
                                                       "keypoints"))

    if getattr(args, "yaw", False):
        # Discriminating protocol: per-frame random yaw applied to every
        # cloud before detect+describe (keypoints rotated back, GT unchanged).
        # Aligned synthetic frames are solvable by yaw-VARIANT untrained ball
        # features (the round-1/2 finding); under mutual yaw only an
        # invariance-trained descriptor keeps matching. The reference trains
        # kitti with rot_horizontal for exactly this regime.
        results["trained_desc_yaw"] = _export_and_reg(
            cfg, det_ckpt, desc_ckpt, trained_dir + "_yaw", gt, calib_root,
            frame_yaw_seed=7)
        results["untrained_desc_yaw"] = _export_and_reg(
            cfg, det_ckpt, upath,
            os.path.join(args.root, "reg_untrained_yaw"), gt, calib_root,
            frame_yaw_seed=7)
    print(json.dumps(results))


def _random_desc_arm(args, cfg, gt, calib_root, seed=17, kp_dir=None):
    from usip_tpu.eval.eval_runner import make_coord_fix, run_registration

    if kp_dir is None:
        kp_dir = os.path.join(args.root, "reg_trained", "keypoints")
    desc_dir = os.path.join(args.root, "reg_randomdesc", "descriptors")
    d = cfg.descriptor.descriptor_len
    rng = np.random.default_rng(seed)
    frames = 0
    for seq in sorted(os.listdir(kp_dir)):
        os.makedirs(os.path.join(desc_dir, seq), exist_ok=True)
        for fn in sorted(os.listdir(os.path.join(kp_dir, seq))):
            kp = np.fromfile(os.path.join(kp_dir, seq, fn),
                             np.float32).reshape(-1, 3)
            vec = rng.normal(size=(kp.shape[0], d)).astype(np.float32)
            vec /= np.linalg.norm(vec, axis=1, keepdims=True) + 1e-12
            vec.tofile(os.path.join(desc_dir, seq, fn))
            frames += 1
    res = run_registration(kp_dir, desc_dir, gt, desc_dim=d,
                           max_trials=10000,
                           coord_fix=make_coord_fix("kitti", calib_root))
    return {"frames": frames, **res._asdict()}


def phase_smoke(args):
    """Production-preset quality regression gate (round-3 VERDICT weak #6):
    a shortened gen/train/eval cycle at the REAL kitti preset *semantics* —
    device_sampling parent-cloud wire in fp16, bf16 trunk, the shipped FPS
    backend — with scaled-down sizes so it runs on CPU in minutes. Asserts
    trained repeatability >= ``--factor`` x random keypoints, exiting nonzero
    otherwise. This is the pre-release check for the exact path (device
    subsample + fp16 wire + bf16 + Mosaic-FPS-on-TPU) where a silent quality
    regression would hide from the toy-scale fp32 gate
    (scripts/validate_synthetic.py)."""
    import shutil
    import tempfile

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from usip_tpu.data.synthetic import build_synthetic_kitti_tree

    root = args.root or tempfile.mkdtemp(prefix="usip_smoke_")
    args.root = root
    scale = [
        # reduced sizes; every *semantic* lever (device_sampling, fp16 wire,
        # bf16 compute, fps backend) stays at the preset default
        "data.input_pc_num=2048", "data.parent_pc_num=2560",
        "data.node_num=64", "detector.c1=32", "detector.c2=128",
        "train.batch_size=4", "train.log_every=50",
    ]
    args.override = scale + list(args.override)
    # all 9 train seqs (the kitti loader's fixed seq contract), few frames each
    build_synthetic_kitti_tree(root, train_seqs=range(9), test_seqs=(9, 10),
                               frames_per_seq=6, test_frames_per_seq=10,
                               target_points=4096, seed=0)
    args.epochs = args.epochs or 16
    phase_train(args)

    from usip_tpu.eval.eval_runner import load_kitti_gt_table
    gt = []
    for seq in (9, 10):
        gt.extend(load_kitti_gt_table(
            os.path.join(root, "kitti-reg-test"), seq))
    calib_root = os.path.join(root, "calib")
    cfg = _cfg(args)
    trained = _export_and_rep(
        cfg, _detector_ckpt(root), os.path.join(root, "kp_smoke"), gt,
        calib_root, desired=64, inlier_radius=0.5)
    random_kp = _export_and_rep(
        cfg, None, os.path.join(root, "kp_smoke_rand"), gt, calib_root,
        desired=64, inlier_radius=0.5)
    ratio = trained["repeatability"] / max(random_kp["repeatability"], 1e-9)
    result = {"phase": "smoke", "pairs": len(gt),
              "trained": trained, "random": random_kp,
              "ratio": ratio, "factor": args.factor,
              "passed": bool(ratio >= args.factor)}
    print(json.dumps(result))
    if args.cleanup:
        shutil.rmtree(root, ignore_errors=True)
    if not result["passed"]:
        raise SystemExit(
            f"smoke gate FAILED: trained/random repeatability {ratio:.2f} "
            f"< required {args.factor}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="phase", required=True)
    g = sub.add_parser("gen")
    g.add_argument("--root", default="/tmp/synth_kitti")
    g.add_argument("--frames", type=int, default=48)
    g.add_argument("--test-frames", type=int, default=36)
    g.set_defaults(fn=phase_gen)
    t = sub.add_parser("train")
    t.add_argument("--root", default="/tmp/synth_kitti")
    t.add_argument("--epochs", type=int, default=40)
    t.set_defaults(fn=phase_train)
    e = sub.add_parser("eval")
    e.add_argument("--root", default="/tmp/synth_kitti")
    e.set_defaults(fn=phase_eval)
    td = sub.add_parser("train-desc")
    td.add_argument("--root", default="/tmp/synth_kitti")
    td.add_argument("--epochs", type=int, default=30)
    td.set_defaults(fn=phase_train_desc)
    er = sub.add_parser("eval-reg")
    er.add_argument("--root", default="/tmp/synth_kitti")
    er.add_argument("--yaw", action="store_true",
                    help="add per-frame-yaw arms (trained/untrained) — the "
                         "discriminating rotation protocol")
    er.set_defaults(fn=phase_eval_reg)
    for p in (td, er):
        p.add_argument("--desc-name", default="fullscale",
                       help="descriptor arm name: checkpoints live in "
                            "ckpt/<name>_descriptor (e.g. train a CGF arm "
                            "with --desc-name cgf --override "
                            "descriptor.use_cgf_loss=true)")
    sm = sub.add_parser("smoke")
    sm.add_argument("--root", default=None,
                    help="working dir (default: fresh temp dir)")
    sm.add_argument("--epochs", type=int, default=None)
    sm.add_argument("--factor", type=float, default=2.0,
                    help="required trained/random repeatability ratio")
    sm.add_argument("--cleanup", action="store_true",
                    help="remove the working dir on success")
    sm.add_argument("--platform", default=None,
                    choices=["cpu", "tpu", "axon"],
                    help="force a jax platform (cpu = TPU-less pre-release "
                         "gate, minutes on a workstation)")
    sm.set_defaults(fn=phase_smoke)
    for p in (g, t, e, td, er, sm):
        p.add_argument("--override", action="append", default=[],
                       help="dotted config override, e.g. detector.c1=32 "
                            "(repeatable; lets the protocol run at reduced "
                            "scale, e.g. a CPU smoke test)")
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
