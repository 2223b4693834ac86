"""Unified CLI: train / export / eval for every dataset.

Replaces the reference's nine per-dataset scripts with one entry point:

  python -m usip_tpu.cli train-detector --dataset kitti --dataroot ... [--synthetic]
  python -m usip_tpu.cli train-descriptor --dataset oxford --dataroot ... \
      --detector-checkpoint ckpt.msgpack
  python -m usip_tpu.cli export-keypoints --dataset kitti --checkpoint ... --out ...
  python -m usip_tpu.cli eval-repeatability --anc-dir ... --pos-dir ... --gt ...
  python -m usip_tpu.cli bench
"""

from __future__ import annotations

import argparse
import json
import os


def _add_common(p):
    p.add_argument("--dataset", default="kitti",
                   choices=["modelnet", "shrec", "oxford", "kitti", "scenenn",
                            "match3d"])
    p.add_argument("--dataroot", default="")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--num-devices", type=int, default=1)
    p.add_argument("--name", default="train")
    p.add_argument("--checkpoints-dir", default="checkpoints")
    p.add_argument("--synthetic", action="store_true",
                   help="use the in-memory synthetic dataset (smoke runs)")
    p.add_argument("--override", action="append", default=[],
                   help="dotted config override, e.g. data.input_pc_num=4096")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of one steady-state step")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                   help="force a jax platform (cpu enables TPU-less smoke runs)")
    p.add_argument("--coordinator-address", default=None,
                   help="multi-host training: coordinator host:port. Launch "
                        "one process per host with --num-processes and "
                        "--process-id; --num-devices counts GLOBAL devices, "
                        "--batch-size and the data loader are PER HOST (the "
                        "global batch is the per-host batches concatenated "
                        "in process order). Only process 0 logs and writes "
                        "checkpoints.")
    p.add_argument("--num-processes", type=int, default=None,
                   help="multi-host: total process count")
    p.add_argument("--process-id", type=int, default=None,
                   help="multi-host: this process's index")


def _build_config(args, role="detector"):
    from usip_tpu.config import get_config
    overrides = {}
    for ov in args.override:
        k, _, v = ov.partition("=")
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        overrides[k] = v
    cfg = get_config(args.dataset, role=role, **overrides)
    updates = {"data.dataroot": args.dataroot,
               "train.num_devices": args.num_devices,
               "train.name": args.name,
               "train.checkpoint_dir": args.checkpoints_dir}
    if args.batch_size:
        updates["train.batch_size"] = args.batch_size
    if args.epochs:
        updates["train.epochs"] = args.epochs
    # an explicit --override always wins over a flag's *default* value (a
    # --override train.num_devices=4 must not be clobbered by the unset
    # --num-devices defaulting to 1)
    updates = {k: v for k, v in updates.items() if k not in overrides}
    return cfg.with_overrides(**updates)


def _make_loaders(cfg, args, sn_len):
    from usip_tpu.data.pipeline import BatchLoader
    if args.synthetic:
        from usip_tpu.data.synthetic import SyntheticDataset
        train_ds = SyntheticDataset(size=64, input_pc_num=cfg.data.input_pc_num,
                                    surface_normal_len=sn_len, seed=0)
        test_ds = SyntheticDataset(size=16, input_pc_num=cfg.data.input_pc_num,
                                   surface_normal_len=sn_len, seed=1)
    else:
        from usip_tpu.data.loaders import (ConcatSiameseDataset,
                                           ParentCloudDataset,
                                           make_detector_dataset)
        train_ds = make_detector_dataset(cfg.data.dataset, cfg.data, "train",
                                         sn_len)
        if cfg.data.dataset == "scenenn":
            # scenenn trains on train+val (scenenn/train_detector.py:55-60)
            try:
                val_ds = make_detector_dataset(cfg.data.dataset, cfg.data,
                                               "val", sn_len)
                train_ds = ConcatSiameseDataset([train_ds, val_ds])
            except (FileNotFoundError, OSError):
                pass  # no val split on disk
        test_ds = make_detector_dataset(cfg.data.dataset, cfg.data, "test",
                                        sn_len)
        if cfg.data.device_sampling:
            # ship the parent cloud once; siamese subsamples drawn on device
            train_ds = ParentCloudDataset(train_ds)
            test_ds = ParentCloudDataset(test_ds)
    train = BatchLoader(train_ds, cfg.train.batch_size, shuffle=True,
                        num_workers=cfg.data.num_workers)
    test = BatchLoader(test_ds, cfg.train.batch_size, shuffle=False,
                       num_workers=cfg.data.num_workers)
    return train, test


def cmd_train_detector(args):
    cfg = _build_config(args)
    if getattr(args, "lite", False):
        # indoor widths (RPN_DetectorLite, networks.py:165-307) — required
        # when the checkpoint will feed an indoor descriptor pipeline, which
        # builds the lite-width detector (config.get_config role='descriptor').
        # Explicit --override detector.* entries keep precedence over --lite.
        import dataclasses as _dc

        from usip_tpu.config import lite_detector
        cfg = _dc.replace(cfg, detector=lite_detector(cfg.detector))
        det_overrides = {}
        for ov in args.override:
            k, _, v = ov.partition("=")
            if k.startswith("detector."):
                try:
                    v = json.loads(v)
                except json.JSONDecodeError:
                    pass
                det_overrides[k] = v
        if det_overrides:
            cfg = cfg.with_overrides(**det_overrides)
    from usip_tpu.train.loop import DetectorEngine
    train, test = _make_loaders(cfg, args, cfg.detector.surface_normal_len)
    engine = DetectorEngine(cfg, train, test, profile_dir=args.profile_dir)
    if args.resume:
        path = args.resume
        if path == "auto":
            path = os.path.join(engine.out_dir, "last.msgpack")
        start = engine.resume(path)
        print(f"resumed from {path} at epoch {start}")
    engine.fit()


def cmd_train_descriptor(args):
    cfg = _build_config(args, role="descriptor")
    from usip_tpu.train.descriptor_loop import DescriptorEngine
    if args.synthetic:
        engine = DescriptorEngine(cfg, args.detector_checkpoint, synthetic=True)
    else:
        import numpy as np
        from usip_tpu.data.pipeline import BatchLoader
        sn = cfg.descriptor.surface_normal_len
        name = cfg.data.dataset
        if name == "oxford":
            from usip_tpu.data.descriptor_loaders import OxfordDescriptorDataset
            ds = OxfordDescriptorDataset(cfg.data, "train", sn_len=sn)

            def mine(raw):
                return ds.mine_negative_indices(np.asarray(raw["index"]))
        elif name == "kitti":
            from usip_tpu.data.descriptor_loaders import KittiDescriptorDataset
            ds = KittiDescriptorDataset(cfg.data, "train", sn_len=sn)

            def mine(raw):
                return ds.mine_negative_indices(np.asarray(raw["seq"]),
                                                np.asarray(raw["pose"]))
        elif name == "scenenn":
            from usip_tpu.data.descriptor_loaders import SceneNNDescriptorDataset
            ds = SceneNNDescriptorDataset(cfg.data, "train", sn_len=sn)
            mine = None  # indoor CGF loss mines negatives per-keypoint on device
        else:
            raise SystemExit(f"descriptor training not defined for {name!r} "
                             "(reference trains descriptors on oxford/kitti/"
                             "scenenn only)")
        loader = BatchLoader(ds, cfg.train.batch_size, shuffle=True,
                             num_workers=cfg.data.num_workers)
        test_loader = None
        try:
            test_ds = type(ds)(cfg.data, "test", sn_len=sn)
            test_loader = BatchLoader(test_ds, cfg.train.batch_size,
                                      shuffle=False,
                                      num_workers=cfg.data.num_workers)
        except (FileNotFoundError, OSError):
            pass  # no test split on disk
        engine = DescriptorEngine(cfg, args.detector_checkpoint,
                                  train_loader=loader, test_loader=test_loader,
                                  mine_negatives=mine)
    engine.fit()


def cmd_export_keypoints(args):
    cfg = _build_config(args)
    if getattr(args, "downsample_rate", 1) > 1:
        # the export tool's robustness knob: detect on 1/rate of the points
        # (save_keypoints.py:35,116 input_pc_num /= downsample_rate)
        cfg = cfg.with_overrides(**{
            "data.input_pc_num": cfg.data.input_pc_num // args.downsample_rate})
    from usip_tpu.eval.export_runner import run_export
    stats = run_export(cfg, checkpoint=args.checkpoint, out_dir=args.out,
                       nms_radius=args.nms_radius,
                       desired_num=args.num_keypoints,
                       synthetic=args.synthetic, method=args.method,
                       noise_sigma=args.noise_sigma, subset=args.subset,
                       with_sigmas=args.with_sigmas)
    print(json.dumps(stats))


def cmd_export_model(args):
    """Write self-contained AOT model artifacts (jax.export / StableHLO) —
    the deployment form: weights baked in, runnable without model code."""
    from usip_tpu.model_artifact import (export_descriptor_artifact,
                                         export_detector_artifact,
                                         export_pipeline_artifact)
    platforms = tuple(p.strip() for p in args.platforms.split(","))
    cfg = _build_config(
        args, role="descriptor" if args.descriptor_checkpoint else "detector")
    if args.pipeline:
        if not args.descriptor_checkpoint:
            raise SystemExit("--pipeline needs --descriptor-checkpoint "
                             "(it fuses detect+describe into one program)")
        hdr = export_pipeline_artifact(
            cfg, args.checkpoint, args.descriptor_checkpoint, args.out,
            batch=args.batch, platforms=platforms)
        hdr["path"] = args.out
        print(json.dumps({"pipeline": hdr}))
        return
    out = {}
    out["detector"] = export_detector_artifact(
        cfg, args.checkpoint, args.out, batch=args.batch, platforms=platforms)
    out["detector"]["path"] = args.out
    if args.descriptor_checkpoint:
        desc_out = args.desc_out or (os.path.splitext(args.out)[0]
                                     + ".descriptor.usipart")
        out["descriptor"] = export_descriptor_artifact(
            cfg, args.descriptor_checkpoint, desc_out, batch=args.batch,
            num_keypoints=args.num_keypoints, platforms=platforms)
        out["descriptor"]["path"] = desc_out
    print(json.dumps(out))


def cmd_run_model(args):
    """Serve raw .npy clouds through exported artifacts (the checkpoint-free
    counterpart of `detect`)."""
    import glob as globmod

    from usip_tpu.model_artifact import run_detector_artifact
    paths = sorted(globmod.glob(os.path.join(args.input, "*.npy"))
                   if os.path.isdir(args.input) else globmod.glob(args.input))
    if not paths:
        raise SystemExit(f"no .npy clouds match {args.input}")
    stats = run_detector_artifact(
        args.artifact, paths, args.out, num_keypoints=args.num_keypoints,
        nms_radius=args.nms_radius, desc_artifact_path=args.desc_artifact,
        seed=args.seed)
    print(json.dumps(stats))


def cmd_render_keypoints(args):
    """Browse exported keypoints over their clouds (the reference's
    evaluation/visualize_keypoints viewer)."""
    cfg = _build_config(args)
    from usip_tpu.eval.render import run_render
    stats = run_render(cfg, kp_dir=args.kp_dir, out_dir=args.out,
                       kp_dim=args.kp_dim,
                       sigma_threshold=args.sigma_threshold,
                       max_frames=args.max_frames, html=not args.no_html,
                       seed=args.seed, synthetic=args.synthetic,
                       subset=args.subset)
    print(json.dumps(stats))


def cmd_export_descriptors(args):
    # descriptor checkpoints are trained under role='descriptor' config deltas
    # (lite detector widths for scenenn, descriptor-role node counts); build
    # the matching config so restore_checkpoint sees the right shapes
    cfg = _build_config(args, role="descriptor")
    from usip_tpu.eval.export_runner import run_export_with_descriptors
    stats = run_export_with_descriptors(
        cfg, detector_checkpoint=args.checkpoint,
        descriptor_checkpoint=args.descriptor_checkpoint,
        kp_out=os.path.join(args.out, "keypoints"),
        desc_out=os.path.join(args.out, "descriptors"),
        nms_radius=args.nms_radius, desired_num=args.num_keypoints,
        synthetic=args.synthetic)
    print(json.dumps(stats))


def _load_gt(args):
    from usip_tpu.eval.eval_runner import (load_gt_npy_dir, load_kitti_gt_table,
                                           load_oxford_gt_pkl)
    if args.kitti_gt:
        gt = []
        for seq in (9, 10):
            gt.extend(load_kitti_gt_table(args.kitti_gt, seq))
        return gt
    if getattr(args, "oxford_root", None):
        return load_oxford_gt_pkl(args.oxford_root)
    if not args.gt_dir:
        raise SystemExit("no groundtruth source: pass --gt-dir, --kitti-gt, "
                         "or --oxford-root")
    gt = load_gt_npy_dir(args.gt_dir)
    if not gt:
        raise SystemExit(f"no GT pairs found in --gt-dir {args.gt_dir!r} "
                         "(expected <i>.npy or <i>_gt.npy 4x4 transforms)")
    return gt


def _coord_fix(args):
    from usip_tpu.eval.eval_runner import make_coord_fix
    return make_coord_fix(getattr(args, "coord_fix", None),
                          getattr(args, "calib_root", None))


def cmd_eval_repeatability(args):
    from usip_tpu.eval.eval_runner import run_repeatability
    gt = _load_gt(args)
    mean, arr = run_repeatability(args.anc_dir, args.pos_dir, gt,
                                  inlier_radius=args.inlier_radius,
                                  coord_fix=_coord_fix(args))
    print(json.dumps({"repeatability": mean, "pairs": len(arr),
                      "min": float(arr.min()), "max": float(arr.max())}))


def cmd_eval_registration(args):
    from usip_tpu.eval.eval_runner import run_registration
    gt = _load_gt(args)
    if args.sweep_trials:
        # automation_kitti.m:4-19: sweep the RANSAC budget
        for trials in [int(t) for t in args.sweep_trials.split(",")]:
            stats = run_registration(args.kp_dir, args.desc_dir, gt,
                                     desc_dim=args.desc_dim,
                                     threshold=args.inlier_threshold,
                                     max_trials=trials,
                                     coord_fix=_coord_fix(args))
            print(json.dumps({"max_trials": trials, **stats._asdict()}))
    else:
        stats = run_registration(args.kp_dir, args.desc_dir, gt,
                                 desc_dim=args.desc_dim,
                                 threshold=args.inlier_threshold,
                                 max_trials=args.max_trials,
                                 coord_fix=_coord_fix(args))
        print(json.dumps(stats._asdict()))


def cmd_eval_indoor(args):
    """3DMatch/Redwood fragment-registration eval (ElasticReconstruction lite
    protocol — eval_indoor/fullEvaluation.m): register gated pairs per scene
    into <out>/<scene>.log, then recall/precision vs gt. With --logs-only,
    evaluates existing logs (the Redwood loop protocol, eval_loop.m)."""
    import numpy as np

    from usip_tpu.eval import indoor

    scenes = args.scenes.split(",")
    logs = {}
    if args.logs_only:
        if not args.log_dir:
            raise SystemExit("eval-indoor: --logs-only requires --log-dir")
        for scene in scenes:
            logs[scene] = os.path.join(args.log_dir, f"{scene}.log")
    else:
        missing = [f for f, v in (("--pc-root", args.pc_root),
                                  ("--result-root", args.result_root),
                                  ("--out", args.out)) if not v]
        if missing:
            raise SystemExit(
                f"eval-indoor: register mode requires {' '.join(missing)} "
                "(or pass --logs-only with --log-dir)")
        os.makedirs(args.out, exist_ok=True)
        for scene in scenes:
            pc_dir = os.path.join(args.pc_root, scene)
            res_dir = os.path.join(args.result_root, scene)
            n_frag = len([f for f in os.listdir(pc_dir) if f.endswith(".npy")])
            fragments = []
            for i in range(n_frag):
                pc = np.load(os.path.join(pc_dir, f"{i}.npy"))
                kp, desc = indoor.load_fragment_features(
                    os.path.join(res_dir, f"{i}.bin"), args.desc_dim)
                fragments.append((pc, kp, desc))
            pairs = None
            if args.overlapped_only:
                gt = indoor.load_log(os.path.join(
                    args.gt_root, f"{scene}-evaluation", "gt.log"))
                pairs = [(e.i, e.j) for e in gt]
            entries = indoor.run_scene_registration(
                fragments, pairs=pairs, max_trials=args.max_trials,
                estimator=args.estimator)
            log_path = os.path.join(args.out, f"{scene}.log")
            indoor.write_log_my(log_path, entries)
            logs[scene] = log_path
    per_scene = indoor.evaluate_scenes(logs, args.gt_root)
    for scene, r in per_scene.items():
        print(json.dumps({"scene": scene, **r._asdict()}))
    print(json.dumps(indoor.summarize(per_scene)))


def _sn_columns(data, s):
    """Extract the sn feature block from an (N, 3+F) cloud, zero-padding when
    the file carries fewer channels than the model expects (a width mismatch
    otherwise surfaces as an opaque XLA shape error deep in the forward)."""
    import numpy as np
    if data.shape[1] <= 3:
        return None
    sn = data[:, 3:3 + s].astype(np.float32)
    if sn.shape[1] < s:
        sn = np.concatenate(
            [sn, np.zeros((sn.shape[0], s - sn.shape[1]), np.float32)], axis=1)
    return sn


def cmd_detect(args):
    """Serve keypoints (+descriptors) for arbitrary cloud files — no dataset
    layout required: each input .npy holds one (N, 3) or (N, 3+S) cloud."""
    import glob as globmod

    import numpy as np

    from usip_tpu.inference import KeypointPipeline

    # with a descriptor checkpoint the descriptor-role config deltas apply
    # (the descriptor engine trains its frozen detector at those widths)
    cfg = _build_config(
        args, role="descriptor" if args.descriptor_checkpoint else "detector")
    pipe = KeypointPipeline(cfg, args.checkpoint,
                            descriptor_checkpoint=args.descriptor_checkpoint)
    paths = sorted(globmod.glob(os.path.join(args.input, "*.npy"))
                   if os.path.isdir(args.input) else globmod.glob(args.input))
    if not paths:
        raise SystemExit(f"no .npy clouds match {args.input}")
    os.makedirs(args.out, exist_ok=True)
    gallery = None
    if getattr(args, "html", False):
        from usip_tpu.utils.html import HTMLGallery
        # image_dir='' -> renders live next to index.html, links stay valid
        gallery = HTMLGallery(args.out, title="usip_tpu detections",
                              image_dir="")
    s = cfg.detector.surface_normal_len
    for path in paths:
        data = np.load(path)
        pc, sn = data[:, :3], _sn_columns(data, s)
        name = os.path.splitext(os.path.basename(path))[0]
        if args.descriptor_checkpoint:
            kp, desc = pipe.detect_and_describe(
                pc, sn, num_keypoints=args.num_keypoints,
                nms_radius=args.nms_radius)
            sig = None
            desc.astype(np.float32).tofile(
                os.path.join(args.out, f"{name}.desc.bin"))
        else:
            kp, sig = pipe.detect(pc, sn, num_keypoints=args.num_keypoints,
                                  nms_radius=args.nms_radius)
        kp.astype(np.float32).tofile(
            os.path.join(args.out, f"{name}.keypoints.bin"))
        if getattr(args, "render", False) or gallery is not None:
            # the working replacement of the reference's broken matplotlib
            # keypoint viewer (oxford/test.py:6,17 stale imports) and of the
            # visdom scatter payloads (models/keypoint_detector.py:259-334)
            from usip_tpu.utils.vis import save_keypoint_scene
            png = os.path.join(args.out, f"{name}.png")
            save_keypoint_scene(png, pc, None, kp, sig)
            if gallery is not None:
                gallery.add_section(name, [(f"{name}.png",
                                            f"{kp.shape[0]} keypoints")])
        print(f"{name}: {kp.shape[0]} keypoints", flush=True)
    if gallery is not None:
        gallery.save()
    print(json.dumps({"clouds": len(paths), "out": args.out}))


def cmd_serve(args):
    """Long-running keypoint service: one JSON request per stdin line,
    one JSON reply per stdout line.

    Request:  {"input": "<cloud.npy>", "out": "<dir>", "id": any,
               "num_keypoints": int?, "nms_radius": float?}
    Reply:    {"id": ..., "keypoints": "<path>.keypoints.bin",
               "descriptors": "<path>.desc.bin"?, "n": int}
    Errors reply {"id": ..., "error": "..."} and the loop continues. EOF or
    a {"cmd": "shutdown"} line exits cleanly. The model stays resident and
    compiled across requests — the deployment analog of the reference's
    one-shot save_keypoints.py batch tool."""
    import sys as _sys

    import numpy as np

    from usip_tpu.inference import KeypointPipeline

    cfg = _build_config(
        args, role="descriptor" if args.descriptor_checkpoint else "detector")
    pipe = KeypointPipeline(cfg, args.checkpoint,
                            descriptor_checkpoint=args.descriptor_checkpoint)
    s = cfg.detector.surface_normal_len
    print(json.dumps({"status": "ready",
                      "descriptors": args.descriptor_checkpoint is not None}),
          flush=True)
    for line in _sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            print(json.dumps({"error": f"bad request: {e}"}), flush=True)
            continue
        if not isinstance(req, dict):
            print(json.dumps({"error": "bad request: expected a JSON "
                                       "object"}), flush=True)
            continue
        if req.get("cmd") == "shutdown":
            print(json.dumps({"status": "bye"}), flush=True)
            return
        rid = req.get("id")
        try:
            data = np.load(req["input"])
            pc = data[:, :3]
            sn = _sn_columns(data, s)
            out_dir = req.get("out", args.out or ".")
            os.makedirs(out_dir, exist_ok=True)
            name = os.path.splitext(os.path.basename(req["input"]))[0]
            nk = int(req.get("num_keypoints", args.num_keypoints))
            nms = float(req.get("nms_radius", args.nms_radius))
            reply = {"id": rid}
            if args.descriptor_checkpoint:
                kp, desc = pipe.detect_and_describe(pc, sn, num_keypoints=nk,
                                                    nms_radius=nms)
                dpath = os.path.join(out_dir, f"{name}.desc.bin")
                desc.astype(np.float32).tofile(dpath)
                reply["descriptors"] = dpath
            else:
                kp, _ = pipe.detect(pc, sn, num_keypoints=nk, nms_radius=nms)
            kpath = os.path.join(out_dir, f"{name}.keypoints.bin")
            kp.astype(np.float32).tofile(kpath)
            reply.update(keypoints=kpath, n=int(kp.shape[0]))
            print(json.dumps(reply), flush=True)
        except Exception as e:  # noqa: BLE001 — a bad request must not kill the server
            print(json.dumps({"id": rid,
                              "error": f"{type(e).__name__}: {e}"}),
                  flush=True)


def cmd_import_torch(args):
    """Convert a reference PyTorch checkpoint (<epoch>_net_detector.pth /
    _net_descriptor.pth, keypoint_detector.py:348-351) into a full-state
    msgpack checkpoint loadable by the engines/eval tools."""
    import torch

    from usip_tpu.train.checkpoint import save_checkpoint
    from usip_tpu.train.state import make_adam, TrainState
    from usip_tpu.train.torch_import import (convert_descriptor_state_dict,
                                             convert_detector_state_dict)

    cfg = _build_config(args, role=args.role)
    sd = torch.load(args.pth, map_location="cpu", weights_only=True)
    if args.role == "detector":
        from usip_tpu.train.loop import init_detector_state
        _, state = init_detector_state(cfg, cfg.train.seed)
        variables = convert_detector_state_dict(sd, state.variables)
    else:
        from usip_tpu.train.descriptor_loop import init_descriptor_state
        _, state = init_descriptor_state(cfg, cfg.train.seed)
        variables = convert_descriptor_state_dict(sd, state.variables)
    new_state = TrainState.create(variables, make_adam(cfg.train.lr))
    save_checkpoint(args.out, new_state,
                    metadata={"imported_from": args.pth, "role": args.role})
    print(f"imported {args.pth} -> {args.out} ({args.role}, "
          f"dataset={cfg.data.dataset})")


def cmd_bench(args):
    import bench
    bench.main()


def main(argv=None):
    parser = argparse.ArgumentParser(prog="usip_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train-detector")
    _add_common(p)
    p.add_argument("--resume", default=None,
                   help="checkpoint path, or 'auto' for <out_dir>/last.msgpack")
    p.add_argument("--lite", action="store_true",
                   help="indoor lite widths (c1=64/c2=256, RPN_DetectorLite) "
                        "— use when training the detector for an indoor "
                        "(scenenn/3DMatch) descriptor pipeline")
    p.set_defaults(fn=cmd_train_detector)

    p = sub.add_parser("train-descriptor")
    _add_common(p)
    p.add_argument("--detector-checkpoint", required=True)
    p.set_defaults(fn=cmd_train_descriptor)

    p = sub.add_parser("export-keypoints")
    _add_common(p)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--nms-radius", type=float, default=0.0)
    p.add_argument("--num-keypoints", type=int, default=128)
    p.add_argument("--method", default="model",
                   choices=["model", "random", "iss", "harris", "sift"],
                   help="trained detector or a classical baseline "
                        "(save_keypoints.py method switch)")
    p.add_argument("--noise-sigma", type=float, default=0.0)
    p.add_argument("--downsample-rate", type=int, default=1,
                   help="detect on input_pc_num/rate points "
                        "(save_keypoints.py downsample_rate)")
    p.add_argument("--subset", default="original",
                   choices=["original", "rotated"],
                   help="modelnet/shrec: which half of the rotated-pair "
                        "repeatability protocol to export")
    p.add_argument("--with-sigmas", action="store_true",
                   help="write 4-column (xyz, sigma) bins — the form the "
                        "reference's visualize_keypoints viewer reads; "
                        "render with render-keypoints --kp-dim 4")
    p.set_defaults(fn=cmd_export_keypoints)

    p = sub.add_parser("export-model",
                       help="write a self-contained AOT artifact "
                            "(jax.export/StableHLO, weights baked in) for "
                            "checkpoint-free serving")
    _add_common(p)
    p.add_argument("--checkpoint", required=True, help="detector checkpoint")
    p.add_argument("--out", required=True, help="artifact path (.usipart)")
    p.add_argument("--batch", type=int, default=1,
                   help="pinned serving batch (static shapes)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets; 'tpu' alone "
                        "keeps the Mosaic FPS kernel in the artifact "
                        "(fastest serving form — not loadable on cpu)")
    p.add_argument("--descriptor-checkpoint", default=None,
                   help="also export a descriptor artifact")
    p.add_argument("--desc-out", default=None,
                   help="descriptor artifact path (default: "
                        "<out>.descriptor.usipart)")
    p.add_argument("--num-keypoints", type=int, default=128,
                   help="keypoint-set shape pinned into the descriptor "
                        "artifact")
    p.add_argument("--pipeline", action="store_true",
                   help="one fused program (FPS+detect+describe, descriptors "
                        "for every proposal) instead of two artifacts")
    p.set_defaults(fn=cmd_export_model)

    p = sub.add_parser("run-model",
                       help="run exported artifacts over raw .npy clouds "
                            "(no model code or checkpoints needed)")
    p.add_argument("--artifact", required=True)
    p.add_argument("--input", required=True,
                   help=".npy file, glob, or directory of clouds")
    p.add_argument("--out", required=True)
    p.add_argument("--num-keypoints", type=int, default=128)
    p.add_argument("--nms-radius", type=float, default=0.0)
    p.add_argument("--desc-artifact", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None,
                   choices=["cpu", "tpu", "axon"],
                   help="force a jax platform")
    p.set_defaults(fn=cmd_run_model)

    p = sub.add_parser("render-keypoints",
                       help="render exported keypoint .bin trees over their "
                            "source clouds (evaluation/visualize_keypoints "
                            "viewer): PNGs + an HTML gallery")
    _add_common(p)
    p.add_argument("--kp-dir", required=True,
                   help="root of an export-keypoints .bin tree")
    p.add_argument("--out", required=True)
    p.add_argument("--kp-dim", type=int, default=3, choices=[3, 4],
                   help="columns per keypoint row (4 = --with-sigmas exports)")
    p.add_argument("--sigma-threshold", type=float, default=None,
                   help="keep keypoints with sigma < threshold (defaults to "
                        "the reference's per-dataset value for 4-column bins: "
                        "modelnet 0.04 / oxford 0.25 / kitti 0.3 / "
                        "scenenn 0.08, visualize_features.m)")
    p.add_argument("--max-frames", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-html", action="store_true")
    p.add_argument("--subset", default="original",
                   choices=["original", "rotated"],
                   help="modelnet/shrec: which half of the rotated-pair "
                        "tree the bins were exported from")
    p.set_defaults(fn=cmd_render_keypoints)

    p = sub.add_parser("export-descriptors")
    _add_common(p)
    p.add_argument("--checkpoint", required=True, help="detector checkpoint")
    p.add_argument("--descriptor-checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--nms-radius", type=float, default=0.0)
    p.add_argument("--num-keypoints", type=int, default=128)
    p.set_defaults(fn=cmd_export_descriptors)

    p = sub.add_parser("eval-repeatability")
    p.add_argument("--anc-dir", required=True)
    p.add_argument("--pos-dir", required=True)
    p.add_argument("--gt-dir", default=None)
    p.add_argument("--kitti-gt", default=None,
                   help="kitti-reg-test root with <seq>/groundtruths.txt")
    p.add_argument("--oxford-root", default=None,
                   help="oxford dataroot (reads test groundtruths.pkl)")
    p.add_argument("--inlier-radius", type=float, default=0.5)
    p.add_argument("--coord-fix", default="none",
                   choices=["none", "kitti", "oxford"],
                   help="convert exported camera-frame keypoints into the GT "
                        "frame (eval_rep.m:48,70-83)")
    p.add_argument("--calib-root", default=None,
                   help="kitti calib tree <root>/<seq:02d>/calib.txt")
    p.set_defaults(fn=cmd_eval_repeatability)

    p = sub.add_parser("eval-registration")
    p.add_argument("--kp-dir", required=True)
    p.add_argument("--desc-dir", required=True)
    p.add_argument("--gt-dir", default=None)
    p.add_argument("--kitti-gt", default=None)
    p.add_argument("--oxford-root", default=None)
    p.add_argument("--desc-dim", type=int, default=128)
    p.add_argument("--inlier-threshold", type=float, default=1.0)
    p.add_argument("--max-trials", type=int, default=10000)
    p.add_argument("--sweep-trials", default=None,
                   help="comma list of RANSAC budgets (automation_kitti.m sweep)")
    p.add_argument("--coord-fix", default="none",
                   choices=["none", "kitti", "oxford"],
                   help="convert exported camera-frame keypoints into the GT "
                        "frame (eval_rep.m:48,70-83)")
    p.add_argument("--calib-root", default=None,
                   help="kitti calib tree <root>/<seq:02d>/calib.txt")
    p.set_defaults(fn=cmd_eval_registration)

    p = sub.add_parser("eval-indoor")
    p.add_argument("--gt-root", required=True,
                   help="dir with <scene>-evaluation/gt.log+gt.info")
    p.add_argument("--scenes", default="livingroom1,livingroom2,office1,office2")
    p.add_argument("--pc-root", help="fragment npy tree <root>/<scene>/<i>.npy")
    p.add_argument("--result-root",
                   help="keypoint+descriptor bins <root>/<scene>/<i>.bin")
    p.add_argument("--out", default="indoor_logs",
                   help="where to write <scene>.log result logs")
    p.add_argument("--desc-dim", type=int, default=128)
    p.add_argument("--estimator", default="ransac", choices=["ransac", "fgr"],
                   help="pose estimator: RANSAC (register2Fragments.m) or "
                        "Fast Global Registration (register2FragmentsFGR.m)")
    p.add_argument("--max-trials", type=int, default=1000,
                   help="RANSAC cap (lite protocol, fullEvaluation.m:5)")
    p.add_argument("--overlapped-only", action="store_true",
                   help="register only gt-overlapped pairs (lite protocol)")
    p.add_argument("--logs-only", action="store_true",
                   help="skip registration; evaluate existing logs "
                        "(Redwood loop protocol)")
    p.add_argument("--log-dir", help="dir with <scene>.log for --logs-only")
    p.set_defaults(fn=cmd_eval_indoor)

    p = sub.add_parser("detect", help="keypoints (+descriptors) for arbitrary "
                       ".npy cloud files, no dataset layout needed")
    _add_common(p)
    p.add_argument("--input", required=True,
                   help="directory of .npy clouds, or a glob")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--descriptor-checkpoint", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--num-keypoints", type=int, default=128)
    p.add_argument("--nms-radius", type=float, default=0.0)
    p.add_argument("--render", action="store_true",
                   help="write a keypoint-scene PNG per cloud")
    p.add_argument("--html", action="store_true",
                   help="also build an index.html gallery of the renders")
    p.set_defaults(fn=cmd_detect)

    p = sub.add_parser("serve", help="resident keypoint service: JSON "
                       "requests on stdin, JSON replies on stdout")
    _add_common(p)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--descriptor-checkpoint", default=None)
    p.add_argument("--out", default=None,
                   help="default output dir when requests omit 'out'")
    p.add_argument("--num-keypoints", type=int, default=128)
    p.add_argument("--nms-radius", type=float, default=0.0)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("import-torch", help="convert a reference .pth "
                       "state_dict into a framework checkpoint")
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--role", default="detector",
                   choices=["detector", "descriptor"])
    _add_common(p)
    p.set_defaults(fn=cmd_import_torch)

    p = sub.add_parser("bench")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    if getattr(args, "platform", None):
        import jax
        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "coordinator_address", None) is not None \
            or getattr(args, "num_processes", None) is not None:
        # must run before any backend use (after the platform override above)
        from usip_tpu.parallel import initialize_distributed
        initialize_distributed(coordinator_address=args.coordinator_address,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    args.fn(args)


if __name__ == "__main__":
    main()
