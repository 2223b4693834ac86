"""End-to-end quality validation on synthetic shapes (no datasets needed).

Trains the detector on procedurally generated clouds with the modelnet recipe,
then measures rotated-pair keypoint repeatability against a random-keypoint
baseline — the framework's self-contained stand-in for the reference's
ModelNet-rotated repeatability protocol (eval_rep.m). Prints one JSON line.

Usage: python scripts/validate_synthetic.py [--epochs 30] [--pc 1024] [--nodes 64]
"""

import argparse
import json
import sys

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from usip_tpu.config import get_config
from usip_tpu.data.augment import rotation_matrix
from usip_tpu.data.pipeline import BatchLoader
from usip_tpu.data.synthetic import SyntheticDataset
from usip_tpu.eval import pair_repeatability, select_keypoints
from usip_tpu.train.loop import DetectorEngine
from usip_tpu.train.steps import make_detector_infer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--pc", type=int, default=1024)
    ap.add_argument("--nodes", type=int, default=64)
    ap.add_argument("--keypoints", type=int, default=32)
    ap.add_argument("--radius", type=float, default=0.25)
    ap.add_argument("--out", default="/tmp/validate_synth")
    ap.add_argument("--fps-parallel", type=int, default=1,
                    help="bucketed-FPS factor for node sampling (A/B the "
                         "multi-point FPS lever, PERFORMANCE.md)")
    ap.add_argument("--override", action="append", default=[],
                    help="extra dotted config overrides (section.field=JSON), "
                         "e.g. detector.grouping='\"knn\"' for trunk A/Bs")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                    help="force a jax platform (cpu for TPU-less runs)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    overrides = {"data.input_pc_num": args.pc, "data.node_num": args.nodes,
                 "data.fps_parallel": args.fps_parallel,
                 "detector.c1": 64, "detector.c2": 128,
                 "detector.node_knn_k": 8,
                 "train.batch_size": 16, "train.log_every": 50}
    for ov in args.override:
        k, _, v = ov.partition("=")
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        overrides[k] = v
    cfg = get_config("modelnet", **overrides)
    sn_len = cfg.detector.surface_normal_len
    train_ds = SyntheticDataset(size=256, input_pc_num=args.pc,
                                surface_normal_len=sn_len, seed=0)
    test_ds = SyntheticDataset(size=32, input_pc_num=args.pc,
                               surface_normal_len=sn_len, seed=1)
    train = BatchLoader(train_ds, cfg.train.batch_size, num_workers=4, seed=0)
    test = BatchLoader(test_ds, cfg.train.batch_size, shuffle=False,
                       num_workers=4, seed=0)
    engine = DetectorEngine(cfg, train, test, out_dir=args.out)
    for epoch in range(args.epochs):
        avg = engine.train_epoch(epoch)
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            t = engine.test_epoch(epoch)
            print(f"epoch {epoch}: train {avg['loss']:.4f} "
                  f"test {t.get('loss', float('nan')):.4f} "
                  f"chamfer_pure {t.get('chamfer_pure', float('nan')):.4f}",
                  flush=True)

    infer = jax.jit(make_detector_infer(cfg, engine.model))
    rng = np.random.default_rng(7)
    reps_model, reps_random = [], []
    for i in range(24):
        item = test_ds[i % len(test_ds)]
        pc, sn = item["src_pc"], item["src_sn"]
        theta = rng.uniform(0, 2 * np.pi, size=3).astype(np.float32)
        R = np.asarray(rotation_matrix(jnp.asarray(theta)))
        pc_rot = (pc @ R.T).astype(np.float32)
        sn_rot = sn.copy()
        sn_rot[:, :3] = sn[:, :3] @ R.T

        kp_a, sig_a = infer(engine.state, jnp.asarray(pc[None]),
                            jnp.asarray(sn[None]), jax.random.PRNGKey(2 * i))
        kp_p, sig_p = infer(engine.state, jnp.asarray(pc_rot[None]),
                            jnp.asarray(sn_rot[None]),
                            jax.random.PRNGKey(2 * i + 1))
        sel_a = select_keypoints(np.asarray(kp_a[0]), np.asarray(sig_a[0]), pc,
                                 desired_num=args.keypoints, rng=rng)
        sel_p = select_keypoints(np.asarray(kp_p[0]), np.asarray(sig_p[0]),
                                 pc_rot, desired_num=args.keypoints, rng=rng)
        T = np.eye(4)
        T[:3, :3] = R.T
        reps_model.append(pair_repeatability(sel_a, sel_p, T, args.radius))
        rand_a = pc[rng.choice(len(pc), args.keypoints, replace=False)]
        rand_p = pc_rot[rng.choice(len(pc_rot), args.keypoints, replace=False)]
        reps_random.append(pair_repeatability(rand_a, rand_p, T, args.radius))

    print(json.dumps({
        "repeatability_model": float(np.mean(reps_model)),
        "repeatability_random": float(np.mean(reps_random)),
        "gain": float(np.mean(reps_model) / max(np.mean(reps_random), 1e-9)),
        "epochs": args.epochs,
        "inlier_radius": args.radius,
        "keypoints": args.keypoints,
        "fps_parallel": args.fps_parallel,
    }))


if __name__ == "__main__":
    main()
