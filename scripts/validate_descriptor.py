"""End-to-end descriptor validation on synthetic shapes.

Trains the detector briefly, freezes it, trains the descriptor on synthetic
anchor/positive pairs (scan triplet loss), then measures descriptor matching
accuracy: the fraction of keypoints whose descriptor 1-NN in the partner set is
the geometrically correct match (within a radius), vs untrained/random
descriptors. The partner is an independent resampling of the same shape
(optionally yaw-rotated) — the reference's descriptors are not rotation
invariant (ball features are decentered but not canonically oriented,
networks.py:372-374); its LiDAR datasets have mostly-yaw relative transforms and
invariance comes from augmentation, so full-3D-rotation matching is out of scope
by design. Prints one JSON line.
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
from usip_tpu.train.checkpoint import save_checkpoint
from usip_tpu.train.descriptor_loop import DescriptorEngine
from usip_tpu.train.loop import DetectorEngine
from usip_tpu.train.steps import make_detector_infer


def match_accuracy(kp_a, desc_a, kp_p, desc_p, R, radius):
    """Fraction of anc keypoints whose descriptor 1-NN in pos is geometrically
    correct: ||R^T @ kp_p[nn] - kp_a|| < radius."""
    d2 = (np.sum(desc_a ** 2, 1)[:, None] + np.sum(desc_p ** 2, 1)[None]
          - 2 * desc_a @ desc_p.T)
    nn = np.argmin(d2, axis=1)
    back = kp_p[nn] @ R  # R^T applied: kp_p @ (R^T)^T = kp_p @ R
    err = np.linalg.norm(back - kp_a, axis=1)
    return float((err < radius).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--det-epochs", type=int, default=20)
    ap.add_argument("--desc-epochs", type=int, default=20)
    ap.add_argument("--pc", type=int, default=1024)
    ap.add_argument("--nodes", type=int, default=64)
    ap.add_argument("--out", default="/tmp/validate_desc")
    ap.add_argument("--use-cgf", action="store_true",
                    help="keypoint-level CGF triplet instead of the scan triplet")
    ap.add_argument("--cgf-radius", type=float, default=0.2,
                    help="CGF positive-match radius (synthetic shapes are unit "
                         "scale; the kitti-scale default 0.075 starves matches)")
    ap.add_argument("--rot", default="none", choices=["none", "2d", "3d"],
                    help="rotation regime of the CGF GT transform; descriptors "
                         "are rotation-variant by design (networks.py:372-374), "
                         "so 3d training fights the architecture")
    ap.add_argument("--train-size", type=int, default=256)
    ap.add_argument("--min-ratio", type=float, default=None,
                    help="quality gate: exit 1 unless trained >= ratio x "
                         "untrained matching accuracy")
    ap.add_argument("--test-yaw", action="store_true",
                    help="rotate the partner scan by a random yaw at test time "
                         "(the reference's LiDAR matching regime; untrained "
                         "rotation-variant features degrade, trained rot-2d "
                         "features should not)")
    args = ap.parse_args()

    # detector trains under the full modelnet augmentation regime; the
    # descriptor's CGF GT transform is controlled separately (--rot): the
    # descriptor is rotation-variant by design, so its training rotation
    # regime must match the matching regime being validated
    cfg = get_config(
        "modelnet",
        **{"data.input_pc_num": args.pc, "data.node_num": args.nodes,
           "detector.c1": 64, "detector.c2": 128, "detector.node_knn_k": 8,
           "descriptor.descriptor_len": 64, "descriptor.ball_nsamples": 32,
           "descriptor.ball_radius": 0.4, "descriptor.surface_normal_len": 3,
           "train.batch_size": 16, "train.log_every": 1000})
    cfg_desc = cfg.with_overrides(
        **{"loss.cgf_radius": args.cgf_radius,
           "augment.rot_3d": args.rot == "3d",
           "augment.rot_horizontal": args.rot == "2d",
           "augment.gt_scale_thre": 0.0, "augment.gt_shift_thre": 0.0})
    sn_len = cfg.detector.surface_normal_len
    train_ds = SyntheticDataset(size=args.train_size, input_pc_num=args.pc,
                                surface_normal_len=sn_len, seed=0)
    train = BatchLoader(train_ds, cfg.train.batch_size, num_workers=4, seed=0)

    det_engine = DetectorEngine(cfg, train, None, out_dir=args.out + "/det")
    for epoch in range(args.det_epochs):
        avg = det_engine.train_epoch(epoch)
    print(f"detector trained: loss {avg['loss']:.4f} "
          f"chamfer_pure {avg['chamfer_pure']:.4f}", flush=True)
    det_ckpt = args.out + "/det/final.msgpack"
    save_checkpoint(det_ckpt, det_engine.state, metadata={"epoch": args.det_epochs})

    from usip_tpu.train.descriptor_loop import _SyntheticPairDataset
    desc_ds = _SyntheticPairDataset(cfg_desc, size=args.train_size, seed=0)
    desc_loader = BatchLoader(desc_ds, cfg.train.batch_size, num_workers=4,
                              seed=0)
    desc_engine = DescriptorEngine(cfg_desc, det_ckpt,
                                   train_loader=desc_loader,
                                   use_cgf=args.use_cgf,
                                   out_dir=args.out + "/desc")
    # host snapshot: the train step donates state buffers, so keep a copy
    untrained_vars = jax.tree_util.tree_map(
        np.asarray, desc_engine.state.variables)
    for epoch in range(args.desc_epochs):
        avg = desc_engine.train_epoch(epoch)
    print(f"descriptor trained: loss {avg['loss']:.4f} "
          f"active {avg['active_percentage']:.3f}", flush=True)

    # --- matching accuracy on rotated pairs -------------------------------
    infer = jax.jit(make_detector_infer(cfg, det_engine.model))
    desc_model = desc_engine.descriptor

    @jax.jit
    def describe(variables, pc, sn, kp, key):
        d, _ = desc_model.apply(variables, pc, sn, kp, key=key, train=False)
        return d

    test_ds = SyntheticDataset(size=16, input_pc_num=args.pc,
                               surface_normal_len=sn_len, seed=1)
    rng = np.random.default_rng(3)
    acc_trained, acc_untrained, acc_random = [], [], []
    for i in range(12):
        item = test_ds[i % len(test_ds)]
        # partner = independent resampling of the same shape (the descriptor
        # training distribution), identity transform
        pc, sn = item["src_pc"], item["src_sn"]
        pc2, sn2 = item["dst_pc"], item["dst_sn"]
        if args.test_yaw:
            ang = rng.uniform(0, 2 * np.pi)
            R = np.asarray(rotation_matrix(
                np.array([0.0, ang, 0.0], np.float32))).astype(np.float32)
            pc_r = pc2 @ R.T
            sn_r = np.concatenate([sn2[:, :3] @ R.T, sn2[:, 3:]], axis=1)
        else:
            R = np.eye(3, dtype=np.float32)
            pc_r = pc2
            sn_r = sn2

        kp_a, _ = infer(det_engine.state, jnp.asarray(pc[None]),
                        jnp.asarray(sn[None]), jax.random.PRNGKey(2 * i))
        kp_p, _ = infer(det_engine.state, jnp.asarray(pc_r[None]),
                        jnp.asarray(sn_r[None]), jax.random.PRNGKey(2 * i + 1))
        args_a = (jnp.asarray(pc[None]), jnp.asarray(sn[None]), kp_a)
        args_p = (jnp.asarray(pc_r[None]), jnp.asarray(sn_r[None]), kp_p)
        key_a, key_p = jax.random.PRNGKey(100 + i), jax.random.PRNGKey(200 + i)

        d_a = np.asarray(describe(desc_engine.state.variables, *args_a, key_a)[0])
        d_p = np.asarray(describe(desc_engine.state.variables, *args_p, key_p)[0])
        d_a0 = np.asarray(describe(untrained_vars, *args_a, key_a)[0])
        d_p0 = np.asarray(describe(untrained_vars, *args_p, key_p)[0])
        kp_a_np, kp_p_np = np.asarray(kp_a[0]), np.asarray(kp_p[0])
        radius = 0.2
        acc_trained.append(match_accuracy(kp_a_np, d_a, kp_p_np, d_p, R, radius))
        acc_untrained.append(match_accuracy(kp_a_np, d_a0, kp_p_np, d_p0, R,
                                            radius))
        rnd_a = rng.normal(size=d_a.shape).astype(np.float32)
        rnd_p = rng.normal(size=d_p.shape).astype(np.float32)
        acc_random.append(match_accuracy(kp_a_np, rnd_a, kp_p_np, rnd_p, R,
                                         radius))

    print(json.dumps({
        "match_acc_trained": float(np.mean(acc_trained)),
        "match_acc_untrained": float(np.mean(acc_untrained)),
        "match_acc_random": float(np.mean(acc_random)),
        "det_epochs": args.det_epochs,
        "desc_epochs": args.desc_epochs,
        "use_cgf": args.use_cgf,
        "rot": args.rot,
    }))
    if args.min_ratio is not None:
        t, u = float(np.mean(acc_trained)), float(np.mean(acc_untrained))
        if t < args.min_ratio * u:
            print(f"QUALITY GATE FAILED: trained {t:.4f} < "
                  f"{args.min_ratio} x untrained {u:.4f}")
            sys.exit(1)


if __name__ == "__main__":
    main()
