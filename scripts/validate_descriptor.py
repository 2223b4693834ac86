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

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from usip_tpu.config import get_config
from usip_tpu.data.augment import rotation_matrix
from usip_tpu.data.pipeline import BatchLoader
from usip_tpu.data.synthetic import SyntheticDataset
from usip_tpu.train.checkpoint import save_checkpoint
from usip_tpu.train.descriptor_loop import DescriptorEngine, init_descriptor_state
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
    args = ap.parse_args()

    cfg = get_config(
        "modelnet",
        **{"data.input_pc_num": args.pc, "data.node_num": args.nodes,
           "detector.c1": 64, "detector.c2": 128, "detector.node_knn_k": 8,
           "descriptor.descriptor_len": 64, "descriptor.ball_nsamples": 32,
           "descriptor.ball_radius": 0.4, "descriptor.surface_normal_len": 3,
           "train.batch_size": 16, "train.log_every": 1000})
    sn_len = cfg.detector.surface_normal_len
    train_ds = SyntheticDataset(size=256, input_pc_num=args.pc,
                                surface_normal_len=sn_len, seed=0)
    train = BatchLoader(train_ds, cfg.train.batch_size, num_workers=4, seed=0)

    det_engine = DetectorEngine(cfg, train, None, out_dir=args.out + "/det")
    for epoch in range(args.det_epochs):
        avg = det_engine.train_epoch(epoch)
    print(f"detector trained: loss {avg['loss']:.4f} "
          f"chamfer_pure {avg['chamfer_pure']:.4f}", flush=True)
    det_ckpt = args.out + "/det/final.msgpack"
    save_checkpoint(det_ckpt, det_engine.state, metadata={"epoch": args.det_epochs})

    desc_engine = DescriptorEngine(cfg, det_ckpt, synthetic=True,
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
    }))


if __name__ == "__main__":
    main()
