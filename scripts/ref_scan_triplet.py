"""Controlled experiment: does the REFERENCE's own scan-triplet descriptor
also fail to beat its untrained init under yaw-rotated matching?

Round-4 finding (PERFORMANCE.md "Full-scale registration"): our
scan-triplet-trained descriptor scores BELOW untrained under mutual yaw
(0.655 vs 0.810 registration success). Two hypotheses: (a) the scan-level
triplet (models/losses.py:190-237) optimizes scan retrieval, not
per-keypoint matching, so the inversion is inherent to the objective; (b) a
defect in OUR pipeline (negative mining, augmentation mismatch,
sigma-weighting interaction) produces the same symptom.

This script discriminates: train the reference's own ``DescriptorLiteOld``
+ ``DescPairScanLoss`` (the ACTUAL reference source, executed on CPU via
train/reference_runtime.py shims) and OUR descriptor engine side by side at
matched toy scale — same frozen detector checkpoint, same synthetic
anchor/positive stream, same lr/batch/epochs/negative rule, same
yaw-matching protocol as ``validate_descriptor.py --test-yaw``. If the
reference's trained arm shows the same trained<=untrained ordering, the
anomaly is the objective, not our code.

Protocol references: reference training loop kitti/train_descriptor.py:94-132
(frozen detector -> keypoints -> in-batch negatives -> DescPairScanLoss),
loss models/losses.py:190-237, descriptor forward models/networks.py:310-385.

CPU-only (the reference shims are pure torch). Prints one JSON line.
"""

import argparse
import copy
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon; undo

import jax.numpy as jnp
import numpy as np

from usip_tpu.config import get_config
from usip_tpu.data.augment import rotation_matrix
from usip_tpu.data.pipeline import BatchLoader
from usip_tpu.data.synthetic import SyntheticDataset
from usip_tpu.train.checkpoint import save_checkpoint
from usip_tpu.train.descriptor_loop import (DescriptorEngine,
                                            _SyntheticPairDataset)
from usip_tpu.train.loop import DetectorEngine
from usip_tpu.train.reference_runtime import (build_reference_descriptor,
                                              load_reference_networks,
                                              make_reference_opt)
from usip_tpu.train.steps import make_detector_infer

REF_ROOT = os.environ.get("USIP_REFERENCE_ROOT", "/root/reference")


def match_accuracy(kp_a, desc_a, kp_p, desc_p, R, radius=0.2):
    """validate_descriptor.match_accuracy: fraction of anc keypoints whose
    descriptor 1-NN in pos is geometrically correct under R."""
    d2 = (np.sum(desc_a ** 2, 1)[:, None] + np.sum(desc_p ** 2, 1)[None]
          - 2 * desc_a @ desc_p.T)
    nn = np.argmin(d2, axis=1)
    back = kp_p[nn] @ R
    err = np.linalg.norm(back - kp_a, axis=1)
    return float((err < radius).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--det-epochs", type=int, default=20)
    ap.add_argument("--desc-epochs", type=int, default=20)
    ap.add_argument("--pc", type=int, default=1024)
    ap.add_argument("--nodes", type=int, default=64)
    ap.add_argument("--train-size", type=int, default=256)
    ap.add_argument("--out", default="/tmp/ref_scan_triplet")
    args = ap.parse_args()

    import torch
    torch.manual_seed(0)
    np.random.seed(0)  # DescriptorLiteOld permutes points via np.random

    # validate_descriptor.py's toy config, bit for bit
    cfg = get_config(
        "modelnet",
        **{"data.input_pc_num": args.pc, "data.node_num": args.nodes,
           "detector.c1": 64, "detector.c2": 128, "detector.node_knn_k": 8,
           "descriptor.descriptor_len": 64, "descriptor.ball_nsamples": 32,
           "descriptor.ball_radius": 0.4, "descriptor.surface_normal_len": 3,
           "train.batch_size": 16, "train.log_every": 1000})
    sn_len = cfg.detector.surface_normal_len

    # ---- shared frozen detector --------------------------------------------
    train_ds = SyntheticDataset(size=args.train_size, input_pc_num=args.pc,
                                surface_normal_len=sn_len, seed=0)
    train = BatchLoader(train_ds, cfg.train.batch_size, num_workers=4, seed=0)
    det_engine = DetectorEngine(cfg, train, None, out_dir=args.out + "/det")
    for epoch in range(args.det_epochs):
        avg = det_engine.train_epoch(epoch)
    print(f"detector trained: loss {avg['loss']:.4f} "
          f"chamfer_pure {avg['chamfer_pure']:.4f}", flush=True)
    det_ckpt = args.out + "/det/final.msgpack"
    save_checkpoint(det_ckpt, det_engine.state,
                    metadata={"epoch": args.det_epochs})
    infer = jax.jit(make_detector_infer(cfg, det_engine.model))

    # ---- arm 1: OUR descriptor engine, scan triplet ------------------------
    desc_ds = _SyntheticPairDataset(cfg, size=args.train_size, seed=0)
    desc_loader = BatchLoader(desc_ds, cfg.train.batch_size, num_workers=4,
                              seed=0)
    ours = DescriptorEngine(cfg, det_ckpt, train_loader=desc_loader,
                            use_cgf=False, out_dir=args.out + "/desc")
    ours_untrained = jax.tree_util.tree_map(np.asarray, ours.state.variables)
    for epoch in range(args.desc_epochs):
        avg = ours.train_epoch(epoch)
    print(f"ours trained: loss {avg['loss']:.4f} "
          f"active {avg['active_percentage']:.3f}", flush=True)

    # ---- arm 2: the REFERENCE's DescriptorLiteOld + DescPairScanLoss -------
    # reference-native init (He/BN defaults of MyConv2d), reference loss,
    # reference Adam recipe (keypoint_descriptor.py:33-36: lr, betas
    # (0.9, 0.999), wd 0); lr matches our engine (both default 1e-3, the
    # reference's kitti/options_descriptor.py:33 default).
    ref_losses = __import__("importlib").import_module("models.losses") \
        if load_reference_networks(REF_ROOT) else None
    opt_ns = make_reference_opt(cfg, triple_loss_gamma=0.5, sigma_max=3.0)
    ref_net = build_reference_descriptor(cfg, REF_ROOT)
    untrained_sd = copy.deepcopy(ref_net.state_dict())
    ref_loss = ref_losses.DescPairScanLoss(opt_ns)
    optim = torch.optim.Adam(ref_net.parameters(), lr=cfg.train.lr,
                             betas=(0.9, 0.999), weight_decay=0)
    neg_rng = np.random.default_rng(cfg.train.seed + 21)  # engine's rule
    key = jax.random.PRNGKey(cfg.train.seed + 13)
    t0 = time.time()
    for epoch in range(args.desc_epochs):
        ref_net.train()
        ep_loss, ep_active, steps = 0.0, 0.0, 0
        for i, raw in enumerate(desc_loader):
            b = raw["anc_pc"].shape[0]
            # frozen detector keypoints for both scans (our jitted infer —
            # the shared-detector control; kitti/train_descriptor.py:94-132)
            k = jax.random.fold_in(key, 2_000_000 * epoch + i)
            ka, kp_ = jax.random.split(k)
            kp_a, sig_a = infer(det_engine.state, jnp.asarray(raw["anc_pc"]),
                                jnp.asarray(raw["anc_sn"]), ka)
            kp_p, _ = infer(det_engine.state, jnp.asarray(raw["pos_pc"]),
                            jnp.asarray(raw["pos_sn"]), kp_)
            # in-batch negatives: the engine's seeded shifted permutation
            neg_idx = (np.arange(b) + 1 + neg_rng.integers(0, b - 1)) % b \
                if b > 1 else np.zeros(b, np.int64)

            def t(x):  # (B, N, C) numpy -> (B, C, N) torch
                return torch.as_tensor(np.ascontiguousarray(
                    np.swapaxes(np.asarray(x), 1, 2)), dtype=torch.float32)

            # siamese: one batched forward over cat(anc, pos) so BN sees both
            # scans, as the reference's forward_siamese does
            # (keypoint_descriptor.py:96-124)
            pc2 = torch.cat([t(raw["anc_pc"]), t(raw["pos_pc"])], dim=0)
            sn2 = torch.cat([t(raw["anc_sn"]), t(raw["pos_sn"])], dim=0)
            kp2 = torch.cat([t(kp_a), t(kp_p)], dim=0)
            desc2, _ = ref_net(pc2, sn2, kp2, is_train=True, epoch=epoch)
            anc_d, pos_d = desc2[:b], desc2[b:]
            sig_t = torch.as_tensor(np.asarray(sig_a), dtype=torch.float32)
            loss_bm, active = ref_loss(anc_d, pos_d,
                                       anc_d[torch.as_tensor(neg_idx)], sig_t)
            loss = loss_bm.mean()
            optim.zero_grad()
            loss.backward()
            optim.step()
            ep_loss += float(loss)
            ep_active += float(active.mean())
            steps += 1
        if epoch % 5 == 0 or epoch == args.desc_epochs - 1:
            print(f"ref epoch {epoch}: loss {ep_loss / steps:.4f} "
                  f"active {ep_active / steps:.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # ---- identical yaw-matching eval for all four arms ---------------------
    desc_model = ours.descriptor

    @jax.jit
    def describe(variables, pc, sn, kp, key):
        d, _ = desc_model.apply(variables, pc, sn, kp, key=key, train=False)
        return d

    def ref_describe(net, pc, sn, kp):
        net.eval()
        with torch.no_grad():
            d, _ = net(torch.as_tensor(np.swapaxes(pc, 1, 2)),
                       torch.as_tensor(np.swapaxes(sn, 1, 2)),
                       torch.as_tensor(np.swapaxes(kp, 1, 2)),
                       is_train=False)
        return np.swapaxes(d.numpy(), 1, 2)  # (B, M, C)

    ref_untrained = build_reference_descriptor(cfg, REF_ROOT)
    ref_untrained.load_state_dict(untrained_sd)

    test_ds = SyntheticDataset(size=16, input_pc_num=args.pc,
                               surface_normal_len=sn_len, seed=1)
    rng = np.random.default_rng(3)
    accs = {k: [] for k in ("ours_trained", "ours_untrained", "ref_trained",
                            "ref_untrained", "random")}
    for i in range(12):
        item = test_ds[i % len(test_ds)]
        pc, sn = item["src_pc"], item["src_sn"]
        pc2, sn2 = item["dst_pc"], item["dst_sn"]
        ang = rng.uniform(0, 2 * np.pi)  # --test-yaw always on
        R = np.asarray(rotation_matrix(
            np.array([0.0, ang, 0.0], np.float32))).astype(np.float32)
        pc_r = (pc2 @ R.T).astype(np.float32)
        sn_r = np.concatenate([sn2[:, :3] @ R.T, sn2[:, 3:]],
                              axis=1).astype(np.float32)

        kp_a, _ = infer(det_engine.state, jnp.asarray(pc[None]),
                        jnp.asarray(sn[None]), jax.random.PRNGKey(2 * i))
        kp_p, _ = infer(det_engine.state, jnp.asarray(pc_r[None]),
                        jnp.asarray(sn_r[None]), jax.random.PRNGKey(2 * i + 1))
        args_a = (jnp.asarray(pc[None]), jnp.asarray(sn[None]), kp_a)
        args_p = (jnp.asarray(pc_r[None]), jnp.asarray(sn_r[None]), kp_p)
        key_a, key_p = jax.random.PRNGKey(100 + i), jax.random.PRNGKey(200 + i)
        kp_a_np, kp_p_np = np.asarray(kp_a[0]), np.asarray(kp_p[0])
        pc_a_np, sn_a_np = pc[None], sn[None]
        pc_p_np, sn_p_np = pc_r[None], sn_r[None]

        d = {}
        d["ours_trained"] = (
            np.asarray(describe(ours.state.variables, *args_a, key_a)[0]),
            np.asarray(describe(ours.state.variables, *args_p, key_p)[0]))
        d["ours_untrained"] = (
            np.asarray(describe(ours_untrained, *args_a, key_a)[0]),
            np.asarray(describe(ours_untrained, *args_p, key_p)[0]))
        d["ref_trained"] = (
            ref_describe(ref_net, pc_a_np, sn_a_np, kp_a_np[None])[0],
            ref_describe(ref_net, pc_p_np, sn_p_np, kp_p_np[None])[0])
        d["ref_untrained"] = (
            ref_describe(ref_untrained, pc_a_np, sn_a_np, kp_a_np[None])[0],
            ref_describe(ref_untrained, pc_p_np, sn_p_np, kp_p_np[None])[0])
        d["random"] = (
            rng.normal(size=d["ours_trained"][0].shape).astype(np.float32),
            rng.normal(size=d["ours_trained"][1].shape).astype(np.float32))
        for name, (da, dp) in d.items():
            accs[name].append(match_accuracy(kp_a_np, da, kp_p_np, dp, R))

    out = {f"match_acc_{k}": float(np.mean(v)) for k, v in accs.items()}
    out.update({"det_epochs": args.det_epochs, "desc_epochs": args.desc_epochs,
                "train_size": args.train_size, "pc": args.pc,
                "nodes": args.nodes})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
