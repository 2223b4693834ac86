"""Descriptor learning-signal regression test (VERDICT round-1 weak #3).

Round-1 found trained ~= untrained 1-NN matching accuracy; the causes were
(a) an identity-transform matching protocol that rotation-variant random ball
projections already solve, and (b) descriptor training on 32 shapes. Under the
reference's yaw regime (rot-horizontal CGF training, yaw-rotated partner at
test — the LiDAR setting, networks.py:372-374 rotation-variance by design) the
trained descriptor beats untrained 2.9x at full scale
(scripts/validate_descriptor.py --use-cgf --rot 2d --test-yaw) and ~1.6x at
this test's tiny scale.

Determinism note: SyntheticDataset previously seeded items with Python
``hash()``, which is salted per process (PYTHONHASHSEED) — the "fixed seeds"
varied across pytest runs and this gate flaked (observed ratios 1.28-1.64x
across processes). Items are now seeded via ``np.random.SeedSequence``;
run-to-run values are identical on the CPU backend.
"""

import os

import jax
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
from usip_tpu.train.steps import make_detector_infer


def _match_acc(kp_a, da, kp_p, dp, R, radius=0.3):
    d2 = (np.sum(da ** 2, 1)[:, None] + np.sum(dp ** 2, 1)[None]
          - 2 * da @ dp.T)
    nn = d2.argmin(1)
    err = np.linalg.norm(kp_p[nn] @ R - kp_a, axis=1)
    return float((err < radius).mean())


def test_cgf_descriptor_learns_yaw_matching(tmp_path):
    cfg = get_config("modelnet", **{
        "data.input_pc_num": 256, "data.node_num": 32,
        "detector.c1": 32, "detector.c2": 64, "detector.node_knn_k": 4,
        "descriptor.descriptor_len": 32, "descriptor.ball_nsamples": 16,
        "descriptor.ball_radius": 0.5, "descriptor.surface_normal_len": 3,
        "train.batch_size": 16, "train.log_every": 1000})
    # descriptor trains under the yaw (rot-horizontal) CGF regime; the
    # detector keeps the full modelnet augmentation
    cfg_desc = cfg.with_overrides(**{
        "loss.cgf_radius": 0.3, "augment.rot_3d": False,
        "augment.rot_horizontal": True,
        "augment.gt_scale_thre": 0.0, "augment.gt_shift_thre": 0.0})

    train_ds = SyntheticDataset(size=128, input_pc_num=256,
                                surface_normal_len=3, seed=0)
    train = BatchLoader(train_ds, 16, num_workers=2, seed=0)
    det = DetectorEngine(cfg, train, None, out_dir=str(tmp_path / "det"))
    for ep in range(8):
        det.train_epoch(ep)
    det_ckpt = os.path.join(tmp_path, "det.msgpack")
    save_checkpoint(det_ckpt, det.state)

    desc_ds = _SyntheticPairDataset(cfg_desc, size=128, seed=0)
    desc_loader = BatchLoader(desc_ds, 16, num_workers=2, seed=0)
    eng = DescriptorEngine(cfg_desc, det_ckpt, train_loader=desc_loader,
                           use_cgf=True, out_dir=str(tmp_path / "desc"))
    untrained = jax.tree_util.tree_map(np.asarray, eng.state.variables)
    for ep in range(30):
        eng.train_epoch(ep)

    infer = jax.jit(make_detector_infer(cfg, det.model))
    dm = eng.descriptor

    @jax.jit
    def describe(v, pc, sn, kp, key):
        d, _ = dm.apply(v, pc, sn, kp, key=key, train=False)
        return d

    test_ds = SyntheticDataset(size=16, input_pc_num=256,
                               surface_normal_len=3, seed=1)
    rng = np.random.default_rng(3)
    accs_t, accs_u = [], []
    for i in range(16):
        item = test_ds[i]
        pc, sn = item["src_pc"], item["src_sn"]
        ang = rng.uniform(0, 2 * np.pi)
        R = np.asarray(rotation_matrix(
            np.array([0.0, ang, 0.0], np.float32))).astype(np.float32)
        pc_r = item["dst_pc"] @ R.T
        sn_r = item["dst_sn"] @ R.T
        kp_a, _ = infer(det.state, jnp.asarray(pc[None]), jnp.asarray(sn[None]),
                        jax.random.PRNGKey(2 * i))
        kp_p, _ = infer(det.state, jnp.asarray(pc_r[None]),
                        jnp.asarray(sn_r[None]), jax.random.PRNGKey(2 * i + 1))
        ka, kp_np = np.asarray(kp_a[0]), np.asarray(kp_p[0])
        for vars_, accs in ((eng.state.variables, accs_t),
                            (untrained, accs_u)):
            da = np.asarray(describe(vars_, jnp.asarray(pc[None]),
                                     jnp.asarray(sn[None]), kp_a,
                                     jax.random.PRNGKey(100 + i))[0])
            dp = np.asarray(describe(vars_, jnp.asarray(pc_r[None]),
                                     jnp.asarray(sn_r[None]), kp_p,
                                     jax.random.PRNGKey(200 + i))[0])
            accs.append(_match_acc(ka, da, kp_np, dp, R))
    trained, untrained_acc = float(np.mean(accs_t)), float(np.mean(accs_u))
    print(f"\n[descriptor-gate] trained={trained:.4f} "
          f"untrained={untrained_acc:.4f} ratio={trained / untrained_acc:.2f}")
    assert trained >= 1.3 * untrained_acc, (trained, untrained_acc)
    assert trained > 0.10, (trained, untrained_acc)
