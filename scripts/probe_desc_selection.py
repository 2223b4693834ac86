"""Checkpoint-selection probe: does the CGF test LOSS diverge from matching
quality at long training, and does ``train.select_best_by='match_acc'`` pick
a better checkpoint?

Toy-scale CPU replica of the full-scale indoor divergence (PERFORMANCE.md
indoor 2x2: arm D's best-by-test-loss epoch 72 scored recall 0.268 vs the
30-epoch 0.289): train a tiny detector, then a CGF descriptor for --epochs
epochs with per-epoch checkpoints, record the held-out test (loss, match_acc)
curve, and score the by-loss vs by-match-acc selected checkpoints under the
EXTERNAL yaw-matching protocol (independent detector inference + random-yaw
partner + 1-NN matching, the validate_descriptor.py --test-yaw recipe). One
JSON line.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from usip_tpu.config import get_config  # noqa: E402
from usip_tpu.data.augment import rotation_matrix  # noqa: E402
from usip_tpu.data.pipeline import BatchLoader  # noqa: E402
from usip_tpu.data.synthetic import SyntheticDataset  # noqa: E402
from usip_tpu.train.checkpoint import (restore_checkpoint,  # noqa: E402
                                       save_checkpoint)
from usip_tpu.train.descriptor_loop import (DescriptorEngine,  # noqa: E402
                                            _SyntheticPairDataset)
from usip_tpu.train.loop import DetectorEngine  # noqa: E402
from usip_tpu.train.steps import make_detector_infer  # noqa: E402


def external_yaw_accuracy(cfg, det_engine, descriptor, desc_vars, n_shapes,
                          seed, radius=0.3):
    """validate_descriptor --test-yaw protocol: per-keypoint 1-NN matching
    accuracy between a shape and its yaw-rotated second sampling."""
    infer = jax.jit(make_detector_infer(cfg, det_engine.model))

    @jax.jit
    def describe(v, pc, sn, kp, key):
        d, _ = descriptor.apply(v, pc, sn, kp, key=key, train=False)
        return d

    ds = SyntheticDataset(size=n_shapes, input_pc_num=cfg.data.input_pc_num,
                          surface_normal_len=3, seed=seed)
    rng = np.random.default_rng(seed + 1)
    accs = []
    for i in range(n_shapes):
        item = ds[i]
        pc, sn = item["src_pc"], item["src_sn"]
        ang = rng.uniform(0, 2 * np.pi)
        R = np.asarray(rotation_matrix(
            np.array([0.0, ang, 0.0], np.float32))).astype(np.float32)
        pc_r, sn_r = item["dst_pc"] @ R.T, item["dst_sn"] @ R.T
        kp_a, _ = infer(det_engine.state, jnp.asarray(pc[None]),
                        jnp.asarray(sn[None]), jax.random.PRNGKey(2 * i))
        kp_p, _ = infer(det_engine.state, jnp.asarray(pc_r[None]),
                        jnp.asarray(sn_r[None]), jax.random.PRNGKey(2 * i + 1))
        da = np.asarray(describe(desc_vars, jnp.asarray(pc[None]),
                                 jnp.asarray(sn[None]), kp_a,
                                 jax.random.PRNGKey(100 + i))[0])
        dp = np.asarray(describe(desc_vars, jnp.asarray(pc_r[None]),
                                 jnp.asarray(sn_r[None]), kp_p,
                                 jax.random.PRNGKey(200 + i))[0])
        ka, kpn = np.asarray(kp_a[0]), np.asarray(kp_p[0])
        d2 = (np.sum(da ** 2, 1)[:, None] + np.sum(dp ** 2, 1)[None]
              - 2 * da @ dp.T)
        nn = d2.argmin(1)
        err = np.linalg.norm(kpn[nn] @ R - ka, axis=1)
        accs.append(float((err < radius).mean()))
    return float(np.mean(accs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--det-epochs", type=int, default=8)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--out", default="/tmp/desc_selection_probe")
    args = ap.parse_args()

    cfg = get_config("modelnet", **{
        "data.input_pc_num": 256, "data.node_num": 32,
        "detector.c1": 32, "detector.c2": 64, "detector.node_knn_k": 4,
        "descriptor.descriptor_len": 32, "descriptor.ball_nsamples": 16,
        "descriptor.ball_radius": 0.5, "descriptor.surface_normal_len": 3,
        "train.batch_size": 16, "train.log_every": 1000})
    cfg_desc = cfg.with_overrides(**{
        "loss.cgf_radius": 0.3, "augment.rot_3d": False,
        "augment.rot_horizontal": True,
        "augment.gt_scale_thre": 0.0, "augment.gt_shift_thre": 0.0,
        "train.keep_epoch_checkpoints": True})

    train_ds = SyntheticDataset(size=args.size, input_pc_num=256,
                                surface_normal_len=3, seed=0)
    train = BatchLoader(train_ds, 16, num_workers=2, seed=0)
    det = DetectorEngine(cfg, train, None,
                         out_dir=os.path.join(args.out, "det"))
    for ep in range(args.det_epochs):
        det.train_epoch(ep)
    det_ckpt = os.path.join(args.out, "det.msgpack")
    save_checkpoint(det_ckpt, det.state)

    desc_train = BatchLoader(_SyntheticPairDataset(cfg_desc, size=args.size,
                                                   seed=0),
                             16, num_workers=2, seed=0)
    # held-out shapes; the eval step applies its own device-side SE3 per the
    # CGF protocol, so this is a fresh-data test split
    desc_test = BatchLoader(_SyntheticPairDataset(cfg_desc, size=32, seed=9),
                            16, shuffle=False, num_workers=2, seed=1)
    eng = DescriptorEngine(cfg_desc, det_ckpt, train_loader=desc_train,
                           test_loader=desc_test, use_cgf=True,
                           out_dir=os.path.join(args.out, "desc"))
    curve = []
    for ep in range(args.epochs):
        eng.train_epoch(ep)
        t = eng.test_epoch(ep)
        curve.append({"epoch": ep, "loss": t["loss"],
                      "match_acc": t["match_acc"]})
        save_checkpoint(os.path.join(eng.out_dir, f"epoch_{ep}.msgpack"),
                        eng.state, metadata={"epoch": ep, **t})

    by_loss = min(curve, key=lambda c: c["loss"])
    by_acc = max(curve, key=lambda c: c["match_acc"])

    def load_vars(ep):
        st, _ = restore_checkpoint(
            os.path.join(eng.out_dir, f"epoch_{ep}.msgpack"), eng.state)
        return st.variables

    ext = {}
    for tag, sel in (("by_loss", by_loss), ("by_match_acc", by_acc)):
        ext[tag] = {"epoch": sel["epoch"], "test_loss": sel["loss"],
                    "test_match_acc": sel["match_acc"],
                    "external_yaw_acc": external_yaw_accuracy(
                        cfg, det, eng.descriptor, load_vars(sel["epoch"]),
                        n_shapes=16, seed=77)}
    print(json.dumps({"probe": "desc_selection", "epochs": args.epochs,
                      "curve": curve, "selected": ext}))


if __name__ == "__main__":
    main()
