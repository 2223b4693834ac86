"""Cross-implementation parity: run the ACTUAL reference source (CPU, via
pure-torch extension shims — train/reference_runtime.py) with this
framework's exported weights and compare outputs.

This closes the gap left by tests/test_torch_parity.py, which pins the
dataflow against an in-repo transcription (a transcription can carry a
common-mode error). Skipped when no reference checkout or torch is present.
"""

import os

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from usip_tpu.config import get_config  # noqa: E402
from usip_tpu.models import Descriptor, Detector  # noqa: E402
from usip_tpu.train import reference_runtime as rr  # noqa: E402

REFERENCE = os.environ.get("USIP_REFERENCE", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "models")),
    reason="no reference checkout")


def _cfg(**over):
    base = {
        "data.input_pc_num": 512, "data.node_num": 64,
        "detector.compute_dtype": "float32",
        "detector.surface_normal_len": 4,
        "descriptor.compute_dtype": "float32",
        "descriptor.surface_normal_len": 4,
        "descriptor.descriptor_len": 32,
        "descriptor.ball_radius": 0.7,
        "descriptor.ball_nsamples": 16,
    }
    base.update(over)
    return get_config("kitti", **base)


def test_shims_match_our_ops():
    """The torch shims reproduce our jax ops on identical inputs (both claim
    the CUDA kernels' contracts, so they must agree with each other)."""
    from usip_tpu import ops
    rng = np.random.default_rng(0)
    data = rng.normal(size=(2, 8, 64)).astype(np.float32)
    ids = rng.integers(0, 6, size=(2, 64)).astype(np.int32)
    # index_max first-argmax -> gathering yields the segment max
    first = rr.index_max_forward(torch.as_tensor(data),
                                 torch.as_tensor(ids), 6).long()
    gathered = torch.as_tensor(data).gather(2, first).numpy()  # (2, 8, 6)
    ours = np.asarray(ops.masked_scatter_max(
        np.transpose(data, (0, 2, 1)), ids, 6))  # (2, 6, 8)
    occupied = np.zeros((2, 6), bool)
    for b in range(2):
        occupied[b, ids[b]] = True
    got = np.transpose(gathered, (0, 2, 1))
    np.testing.assert_allclose(got[occupied], ours[occupied], rtol=0, atol=0)

    # ball query first-K scan-order contract vs our key=None path
    pts = rng.normal(size=(2, 128, 3)).astype(np.float32)
    centers = pts[:, :8]
    dist = np.linalg.norm(centers[:, :, None] - pts[:, None], axis=-1)
    shim = rr.ball_query_forward(torch.as_tensor(dist), 0.9, 8).numpy()
    ours_bq = np.asarray(ops.ball_query(pts, centers, 0.9, 8, key=None).idx)
    np.testing.assert_array_equal(shim, ours_bq)


def test_detector_parity_vs_reference_source():
    cfg = _cfg()
    rng = np.random.default_rng(1)
    b, n, m = 2, cfg.data.input_pc_num, cfg.data.node_num
    pc = rng.normal(size=(b, n, 3)).astype(np.float32)
    sn = rng.normal(size=(b, n, 4)).astype(np.float32)
    node = pc[:, :m].copy()

    model = Detector(cfg.detector)
    variables = model.init(jax.random.PRNGKey(0), pc, sn, node, train=False)
    anchors, kp, sg = model.apply(variables, pc, sn, node, train=False)

    net = rr.build_reference_detector(cfg, REFERENCE, variables)
    with torch.no_grad():
        r_anchor, r_kp, r_sg, _ = net(
            torch.as_tensor(pc.transpose(0, 2, 1)),
            torch.as_tensor(sn.transpose(0, 2, 1)),
            torch.as_tensor(node.transpose(0, 2, 1)),
            is_train=False, epoch=None)

    anchor_diff = np.abs(np.asarray(anchors)
                         - r_anchor.numpy().transpose(0, 2, 1))
    kp_diff = np.abs(np.asarray(kp) - r_kp.numpy().transpose(0, 2, 1))
    sg_diff = np.abs(np.asarray(sg) - r_sg.numpy())
    # identical assignment -> identical cluster means (pure means, fp32)
    assert anchor_diff.max() < 1e-4, anchor_diff.max()
    # full network: fp32 accumulation-order noise only
    assert np.median(kp_diff) < 1e-5
    assert kp_diff.max() < 1e-2, kp_diff.max()
    assert sg_diff.max() < 1e-3, sg_diff.max()


def test_descriptor_parity_vs_reference_source(monkeypatch):
    cfg = _cfg()
    rng = np.random.default_rng(2)
    b, n, m = 2, 512, 16
    pc = rng.normal(size=(b, n, 3)).astype(np.float32)
    sn = rng.normal(size=(b, n, 4)).astype(np.float32)
    kp = pc[:, :m].copy()

    model = Descriptor(cfg.descriptor)
    variables = model.init(jax.random.PRNGKey(0), pc, sn, kp, key=None,
                           train=False)
    desc, _ = model.apply(variables, pc, sn, kp, key=None, train=False)

    net = rr.build_reference_descriptor(cfg, REFERENCE, variables)
    # the reference permutes the cloud before its ball query
    # (networks.py:344-347); identity-permute so both sides see the same
    # scan order (ours: key=None natural order)
    networks = rr.load_reference_networks(REFERENCE)
    monkeypatch.setattr(networks.np.random, "permutation",
                        lambda k: np.arange(k))
    with torch.no_grad():
        r_desc, _ = net(torch.as_tensor(pc.transpose(0, 2, 1)),
                        torch.as_tensor(sn.transpose(0, 2, 1)),
                        torch.as_tensor(kp.transpose(0, 2, 1)),
                        is_train=False, epoch=None)

    diff = np.abs(np.asarray(desc) - r_desc.numpy().transpose(0, 2, 1))
    assert np.median(diff) < 1e-5
    assert diff.max() < 1e-3, diff.max()
