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


@pytest.mark.parametrize("grouping", ["ball", "knn"])
def test_group_detector_parity_vs_reference_source(grouping):
    """RPN_Detector_Ball (the released Oxford BALL-16384-512-r2k64-k16
    model's net, networks.py:611-738) and RPN_Detector_KNN (:482-608) vs our
    grouped trunk under exported weights. The reference hardcodes C1=128,
    C2=512, K=64, radius=2 (networks.py:563,691-692) so the test runs those
    widths at reduced N."""
    cfg = _cfg(**{"detector.grouping": grouping, "detector.c1": 128,
                  "detector.c2": 512, "detector.group_k": 64,
                  "detector.group_radius": 2.0, "detector.node_knn_k": 16})
    rng = np.random.default_rng(3)
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

    # grouped variants return the input nodes as anchors (networks.py:604,734)
    np.testing.assert_array_equal(np.asarray(anchors),
                                  r_anchor.numpy().transpose(0, 2, 1))
    kp_diff = np.abs(np.asarray(kp) - r_kp.numpy().transpose(0, 2, 1))
    sg_diff = np.abs(np.asarray(sg) - r_sg.numpy())
    assert np.median(kp_diff) < 1e-5
    assert kp_diff.max() < 1e-2, kp_diff.max()
    assert sg_diff.max() < 1e-3, sg_diff.max()


def test_export_protocol_interop_roundtrip(tmp_path):
    """Protocol-level interop of the eval tooling (round-2 VERDICT ask #3):
    drive the reference's OWN export post-processing (nms + sigma-ranking +
    count enforcement, save_keypoints.py:180-227,343-351, AST-extracted and
    executed verbatim) to write .bin trees; evaluate them with our
    repeatability runner; export the same detector outputs with our tool and
    cross-evaluate. The trees must be byte-identical and every direction must
    produce the same repeatability."""
    from usip_tpu.eval.eval_runner import run_repeatability
    from usip_tpu.eval.export import select_keypoints, write_keypoints_bin
    from usip_tpu.eval.repeatability import apply_transform

    ref_nms, ref_ensure = rr.load_reference_export_fns(REFERENCE)
    rng = np.random.default_rng(7)
    nms_radius, desired = 0.3, 32
    ours_root = tmp_path / "ours"
    ref_root = tmp_path / "ref"
    gt = []
    for i in range(3):
        # synthetic detector outputs: proposals + sigmas for an anc/pos pair
        # related by a known rigid transform (plenty of proposals so the
        # sigma-ranking trim path is exercised, not the random pad)
        pc_anc = rng.normal(size=(256, 3)).astype(np.float32) * 3
        kp_anc = pc_anc[rng.choice(256, 128, replace=False)]
        sig_anc = rng.uniform(0.05, 1.0, size=128).astype(np.float32)
        theta = rng.uniform(0, 2 * np.pi)
        T = np.eye(4)
        T[:3, :3] = np.array([[np.cos(theta), -np.sin(theta), 0],
                              [np.sin(theta), np.cos(theta), 0], [0, 0, 1]])
        T[:3, 3] = rng.normal(size=3)
        pc_pos = apply_transform(pc_anc, np.linalg.inv(T)).astype(np.float32)
        kp_pos = apply_transform(kp_anc, np.linalg.inv(T)).astype(np.float32)
        sig_pos = rng.uniform(0.05, 1.0, size=128).astype(np.float32)
        gt.append({"seq": 0, "anc_idx": 2 * i, "pos_idx": 2 * i + 1,
                   "T_gt": T})

        for idx, (kp, sig, pc) in (
                (2 * i, (kp_anc, sig_anc, pc_anc)),
                (2 * i + 1, (kp_pos, sig_pos, pc_pos))):
            # ours: the framework's export post-processing
            sel = select_keypoints(kp, sig, pc, nms_radius=nms_radius,
                                   desired_num=desired, rng=rng)
            write_keypoints_bin(str(ours_root / "00" / f"{idx}.bin"), sel)
            # reference: its own nms -> sigma argsort -> top-K -> ensure
            # (save_keypoints.py:343-351)
            r_kp, r_sig = ref_nms(kp.copy(), sig.copy(), nms_radius)
            order = np.argsort(r_sig)[:desired]
            r_kp = r_kp[order]
            r_kp = ref_ensure(r_kp, pc, desired)
            os.makedirs(str(ref_root / "00"), exist_ok=True)
            r_kp.astype(np.float32).tofile(str(ref_root / "00" / f"{idx}.bin"))

    # byte-identical exports
    for f in sorted(os.listdir(str(ours_root / "00"))):
        a = (ours_root / "00" / f).read_bytes()
        b = (ref_root / "00" / f).read_bytes()
        assert a == b, f"export mismatch at {f}"

    # cross-evaluation: every direction yields the same repeatability
    m_ours, _ = run_repeatability(str(ours_root), str(ours_root), gt,
                                  inlier_radius=0.5)
    m_ref, _ = run_repeatability(str(ref_root), str(ref_root), gt,
                                 inlier_radius=0.5)
    m_cross, _ = run_repeatability(str(ref_root), str(ours_root), gt,
                                   inlier_radius=0.5)
    assert abs(m_ours - m_ref) <= 1e-6
    assert abs(m_cross - m_ref) <= 1e-6
    assert 0.0 < m_ref <= 1.0


def test_reference_pad_path_protocol(tmp_path):
    """The pad-from-cloud branch (fewer survivors than desired): both
    implementations fill from cloud points — selection is random so bytes
    differ, but the protocol contract (count, survivor prefix, pad source)
    must match."""
    from usip_tpu.eval.export import select_keypoints

    ref_nms, ref_ensure = rr.load_reference_export_fns(REFERENCE)
    rng = np.random.default_rng(11)
    # two tight clusters -> aggressive NMS keeps exactly 2 survivors
    base = np.array([[0.0, 0, 0], [8.0, 0, 0]], np.float32)
    kp = np.concatenate([base + rng.normal(scale=0.01, size=(2, 3)).astype(np.float32)
                         for _ in range(6)])
    sig = np.arange(12).astype(np.float32)
    pc = rng.normal(size=(64, 3)).astype(np.float32) + 30.0
    desired = 8

    ours = select_keypoints(kp, sig, pc, nms_radius=2.0, desired_num=desired,
                            rng=rng)
    r_kp, r_sig = ref_nms(kp.copy(), sig.copy(), 2.0)
    r_kp = r_kp[np.argsort(r_sig)[:desired]]
    np.random.seed(0)
    ref = ref_ensure(r_kp, pc, desired)

    assert ours.shape == ref.shape == (desired, 3)
    np.testing.assert_allclose(ours[:2], ref[:2])  # same survivors, same order
    cloud_set = {tuple(p) for p in pc}
    for row in list(ours[2:]) + list(ref[2:]):
        assert tuple(row) in cloud_set  # pads come from the cloud


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
