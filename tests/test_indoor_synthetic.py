"""Synthetic indoor trees (SceneNN-style frames + 3DMatch-style fragments)
and the fragment feature export: the directory/geometry contracts the indoor
end-to-end protocol (scripts/fullscale_indoor.py) relies on."""

import os

import numpy as np
import pytest
from scipy.spatial import cKDTree

from usip_tpu.config import get_config
from usip_tpu.data.synthetic import (build_synthetic_match3d_fragments,
                                     build_synthetic_scenenn_tree)


@pytest.fixture(scope="module")
def scenenn_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scenenn"))
    counts = build_synthetic_scenenn_tree(root, train_frames=18,
                                          test_frames=9,
                                          target_points=3000, seed=3)
    return root, counts


@pytest.fixture(scope="module")
def match3d_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("m3d"))
    out = build_synthetic_match3d_fragments(root, scenes=1,
                                            fragments_per_scene=5,
                                            target_points=1500, seed=4)
    return root, out


def test_scenenn_detector_loader_contract(scenenn_tree):
    """frames_<mode>/<i>.npy + info_<mode>.pkl load through the real
    SceneNNDataset (scenenn_detector_loader.py contract)."""
    root, counts = scenenn_tree
    from usip_tpu.data.loaders import SceneNNDataset
    cfg = get_config("scenenn", **{"data.dataroot": root,
                                   "data.input_pc_num": 256})
    ds = SceneNNDataset(cfg.data, "train", sn_len=4)
    assert len(ds) == counts["train"] == 18
    item = ds[0]
    assert item["src_pc"].shape == (256, 3)
    assert item["src_sn"].shape == (256, 4)
    # normals are unit-ish (analytic normals rotated into the camera frame)
    nrm = np.linalg.norm(item["src_sn"][:, :3], axis=1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-4)


def test_scenenn_descriptor_icp_alignment(scenenn_tree):
    """icp_np must actually align anchor frames onto positives: after
    cart_to_hom_apply, anchor points lie on the positive frame's surface
    (both are views of the same room)."""
    root, _ = scenenn_tree
    from usip_tpu.data.descriptor_loaders import SceneNNDescriptorDataset
    cfg = get_config("scenenn", role="descriptor",
                     **{"data.dataroot": root, "data.input_pc_num": 400})
    ds = SceneNNDescriptorDataset(cfg.data, "train", sn_len=4)
    assert len(ds) > 0
    item = ds[0]
    d, _ = cKDTree(item["pos_pc"]).query(item["anc_pc"], k=1)
    # pairs are gated at >=45% measured view overlap, so at least the
    # overlapping 40% of aligned anchor points must land on the positive
    # frame's surface up to sampling density
    spacing = np.median(cKDTree(item["pos_pc"]).query(item["pos_pc"],
                                                      k=2)[0][:, 1])
    q40 = float(np.quantile(d, 0.4))
    assert q40 < 4 * spacing, \
        f"icp alignment broken: q40 NN {q40} vs spacing {spacing}"
    # sanity: the alignment does nontrivial work — camera frames differ by a
    # real rotation+translation, not an identity
    icp = ds.icp_np[0]
    angle = np.degrees(np.arccos(np.clip(
        (np.trace(icp[:3, :3]) - 1) / 2, -1, 1)))
    assert angle > 5.0 or np.linalg.norm(icp[:3, 3]) > 0.2, \
        f"icp_np[0] is near-identity: angle {angle}, t {icp[:3, 3]}"


def test_match3d_fragment_gt_geometry(match3d_tree):
    """gt.log transforms must align fragment j onto fragment i, and gt.info
    must be symmetric positive-semidefinite information matrices
    (mrLoadLog/mrLoadInfo contract)."""
    root, out = match3d_tree
    from usip_tpu.eval import indoor
    scene = next(iter(out))
    assert out[scene]["gt_pairs"] > 0
    gt_dir = os.path.join(root, "gt", f"{scene}-evaluation")
    gt = indoor.load_log(os.path.join(gt_dir, "gt.log"))
    info = indoor.load_info(os.path.join(gt_dir, "gt.info"))
    assert len(gt) == len(info) == out[scene]["gt_pairs"]
    frag_dir = os.path.join(root, "fragments", scene)
    clouds = [np.load(os.path.join(frag_dir, f"{i}.npy"))[:, :3]
              for i in range(out[scene]["fragments"])]
    spacing = np.median(cKDTree(clouds[0]).query(clouds[0], k=2)[0][:, 1])
    for e, ie in zip(gt, info):
        p_j = clouds[e.j] @ e.trans[:3, :3].T + e.trans[:3, 3]
        d, _ = cKDTree(clouds[e.i]).query(p_j, k=1)
        # >= the generator's overlap gate of j's points must land on i
        frac = np.mean(d < 3 * spacing)
        assert frac > 0.25, f"pair ({e.i},{e.j}): aligned overlap {frac}"
        m = ie.information
        np.testing.assert_allclose(m, m.T, atol=1e-6)
        eig = np.linalg.eigvalsh(m)
        assert eig.min() >= -1e-6 and m[0, 0] > 0


def test_fragment_feature_export_roundtrip(match3d_tree, tmp_path):
    """run_export_fragments writes the [xyz, desc] rows eval-indoor consumes
    (register2Fragments.m:23-30 layout), keypoints drawn from the cloud."""
    root, out = match3d_tree
    from usip_tpu.eval import indoor
    from usip_tpu.eval.export_runner import run_export_fragments
    from usip_tpu.train.checkpoint import save_checkpoint
    from usip_tpu.train.descriptor_loop import init_descriptor_state
    from usip_tpu.train.loop import init_detector_state

    cfg = get_config(
        "scenenn", role="descriptor",
        **{"data.dataroot": root, "data.input_pc_num": 384,
           "data.node_num": 16, "data.device_sampling": False,
           "detector.c1": 16, "detector.c2": 32, "detector.node_knn_k": 4,
           "detector.compute_dtype": "float32",
           "descriptor.descriptor_len": 16, "descriptor.ball_nsamples": 8,
           "descriptor.ball_radius": 0.6,
           "descriptor.compute_dtype": "float32",
           "train.batch_size": 2})
    assert cfg.descriptor.use_global_context  # the indoor descriptor form
    _, det_state = init_detector_state(cfg, seed=0)
    det_ckpt = str(tmp_path / "det.msgpack")
    save_checkpoint(det_ckpt, det_state)
    _, desc_state = init_descriptor_state(cfg, seed=1)
    desc_ckpt = str(tmp_path / "desc.msgpack")
    save_checkpoint(desc_ckpt, desc_state)

    scenes = list(out)
    out_root = str(tmp_path / "features")
    stats = run_export_fragments(cfg, det_ckpt, desc_ckpt,
                                 os.path.join(root, "fragments"), out_root,
                                 scenes, desired_num=24)
    assert stats["frames"] == out[scenes[0]]["fragments"]
    kp, desc = indoor.load_fragment_features(
        os.path.join(out_root, scenes[0], "0.bin"), feature_dim=16)
    assert kp.shape == (24, 3) and desc.shape == (24, 16)
    # descriptors are L2-normalized by the model head
    np.testing.assert_allclose(np.linalg.norm(desc, axis=1), 1.0, atol=1e-3)
    # keypoints live inside the fragment's extent
    cloud = np.load(os.path.join(root, "fragments", scenes[0], "0.npy"))[:, :3]
    lo, hi = cloud.min(0) - 0.5, cloud.max(0) + 0.5
    assert np.all(kp >= lo) and np.all(kp <= hi)
