"""Preprocessing tests: voxel grid, PCA normals, scan preparation, pair building."""

import os

import numpy as np

from usip_tpu.data.preprocess import (build_test_pairs, estimate_normals,
                                      prepare_lidar_scan, rotm_to_quat,
                                      voxel_downsample, write_groundtruths_txt)
from usip_tpu.eval.eval_runner import load_kitti_gt_table, quat_to_rotm


def test_voxel_downsample(rng):
    # two clusters at voxel centers far apart -> two voxels, averaged
    a = rng.normal(scale=0.01, size=(50, 3)) + [0.5, 0.5, 0.5]
    b = rng.normal(scale=0.01, size=(50, 3)) + [10.5, 10.5, 10.5]
    pts = np.concatenate([a, b])
    out = voxel_downsample(pts, 1.0)
    assert out.shape[0] == 2
    means = sorted(out.tolist())
    np.testing.assert_allclose(means[0], a.mean(0), atol=1e-6)
    np.testing.assert_allclose(means[1], b.mean(0), atol=1e-6)


def test_estimate_normals_plane(rng):
    # z=0 plane -> normals +-z, low curvature
    pts = np.concatenate([rng.uniform(-1, 1, size=(200, 2)),
                          np.zeros((200, 1))], axis=1)
    pts[:, 2] += rng.normal(scale=1e-4, size=200)
    normals, curvature = estimate_normals(pts, k=12,
                                          orient_towards=np.array([0, 0, 10.0]))
    np.testing.assert_allclose(np.abs(normals[:, 2]), 1.0, atol=1e-2)
    assert (normals[:, 2] > 0).all()  # oriented towards +z target
    assert curvature.mean() < 0.01


def test_prepare_lidar_scan(rng):
    pts = rng.normal(size=(5000, 4)).astype(np.float32) * 20
    pts[:, 3] = rng.uniform(size=5000)  # reflectance
    out = prepare_lidar_scan(pts, voxel_size=0.5, target_points=1000,
                             max_radius=30.0)
    assert out.shape[1] == 8
    assert out.shape[0] <= 1000
    assert (np.linalg.norm(out[:, :3], axis=1) <= 30.0 + 1.0).all()
    # unit normals
    np.testing.assert_allclose(np.linalg.norm(out[:, 3:6], axis=1), 1.0,
                               atol=1e-4)


def test_build_test_pairs_spacing():
    poses = np.stack([np.eye(4)] * 30)
    for i in range(30):
        poses[i][0, 3] = i * 3.0  # 3 m apart
    pairs = build_test_pairs(poses, min_spacing=10.0)
    assert pairs, "no pairs found"
    for a, p in pairs:
        d = abs(poses[p][0, 3] - poses[a][0, 3])
        assert d >= 10.0 and d < 13.0  # just above the spacing


def test_groundtruths_roundtrip(tmp_path, rng):
    # random poses -> write txt -> parse back -> transforms match
    poses = []
    for i in range(5):
        T = np.eye(4)
        theta = rng.uniform(0, 2 * np.pi)
        T[:3, :3] = np.array([[np.cos(theta), -np.sin(theta), 0],
                              [np.sin(theta), np.cos(theta), 0], [0, 0, 1]])
        T[:3, 3] = rng.normal(size=3) * 20
        poses.append(T)
    poses = np.stack(poses)
    pairs = [(0, 2), (1, 4)]
    path = str(tmp_path / "09" / "groundtruths.txt")
    write_groundtruths_txt(path, poses, pairs)
    rows = load_kitti_gt_table(str(tmp_path), 9)
    assert len(rows) == 2
    for row, (a, p) in zip(rows, pairs):
        rel = np.linalg.inv(poses[a]) @ poses[p]
        np.testing.assert_allclose(row["T_gt"], rel, atol=1e-4)


def test_rotm_quat_roundtrip(rng):
    for _ in range(10):
        A = rng.normal(size=(3, 3))
        q_, _ = np.linalg.qr(A)
        if np.linalg.det(q_) < 0:
            q_[:, 0] *= -1
        q = rotm_to_quat(q_)
        np.testing.assert_allclose(quat_to_rotm(q), q_, atol=1e-6)


def test_build_modelnet_rotated(tmp_path, rng):
    from usip_tpu.data.preprocess import build_modelnet_rotated

    src_files = []
    for i in range(2):
        p = str(tmp_path / f"shape{i}.npy")
        np.save(p, rng.normal(size=(100, 6)).astype(np.float32))
        src_files.append(p)
    out = str(tmp_path / "rotated_set")
    n = build_modelnet_rotated(src_files, out, seed=0)
    assert n == 2
    orig = np.load(os.path.join(out, "original", "0.npy"))
    rot = np.load(os.path.join(out, "rotated", "0.npy"))
    T = np.load(os.path.join(out, "rotated", "0_gt.npy"))
    # applying T to rotated coords recovers the original cloud
    back = rot[:, :3] @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(back, orig[:, :3], atol=1e-5)
    # rotated normals stay unit if input ones were
    src = np.load(src_files[0])
    np.testing.assert_allclose(np.linalg.norm(rot[:, 3:6], axis=1),
                               np.linalg.norm(src[:, 3:6], axis=1), atol=1e-5)


def test_synthetic_kitti_tree_frame_conventions(tmp_path):
    """build_synthetic_kitti_tree writes a tree the full kitti protocol can
    consume: the loaders read it, and GT-transforming a positive frame's
    cloud (after the cam->velodyne coord fix) lands on the anchor frame's
    cloud — validating every frame convention (storage=camera, GT=velodyne)
    end to end."""
    import numpy as np
    from scipy.spatial import cKDTree

    from usip_tpu.config import get_config
    from usip_tpu.data.eval_loaders import KittiTestFrames
    from usip_tpu.data.loaders import KittiDataset
    from usip_tpu.data.synthetic import build_synthetic_kitti_tree
    from usip_tpu.eval.eval_runner import (load_kitti_gt_table, make_coord_fix)
    from usip_tpu.eval.repeatability import apply_transform

    root = str(tmp_path)
    counts = build_synthetic_kitti_tree(
        root, frames_per_seq=3, test_frames_per_seq=12, target_points=2048,
        scan_radius=30.0, spacing=1.5, test_seqs=(9, 10))
    assert counts[0] == 3 and counts[9] == 12

    cfg = get_config("kitti", **{"data.dataroot": root,
                                 "data.input_pc_num": 1024,
                                 "data.parent_pc_num": 2048})
    train = KittiDataset(cfg.data, "train", sn_len=4)
    assert len(train) == 27
    item = train[0]
    assert item["src_pc"].shape == (1024, 3)
    assert item["src_sn"].shape == (1024, 4)

    gt = load_kitti_gt_table(os.path.join(root, "kitti-reg-test"), 9)
    assert gt, "no >=10m pairs generated"
    frames = KittiTestFrames(
        cfg.data, txt_root=os.path.join(root, "kitti-reg-test"),
        numpy_root=os.path.join(root, "data_odometry_velodyne", "numpy"),
        seqs=(9,), sn_len=4)
    assert len(frames) > 0

    fix = make_coord_fix("kitti", os.path.join(root, "calib"))
    row = gt[0]
    load = lambda idx: np.load(os.path.join(
        root, "data_odometry_velodyne", "numpy", "09",
        "np_0.20_20480_r90_sn", f"{idx:06d}.npy"))[:, :3]
    anc_v = fix(load(row["anc_idx"]), 9)
    pos_v = fix(load(row["pos_idx"]), 9)
    pos_in_anc = apply_transform(pos_v, row["T_gt"])
    # the two scans observe the same persistent world: transformed positive
    # points must land on anchor geometry (not centimeter-exact — different
    # world subsets — but far below the 1.5 m frame spacing)
    d, _ = cKDTree(anc_v).query(pos_in_anc)
    assert np.median(d) < 0.35, float(np.median(d))
