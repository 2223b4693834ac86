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
