"""Data-layer tests against synthetic on-disk dataset trees that mimic the
reference directory contracts."""

import os
import pickle

import numpy as np
import pytest

from usip_tpu.config import DataConfig
from usip_tpu.data.common import radius_crop, split_pc_sn, subsample_fixed
from usip_tpu.data.descriptor_loaders import (KittiDescriptorDataset,
                                              OxfordDescriptorDataset,
                                              SceneNNDescriptorDataset,
                                              cart_to_hom_apply)
from usip_tpu.data.eval_loaders import KittiTestFrames, load_kitti_test_pairs
from usip_tpu.data.loaders import (KITTI_NP_FOLDER, KittiDataset,
                                   Match3DDataset, ModelNetDataset,
                                   OxfordDataset, SceneNNDataset)
from usip_tpu.data.pipeline import BatchLoader
from usip_tpu.data.synthetic import SyntheticDataset


def test_subsample_fixed(rng):
    data = rng.normal(size=(100, 8)).astype(np.float32)
    out = subsample_fixed(rng, data, 40)
    assert out.shape == (40, 8)
    assert len({tuple(r) for r in out}) == 40  # no replacement when enough points
    short = data[:7]
    grown = subsample_fixed(rng, short, 20)
    assert grown.shape == (20, 8)
    # contains full repetitions of the short cloud
    uniq = {tuple(r) for r in grown}
    assert uniq <= {tuple(r) for r in short}


def test_split_pc_sn(rng):
    data = rng.normal(size=(10, 8)).astype(np.float32)
    pc, sn = split_pc_sn(data, 4)
    np.testing.assert_array_equal(pc, data[:, :3])
    np.testing.assert_array_equal(sn, data[:, 3:7])
    _, refl = split_pc_sn(data, 1)
    np.testing.assert_array_equal(refl, data[:, -1:])
    _, empty = split_pc_sn(data, 0)
    assert empty.shape == (10, 0)


def test_radius_crop(rng):
    data = rng.normal(size=(50, 8)).astype(np.float32) * 10
    out = radius_crop(data, 5.0)
    assert (np.linalg.norm(out[:, [0, 2]], axis=1) <= 5.0).all()


# ------------------------------------------------------ synthetic dataset trees


def _make_modelnet_tree(root, n_shapes=3, pts=200):
    rng = np.random.default_rng(0)
    names = []
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "modelnet40_shape_names.txt"), "w") as f:
        f.write("chair\n")
    for i in range(n_shapes):
        name = f"chair_{i:04d}"
        names.append(name)
        os.makedirs(os.path.join(root, "chair"), exist_ok=True)
        np.save(os.path.join(root, "chair", name + ".npy"),
                rng.normal(size=(pts, 6)).astype(np.float32))
    with open(os.path.join(root, "modelnet40_train.txt"), "w") as f:
        f.write("\n".join(names))
    with open(os.path.join(root, "modelnet40_test.txt"), "w") as f:
        f.write(names[0])


def test_modelnet_dataset(tmp_path):
    root = str(tmp_path / "modelnet")
    _make_modelnet_tree(root)
    cfg = DataConfig(dataset="modelnet", dataroot=root, input_pc_num=64)
    ds = ModelNetDataset(cfg, "train", sn_len=3)
    assert len(ds) == 3
    item = ds[0]
    assert item["src_pc"].shape == (64, 3)
    assert item["src_sn"].shape == (64, 3)
    # siamese copies are distinct samplings
    assert not np.array_equal(item["src_pc"], item["dst_pc"])


def _make_kitti_tree(root, seqs=(0, 9), frames=4, pts=300):
    rng = np.random.default_rng(1)
    for seq in seqs:
        folder = os.path.join(root, "data_odometry_velodyne", "numpy",
                              f"{seq:02d}", KITTI_NP_FOLDER)
        pose_folder = os.path.join(root, "poses", f"{seq:02d}")
        os.makedirs(folder, exist_ok=True)
        os.makedirs(pose_folder, exist_ok=True)
        for i in range(frames):
            np.save(os.path.join(folder, f"{i:06d}.npy"),
                    (rng.normal(size=(pts, 8)) * 20).astype(np.float32))
            pose = np.eye(4)
            pose[0, 3] = i * 1.0  # 1 m apart
            np.savez(os.path.join(pose_folder, f"{i:06d}.npz"), pose=pose)


def test_kitti_dataset(tmp_path):
    root = str(tmp_path / "kitti")
    _make_kitti_tree(root, seqs=tuple(range(9)), frames=2)
    cfg = DataConfig(dataset="kitti", dataroot=root, input_pc_num=128,
                     crop_radius=30.0)
    ds = KittiDataset(cfg, "train", sn_len=4)
    assert len(ds) == 18
    item = ds[3]
    assert item["src_pc"].shape == (128, 3)
    assert item["src_sn"].shape == (128, 4)
    seq, pose = ds.load_pose(3)
    assert seq == 1 and pose.shape == (4, 4)


def test_kitti_descriptor_dataset(tmp_path):
    root = str(tmp_path / "kitti")
    _make_kitti_tree(root, seqs=tuple(range(9)), frames=6)
    cfg = DataConfig(dataset="kitti", dataroot=root, input_pc_num=64,
                     positive_radius=5.0, negative_radius=2.5)
    ds = KittiDescriptorDataset(cfg, "train", sn_len=4)
    item = ds[2]
    assert item["anc_pc"].shape == (64, 3)
    assert item["pose"].shape == (4, 4)
    # negative mining: frames 1m apart, negative_radius 2.5 -> frames >2.5m or
    # other sequences qualify
    seqs = np.array([0, 0, 1], dtype=np.int64)
    poses = np.stack([np.eye(4)] * 3).astype(np.float32)
    poses[1][0, 3] = 1.0   # 1 m from anchor 0 (too close, same seq)
    neg = ds.mine_negative_indices(seqs, poses)
    assert neg[0] == 2  # only the other-sequence entry qualifies


def _make_oxford_tree(root, n=4, pts=200):
    rng = np.random.default_rng(2)
    os.makedirs(os.path.join(root, "train_np_nofilter"), exist_ok=True)
    lines = []
    for i in range(n):
        fn = f"scan_{i}.bin"
        np.save(os.path.join(root, "train_np_nofilter", f"scan_{i}.npy"),
                rng.normal(size=(pts, 8)).astype(np.float32))
        pos = [(i + 1) % n]
        nonneg = [i, (i + 1) % n]
        lines.append(f"{fn} | {' '.join(map(str, pos))} | "
                     f"{' '.join(map(str, nonneg))}")
    with open(os.path.join(root, "train_relative.txt"), "w") as f:
        f.write("\n".join(lines))


def test_oxford_datasets(tmp_path):
    root = str(tmp_path / "oxford")
    _make_oxford_tree(root)
    cfg = DataConfig(dataset="oxford", dataroot=root, input_pc_num=64)
    ds = OxfordDataset(cfg, "train", sn_len=4)
    assert len(ds) == 4
    item = ds[1]
    assert item["src_pc"].shape == (64, 3)

    desc = OxfordDescriptorDataset(cfg, "train", sn_len=4)
    d = desc[0]
    assert d["anc_pc"].shape == (64, 3) and d["pos_pc"].shape == (64, 3)
    # entry 0's nonneg list is {0, 1}: in a batch [0,1,2,3] its negative must be 2/3
    neg = desc.mine_negative_indices(np.array([0, 1, 2, 3]))
    assert neg[0] in (2, 3)


def _make_scenenn_tree(root, frames=4, pts=150):
    rng = np.random.default_rng(3)
    folder = os.path.join(root, "frames_train")
    os.makedirs(folder, exist_ok=True)
    for i in range(frames):
        np.save(os.path.join(folder, f"{i}.npy"),
                rng.normal(size=(pts, 8)).astype(np.float32))
    pairs = np.array([[0, 1], [2, 3]])
    icp = np.stack([np.eye(4)] * 2)
    icp[0][0, 3] = 0.5
    info = {"pairs_np": pairs, "icp_np": icp,
            "positive_list": [[1], [3]], "sample_num": frames}
    with open(os.path.join(root, "info_train.pkl"), "wb") as f:
        pickle.dump(info, f)


def test_scenenn_datasets(tmp_path):
    root = str(tmp_path / "scenenn")
    _make_scenenn_tree(root)
    cfg = DataConfig(dataset="scenenn", dataroot=root, input_pc_num=64)
    ds = SceneNNDataset(cfg, "train", sn_len=4)
    assert len(ds) == 4
    assert ds[0]["src_pc"].shape == (64, 3)

    desc = SceneNNDescriptorDataset(cfg, "train", sn_len=4)
    assert len(desc) == 2
    d = desc[0]
    assert d["anc_pc"].shape == (64, 3)


def test_cart_to_hom_apply(rng):
    pc = rng.normal(size=(10, 3))
    T = np.eye(4)
    T[:3, 3] = [1, 2, 3]
    out = cart_to_hom_apply(T, pc)
    np.testing.assert_allclose(out, pc + [1, 2, 3], atol=1e-12)


def _make_match3d_tree(root, pts=100):
    rng = np.random.default_rng(4)
    os.makedirs(os.path.join(root, "sceneA", "seq-01"), exist_ok=True)
    for i in range(3):
        np.save(os.path.join(root, "sceneA", "seq-01", f"{i}.npy"),
                rng.normal(size=(pts, 8)).astype(np.float32))
    with open(os.path.join(root, "training_list.txt"), "w") as f:
        f.write("sceneA\n")


def test_match3d_dataset(tmp_path):
    root = str(tmp_path / "m3d")
    _make_match3d_tree(root)
    cfg = DataConfig(dataset="match3d", dataroot=root, input_pc_num=64)
    ds = Match3DDataset(cfg, "train", sn_len=4)
    assert len(ds) == 3
    assert ds[0]["src_pc"].shape == (64, 3)


def test_kitti_test_pairs(tmp_path):
    root = str(tmp_path / "reg")
    os.makedirs(os.path.join(root, "09"), exist_ok=True)
    with open(os.path.join(root, "09", "groundtruths.txt"), "w") as f:
        f.write("anc pos tx ty tz qw qx qy qz\n")
        f.write("0 5 0 0 0 1 0 0 0\n")
        f.write("5 0 0 0 0 1 0 0 0\n")
        f.write("1 6 0 0 0 1 0 0 0\n")
    pairs = load_kitti_test_pairs(root, 9)
    idxs = {(p["anc_idx"], p["pos_idx"]) for p in pairs}
    assert (0, 5) in idxs and (5, 0) in idxs and (1, 6) in idxs and (6, 1) in idxs


def test_batch_loader_prefetch():
    ds = SyntheticDataset(size=10, input_pc_num=32, surface_normal_len=3)
    loader = BatchLoader(ds, batch_size=4, shuffle=True, num_workers=2,
                         prefetch=2)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    for b in batches:
        assert b["src_pc"].shape == (4, 32, 3)
    # second epoch re-iterates
    assert len(list(loader)) == 2
    # eval mode: drop_last=False visits every item, ragged tail batch of 2
    full = BatchLoader(ds, batch_size=4, shuffle=False, num_workers=2,
                       drop_last=False)
    assert len(full) == 3
    fb = list(full)
    assert [b["src_pc"].shape[0] for b in fb] == [4, 4, 2]


def test_device_prefetch():
    import jax
    from usip_tpu.data.pipeline import device_prefetch

    ds = SyntheticDataset(size=8, input_pc_num=16, surface_normal_len=3)
    loader = BatchLoader(ds, batch_size=4, shuffle=False, num_workers=1)
    batches = list(device_prefetch(iter(loader), depth=2))
    assert len(batches) == 2
    assert isinstance(batches[0]["src_pc"], jax.Array)
    assert batches[0]["src_pc"].shape == (4, 16, 3)


def test_oxford_descriptor_test_mode(tmp_path):
    """Test-mode descriptor pairs come from groundtruths.pkl anc/pos indices."""
    rng = np.random.default_rng(7)
    root = str(tmp_path / "oxford")
    folder = os.path.join(root, "test_models_20k_np_nofilter")
    os.makedirs(folder, exist_ok=True)
    for i in range(4):
        np.save(os.path.join(folder, f"{i}.npy"),
                rng.normal(size=(200, 8)).astype(np.float32))
    gts = [{"anc_idx": 0, "pos_idx": 2, "neg_idx": 3, "t": [0, 0, 0],
            "q": [1, 0, 0, 0]},
           {"anc_idx": 1, "pos_idx": 3, "neg_idx": 0, "t": [0, 0, 0],
            "q": [1, 0, 0, 0]}]
    with open(os.path.join(folder, "groundtruths.pkl"), "wb") as f:
        pickle.dump(gts, f)
    cfg = DataConfig(dataset="oxford", dataroot=root, input_pc_num=64)
    ds = OxfordDescriptorDataset(cfg, "test", sn_len=4)
    assert len(ds) == 2
    item = ds[0]
    assert item["anc_pc"].shape == (64, 3)
    assert item["pos_pc"].shape == (64, 3)


def test_native_batch_fast_path(tmp_path):
    """Datasets expose item_path/get_batch; the native thread-pooled loader
    assembles whole siamese batches (usip_native.cpp usip_batch_load_subsample)
    with points drawn from the file and the oxford ENU->cam flip applied."""
    from usip_tpu import native

    root = str(tmp_path / "modelnet")
    _make_modelnet_tree(root, n_shapes=4, pts=200)
    cfg = DataConfig(dataset="modelnet", dataroot=root, input_pc_num=64)
    ds = ModelNetDataset(cfg, "train", sn_len=3)
    assert ds.item_path(1) is not None
    batch = ds.get_batch([0, 1, 2, 3])
    if not native.available():
        assert batch is None
        return
    assert batch["src_pc"].shape == (4, 64, 3)
    assert batch["src_sn"].shape == (4, 64, 3)
    assert not np.array_equal(batch["src_pc"], batch["dst_pc"])
    # every batch point must be a row of the source file
    f0 = np.load(ds.item_path(0))
    d = np.abs(batch["src_pc"][0][:, None, :] - f0[None, :, :3]).sum(-1)
    assert float(d.min(axis=1).max()) < 1e-6

    # BatchLoader integration: batches flow through the fast path
    loader = BatchLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 1 and batches[0]["src_pc"].shape == (4, 64, 3)


def test_native_batch_oxford_flip(tmp_path):
    from usip_tpu import native

    if not native.available():
        return
    root = str(tmp_path / "oxford")
    _make_oxford_tree(root)
    cfg = DataConfig(dataset="oxford", dataroot=root, input_pc_num=64)
    ds = OxfordDataset(cfg, "train", sn_len=4)
    batch = ds.get_batch([0, 1])
    assert batch is not None and batch["src_pc"].shape == (2, 64, 3)
    # flipped: each point equals ENU->cam of some file row
    raw = np.load(ds.item_path(0))
    enu = raw[:, :3]
    cam = np.stack([enu[:, 0], -enu[:, 2], enu[:, 1]], axis=1)
    d = np.abs(batch["src_pc"][0][:, None, :] - cam[None, :, :]).sum(-1)
    assert float(d.min(axis=1).max()) < 1e-6
    # sn: first 3 channels flipped too, 4th passthrough
    sn_cam = np.stack([raw[:, 3], -raw[:, 5], raw[:, 4], raw[:, 6]], axis=1)
    d = np.abs(batch["src_sn"][0][:, None, :] - sn_cam[None, :, :]).sum(-1)
    assert float(d.min(axis=1).max()) < 1e-6


def test_native_batch_kitti_crop_fallback(tmp_path):
    root = str(tmp_path / "kitti")
    _make_kitti_tree(root, seqs=tuple(range(9)), frames=2)
    cropped = DataConfig(dataset="kitti", dataroot=root, input_pc_num=64,
                         crop_radius=30.0)
    assert KittiDataset(cropped, "train", sn_len=4).item_path(0) is None
    full = DataConfig(dataset="kitti", dataroot=root, input_pc_num=64)
    assert KittiDataset(full, "train", sn_len=4).item_path(0) is not None


def test_parent_cloud_dataset(tmp_path):
    """ParentCloudDataset view: fixed-size parent items + native batch path."""
    import dataclasses

    from usip_tpu.data.loaders import ParentCloudDataset

    root = str(tmp_path / "modelnet")
    _make_modelnet_tree(root, n_shapes=4, pts=200)
    cfg = DataConfig(dataset="modelnet", dataroot=root, input_pc_num=64,
                     device_sampling=True, parent_pc_num=128)
    base = ModelNetDataset(cfg, "train", sn_len=3)
    view = ParentCloudDataset(base)
    assert len(view) == 4
    item = view[0]
    assert item["pc"].shape == (128, 3) and item["sn"].shape == (128, 3)
    batch = view.get_batch([0, 1])
    if batch is not None:
        assert batch["pc"].shape == (2, 128, 3)

    # validation errors
    import pytest as _pytest
    bad = dataclasses.replace(cfg, parent_pc_num=None)
    with _pytest.raises(ValueError):
        ParentCloudDataset(ModelNetDataset(bad, "train", sn_len=3))
    bad2 = dataclasses.replace(cfg, parent_pc_num=32)
    with _pytest.raises(ValueError):
        ParentCloudDataset(ModelNetDataset(bad2, "train", sn_len=3))


def test_modelnet_cls_dataset(tmp_path):
    """Classification-style loader (SO-Net legacy surface,
    modelnet_cls_loader.py): single view + integer label."""
    from usip_tpu.data.loaders import ModelNetClsDataset
    root = str(tmp_path / "modelnet")
    _make_modelnet_tree(root)
    cfg = DataConfig(dataset="modelnet", dataroot=root, input_pc_num=64)
    ds = ModelNetClsDataset(cfg, "train", sn_len=3)
    assert len(ds) == 3
    item = ds[0]
    assert item["pc"].shape == (64, 3)
    assert item["sn"].shape == (64, 3)
    assert item["label"].dtype == np.int32 and item["label"] == 0
    from usip_tpu.data.pipeline import BatchLoader
    batch = next(iter(BatchLoader(ds, 2, num_workers=1, seed=0)))
    assert batch["pc"].shape == (2, 64, 3)
    assert batch["label"].shape == (2,)


def test_subsample_fixed_short_cloud_random_order():
    """Short clouds pad by repetition AND come back in uniformly random row
    order — slice-mode device sampling takes prefix/suffix crops and would
    otherwise see scan-order-biased siamese copies (oxford ~20k submaps vs
    parent_pc_num=20480)."""
    from usip_tpu.data.common import subsample_fixed
    from usip_tpu import native as native_mod
    rng = np.random.default_rng(0)
    data = np.arange(100, dtype=np.float32).reshape(100, 1) \
        .repeat(4, 1)  # row id in every column
    out = subsample_fixed(rng, data, 160)
    ids = out[:, 0].astype(int)
    counts = np.bincount(ids, minlength=100)
    assert counts.min() >= 1 and counts.max() <= 2  # repetition contract
    # not in scan order: the first 100 rows must not be exactly 0..99,
    # nor sorted ascending
    assert not np.array_equal(ids[:100], np.arange(100))
    assert not (np.diff(ids[:100]) >= 0).all()
    # prefix/suffix crops each cover a healthy spread of the cloud
    assert len(set(ids[:80])) > 50 and len(set(ids[-80:])) > 50

    if native_mod.available():
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "short.npy")
            np.save(p, data)
            pc, sn = native_mod.batch_load_subsample([p], 160, 1, seed=3)
            nid = pc[0, :, 0].astype(int)
            ncounts = np.bincount(nid, minlength=100)
            assert ncounts.min() >= 1 and ncounts.max() <= 2
            assert not np.array_equal(nid[:100], np.arange(100))
            assert not (np.diff(nid[:100]) >= 0).all()
            assert len(set(nid[:80])) > 50 and len(set(nid[-80:])) > 50


def test_batchloader_abandoned_iteration_releases_producer():
    """Abandoning iteration mid-epoch (truncated test sweeps, single-batch
    pulls) must terminate the producer thread instead of leaving it blocked
    on a full queue holding batches."""
    import threading
    import time as time_mod

    from usip_tpu.data.pipeline import BatchLoader
    from usip_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(size=32, input_pc_num=64, seed=0)
    base = threading.active_count()
    for _ in range(8):
        loader = BatchLoader(ds, 2, num_workers=2, prefetch=1, seed=0)
        it = iter(loader)
        next(it)
        it.close()  # GeneratorExit -> stop event -> producer must exit
    deadline = time_mod.time() + 10
    while time_mod.time() < deadline:
        if threading.active_count() <= base + 1:
            break
        time_mod.sleep(0.2)
    assert threading.active_count() <= base + 1, threading.active_count()
