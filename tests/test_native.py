"""Native library tests: build, then verify each entry point against the numpy
reference implementations (the same oracle pattern the reference used for its
CUDA kernels vs CPU implementations, models/test_operations.py)."""

import numpy as np
import pytest

from usip_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built():
    assert native.build(), "native library failed to build"
    assert native.available()


def test_subsample_shapes_and_membership(rng):
    data = rng.normal(size=(100, 8)).astype(np.float32)
    out = native.subsample(data, 40, seed=1)
    assert out.shape == (40, 8)
    rows = {tuple(r) for r in data}
    assert all(tuple(r) in rows for r in out)
    assert len({tuple(r) for r in out}) == 40  # without replacement
    # pad-by-repetition
    short = data[:7]
    grown = native.subsample(short, 20, seed=2)
    assert grown.shape == (20, 8)
    assert {tuple(r) for r in grown} <= {tuple(r) for r in short}
    # every original row appears at least twice (two full repetitions fit)
    counts = {tuple(r): 0 for r in short}
    for r in grown:
        counts[tuple(r)] += 1
    assert all(v >= 2 for v in counts.values())


def test_fps_matches_numpy_recurrence(rng):
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    out, idx = native.fps(pts, 16, seed=3)
    # recurrence check given the same seed point
    first = int(idx[0])
    chosen = [first]
    d = ((pts - pts[first]) ** 2).sum(1)
    for _ in range(15):
        far = int(np.argmax(d))
        chosen.append(far)
        d = np.minimum(d, ((pts - pts[far]) ** 2).sum(1))
    np.testing.assert_array_equal(idx, chosen)
    np.testing.assert_allclose(out, pts[chosen])


def test_nms_matches_python(rng):
    from usip_tpu.eval.export import nms as py_nms
    kp = rng.normal(size=(60, 3)).astype(np.float32)
    sig = rng.uniform(0.1, 2.0, size=60).astype(np.float32)
    n_kp, n_sig = native.nms(kp, sig, 0.4)
    p_kp, p_sig = py_nms(kp, sig, 0.4)
    np.testing.assert_allclose(n_kp, p_kp)
    np.testing.assert_allclose(n_sig, p_sig)


def test_npy_reader_roundtrip(tmp_path, rng):
    for dtype in (np.float32, np.float64):
        a = rng.normal(size=(37, 8)).astype(dtype)
        p = str(tmp_path / f"a_{dtype.__name__}.npy")
        np.save(p, a)
        out = native.read_npy(p)
        np.testing.assert_allclose(out, a.astype(np.float32), rtol=1e-6)


def test_batch_load_subsample(tmp_path, rng):
    paths = []
    for i in range(6):
        a = rng.normal(size=(150, 8)).astype(np.float32)
        p = str(tmp_path / f"{i}.npy")
        np.save(p, a)
        paths.append(p)
    pc, sn = native.batch_load_subsample(paths, 64, 4, seed=0, threads=3)
    assert pc.shape == (6, 64, 3)
    assert sn.shape == (6, 64, 4)
    # rows must come from the right file
    src = np.load(paths[2])
    rows = {tuple(np.concatenate([p, s])) for p, s in
            zip(src[:, :3], src[:, 3:7])}
    for p, s in zip(pc[2], sn[2]):
        assert tuple(np.concatenate([p, s])) in rows


def test_batch_load_reflectance_mode(tmp_path, rng):
    a = rng.normal(size=(80, 8)).astype(np.float32)
    p = str(tmp_path / "r.npy")
    np.save(p, a)
    pc, sn = native.batch_load_subsample([p], 32, 1, seed=0)
    assert sn.shape == (1, 32, 1)
    refl = set(np.round(a[:, -1], 5))
    assert all(np.round(v, 5) in refl for v in sn[0, :, 0])


def test_batch_load_subsample_f16_matches_numpy_cast(tmp_path, rng):
    """dtype=float16: the C++ thread pool encodes the fp16 wire with
    round-to-nearest-even, bit-identical to numpy astype(float16) of the
    fp32 load (same seed -> same subsample)."""
    paths = []
    for i in range(5):
        a = (rng.normal(size=(150, 8)) * 1000).astype(np.float32)
        a[0, :3] = [65520.0, 7e-8, -65520.0]  # overflow->inf, subnormal
        p = str(tmp_path / f"h{i}.npy")
        np.save(p, a)
        paths.append(p)
    pc32, sn32 = native.batch_load_subsample(paths, 64, 4, seed=3, threads=2)
    pc16, sn16 = native.batch_load_subsample(paths, 64, 4, seed=3, threads=2,
                                             dtype=np.float16)
    assert pc16.dtype == np.float16 and sn16.dtype == np.float16
    np.testing.assert_array_equal(pc16, pc32.astype(np.float16))
    np.testing.assert_array_equal(sn16, sn32.astype(np.float16))


def test_parent_get_batch_emits_wire_dtype(tmp_path, rng):
    """ParentCloudDataset.get_batch emits float16 directly when the config's
    wire_dtype is float16 (the numpy astype pass on the prefetch thread
    disappears)."""
    from usip_tpu.config import get_config
    from usip_tpu.data.loaders import KittiDataset, ParentCloudDataset

    from usip_tpu.data.loaders import KITTI_NP_FOLDER
    for s_ in range(9):  # train mode lists seqs 00-08
        folder = tmp_path / "data_odometry_velodyne" / "numpy" / f"{s_:02d}" \
            / KITTI_NP_FOLDER
        folder.mkdir(parents=True)
    folder = tmp_path / "data_odometry_velodyne" / "numpy" / "00" / \
        KITTI_NP_FOLDER
    for i in range(4):
        np.save(str(folder / f"{i:06d}.npy"),
                rng.normal(size=(300, 8)).astype(np.float32))
    cfg = get_config("kitti", **{
        "data.dataroot": str(tmp_path), "data.parent_pc_num": 128,
        "data.input_pc_num": 64, "data.wire_dtype": "float16"})
    ds = ParentCloudDataset(KittiDataset(cfg.data, "train", sn_len=4))
    batch = ds.get_batch([0, 1])
    assert batch is not None
    assert batch["pc"].dtype == np.float16
    assert batch["sn"].dtype == np.float16


def test_batch_load_rejects_short_rows(tmp_path, rng):
    """cols < 3+sn_len raises a clear error instead of overreading."""
    p = str(tmp_path / "short.npy")
    np.save(p, rng.normal(size=(50, 4)).astype(np.float32))
    with pytest.raises(IOError, match="columns"):
        native.batch_load_subsample([p], 32, 4)
