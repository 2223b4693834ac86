"""Sigma-column export + the render-keypoints viewer (the reference's
evaluation/visualize_keypoints MATLAB workflow: load Nx4 (xyz, sigma) bins,
drop sigma >= threshold, scatter over the cloud — visualize_features.m)."""

import os

import numpy as np
import pytest

from usip_tpu.config import get_config
from usip_tpu.eval.export_runner import run_export
from usip_tpu.eval.render import SIGMA_THRESHOLDS, run_render
from usip_tpu.train.checkpoint import save_checkpoint
from usip_tpu.train.loop import init_detector_state


def _tiny_cfg():
    return get_config(
        "modelnet",
        **{"data.input_pc_num": 128, "data.node_num": 16,
           "detector.c1": 16, "detector.c2": 32, "detector.node_knn_k": 4,
           "train.batch_size": 4})


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    """One synthetic 4-column export shared by the tests below."""
    tmp = tmp_path_factory.mktemp("render")
    cfg = _tiny_cfg()
    _, state = init_detector_state(cfg, 0)
    ckpt = str(tmp / "det.msgpack")
    save_checkpoint(ckpt, state)
    out = str(tmp / "kp4")
    stats = run_export(cfg, ckpt, out, desired_num=8, synthetic=True,
                       with_sigmas=True)
    return cfg, out, stats, tmp


def test_export_with_sigmas_writes_4col(exported):
    cfg, out, stats, _ = exported
    assert stats["frames"] == 16
    rows = np.fromfile(os.path.join(out, "00", "0.bin"), np.float32)
    assert rows.size == 8 * 4
    sig = rows.reshape(8, 4)[:, 3]
    # sigma-sorted selection; pad rows (if any) carry inf at the tail
    finite = sig[np.isfinite(sig)]
    assert finite.size > 0 and np.all(np.diff(finite) >= 0)
    assert np.all(sig > 0)


def test_export_with_sigmas_rejects_baselines(tmp_path):
    with pytest.raises(ValueError, match="with_sigmas"):
        run_export(_tiny_cfg(), None, str(tmp_path / "kp"), desired_num=8,
                   synthetic=True, method="random", with_sigmas=True)


def test_render_gallery(exported):
    cfg, kp_dir, _, tmp = exported
    out = str(tmp / "gallery")
    res = run_render(cfg, kp_dir, out, kp_dim=4, sigma_threshold=1e9,
                     max_frames=3, synthetic=True)
    assert res["rendered"] == 3
    assert os.path.exists(res["html"])
    pngs = os.listdir(os.path.join(out, "images"))
    assert len(pngs) == 3
    with open(res["html"]) as f:
        page = f.read()
    for name in pngs:
        assert name in page


def test_render_sigma_filter_drops_rows(exported):
    cfg, kp_dir, _, tmp = exported
    # threshold below every sigma -> all keypoints filtered, still renders
    res = run_render(cfg, kp_dir, str(tmp / "filtered"), kp_dim=4,
                     sigma_threshold=1e-12, max_frames=1, html=False,
                     synthetic=True)
    assert res["rendered"] == 1 and res["html"] is None


def test_render_argument_contract(exported):
    cfg, kp_dir, _, tmp = exported
    with pytest.raises(ValueError, match="4-column"):
        run_render(cfg, kp_dir, str(tmp / "x"), kp_dim=3, sigma_threshold=0.3)
    # per-dataset default threshold resolves for 4-column bins
    assert SIGMA_THRESHOLDS["kitti"] == 0.3


def test_render_skips_missing_bins(exported):
    cfg, _, _, tmp = exported
    empty = str(tmp / "nobins")
    os.makedirs(empty, exist_ok=True)
    res = run_render(cfg, empty, str(tmp / "y"), max_frames=4, html=False,
                     synthetic=True)
    assert res["rendered"] == 0 and res["skipped"] == 16
