"""Config system tests: presets, overrides, json roundtrip."""

import pytest

from usip_tpu.config import Config, get_config, lite_detector


def test_presets_match_reference_defaults():
    """Spot-check the per-dataset defaults table (SURVEY §5.6)."""
    k = get_config("kitti")
    assert k.data.input_pc_num == 16384
    assert k.detector.node_knn_k == 16
    assert k.loss.keypoint_on_pc_alpha == 0.01
    assert k.detector.sigma_lower_bound == 1e-3
    m = get_config("modelnet")
    assert m.data.input_pc_num == 5000
    assert m.detector.surface_normal_len == 3
    assert m.detector.node_knn_k == 32
    s = get_config("scenenn")
    assert s.loss.keypoint_on_pc_alpha == 100.0
    assert s.descriptor.ball_nsamples == 448
    assert s.descriptor.use_global_context
    assert s.loss.cgf_radius == 0.075
    x = get_config("match3d")
    assert x.loss.keypoint_on_pc_alpha == 10.0
    # parent-cloud wire mode on every fixed-frame-tree preset (round-3):
    # kitti/oxford since round 2, scenenn/match3d join with fp32 wire
    for ds in ("kitti", "oxford", "scenenn", "match3d"):
        d = get_config(ds).data
        assert d.device_sampling and d.parent_pc_num >= d.input_pc_num, ds
    assert get_config("scenenn").data.wire_dtype == "float32"


def test_ball_query_defaults_are_parity_safe():
    """Default ball query semantics match the reference (exact/fp32); only
    the A/B-validated LiDAR presets opt into the fast path (round-2 ADVICE)."""
    for ds in ("scenenn", "match3d", "modelnet"):
        d = get_config(ds).descriptor
        assert d.ball_method == "exact", ds
        assert d.ball_compute_dtype == "float32", ds
    for ds in ("kitti", "oxford"):
        d = get_config(ds).descriptor
        assert d.ball_method == "auto", ds
        assert d.ball_compute_dtype == "bfloat16", ds


def test_unknown_dataset():
    with pytest.raises(KeyError):
        get_config("nope")


def test_overrides():
    cfg = get_config("kitti", **{"data.input_pc_num": 1024})
    assert cfg.data.input_pc_num == 1024
    cfg2 = cfg.with_overrides(**{"detector.c1": 64, "train.lr": 0.01})
    assert cfg2.detector.c1 == 64 and cfg2.train.lr == 0.01
    with pytest.raises(KeyError):
        cfg.with_overrides(nodots=1)


def test_lite_detector_widths():
    d = lite_detector(get_config("scenenn").detector)
    assert (d.c1, d.c2) == (64, 256)


def test_json_roundtrip():
    cfg = get_config("oxford", **{"data.input_pc_num": 2048})
    restored = Config.from_json(cfg.to_json())
    assert restored == cfg
    # None-valued fields survive
    assert restored.train.bn_momentum_decay_step is None


def test_descriptor_role_deltas():
    assert get_config("kitti", role="descriptor").data.node_num == 256
    assert get_config("kitti").data.node_num == 512
    sc = get_config("scenenn", role="descriptor")
    assert sc.data.input_pc_num == 5000 and sc.detector.node_knn_k == 4
    with pytest.raises(ValueError):
        get_config("kitti", role="nope")
