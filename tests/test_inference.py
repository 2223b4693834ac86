"""Inference-pipeline tests: arbitrary-size numpy clouds in, keypoints out."""

import numpy as np

from usip_tpu.config import get_config
from usip_tpu.inference import KeypointPipeline
from usip_tpu.train.checkpoint import save_checkpoint
from usip_tpu.train.descriptor_loop import init_descriptor_state
from usip_tpu.train.loop import init_detector_state


def _cfg():
    return get_config(
        "modelnet",
        **{"data.input_pc_num": 128, "data.node_num": 16,
           "detector.c1": 16, "detector.c2": 32, "detector.node_knn_k": 4,
           "descriptor.descriptor_len": 16, "descriptor.ball_nsamples": 8,
           "descriptor.ball_radius": 0.6, "descriptor.surface_normal_len": 3})


def test_pipeline_detect_various_sizes(tmp_path, rng):
    cfg = _cfg()
    _, state = init_detector_state(cfg, 0)
    ckpt = str(tmp_path / "det.msgpack")
    save_checkpoint(ckpt, state)
    pipe = KeypointPipeline(cfg, ckpt)
    for n in (80, 128, 500):  # shorter, exact, longer than the compiled shape
        pc = rng.normal(size=(n, 3)).astype(np.float32)
        kp, sig = pipe.detect(pc, num_keypoints=8)
        assert kp.shape == (8, 3)
        assert np.isfinite(kp).all()
    # without selection: all proposals sorted by sigma
    kp, sig = pipe.detect(rng.normal(size=(200, 3)).astype(np.float32))
    assert kp.shape == (cfg.data.node_num, 3)
    assert (np.diff(sig) >= 0).all()


def test_pipeline_detect_and_describe(tmp_path, rng):
    cfg = _cfg()
    _, det_state = init_detector_state(cfg, 0)
    det_ckpt = str(tmp_path / "det.msgpack")
    save_checkpoint(det_ckpt, det_state)
    _, desc_state = init_descriptor_state(cfg, 1)
    desc_ckpt = str(tmp_path / "desc.msgpack")
    save_checkpoint(desc_ckpt, desc_state)
    pipe = KeypointPipeline(cfg, det_ckpt, desc_ckpt)
    pc = rng.normal(size=(300, 3)).astype(np.float32)
    sn = rng.normal(size=(300, 3)).astype(np.float32)
    kp, desc = pipe.detect_and_describe(pc, sn, num_keypoints=8)
    assert kp.shape == (8, 3)
    assert desc.shape == (8, cfg.descriptor.descriptor_len)
    np.testing.assert_allclose(np.linalg.norm(desc, axis=1), 1.0, atol=1e-2)
