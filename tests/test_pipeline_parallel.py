"""Stage-placed detect -> describe pipeline vs the single-device path."""

import jax
import jax.numpy as jnp
import numpy as np

from usip_tpu.config import get_config
from usip_tpu.models import Descriptor, Detector
from usip_tpu.parallel.pipeline_parallel import pipeline_detect_describe


def _cfg():
    return get_config(
        "modelnet",
        **{"data.input_pc_num": 128, "data.node_num": 16,
           "detector.c1": 16, "detector.c2": 32, "detector.node_knn_k": 4,
           "detector.compute_dtype": "float32",
           "descriptor.descriptor_len": 16, "descriptor.ball_nsamples": 8,
           "descriptor.ball_radius": 1.5,
           "descriptor.compute_dtype": "float32",
           "descriptor.ball_method": "exact",
           "descriptor.ball_compute_dtype": "float32"})


def test_pipeline_matches_single_device(rng):
    cfg = _cfg()
    s = cfg.detector.surface_normal_len
    det = Detector(cfg.detector)
    desc = Descriptor(cfg.descriptor)
    mk = lambda *sh: jnp.asarray(rng.normal(size=sh).astype(np.float32))
    pc, sn, node = mk(2, 128, 3), mk(2, 128, s), mk(2, 16, 3)
    det_vars = det.init(jax.random.PRNGKey(0), pc, sn, node, train=False)
    _, kp_ref, sig_ref = det.apply(det_vars, pc, sn, node, train=False)
    desc_vars = desc.init(jax.random.PRNGKey(1), pc, sn, kp_ref,
                          key=jax.random.PRNGKey(2), train=False)

    key = jax.random.PRNGKey(7)
    keys = jax.random.split(key, 2)
    batches = [(pc, sn, node), (pc + 0.1, sn, node)]
    devices = jax.devices()
    assert len(devices) >= 2, "conftest provides 8 virtual devices"
    out = pipeline_detect_describe(cfg, det_vars, desc_vars, batches, key,
                                   devices=(devices[0], devices[1]))
    assert len(out) == 2
    for (pcb, snb, nodeb), (kp, sig, d), kb in zip(batches, out, keys):
        _, kp_r, sig_r = det.apply(det_vars, pcb, snb, nodeb, train=False)
        d_r, _ = desc.apply(desc_vars, pcb, snb, kp_r, key=kb, train=False)
        np.testing.assert_allclose(np.asarray(kp), np.asarray(kp_r), atol=1e-5)
        np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_r),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(d), np.asarray(d_r), atol=1e-5)
        # outputs really live on their stage devices
        assert kp.devices() == {devices[0]}
        assert d.devices() == {devices[1]}
