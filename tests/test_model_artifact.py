"""AOT model artifacts (jax.export/StableHLO, weights baked in): export,
deserialize, numerical parity with the live jitted forward, and the
checkpoint-free serving runner. The reference has no deployment-export analog;
this is this framework's TorchScript/ONNX equivalent."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from usip_tpu.config import get_config
from usip_tpu.model_artifact import (export_descriptor_artifact,
                                     export_detector_artifact, load_artifact,
                                     run_detector_artifact)
from usip_tpu.train.checkpoint import save_checkpoint
from usip_tpu.train.descriptor_loop import init_descriptor_state
from usip_tpu.train.loop import init_detector_state
from usip_tpu.train.steps import make_detector_infer


def _tiny_cfg():
    return get_config(
        "modelnet",
        **{"data.input_pc_num": 128, "data.node_num": 16,
           "detector.c1": 16, "detector.c2": 32, "detector.node_knn_k": 4,
           "descriptor.descriptor_len": 16, "descriptor.ball_nsamples": 8,
           # fp32 compute: the exported StableHLO and the live jit may fuse
           # differently, and bf16 re-rounding of differently-fused
           # intermediates shows up as ~1e-3 output deltas (selection indices
           # themselves round-trip bit-identically — verified for ball_query
           # and jax.random). fp32 keeps parity at fp-noise level.
           "detector.compute_dtype": "float32",
           "descriptor.compute_dtype": "float32",
           "descriptor.surface_normal_len": 3})


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("artifacts")
    cfg = _tiny_cfg()
    model, det_state = init_detector_state(cfg, 0)
    det_ckpt = str(tmp / "det.msgpack")
    save_checkpoint(det_ckpt, det_state)
    _, desc_state = init_descriptor_state(cfg, 1)
    desc_ckpt = str(tmp / "desc.msgpack")
    save_checkpoint(desc_ckpt, desc_state)

    det_path = str(tmp / "det.usipart")
    export_detector_artifact(cfg, det_ckpt, det_path, batch=2,
                             platforms=("cpu",))
    desc_path = str(tmp / "desc.usipart")
    export_descriptor_artifact(cfg, desc_ckpt, desc_path, batch=2,
                               num_keypoints=12, platforms=("cpu",))
    return cfg, model, det_state, desc_state, det_path, desc_path, tmp


def test_detector_artifact_parity(artifacts):
    cfg, model, det_state, _, det_path, _, _ = artifacts
    art = load_artifact(det_path)
    assert art.header["kind"] == "detector"
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
    sn = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
    key = jax.random.PRNGKey(7)
    kp_a, sig_a = art(pc, sn, key)
    kp_d, sig_d = jax.jit(make_detector_infer(cfg, model))(det_state, pc, sn,
                                                           key)
    np.testing.assert_allclose(np.asarray(kp_a), np.asarray(kp_d), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sig_a), np.asarray(sig_d), atol=1e-4)


def test_descriptor_artifact_parity(artifacts):
    cfg, _, _, desc_state, _, desc_path, _ = artifacts
    from usip_tpu.models.descriptor import Descriptor
    art = load_artifact(desc_path)
    assert art.header["descriptor_len"] == 16
    rng = np.random.default_rng(1)
    pc = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
    sn = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
    kp = pc[:, :12]
    key = jax.random.PRNGKey(3)
    d_a = art(pc, sn, kp, key)
    desc_model = Descriptor(cfg.descriptor)
    d_d, _ = desc_model.apply(desc_state.variables, pc, sn, kp, key=key,
                              train=False)
    np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_d), atol=1e-4)


def test_bad_magic_rejected(tmp_path):
    p = str(tmp_path / "junk.usipart")
    with open(p, "wb") as f:
        f.write(b"NOTMAGIC" + b"\x00" * 32)
    with pytest.raises(ValueError, match="bad magic"):
        load_artifact(p)


def test_run_detector_artifact_ragged(artifacts, tmp_path):
    _, _, _, _, det_path, desc_path, _ = artifacts
    rng = np.random.default_rng(2)
    paths = []
    for i in range(5):  # 5 clouds at batch 2 -> ragged last chunk
        p = str(tmp_path / f"c{i}.npy")
        np.save(p, rng.normal(size=(200, 6)).astype(np.float32))
        paths.append(p)
    out = str(tmp_path / "served")
    stats = run_detector_artifact(det_path, paths, out, num_keypoints=12,
                                  desc_artifact_path=desc_path)
    assert stats["clouds"] == 5
    for i in range(5):
        kp = np.fromfile(os.path.join(out, f"c{i}.keypoints.bin"), np.float32)
        assert kp.size == 12 * 3
        d = np.fromfile(os.path.join(out, f"c{i}.desc.bin"), np.float32)
        assert d.size == 12 * 16


def test_pipeline_artifact_end_to_end(artifacts, tmp_path):
    cfg, _, _, _, _, _, art_tmp = artifacts
    from usip_tpu.model_artifact import export_pipeline_artifact
    pipe_path = str(tmp_path / "pipe.usipart")
    hdr = export_pipeline_artifact(cfg, str(art_tmp / "det.msgpack"),
                                   str(art_tmp / "desc.msgpack"), pipe_path,
                                   batch=2, platforms=("cpu",))
    assert hdr["kind"] == "pipeline" and hdr["descriptor_len"] == 16
    rng = np.random.default_rng(4)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"c{i}.npy")
        np.save(p, rng.normal(size=(150, 6)).astype(np.float32))
        paths.append(p)
    out = str(tmp_path / "served")
    stats = run_detector_artifact(pipe_path, paths, out, num_keypoints=10)
    assert stats["clouds"] == 3
    for i in range(3):
        kp = np.fromfile(os.path.join(out, f"c{i}.keypoints.bin"),
                         np.float32).reshape(-1, 3)
        d = np.fromfile(os.path.join(out, f"c{i}.desc.bin"),
                        np.float32).reshape(-1, 16)
        # paired rows, selected from the model's 16 proposals without padding
        assert kp.shape[0] == d.shape[0] == 10
    with pytest.raises(ValueError, match="already embeds"):
        run_detector_artifact(pipe_path, paths, out,
                              desc_artifact_path=pipe_path)


def test_select_keypoint_indices_pairs_rows():
    from usip_tpu.eval.export import select_keypoint_indices, select_keypoints
    rng = np.random.default_rng(0)
    kp = rng.normal(size=(40, 3)).astype(np.float32)
    sig = rng.uniform(0.1, 1.0, size=40).astype(np.float32)
    idx = select_keypoint_indices(kp, sig, nms_radius=0.5, desired_num=8)
    assert idx.shape[0] <= 8 and np.unique(idx).size == idx.size
    # sigma-ascending order, and identical to the point-returning selection
    assert np.all(np.diff(sig[idx]) >= 0)
    kp_pts = select_keypoints(kp, sig, kp, nms_radius=0.5, desired_num=8)
    np.testing.assert_array_equal(kp[idx], kp_pts[:idx.shape[0]])


@pytest.mark.parametrize("grouping", ["knn", "ball"])
def test_grouped_detector_artifact(grouping, tmp_path):
    # the released reference checkpoints are the grouped family — their
    # two-stage top-k selection paths must export portably too
    cfg = _tiny_cfg().with_overrides(**{
        "detector.grouping": grouping, "detector.group_k": 8,
        "detector.group_radius": 2.0})
    model, state = init_detector_state(cfg, 0)
    ckpt = str(tmp_path / "det.msgpack")
    save_checkpoint(ckpt, state)
    path = str(tmp_path / f"{grouping}.usipart")
    export_detector_artifact(cfg, ckpt, path, batch=2, platforms=("cpu",))
    art = load_artifact(path)
    rng = np.random.default_rng(5)
    pc = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
    sn = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
    key = jax.random.PRNGKey(11)
    kp_a, sig_a = art(pc, sn, key)
    kp_d, sig_d = jax.jit(make_detector_infer(cfg, model))(state, pc, sn, key)
    np.testing.assert_allclose(np.asarray(kp_a), np.asarray(kp_d), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sig_a), np.asarray(sig_d), atol=1e-4)


def test_force_xla_fps_suppresses_mosaic_dispatch():
    # artifacts must never embed Mosaic custom calls (not portable across
    # the platform list); the export path wraps tracing in force_xla_fps
    from usip_tpu.ops.sampling import _use_pallas_fps, force_xla_fps
    pts = jnp.zeros((2, 256, 3), jnp.float32)
    assert _use_pallas_fps("pallas", pts, 8) is True
    with force_xla_fps():
        assert _use_pallas_fps("pallas", pts, 8) is False
        assert _use_pallas_fps("auto", pts, 8) is False
    assert _use_pallas_fps("pallas", pts, 8) is True


def test_tpu_only_artifact_keeps_mosaic_fps(artifacts, tmp_path):
    # platforms=("tpu",) is the fast serving form: the Mosaic fps_pallas
    # kernel stays in the program (jax.export custom_call safety check
    # waived), instead of being demoted to the portable XLA FPS. Lowering is
    # cross-platform, so this exports fine from the CPU test process; we
    # verify the embedded tpu_custom_call without executing it.
    cfg, _, _, _, _, _, art_tmp = artifacts
    path = str(tmp_path / "det_tpu.usipart")
    hdr = export_detector_artifact(cfg, str(art_tmp / "det.msgpack"), path,
                                   batch=2, platforms=("tpu",))
    assert hdr["platforms"] == ["tpu"]
    from usip_tpu.model_artifact import _read
    header, blob = _read(path)
    assert b"tpu_custom_call" in blob
    # while the portable artifact must NOT contain it
    cpu_path = str(tmp_path / "det_cpu.usipart")
    export_detector_artifact(cfg, str(art_tmp / "det.msgpack"), cpu_path,
                             batch=2, platforms=("cpu",))
    _, cpu_blob = _read(cpu_path)
    assert b"tpu_custom_call" not in cpu_blob


def test_run_detector_artifact_contract_errors(artifacts, tmp_path):
    _, _, _, _, det_path, desc_path, _ = artifacts
    p = str(tmp_path / "c.npy")
    np.save(p, np.zeros((64, 6), np.float32))
    with pytest.raises(ValueError, match="expected a detector"):
        run_detector_artifact(desc_path, [p], str(tmp_path / "x"))
    with pytest.raises(ValueError, match="exported for 12 keypoints"):
        run_detector_artifact(det_path, [p], str(tmp_path / "y"),
                              num_keypoints=8, desc_artifact_path=desc_path)
