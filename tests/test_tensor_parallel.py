"""Channel-sharded (tensor-parallel) detector forward vs single device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from usip_tpu.config import get_config
from usip_tpu.models import Detector
from usip_tpu.parallel.tensor_parallel import (make_channel_mesh,
                                               shard_tp_params,
                                               tensor_parallel_detector_forward)


@pytest.fixture(scope="module")
def mesh():
    return make_channel_mesh(8)


def _setup(rng, **overrides):
    cfg = get_config(
        "modelnet",
        **{"data.input_pc_num": 256, "data.node_num": 16,
           "detector.c1": 16, "detector.c2": 32, "detector.node_knn_k": 4,
           "detector.compute_dtype": "float32", **overrides})
    s = cfg.detector.surface_normal_len
    pc = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
    sn = jnp.asarray(rng.normal(size=(2, 256, s)).astype(np.float32))
    node = jnp.asarray(rng.normal(size=(2, 16, 3)).astype(np.float32))
    model = Detector(cfg.detector)
    variables = model.init(jax.random.PRNGKey(0), pc, sn, node, train=False)
    return cfg, model, variables, (pc, sn, node)


def test_tp_forward_matches_single_device(mesh, rng):
    """TP fusion-block/head forward == single-device forward (fp32)."""
    cfg, model, variables, inputs = _setup(rng)
    ref_anchors, ref_kp, ref_sig = model.apply(variables, *inputs, train=False)
    anchors, kp, sig = tensor_parallel_detector_forward(mesh, cfg, variables,
                                                        *inputs)
    np.testing.assert_allclose(np.asarray(anchors), np.asarray(ref_anchors),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(kp), np.asarray(ref_kp), atol=1e-3)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(ref_sig), atol=1e-3)


def test_tp_forward_prepared_params_reused(mesh, rng):
    """Passing pre-sharded (tp, rp) gives identical results — the serving-loop
    form that avoids re-slicing every kernel per call."""
    from usip_tpu.parallel.tensor_parallel import shard_tp_params

    cfg, model, variables, inputs = _setup(rng)
    prepared = shard_tp_params(cfg, variables, mesh.devices.size)
    _, kp0, sig0 = tensor_parallel_detector_forward(mesh, cfg, variables,
                                                    *inputs)
    _, kp1, sig1 = tensor_parallel_detector_forward(mesh, cfg, variables,
                                                    *inputs,
                                                    tp_params=prepared)
    np.testing.assert_array_equal(np.asarray(kp0), np.asarray(kp1))
    np.testing.assert_array_equal(np.asarray(sig0), np.asarray(sig1))


def test_tp_forward_bf16_close(mesh, rng):
    """bf16 compute: approximate parity (partials round before the psum)."""
    cfg, model, variables, inputs = _setup(
        rng, **{"detector.compute_dtype": "bfloat16"})
    _, ref_kp, ref_sig = model.apply(variables, *inputs, train=False)
    _, kp, sig = tensor_parallel_detector_forward(mesh, cfg, variables,
                                                  *inputs)
    np.testing.assert_allclose(np.asarray(kp), np.asarray(ref_kp), atol=0.05)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(ref_sig), atol=0.05)


def test_tp_param_stacks_shard_evenly(mesh, rng):
    """Every TP stack has a leading n_shards dim; col/row slices tile the
    original kernels exactly."""
    cfg, _, variables, _ = _setup(rng)
    d = 8
    tp, rp = shard_tp_params(cfg, variables, d)
    for k, v in tp.items():
        assert v.shape[0] == d, f"{k}: {v.shape}"
    w = variables["params"]["knnlayer"]["before0"]["dense"]["kernel"]
    col = np.asarray(tp["before0_w"])  # (d, Cin, Cout/d)
    np.testing.assert_array_equal(np.concatenate(list(col), axis=1),
                                  np.asarray(w))
    w1 = variables["params"]["knnlayer"]["before1"]["dense"]["kernel"]
    rowed = np.asarray(tp["before1_w"])  # (d, Cin/d, Cout)
    np.testing.assert_array_equal(np.concatenate(list(rowed), axis=0),
                                  np.asarray(w1))
    # row-layer bias/BN stay replicated and full width
    assert rp["before1_b"].shape == (cfg.detector.c2 // 2,)


def test_tp_rejects_indivisible_widths(mesh, rng):
    cfg, _, variables, _ = _setup(rng)
    with pytest.raises(AssertionError, match="not divisible"):
        shard_tp_params(cfg, variables, 3)


# ----------------------------------------------- GSPMD tensor-parallel training --

def _train_setup(rng, batch_size=4):
    from usip_tpu.data.synthetic import SyntheticDataset
    from usip_tpu.train import DetectorBatch, TrainState, make_adam
    cfg = get_config(
        "modelnet",
        **{"data.input_pc_num": 128, "data.node_num": 16,
           "detector.c1": 16, "detector.c2": 32, "detector.node_knn_k": 4,
           "detector.compute_dtype": "float32",
           "train.batch_size": batch_size, "train.lr": 1e-3})
    model = Detector(cfg.detector)
    n, m = cfg.data.input_pc_num, cfg.data.node_num
    s = cfg.detector.surface_normal_len
    dummy = (jnp.zeros((2, n, 3)), jnp.zeros((2, n, s)), jnp.zeros((2, m, 3)))
    variables = model.init(jax.random.PRNGKey(0), *dummy, train=False)
    state = TrainState.create(variables, make_adam(cfg.train.lr))
    ds = SyntheticDataset(size=8, input_pc_num=n, surface_normal_len=s, seed=3)
    raw = ds.batch(np.random.default_rng(0), batch_size)
    batch = DetectorBatch(**{k: jnp.asarray(v) for k, v in raw.items()})
    return cfg, model, state, batch


def test_tp_train_step_matches_replicated(mesh, rng):
    """Train step jitted with channel-sharded param layouts == replicated."""
    from jax.sharding import PartitionSpec as P
    from usip_tpu.parallel.tensor_parallel import (CHANNEL_AXIS,
                                                   shard_state_tp,
                                                   tp_state_sharding)
    from usip_tpu.train import make_detector_train_step

    cfg, model, state, batch = _train_setup(rng)
    key, ep = jax.random.PRNGKey(5), jnp.asarray(0)
    step = jax.jit(make_detector_train_step(cfg, model))
    s1, m1 = step(state, batch, key, ep)

    tstate = shard_state_tp(mesh, state)
    k = tstate.params["knnlayer"]["before0"]["dense"]["kernel"]
    assert k.sharding.spec == P(None, CHANNEL_AXIS)
    assert tstate.params["head"]["mlp3"]["dense"]["kernel"].sharding.spec == P()
    s2, m2 = step(tstate, batch, key, ep)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
    lr = cfg.train.lr
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3 * lr)
    # sharding specs survive the update (stable layout across steps)
    sh = tp_state_sharding(mesh, state)
    k2 = s2.params["knnlayer"]["before0"]["dense"]["kernel"]
    assert k2.sharding.spec == sh.params[
        "knnlayer"]["before0"]["dense"]["kernel"].spec


def test_tp_dp_2d_mesh_train_step(rng):
    """dp x tp: batch sharded on data, wide params on channels, one program."""
    from usip_tpu.parallel.tensor_parallel import (make_dp_tp_mesh,
                                                   shard_state_tp)
    from usip_tpu.parallel import shard_batch
    from usip_tpu.train import DetectorBatch, make_detector_train_step

    cfg, model, state, batch = _train_setup(rng)
    key, ep = jax.random.PRNGKey(5), jnp.asarray(0)
    step = jax.jit(make_detector_train_step(cfg, model))
    s1, m1 = step(state, batch, key, ep)

    mesh2 = make_dp_tp_mesh(2, 4)
    tstate = shard_state_tp(mesh2, state)
    tbatch = DetectorBatch(*shard_batch(mesh2, tuple(batch)))
    s2, m2 = step(tstate, tbatch, key, ep)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
    lr = cfg.train.lr
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3 * lr)
