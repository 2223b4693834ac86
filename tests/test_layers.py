"""Tests for NN building blocks: torch-semantics batch norm, momentum schedule,
shared MLP init/shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from usip_tpu.nn import (BatchNorm, PointwiseLayer, SharedMLP, activation_fn,
                         bn_momentum_schedule)


def test_batchnorm_normalizes_and_updates_running_stats(rng):
    x = rng.normal(loc=3.0, scale=2.0, size=(4, 10, 8)).astype(np.float32)
    bn = BatchNorm(8)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        use_running_average=False)
    y, mutated = bn.apply(variables, jnp.asarray(x), use_running_average=False,
                          momentum=0.1, mutable=["batch_stats"])
    y = np.asarray(y)
    # normalized output: ~0 mean, ~1 var per channel
    np.testing.assert_allclose(y.reshape(-1, 8).mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.reshape(-1, 8).var(0), 1.0, atol=1e-3)
    # torch running-stat update: (1-m)*run + m*batch (unbiased var)
    batch_mean = x.reshape(-1, 8).mean(0)
    batch_var_unbiased = x.reshape(-1, 8).var(0, ddof=1)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["mean"]),
                               0.9 * 0.0 + 0.1 * batch_mean, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["var"]),
                               0.9 * 1.0 + 0.1 * batch_var_unbiased, rtol=1e-4)


def test_batchnorm_eval_uses_running_stats(rng):
    x = rng.normal(size=(2, 5, 4)).astype(np.float32)
    bn = BatchNorm(4)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        use_running_average=False)
    stats = {"batch_stats": {"mean": jnp.full((4,), 2.0), "var": jnp.full((4,), 4.0)},
             "params": variables["params"]}
    y = bn.apply(stats, jnp.asarray(x), use_running_average=True)
    np.testing.assert_allclose(np.asarray(y), (x - 2.0) / np.sqrt(4.0 + 1e-5),
                               rtol=1e-5)


def test_bn_momentum_schedule_matches_reference():
    """models/layers.py:61-66: m = m0 * decay**(epoch//step), clamped at 0.01,
    applied only from epoch >= 1."""
    f = lambda e: float(bn_momentum_schedule(0.1, jnp.asarray(e), 20, 0.6))
    assert np.isclose(f(0), 0.1)
    assert np.isclose(f(1), 0.1)         # floor(1/20) == 0
    assert np.isclose(f(20), 0.1 * 0.6)
    assert np.isclose(f(45), 0.1 * 0.6 ** 2)
    assert np.isclose(f(1000), 0.01)     # clamp
    assert np.isclose(float(bn_momentum_schedule(0.1, jnp.asarray(50), None, 0.6)),
                      0.1)


def test_swish_matches_reference_formula(rng):
    x = rng.normal(size=(7,)).astype(np.float32)
    got = np.asarray(activation_fn("swish")(jnp.asarray(x)))
    sig = 1.0 / (1.0 + np.exp(-x))
    ref = 1.78718727865 * (x * sig - 0.20662096414)
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_pointwise_layer_init_statistics():
    """He-normal N(0, sqrt(2/fan_in)) kernel, zero bias (models/layers.py:278-287)."""
    layer = PointwiseLayer(256, activation="relu", normalization=None)
    v = layer.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, 128)))
    k = np.asarray(v["params"]["dense"]["kernel"])
    assert k.shape == (128, 256)
    np.testing.assert_allclose(k.std(), np.sqrt(2.0 / 128), rtol=0.1)
    np.testing.assert_array_equal(np.asarray(v["params"]["dense"]["bias"]), 0.0)


def test_split_dense_matches_materialized_concat(rng):
    """PointwiseLayer on a tuple of parts == PointwiseLayer on their
    channel-axis concatenation: identical parameter tree (dense/kernel of the
    full concat width), identical math up to fp summation order
    (PERFORMANCE.md round-3 MFU lever)."""
    h = jnp.asarray(rng.normal(size=(2, 6, 4, 16)).astype(np.float32))
    h_max = jnp.max(h, axis=-2, keepdims=True)
    layer = PointwiseLayer(24, activation="relu", normalization="batch")

    v_split = layer.init(jax.random.PRNGKey(3), (h_max, h))
    v_cat = layer.init(jax.random.PRNGKey(3), jnp.concatenate(
        [jnp.broadcast_to(h_max, h.shape), h], axis=-1))
    # same tree, same shapes, same init
    np.testing.assert_array_equal(
        np.asarray(v_split["params"]["dense"]["kernel"]),
        np.asarray(v_cat["params"]["dense"]["kernel"]))
    assert v_split["params"]["dense"]["kernel"].shape == (32, 24)

    y_split = layer.apply(v_split, (h_max, h))
    y_cat = layer.apply(v_split, jnp.concatenate(
        [jnp.broadcast_to(h_max, h.shape), h], axis=-1))
    np.testing.assert_allclose(np.asarray(y_split), np.asarray(y_cat),
                               atol=1e-5)
    # train mode: BN stats must see the same activations
    y_s, var_s = layer.apply(v_split, (h_max, h), True, 0.5,
                             mutable=["batch_stats"])
    y_c, var_c = layer.apply(v_split, jnp.concatenate(
        [jnp.broadcast_to(h_max, h.shape), h], axis=-1), True, 0.5,
        mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(var_s["batch_stats"]["norm"]["mean"]),
        np.asarray(var_c["batch_stats"]["norm"]["mean"]), atol=1e-6)


def test_shared_mlp_last_layer_linear(rng):
    """PointNet's last layer has no norm/activation (models/layers.py:530-535):
    outputs can be negative."""
    mlp = SharedMLP((8, 8), activation="relu", normalization="batch")
    x = jnp.asarray(rng.normal(size=(2, 16, 4)).astype(np.float32))
    v = mlp.init(jax.random.PRNGKey(0), x, train=False)
    y = np.asarray(mlp.apply(v, x, train=False))
    assert (y < 0).any()
    assert y.shape == (2, 16, 8)


def test_point_resnet_skip_and_linear_tail(rng):
    """PointResNet (models/layers.py:547-589): layer0's output feeds the last
    layer's concat input; the last layer is linear."""
    from usip_tpu.nn import PointResNet

    net = PointResNet((8, 8, 8, 6), activation="relu", normalization="batch")
    x = jnp.asarray(rng.normal(size=(2, 16, 4)).astype(np.float32))
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    # last layer's kernel input width = layer0_out + previous = 8 + 8
    assert v["params"]["layer3"]["dense"]["kernel"].shape == (16, 6)
    assert "norm" not in v["params"]["layer3"]  # linear tail
    y = np.asarray(net.apply(v, x, train=False))
    assert y.shape == (2, 16, 6)
    assert (y < 0).any()


def test_knn_group_modules(rng):
    """KNNModule/KNNFusionModule (models/layers.py:306-372,443-521): center
    types, shapes, and the precomputed-index path."""
    from usip_tpu.nn import KNNFusionGroupModule, KNNGroupModule

    coord = jnp.asarray(rng.normal(size=(2, 24, 3)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 24, 5)).astype(np.float32))

    mod = KNNGroupModule((8, 8), k=4, center_type="center",
                         normalization=None)
    v = mod.init(jax.random.PRNGKey(0), coord, x)
    center, feat = mod.apply(v, coord, x)
    assert center.shape == (2, 24, 3) and feat.shape == (2, 24, 8)
    np.testing.assert_allclose(np.asarray(center), np.asarray(coord))

    avg = KNNGroupModule((8,), k=4, center_type="avg", normalization=None)
    v2 = avg.init(jax.random.PRNGKey(0), coord, x)
    center2, _ = avg.apply(v2, coord, x)
    assert not np.allclose(np.asarray(center2), np.asarray(coord))

    # precomputed indices (first column = self) reproduce the self-knn result
    from usip_tpu.ops import knn
    _, idx = knn(coord, coord, 6)
    c3, f3 = mod.apply(v, coord, x, knn_idx=idx)
    _, f_self = mod.apply(v, coord, x)
    np.testing.assert_allclose(np.asarray(f3), np.asarray(f_self), atol=1e-6)

    fus = KNNFusionGroupModule((8, 8), k=4, features_after=(12,),
                               normalization=None)
    vf = fus.init(jax.random.PRNGKey(1), coord, x)
    _, ff = fus.apply(vf, coord, x)
    assert ff.shape == (2, 24, 12)
    # after0 consumes the [max, h] virtual concat -> kernel width 2*8
    assert vf["params"]["after0"]["dense"]["kernel"].shape == (16, 12)

    # default features_after=(): output is the materialized K-max of the
    # virtual concat, i.e. [max(h), max(h)] doubled channels
    fus0 = KNNFusionGroupModule((8, 8), k=4, normalization=None)
    vf0 = fus0.init(jax.random.PRNGKey(2), coord, x)
    _, ff0 = fus0.apply(vf0, coord, x)
    assert ff0.shape == (2, 24, 16)
    np.testing.assert_allclose(np.asarray(ff0[..., :8]),
                               np.asarray(ff0[..., 8:]), atol=1e-6)


def test_upconv_doubles_spatial(rng):
    """UpConv (models/layers.py:219-245): 2x nearest upsample + 3x3 SAME conv,
    bias init 0.001."""
    from usip_tpu.nn import UpConv

    net = UpConv(6, activation="relu", normalization="batch")
    x = jnp.asarray(rng.normal(size=(2, 5, 7, 3)).astype(np.float32))
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    y = np.asarray(net.apply(v, x, train=False))
    assert y.shape == (2, 10, 14, 6)
    np.testing.assert_allclose(
        np.asarray(v["params"]["conv"]["bias"]), 0.001)
