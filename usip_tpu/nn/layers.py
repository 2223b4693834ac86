"""NN building blocks (flax.linen), channels-last.

Re-designs the reference's block zoo (models/layers.py) for TPU:
  * every "1x1 conv" (``EquivariantLayer``/``MyConv2d``) is a Dense matmul over the
    trailing channel axis — identical math, MXU-shaped,
  * batch norm takes its momentum as a *call argument* so the reference's
    epoch-decayed momentum schedule (models/layers.py:61-66) works inside one jitted
    train step (no recompiles),
  * weight init matches the reference: He-normal ``N(0, sqrt(2/fan_in))`` with zero
    bias (models/layers.py:278-287).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

HE_NORMAL = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def activation_fn(name: Optional[str]):
    """Activation zoo of the reference (models/layers.py:264-273)."""
    if name is None:
        return lambda x: x
    if name == "relu":
        return jax.nn.relu
    if name == "elu":
        return jax.nn.elu
    if name == "swish":
        # the reference's normalized swish (models/layers.py:15-20)
        return lambda x: 1.78718727865 * (x * jax.nn.sigmoid(x) - 0.20662096414)
    if name == "leakyrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.01)
    if name == "selu":
        return jax.nn.selu
    raise ValueError(f"unknown activation {name!r}")


def bn_momentum_schedule(base: float, epoch: Optional[Array],
                         decay_step: Optional[int], decay: float) -> Array:
    """Epoch-decayed BN momentum, clamped at 0.01 (models/layers.py:61-66).

    ``epoch`` may be a traced scalar; returns a scalar momentum usable inside jit.
    """
    m = jnp.asarray(base, jnp.float32)
    if epoch is None or decay_step is None or decay_step <= 0:
        return m
    epoch = jnp.asarray(epoch, jnp.float32)
    decayed = base * jnp.power(jnp.asarray(decay, jnp.float32),
                               jnp.floor(epoch / decay_step))
    decayed = jnp.maximum(decayed, 0.01)
    # reference only applies decay from epoch >= 1
    return jnp.where(epoch >= 1, decayed, m)


class BatchNorm(nn.Module):
    """Torch-semantics batch norm over the trailing channel axis.

    Differences from ``flax.linen.BatchNorm`` that matter for parity:
      * momentum is a call argument (traced), enabling the epoch-decay schedule,
      * torch convention ``running = (1 - m) * running + m * batch`` with the
        *unbiased* batch variance feeding the running stats and the *biased* one
        normalizing the activations (torch F.batch_norm semantics).
    """

    features: int
    eps: float = 1e-5
    # mesh axis (or tuple of axes) to psum batch statistics over (point- and/or
    # data-sharded training): stats become global, matching single-device math
    axis_name: "Optional[str | tuple]" = None

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool,
                 momentum: Array | float = 0.1) -> Array:
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            x32 = x.astype(jnp.float32)
            count = x.size // self.features
            if self.axis_name is not None:
                total = jax.lax.psum(jnp.asarray(count, jnp.float32),
                                     self.axis_name)
                mean = jax.lax.psum(jnp.sum(x32, axis=reduce_axes),
                                    self.axis_name) / total
                sq = jax.lax.psum(jnp.sum(jnp.square(x32), axis=reduce_axes),
                                  self.axis_name) / total
                # clamp: E[x^2]-E[x]^2 can go negative by fp32 cancellation on
                # near-constant channels (flax clamps the same way)
                var = jnp.maximum(sq - jnp.square(mean), 0.0)
                unbiased = var * (total / jnp.maximum(total - 1, 1))
            else:
                mean = jnp.mean(x32, axis=reduce_axes)
                var = jnp.maximum(
                    jnp.mean(jnp.square(x32), axis=reduce_axes)
                    - jnp.square(mean), 0.0)
                unbiased = var * (count / max(count - 1, 1))
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class _SplitDense(nn.Module):
    """Dense over a *virtual concatenation* of parts without materializing it:
    the kernel is split at the concat boundaries and each part gets its own
    matmul, summed with broadcasting. A part with a singleton spatial axis
    (e.g. a per-group max (B, M, 1, C) next to features (B, M, K, C)) is thus
    multiplied ONCE instead of K times, and the (B, M, K, sum C) concat tensor
    never hits HBM. Parameter names/shapes/init are identical to ``nn.Dense``
    on the concatenation, so checkpoints and the torch importer see no
    difference (kernel row order == concat channel order)."""

    features: int
    splits: Sequence[int]
    kernel_init: nn.initializers.Initializer = HE_NORMAL
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, parts) -> Array:
        cin = sum(self.splits)
        kernel = self.param("kernel", self.kernel_init,
                            (cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        dt = self.dtype or jnp.float32
        off = 0
        total = None
        for p, w in zip(parts, self.splits):
            y = p.astype(dt) @ kernel[off:off + w].astype(dt)
            total = y if total is None else total + y
            off += w
        return total + bias.astype(dt)


class PointwiseLayer(nn.Module):
    """Dense + optional norm + optional activation over the channel axis.

    The TPU-native form of ``EquivariantLayer`` (models/layers.py:248-303) and
    ``MyConv2d`` with 1x1 kernels (models/layers.py:172-216): operating channels-last,
    a 1x1 conv over (B, C, N) or (B, C, M, K) is exactly a Dense on (..., C).

    ``x`` may be a tuple of parts, which is treated as their channel-axis
    concatenation but computed via ``_SplitDense`` (split kernel, broadcasting
    partial matmuls) — the fusion-stage layout lever (PERFORMANCE.md
    round-3 MFU section). Same parameter tree either way.
    """

    features: int
    activation: Optional[str] = "relu"
    normalization: Optional[str] = "batch"
    kernel_init: nn.initializers.Initializer = HE_NORMAL
    # matmul compute dtype (params stay fp32); bf16 rides the MXU at full rate
    dtype: Optional[jnp.dtype] = None
    # mesh axis for cross-shard batch statistics (point-sharded training)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False,
                 bn_momentum: Array | float = 0.1) -> Array:
        if isinstance(x, (tuple, list)):
            y = _SplitDense(self.features,
                            tuple(int(p.shape[-1]) for p in x),
                            kernel_init=self.kernel_init, dtype=self.dtype,
                            name="dense")(x)
        else:
            y = nn.Dense(self.features, kernel_init=self.kernel_init,
                         bias_init=nn.initializers.zeros, dtype=self.dtype,
                         param_dtype=jnp.float32, name="dense")(x)
        if self.normalization == "batch":
            y = BatchNorm(self.features, axis_name=self.axis_name,
                          name="norm")(
                y, use_running_average=not train, momentum=bn_momentum)
        elif self.normalization == "instance":
            # stats per (batch, channel) over spatial axes; affine like the reference
            reduce_axes = tuple(range(1, y.ndim - 1))
            mu = jnp.mean(y, axis=reduce_axes, keepdims=True)
            var = jnp.var(y, axis=reduce_axes, keepdims=True)
            g = self.param("in_scale", nn.initializers.ones, (self.features,))
            b = self.param("in_bias", nn.initializers.zeros, (self.features,))
            y = (y - mu) * jax.lax.rsqrt(var + 1e-5) * g + b
        elif self.normalization is not None:
            raise ValueError(f"unknown normalization {self.normalization!r}")
        return activation_fn(self.activation)(y)


class SharedMLP(nn.Module):
    """Stack of PointwiseLayers; the last layer is linear (no norm/act), matching
    ``PointNet`` (models/layers.py:524-544)."""

    features: Sequence[int]
    activation: Optional[str] = "relu"
    normalization: Optional[str] = "batch"
    last_linear: bool = True
    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False,
                 bn_momentum: Array | float = 0.1) -> Array:
        n = len(self.features)
        for i, c in enumerate(self.features):
            last = self.last_linear and i == n - 1
            x = PointwiseLayer(
                c,
                activation=None if last else self.activation,
                normalization=None if last else self.normalization,
                dtype=self.dtype,
                axis_name=self.axis_name,
                name=f"layer{i}",
            )(x, train=train, bn_momentum=bn_momentum)
        return x


class PointResNet(nn.Module):
    """Skip-connected shared-MLP stack (models/layers.py:547-589): layer 0's
    output is concatenated onto the input of the LAST layer, which is linear
    (no norm/act). Channels-last on (..., N, C). Inventory-parity block — no
    released reference config instantiates it, matching the reference where
    it is equally dead code."""

    features: Sequence[int]
    activation: Optional[str] = "relu"
    normalization: Optional[str] = "batch"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False,
                 bn_momentum: Array | float = 0.1) -> Array:
        k = len(self.features)
        assert k >= 2, "PointResNet needs at least 2 layers"
        h0 = PointwiseLayer(self.features[0], activation=self.activation,
                            normalization=self.normalization, dtype=self.dtype,
                            name="layer0")(x, train, bn_momentum)
        h = h0
        for i in range(1, k - 1):
            h = PointwiseLayer(self.features[i], activation=self.activation,
                               normalization=self.normalization,
                               dtype=self.dtype,
                               name=f"layer{i}")(h, train, bn_momentum)
        # final layer: linear, over concat(layer0, previous) — the split-
        # kernel form computes it without materializing the concat
        return PointwiseLayer(self.features[-1], activation=None,
                              normalization=None, dtype=self.dtype,
                              name=f"layer{k - 1}")((h0, h), train,
                                                    bn_momentum)


class KNNGroupModule(nn.Module):
    """kNN-neighborhood feature module (reference ``KNNModule``,
    models/layers.py:306-372): kNN over coordinates (or precomputed indices),
    gather + decentre by the neighborhood 'center'/'avg', MLP stack, max over
    K. Returns (centers (..., M, 3), features (..., M, C)). Channels-last;
    inventory-parity block (dead in every released reference config)."""

    features: Sequence[int]
    k: int
    center_type: str = "center"  # 'center' | 'avg' (layers.py:352-356)
    activation: Optional[str] = "relu"
    normalization: Optional[str] = "batch"
    dtype: Optional[jnp.dtype] = None

    def _group(self, coordinate, x, knn_idx):
        from usip_tpu.ops import gather_points, knn
        if knn_idx is None:
            _, knn_idx = knn(jax.lax.stop_gradient(coordinate),
                             jax.lax.stop_gradient(coordinate), self.k)
        else:
            knn_idx = knn_idx[..., :self.k]
        neighbors = gather_points(coordinate, knn_idx)       # (B, M, K, 3)
        if self.center_type == "avg":
            center = jnp.mean(neighbors, axis=-2, keepdims=True)
        elif self.center_type == "center":
            center = coordinate[..., :, None, :]
        else:
            raise ValueError(f"unknown center_type {self.center_type!r}")
        decentered = jax.lax.stop_gradient(neighbors - center)
        feats = gather_points(x, knn_idx)                    # (B, M, K, C)
        h = jnp.concatenate([decentered, feats], axis=-1)
        return jax.lax.stop_gradient(center[..., 0, :]), h

    @nn.compact
    def __call__(self, coordinate: Array, x: Array, train: bool = False,
                 bn_momentum: Array | float = 0.1,
                 knn_idx: Optional[Array] = None):
        center, h = self._group(coordinate, x, knn_idx)
        for i, c in enumerate(self.features):
            h = PointwiseLayer(c, activation=self.activation,
                               normalization=self.normalization,
                               dtype=self.dtype,
                               name=f"layer{i}")(h, train, bn_momentum)
        return center, jnp.max(h, axis=-2)


class KNNFusionGroupModule(KNNGroupModule):
    """``KNNFusionModule`` (models/layers.py:443-521): KNNGroupModule with a
    mid max-fusion — pre-MLPs, per-neighborhood max, concat [max, features],
    post-MLPs, final max. Inventory-parity block (dead in released configs;
    the live fusion used by the detectors is ``GeneralKNNFusionModule`` ->
    models/detector.py KNNFusionOnNodes)."""

    features_after: Sequence[int] = ()

    @nn.compact
    def __call__(self, coordinate: Array, x: Array, train: bool = False,
                 bn_momentum: Array | float = 0.1,
                 knn_idx: Optional[Array] = None):
        center, h = self._group(coordinate, x, knn_idx)
        for i, c in enumerate(self.features):
            h = PointwiseLayer(c, activation=self.activation,
                               normalization=self.normalization,
                               dtype=self.dtype,
                               name=f"before{i}")(h, train, bn_momentum)
        h_max = jnp.max(h, axis=-2, keepdims=True)
        y = (h_max, h)  # virtual concat [max, h] (layers.py:516)
        if not self.features_after:
            # no post-MLPs: the K-max of the channel-concat is the concat of
            # the per-piece K-maxes (h_max is K-constant)
            return center, jnp.concatenate(
                [h_max[..., 0, :], jnp.max(h, axis=-2)], axis=-1)
        for i, c in enumerate(self.features_after):
            y = PointwiseLayer(c, activation=self.activation,
                               normalization=self.normalization,
                               dtype=self.dtype,
                               name=f"after{i}")(y, train, bn_momentum)
        return center, jnp.max(y, axis=-2)


class UpConv(nn.Module):
    """2x nearest-neighbor upsample + 3x3 same-padded conv (models/
    layers.py:219-245) — the reference's image-domain decoder block, NHWC.
    Fan-out normal init N(0, sqrt(2/(k*k*out))) with 0.001 bias
    (layers.py:230-236). Inventory-parity block (unused by USIP's released
    pipelines)."""

    features: int
    activation: Optional[str] = None
    normalization: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False,
                 bn_momentum: Array | float = 0.1) -> Array:
        b, h, w, c = x.shape
        up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        fan_out_init = nn.initializers.normal(
            stddev=float(np.sqrt(2.0 / (9 * self.features))))
        y = nn.Conv(self.features, (3, 3), padding="SAME",
                    kernel_init=fan_out_init,
                    bias_init=nn.initializers.constant(0.001),
                    name="conv")(up)
        if self.normalization == "batch":
            y = BatchNorm(self.features, name="norm")(
                y, use_running_average=not train, momentum=bn_momentum)
        return activation_fn(self.activation)(y)


class PointNetFusion(nn.Module):
    """pre-MLP -> global max -> concat -> post-MLP (models/layers.py:592-631).

    Operates on (..., N, C); the max is over the N axis (axis=-2).
    """

    features_before: Sequence[int]
    features_after: Sequence[int]
    activation: Optional[str] = "relu"
    normalization: Optional[str] = "batch"

    @nn.compact
    def __call__(self, x: Array, train: bool = False,
                 bn_momentum: Array | float = 0.1) -> Array:
        for i, c in enumerate(self.features_before):
            x = PointwiseLayer(c, activation=self.activation,
                               normalization=self.normalization,
                               name=f"before{i}")(x, train, bn_momentum)
        x_max = jnp.max(x, axis=-2, keepdims=True)
        y = jnp.concatenate([x, jnp.broadcast_to(x_max, x.shape)], axis=-1)
        n = len(self.features_after)
        for i, c in enumerate(self.features_after):
            last = i == n - 1
            y = PointwiseLayer(c, activation=None if last else self.activation,
                               normalization=None if last else self.normalization,
                               name=f"after{i}")(y, train, bn_momentum)
        return y
