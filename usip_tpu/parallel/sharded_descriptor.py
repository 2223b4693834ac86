"""Point-sharded descriptor forward: ball grouping over a sharded cloud.

Completes the sequence-parallel story for the serving pipeline: the
descriptor's only O(N) stage is the ball query + feature gather, which
``sharded_ball_gather`` runs over the mesh's ``points`` axis (per-shard
candidate selection + one tiny all_gather). The conv stack then operates on
the replicated (B, M, K, C) ball features exactly like the single-chip
``Descriptor`` — the submodules are re-applied by name with the same
variables, so any trained/imported checkpoint works unchanged.

Inference-path only (the descriptor's ball grouping is under stop_gradient
in training anyway, models/descriptor.py); numerically identical to
``Descriptor.apply`` given the same PRNG key when the ball dtype is fp32
(the bf16 score default resolves priority ties differently — pass
``descriptor.ball_compute_dtype='float32'`` for bit parity) and every ball
is non-empty (empty balls yield zero descriptors here vs the single-chip
model's point-0 fallback — see sharded_ball_gather).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from usip_tpu.config import Config
from usip_tpu.models.descriptor import Descriptor
from usip_tpu.nn.layers import PointwiseLayer
from usip_tpu.ops import safe_sqrt
from usip_tpu.parallel.sharded_ops import sharded_ball_gather

Array = jax.Array


def _apply_layer(cfg, variables, name, x, *, features, activation,
                 normalization, compute_dtype=True, train=False,
                 bn_momentum=0.1, new_stats=None):
    # the model runs its final (un-normalized) layers conv5/fc3 in fp32
    # regardless of compute_dtype (models/descriptor.py:72,88)
    dt = jnp.bfloat16 if (compute_dtype and
                          cfg.descriptor.compute_dtype == "bfloat16") else None
    layer = PointwiseLayer(features, activation=activation,
                           normalization=normalization, dtype=dt)
    sub = {"params": variables["params"][name]}
    has_stats = ("batch_stats" in variables
                 and name in variables["batch_stats"])
    if has_stats:
        sub["batch_stats"] = variables["batch_stats"][name]
    if train and has_stats:
        y, mut = layer.apply(sub, x, True, bn_momentum,
                             mutable=["batch_stats"])
        if new_stats is not None:
            new_stats[name] = mut["batch_stats"]
        return y
    if new_stats is not None and has_stats:
        new_stats[name] = sub["batch_stats"]
    return layer.apply(sub, x, train, bn_momentum)


def sharded_describe(mesh: Mesh, cfg: Config, variables, pc: Array, sn: Array,
                     keypoints: Array, key: Array) -> Tuple[Array, Array]:
    """Descriptor forward with pc/sn sharded over the mesh's ``points`` axis.

    Args:
      variables: (replicated) flax variables of a ``Descriptor``.
      pc (B, N, 3), sn (B, N, S): N must divide the mesh size.
      keypoints (B, M, 3): replicated.
      key: PRNG key for the ball priorities (same key as the single-chip
        call -> same sampling).

    Returns (descriptors (B, M, len), ball feats (B, M, K, 3+S)), replicated.
    """
    dcfg = cfg.descriptor
    d = dcfg.descriptor_len
    b, n, _ = pc.shape
    if dcfg.surface_normal_len > 0:
        x_aug = jnp.concatenate([pc, sn], axis=-1)
    else:
        x_aug = pc
    priority = jax.random.uniform(key, (b, n), dtype=jnp.float32)
    feats, _, _ = sharded_ball_gather(mesh, keypoints, pc, x_aug,
                                      dcfg.ball_radius, dcfg.ball_nsamples,
                                      priority)
    g_xyz = feats[..., 0:3] - keypoints[:, :, None, :]
    ball_feats = jnp.concatenate([g_xyz, feats[..., 3:]], axis=-1)
    desc, _ = describe_from_ball_feats(cfg, variables, ball_feats)
    return desc, ball_feats


def describe_from_ball_feats(cfg: Config, variables, ball_feats: Array,
                             train: bool = False, bn_momentum=0.1
                             ) -> Tuple[Array, dict]:
    """The descriptor conv stack on (replicated, already-decentered) ball
    features ``(B, M, K, 3+S)`` — everything in ``Descriptor.__call__`` after
    the grouping step, re-applied by submodule name with the same variables.

    Train mode runs batch-norm on batch statistics and returns the updated
    ``batch_stats`` as the second element (train=False echoes the input
    stats). Because the ball features are replicated across the mesh (the
    gather's all_gather made them global), BN batch statistics computed here
    are already global — no cross-shard psum is needed, unlike the detector
    trunk's point-sharded BN (sharded_train.py).
    """
    dcfg = cfg.descriptor
    d = dcfg.descriptor_len
    new_stats: dict = {}
    h = ball_feats

    act, norm = dcfg.activation, dcfg.normalization
    for i, c in enumerate((d // 4, d // 2, d)):
        h = _apply_layer(cfg, variables, f"conv{i + 1}", h, features=c,
                         activation=act, normalization=norm, train=train,
                         bn_momentum=bn_momentum, new_stats=new_stats)
    h_max = jnp.max(h, axis=-2, keepdims=True)
    # virtual concat (split kernel) exactly like the single-chip model —
    # in bf16 the split and materialized forms round differently, so the
    # same form is required for bit parity
    y = _apply_layer(cfg, variables, "conv4", (h, h_max), features=d,
                     activation=act, normalization=norm, train=train,
                     bn_momentum=bn_momentum, new_stats=new_stats)
    y = _apply_layer(cfg, variables, "conv5", y, features=d, activation=None,
                     normalization=None, compute_dtype=False)
    desc = jnp.max(y, axis=-2).astype(jnp.float32)

    if dcfg.use_global_context:
        global_desc = jnp.max(desc, axis=-2, keepdims=True)
        # fc1/fc2 are built WITHOUT dtype in the single-chip model, i.e.
        # always fp32 (models/descriptor.py:80-85) — match that here
        z = _apply_layer(cfg, variables, "fc1", (desc, global_desc),
                         features=2 * d, activation=act, normalization=norm,
                         compute_dtype=False, train=train,
                         bn_momentum=bn_momentum, new_stats=new_stats)
        z = _apply_layer(cfg, variables, "fc2", z, features=d, activation=act,
                         normalization=norm, compute_dtype=False, train=train,
                         bn_momentum=bn_momentum, new_stats=new_stats)
        desc = _apply_layer(cfg, variables, "fc3", z, features=d,
                            activation=None, normalization=None,
                            compute_dtype=False)

    nrm = safe_sqrt(jnp.sum(desc * desc, axis=-1, keepdims=True))
    return desc / (nrm + 1e-5), new_stats


__all__ = ["sharded_describe", "describe_from_ball_feats", "Descriptor"]
