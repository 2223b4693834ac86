"""Keypoint descriptor networks (reference DescriptorLiteOld /
DescriptorLiteOldGlobal, models/networks.py:310-479), channels-last.

Ball grouping around detected keypoints -> two conv stages with a mid max-fusion ->
per-ball max -> L2 normalize. The 'global' variant adds the PPFNet-style
global-context fusion (fc1-3) before normalization.

The reference permutes the cloud once per forward so the ball query's "first K"
approximates uniform ball sampling (networks.py:344-347); here the permutation is the
per-point random priority of ``ops.ball_query`` driven by an explicit PRNG key.

Note: the reference's DescriptorLiteOldGlobal calls a deleted ball-query wrapper and
would crash (networks.py:447); we implement the *intended* behavior — the same ball
query as the lite variant (see SURVEY.md §7 "known reference bugs").
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from usip_tpu.config import DescriptorConfig
from usip_tpu.nn.layers import PointwiseLayer
from usip_tpu.ops import ball_query, gather_points, safe_sqrt

Array = jax.Array


class Descriptor(nn.Module):
    """Ball-grouping descriptor; set ``cfg.use_global_context`` for the indoor
    (PPFNet-fusion) variant."""

    cfg: DescriptorConfig

    @nn.compact
    def __call__(self, pc: Array, sn: Array, keypoints: Array,
                 key: Optional[Array] = None, train: bool = False,
                 bn_momentum: Array | float = 0.1) -> Tuple[Array, Array]:
        """Returns (descriptors (B, M, len), ball features (B, M, K, 3+S))."""
        cfg = self.cfg
        d = cfg.descriptor_len
        dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        if cfg.surface_normal_len > 0:
            x_aug = jnp.concatenate([pc, sn], axis=-1)
        else:
            x_aug = pc
        bq = ball_query(jax.lax.stop_gradient(pc),
                        jax.lax.stop_gradient(keypoints),
                        cfg.ball_radius, cfg.ball_nsamples, key=key,
                        method=cfg.ball_method,
                        compute_dtype=(jnp.bfloat16
                                       if cfg.ball_compute_dtype == "bfloat16"
                                       else None))
        g = gather_points(x_aug, bq.idx)                       # (B, M, K, 3+S)
        g_xyz = g[..., 0:3] - keypoints[:, :, None, :]
        feats = jnp.concatenate([g_xyz, g[..., 3:]], axis=-1)

        h = feats
        for i, c in enumerate((d // 4, d // 2, d)):            # conv1..conv3
            h = PointwiseLayer(c, activation=cfg.activation,
                               normalization=cfg.normalization, dtype=dt,
                               name=f"conv{i + 1}")(h, train, bn_momentum)
        h_max = jnp.max(h, axis=-2, keepdims=True)             # (B, M, 1, d)
        # virtual concat [h, broadcast(h_max)] via the split-kernel layer
        y = PointwiseLayer(d, activation=cfg.activation,
                           normalization=cfg.normalization, dtype=dt,
                           name="conv4")((h, h_max), train, bn_momentum)
        y = PointwiseLayer(d, activation=None, normalization=None,
                           name="conv5")(y)
        desc = jnp.max(y, axis=-2).astype(jnp.float32)         # (B, M, d)

        if cfg.use_global_context:
            # PPFNet global fusion (networks.py:471-475); virtual concat
            # [desc, broadcast(global_desc)] via the split-kernel layer
            global_desc = jnp.max(desc, axis=-2, keepdims=True)   # (B, 1, d)
            z = PointwiseLayer(2 * d, activation=cfg.activation,
                               normalization=cfg.normalization,
                               name="fc1")((desc, global_desc), train,
                                           bn_momentum)
            z = PointwiseLayer(d, activation=cfg.activation,
                               normalization=cfg.normalization,
                               name="fc2")(z, train, bn_momentum)
            desc = PointwiseLayer(d, activation=None, normalization=None,
                                  name="fc3")(z)

        # safe norm: zero-gradient (not nan) at an exactly-zero descriptor row
        norm = safe_sqrt(jnp.sum(desc * desc, axis=-1, keepdims=True))
        desc = desc / (norm + 1e-5)
        return desc, feats
