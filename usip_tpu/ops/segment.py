"""Scatter/segment reductions onto SOM nodes — the TPU replacement of the
``index_max`` CUDA extension (reference models/index_max_ext/index_max_cuda.cu:9-61).

Semantics being reproduced: for features ``(N, C)`` and per-point node ids ``(N,)``
in ``[0, M)``, produce per-node channel maxima ``(M, C)`` where the gradient flows to
the *first* (lowest point index) argmax point of each (node, channel) cell, exactly
like gathering with the CUDA kernel's argmax indices (networks.py:117-133). Nodes with
no assigned points yield 0 (the reference multiplies by ``mask_row_max``).

Two interchangeable backends (property-tested against each other and a numpy oracle):
  * ``native``: ``jax.ops.segment_max`` (XLA scatter-max) + argmax-gather for the
    gradient path.
  * ``onehot``: fused broadcast/reduce formulation — no scatter at all; XLA fuses the
    mask into the reduction loop so the conceptual ``(N, M, C)`` tensor is never
    materialized. Preferred on TPU where giant scatters serialize.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _segment_max_gather(f: Array, ids: Array, num_segments: int):
    """segment-max values + first-argmax indices for one (N, C) block."""
    n = f.shape[0]
    f_sg = jax.lax.stop_gradient(f)
    seg_max = jax.ops.segment_max(f_sg, ids, num_segments=num_segments)  # (M, C)
    # first point index achieving the max within its segment
    at_max = f_sg >= seg_max[ids]  # (N, C)
    point_idx = jax.lax.broadcasted_iota(jnp.int32, f.shape, 0)
    candidates = jnp.where(at_max, point_idx, n)
    argmax = jax.ops.segment_min(candidates, ids, num_segments=num_segments)  # (M, C)
    valid = argmax < n
    return argmax, valid


def _masked_max_native(f: Array, ids: Array, num_segments: int) -> Array:
    argmax, valid = _segment_max_gather(f, ids, num_segments)
    safe = jnp.where(valid, argmax, 0)
    gathered = jnp.take_along_axis(f, safe, axis=0)  # differentiable gather
    return jnp.where(valid, gathered, 0.0)


def _masked_max_onehot(f: Array, ids: Array, num_segments: int,
                       node_chunk: int = 64) -> Array:
    """Scatter-free masked max: scan over node chunks, reduce over points.

    Each scan step evaluates ``max_n(where(ids==m, f, -inf))`` for a chunk of nodes;
    XLA fuses the broadcasted select into the reduce so peak memory is
    O(N * node_chunk) bools, not O(N*M*C). Gradient flows through jnp.max (first
    argmax, matching the CUDA kernel's strictly-greater update rule).
    """
    n, c = f.shape
    num_chunks = -(-num_segments // node_chunk)
    pad_m = num_chunks * node_chunk

    def chunk_body(m0):
        node_range = m0 + jnp.arange(node_chunk)  # (Mc,)
        mask = ids[:, None] == node_range[None, :]  # (N, Mc)
        neg = jnp.asarray(-jnp.inf, f.dtype)
        masked = jnp.where(mask[:, :, None], f[:, None, :], neg)  # (N, Mc, C) fused
        mx = jnp.max(masked, axis=0)  # (Mc, C)
        return jnp.where(jnp.isfinite(mx), mx, 0.0)

    starts = jnp.arange(num_chunks) * node_chunk
    out = jax.lax.map(chunk_body, starts)  # (num_chunks, Mc, C)
    return out.reshape(pad_m, c)[:num_segments]


def _masked_max_fast(f: Array, ids: Array, num_segments: int) -> Array:
    """One scatter-max; relies on JAX's native scatter-max gradient.

    3x fewer scatter ops than the 'native' argmax-gather path. Gradient semantics
    differ from the CUDA kernel only on exact ties, where JAX splits the cograd
    among tied points instead of crediting the first — identical total gradient
    per distinct input value (ties come from pad-duplicated points), so training
    is distribution-equivalent.
    """
    seg = jax.ops.segment_max(f, ids, num_segments=num_segments,
                              indices_are_sorted=False)
    return jnp.where(jnp.isneginf(seg), 0.0, seg)


@functools.partial(jax.jit, static_argnums=(2, 3))
def masked_scatter_max(f: Array, ids: Array, num_segments: int,
                       backend: str = "fast") -> Array:
    """Per-node channel max of point features (index_max replacement).

    Args:
      f: ``(B, N, C)`` point features.
      ids: ``(B, N)`` int32 node assignment in ``[0, num_segments)``.
      num_segments: M, number of nodes.
      backend: 'fast' (single XLA scatter-max, native gradient — default),
        'native' (argmax-gather, reference-exact first-argmax gradient), or
        'onehot' (scatter-free broadcast/reduce; FORWARD-ONLY — its gradient
        makes XLA materialize an O(N*M*C) intermediate at KITTI scale).

    Returns:
      ``(B, M, C)``; empty nodes are exactly 0.
    """
    if backend == "fast":
        fn = _masked_max_fast
    elif backend == "native":
        fn = _masked_max_native
    elif backend == "onehot":
        fn = _masked_max_onehot
    else:
        raise ValueError(f"unknown backend {backend!r}")
    return jax.vmap(fn, in_axes=(0, 0, None))(f, ids, num_segments)


def segment_mean_count(x: Array, ids: Array, num_segments: int,
                       eps: float = 1e-5) -> Tuple[Array, Array]:
    """Per-node mean of point coordinates + occupancy count.

    Replaces the reference's one-hot-mask cluster mean (networks.py:94-99):
    ``cluster_mean = sum(x * mask) / (count + 1e-5)``.

    Args:
      x: ``(B, N, D)``.
      ids: ``(B, N)`` int32.

    Returns:
      ``means (B, M, D)``, ``counts (B, M)`` (float).
    """

    def one(xb, ib):
        sums = jax.ops.segment_sum(xb, ib, num_segments=num_segments)
        counts = jax.ops.segment_sum(jnp.ones((xb.shape[0],), xb.dtype), ib,
                                     num_segments=num_segments)
        return sums / (counts[:, None] + eps), counts

    return jax.vmap(one)(x, ids)


def scatter_back(node_features: Array, ids: Array) -> Array:
    """Broadcast per-node features back onto their points: ``out[n] = nf[ids[n]]``.

    Replaces the expanded ``torch.gather`` scatter-back (networks.py:123-126); a
    plain differentiable gather on TPU.
    """
    return jnp.take_along_axis(node_features, ids[..., None], axis=-2)
