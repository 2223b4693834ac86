"""Exact smallest-k selection, TPU-shaped.

``lax.top_k`` on TPU costs superlinearly in row length: at (8, 512, 16384)
K=64 a direct call is 59.5 ms while the *exact* two-stage chunked form —
per-chunk top-k then a top-k over the C*K candidates — is 26.0 ms
(scripts/probe_topk_twostage.py, PERFORMANCE.md). The k smallest of a row are
contained in the union of the k smallest of each chunk, so the two-stage form
is mathematically exact; and because chunk order matches global index order,
``top_k``'s tie rule (earliest position wins) composes: ties still resolve
toward the lowest global index, bit-identically to the direct call
(property-tested in tests/test_ops.py).

This is the selection behind the reference's ``torch.topk(largest=False)``
knn grouping (models/layers.py:421) and the exact ball-query path; both keep
their semantics exactly — unlike ``approx_min_k``, nothing is traded away, so
the fast form dispatches automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Two-stage pays only when rows are long enough to amortize the candidate
# merge; the probe sweep (chunks 128..2048 at N=16384) bottoms at 512.
_TWOSTAGE_MIN_N = 4096
_CHUNK = 512


def smallest_k(scores: Array, k: int, *, method: str = "auto"):
    """The k smallest entries of the last axis: ``(values ascending, indices)``.

    Bit-identical to ``lax.top_k(-scores, k)`` (negated) including tie order
    — ties resolve toward the lowest index — for every method.

    Args:
      scores: ``(..., N)``; +inf entries sort last (the ball-query "outside
        the radius" convention).
      k: number of entries to select.
      method: ``'auto'`` (two-stage when N is long enough for it to pay),
        ``'direct'``, ``'twostage'``, or ``'pallas'`` (the VMEM-resident
        Mosaic extraction kernel, ``pallas_kernels.smallest_k_pallas`` —
        TPU only, fp32, finite entries < 1e37; same bit-exact contract).
    """
    n = scores.shape[-1]
    if method == "pallas":
        from usip_tpu.ops.pallas_kernels import smallest_k_pallas
        # interpreter off-TPU so the method stays testable on CPU
        return smallest_k_pallas(scores, k,
                                 interpret=jax.default_backend() != "tpu")
    if method not in ("auto", "direct", "twostage"):
        raise ValueError(f"unknown smallest_k method {method!r}")
    if method == "twostage" and k > _CHUNK:
        raise ValueError(f"smallest_k(method='twostage') requires k <= chunk "
                         f"size {_CHUNK}, got k={k}; use method='auto' or "
                         "'direct'")
    use_twostage = method == "twostage" or (
        method == "auto" and n >= _TWOSTAGE_MIN_N and k <= _CHUNK)
    if not use_twostage:
        neg, idx = jax.lax.top_k(-scores, k)
        return -neg, idx

    *lead, _ = scores.shape
    pad = (-n) % _CHUNK
    if pad:
        # +inf padding sorts last; padded indices can only surface when a row
        # has fewer than k finite entries, where direct top_k would surface
        # arbitrary +inf positions too — callers mask those via isfinite.
        scores = jnp.pad(scores, [(0, 0)] * len(lead) + [(0, pad)],
                         constant_values=jnp.inf)
    c = scores.shape[-1] // _CHUNK
    s4 = scores.reshape(*lead, c, _CHUNK)
    v1, i1 = jax.lax.top_k(-s4, k)                       # (..., c, k)
    v2, i2 = jax.lax.top_k(v1.reshape(*lead, c * k), k)  # (..., k)
    flat1 = (i1 + jnp.arange(c, dtype=i1.dtype)[..., :, None] * _CHUNK
             ).reshape(*lead, c * k)
    idx = jnp.take_along_axis(flat1, i2, axis=-1)
    if pad:
        idx = jnp.minimum(idx, n - 1)
    return -v2, idx
