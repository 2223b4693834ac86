"""Exact smallest-k selection, TPU-shaped.

``lax.top_k`` on TPU costs superlinearly in row length: at (8, 512, 16384)
K=64 a direct call is 59.5 ms, the *exact* two-stage chunked form —
per-chunk top-k then a top-k over the C*K candidates — is 26.0 ms, and the
VMEM-resident Mosaic iterative-extraction kernel
(``pallas_kernels.smallest_k_pallas``) is 16.5 ms at tile_rows=32
(scripts/probe_topk_pallas.py, round 5 on-chip; 24.5 ms at tile_rows=8).
All forms are bit-identical to the direct call. Two-stage exactness: the k
smallest of a row are contained in the union of the k smallest of each
chunk, and because chunk order matches global index order, ``top_k``'s tie
rule (earliest position wins) composes — ties still resolve toward the
lowest global index (property-tested in tests/test_ops.py). The Mosaic
kernel's tie parity is property-tested in tests/test_pallas_kernels.py and
was re-verified bit-exact on the chip at the canonical shape (round 5).

This is the selection behind the reference's ``torch.topk(largest=False)``
knn grouping (models/layers.py:421) and the exact ball-query path; both keep
their semantics exactly — unlike ``approx_min_k``, nothing is traded away, so
the fastest exact form dispatches automatically: on TPU, long fp32 rows go
to the Mosaic kernel, long non-fp32 rows to two-stage, short rows direct.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Two-stage pays only when rows are long enough to amortize the candidate
# merge; the probe sweep (chunks 128..2048 at N=16384) bottoms at 512.
_TWOSTAGE_MIN_N = 4096
_CHUNK = 512
# Mosaic kernel auto-eligibility (round-5 probe): fp32 rows at least this
# long, k small enough that the extraction loop stays VPU-bound, and a
# bounded row length so the (tile_rows, N) block stays comfortably in VMEM.
_PALLAS_MIN_N = 4096
_PALLAS_MAX_N = 32768
_PALLAS_MAX_K = 128
_PALLAS_TILE_ROWS = 32  # probe: 16.5 ms vs 24.5 (tr=8) at (8,512,16384) K=64


def smallest_k(scores: Array, k: int, *, method: str = "auto"):
    """The k smallest entries of the last axis: ``(values ascending, indices)``.

    Bit-identical to ``lax.top_k(-scores, k)`` (negated) including tie order
    — ties resolve toward the lowest index — for every method.

    Args:
      scores: ``(..., N)``; +inf entries sort last (the ball-query "outside
        the radius" convention).
      k: number of entries to select.
      method: ``'auto'`` (fastest exact form for the trace target: the
        Mosaic kernel for long fp32 rows on TPU, two-stage when N is long
        enough for it to pay, direct otherwise), ``'direct'``,
        ``'twostage'``, or ``'pallas'`` (force the VMEM-resident Mosaic
        extraction kernel, ``pallas_kernels.smallest_k_pallas`` — fp32,
        finite entries < 1e37; same bit-exact contract; interpreted
        off-TPU).
    """
    n = scores.shape[-1]
    if method in ("auto", "pallas"):
        from usip_tpu.ops import sampling as _sampling

        # honor the sampling.py export overrides (trace-time, like the FPS
        # dispatch): force_xla_fps (portable multi-platform export) falls back
        # to the bit-identical two-stage XLA form — neither a Mosaic custom
        # call nor an interpret-mode pallas_call serializes portably;
        # assume_tpu_fps compiles Mosaic even when the tracing process runs
        # on another backend (TPU-only artifact export from a CPU host)
        on_tpu = (_sampling._ASSUME_TPU_FPS
                  or jax.default_backend() == "tpu")
        if method == "pallas" and not _sampling._FORCE_XLA_FPS:
            from usip_tpu.ops.pallas_kernels import smallest_k_pallas
            return smallest_k_pallas(scores, k, interpret=not on_tpu)
        if (method == "auto" and on_tpu and not _sampling._FORCE_XLA_FPS
                and scores.dtype == jnp.float32
                and _PALLAS_MIN_N <= n <= _PALLAS_MAX_N
                and k <= _PALLAS_MAX_K):
            from usip_tpu.ops.pallas_kernels import smallest_k_pallas
            return smallest_k_pallas(scores, k, tile_rows=_PALLAS_TILE_ROWS)
        method = "auto"  # ineligible / force_xla_fps -> XLA forms below
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
