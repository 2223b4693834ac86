"""On-device point sampling: farthest point sampling + random subset selection.

Replaces the reference's per-loader numpy ``FarthestSampler`` (the CPU hot loop in
every DataLoader worker, e.g. data/kitti_detector_loader.py:69-83) with a
``lax.fori_loop`` that runs inside the jitted train step, batched via vmap.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _fps_single(points: Array, k: int, first: Array) -> Tuple[Array, Array]:
    """FPS on one cloud. points (N, 3); returns (k, 3) samples + (k,) indices.

    Same recurrence as the reference sampler: seed with a random point, then
    repeatedly take the point with the largest distance-to-selected-set
    (modelnet_shrec_loader.py:122-129).
    """
    n = points.shape[0]

    def dist_to(i):
        d = points - points[i]
        return jnp.sum(d * d, axis=-1)

    idxs0 = jnp.zeros((k,), jnp.int32).at[0].set(first.astype(jnp.int32))

    def body(i, state):
        dists, idxs = state
        far = jnp.argmax(dists).astype(jnp.int32)
        idxs = idxs.at[i].set(far)
        dists = jnp.minimum(dists, dist_to(far))
        return dists, idxs

    dists, idxs = jax.lax.fori_loop(1, k, body, (dist_to(first), idxs0),
                                    unroll=4)
    return points[idxs], idxs


_FORCE_XLA_FPS = False
_ASSUME_TPU_FPS = False


@contextlib.contextmanager
def force_xla_fps():
    """Trace-time override: keep FPS on the pure-XLA path regardless of
    backend/dispatch. jax.export artifacts lowered for multiple platforms
    must not embed Mosaic tpu_custom_calls (they neither lower for cpu nor
    serialize portably), so ``model_artifact`` wraps its export tracing in
    this. Picks are bit-identical either way (PERFORMANCE.md)."""
    global _FORCE_XLA_FPS
    prev = _FORCE_XLA_FPS
    _FORCE_XLA_FPS = True
    try:
        yield
    finally:
        _FORCE_XLA_FPS = prev


@contextlib.contextmanager
def assume_tpu_fps():
    """Trace-time override: let the 'auto' FPS dispatch treat the lowering
    target as TPU even when the tracing process runs on another backend.
    Used by ``model_artifact`` when exporting a TPU-only artifact (so the
    Mosaic ``fps_pallas`` kernel is embedded) from any host. The kernel's
    shape/dtype/VMEM eligibility guards still apply."""
    global _ASSUME_TPU_FPS
    prev = _ASSUME_TPU_FPS
    _ASSUME_TPU_FPS = True
    try:
        yield
    finally:
        _ASSUME_TPU_FPS = prev


def _use_pallas_fps(backend: str, points: Array, k: int) -> bool:
    """Resolve the FPS backend at trace time.

    'auto' picks the VMEM-resident Mosaic kernel (``pallas_kernels.fps_pallas``,
    4.1x the XLA fori_loop on-chip, bit-identical picks — PERFORMANCE.md) when
    tracing for TPU with lane-aligned fp32 inputs; anything else keeps the XLA
    path. Guards: S must be a lane multiple (Mosaic pads unaligned blocks with
    garbage lanes that could win the argmax), fp32 only (parity is fp32-exact),
    and the (B, S) planes must comfortably fit VMEM.
    """
    if _FORCE_XLA_FPS:
        return False
    if backend == "pallas":
        return True
    if backend != "auto":
        return False
    b, n, _ = points.shape
    on_tpu = _ASSUME_TPU_FPS or jax.default_backend() == "tpu"
    return (on_tpu and points.dtype == jnp.float32
            and n % 128 == 0 and b * n * 4 <= 2 * 1024 * 1024)


def _fps_batched(key: Array, points: Array, k: int,
                 use_pallas: bool) -> Tuple[Array, Array]:
    """One FPS instance per batch row; backend pre-resolved by the caller."""
    b, n, _ = points.shape
    first = jax.random.randint(key, (b,), 0, n)
    if use_pallas:
        from usip_tpu.ops.pallas_kernels import fps_pallas
        idxs = fps_pallas(jax.lax.stop_gradient(points), first, k)
        return jnp.take_along_axis(points, idxs[..., None], axis=1), idxs
    return jax.vmap(_fps_single, in_axes=(0, None, 0))(points, k, first)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _fps_jit(key: Array, points: Array, k: int, parallel: int,
             use_pallas: bool) -> Tuple[Array, Array]:
    """Jitted FPS body. ``use_pallas`` is resolved by the un-jitted wrapper so
    the Mosaic/XLA decision is part of the jit cache key — resolving it inside
    the traced body from trace-time globals (force_xla_fps/assume_tpu_fps/
    default_backend) let whichever context traced a (shape, k) first poison
    every later caller in the process, including jax.export artifact tracing.
    """
    b, n, _ = points.shape
    if parallel > 1:
        nc, kc = n // parallel, k // parallel
        chunks = points.reshape(b * parallel, nc, 3)
        samples, idxs = _fps_batched(key, chunks, kc, use_pallas)
        offs = ((jnp.arange(b * parallel, dtype=jnp.int32) % parallel)
                * nc)[:, None]
        return (samples.reshape(b, k, 3),
                (idxs + offs).reshape(b, k))
    return _fps_batched(key, points, k, use_pallas)


def farthest_point_sampling(key: Array, points: Array, k: int,
                            parallel: int = 1,
                            backend: str = "auto") -> Tuple[Array, Array]:
    """Batched FPS. points ``(B, N, 3)`` -> samples ``(B, k, 3)``, indices ``(B, k)``.

    ``parallel=t>1`` runs t independent FPS instances over t row-buckets of the
    cloud and concatenates their picks: sequential depth k/t, per-iteration
    work N/t — the multi-point-per-iteration lever for the latency-bound FPS
    loop (PERFORMANCE.md). Buckets are contiguous row ranges, so rows MUST be
    in random order for the approximation to hold (``sample_nodes`` guarantees
    this via its random-subset step; quality A/B in PERFORMANCE.md).

    ``backend``: 'auto' (Mosaic kernel on TPU when eligible, XLA otherwise),
    'xla', or 'pallas'. Both produce bit-identical pick indices
    (tests/test_pallas_kernels.py). The dispatch (including the
    force_xla_fps/assume_tpu_fps export overrides) is resolved HERE, outside
    jit, against the effective per-instance shape, so each resolution compiles
    and caches separately.
    """
    b, n, _ = points.shape
    if parallel > 1:
        if n % parallel or k % parallel:
            raise ValueError(f"parallel={parallel} must divide N={n} and k={k}")
        eff = jax.ShapeDtypeStruct((b * parallel, n // parallel, 3),
                                   points.dtype)
        use_pallas = _use_pallas_fps(backend, eff, k // parallel)
    else:
        use_pallas = _use_pallas_fps(backend, points, k)
    return _fps_jit(key, points, k, parallel, use_pallas)


@functools.partial(jax.jit, static_argnums=(2, 3))
def random_subset(key: Array, points: Array, k: int, replace: bool = False) -> Array:
    """Random subset of k rows per batch element. points ``(B, N, C)`` -> ``(B, k, C)``."""
    b, n, _ = points.shape
    keys = jax.random.split(key, b)

    def one(kb, pb):
        idx = jax.random.choice(kb, n, shape=(k,), replace=replace)
        return pb[idx]

    return jax.vmap(one)(keys, points)


def sample_nodes(key: Array, points: Array, node_num: int,
                 subsample_ratio: int = 4, parallel: int = 1) -> Array:
    """Node initialization: FPS over a random 1/subsample_ratio subset of the cloud.

    Mirrors the loaders' recipe (modelnet_shrec_loader.py:176-178,
    oxford_detector_loader.py:195-200): subsample then FPS to ``node_num``.

    ``parallel``: bucketed-FPS factor (see ``farthest_point_sampling``). The
    random subset rows are in random order, so contiguous bucketing is a valid
    random partition. Falls back to exact FPS when the factor doesn't divide
    the shapes.
    """
    k1, k2 = jax.random.split(key)
    n = points.shape[1]
    sub = max(node_num, n // subsample_ratio)
    subset = random_subset(k1, points, sub, replace=False)
    if parallel > 1 and (sub % parallel or node_num % parallel):
        parallel = 1
    nodes, _ = farthest_point_sampling(k2, subset, node_num, parallel)
    return nodes
