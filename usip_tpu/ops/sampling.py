"""On-device point sampling: farthest point sampling + random subset selection.

Replaces the reference's per-loader numpy ``FarthestSampler`` (the CPU hot loop in
every DataLoader worker, e.g. data/kitti_detector_loader.py:69-83) with a
``lax.fori_loop`` that runs inside the jitted train step, batched via vmap.
"""

from __future__ import annotations

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


@functools.partial(jax.jit, static_argnums=(2, 3))
def farthest_point_sampling(key: Array, points: Array, k: int,
                            parallel: int = 1) -> Tuple[Array, Array]:
    """Batched FPS. points ``(B, N, 3)`` -> samples ``(B, k, 3)``, indices ``(B, k)``.

    ``parallel=t>1`` runs t independent FPS instances over t row-buckets of the
    cloud and concatenates their picks: sequential depth k/t, per-iteration
    work N/t — the multi-point-per-iteration lever for the latency-bound FPS
    loop (PERFORMANCE.md). Buckets are contiguous row ranges, so rows MUST be
    in random order for the approximation to hold (``sample_nodes`` guarantees
    this via its random-subset step; quality A/B in PERFORMANCE.md).
    """
    b, n, _ = points.shape
    if parallel > 1:
        if n % parallel or k % parallel:
            raise ValueError(f"parallel={parallel} must divide N={n} and k={k}")
        nc, kc = n // parallel, k // parallel
        chunks = points.reshape(b * parallel, nc, 3)
        first = jax.random.randint(key, (b * parallel,), 0, nc)
        samples, idxs = jax.vmap(_fps_single, in_axes=(0, None, 0))(
            chunks, kc, first)
        offs = ((jnp.arange(b * parallel, dtype=jnp.int32) % parallel)
                * nc)[:, None]
        return (samples.reshape(b, k, 3),
                (idxs + offs).reshape(b, k))
    first = jax.random.randint(key, (b,), 0, n)
    return jax.vmap(_fps_single, in_axes=(0, None, 0))(points, k, first)


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
