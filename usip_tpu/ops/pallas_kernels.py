"""Pallas TPU kernels for the hot grouping ops.

The point->node assignment materializes a ``(B, N, M)`` fp32 distance matrix in
HBM (268 MB at KITTI scale) just to argmin over M. This kernel tiles N, computes
each ``(TILE, M)`` distance block in VMEM straight off the MXU, reduces it to
``(TILE,)`` min/argmin, and writes only the reduced outputs — HBM traffic drops
from O(N*M) to O(N).

Same pattern serves the single-side chamfer (keypoint->cloud min distance) by
swapping the roles of the two point sets.

Status: correctness-validated in interpreter mode (tests/test_pallas_kernels.py);
measured at parity with the XLA formulation on v5e (the op is reduce-bound, not
HBM-bound — PERFORMANCE.md), so it is NOT on the default path. Mosaic compiles of
the broadcast-FMA variant were slow through this environment's remote-compile
tunnel; treat native-TPU use as experimental.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _min_argmin_kernel(points_ref, nodes_ref, nodes_sq_ref, min_ref, idx_ref):
    """One (TILE_N, 3) point block vs all M nodes.

    points_ref: (TILE_N, 3) VMEM; nodes_ref: (3, M) VMEM (transposed);
    nodes_sq_ref: (1, M) VMEM; outputs: (TILE_N, 1) min sqdist + argmin.

    The coordinate dimension (3) is far below the 128-lane tile, so reductions
    over it would touch padded lanes; expand the K=3 contraction explicitly as
    three broadcasted FMAs instead.
    """
    px = points_ref[:, 0:1]
    py = points_ref[:, 1:2]
    pz = points_ref[:, 2:3]
    nx = nodes_ref[0:1, :]
    ny = nodes_ref[1:2, :]
    nz = nodes_ref[2:3, :]
    cross = px * nx + py * ny + pz * nz                # (T, M) on the VPU
    p_sq = px * px + py * py + pz * pz                 # (T, 1)
    dist = p_sq - 2.0 * cross + nodes_sq_ref[:]        # (T, M)
    min_ref[:] = jnp.min(dist, axis=1, keepdims=True)
    idx_ref[:] = jnp.argmin(dist, axis=1, keepdims=True).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def min_argmin_pallas(points: Array, nodes: Array, tile_n: int = 1024,
                      interpret: bool = False):
    """Fused nearest-node search: for each point the (sq-distance, index) of its
    nearest node. points (B, N, 3), nodes (B, M, 3) -> ((B, N), (B, N) int32).

    M must be a multiple of 128 (lane width); N a multiple of tile_n.
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests).
    """
    b, n, _ = points.shape
    m = nodes.shape[1]
    assert n % tile_n == 0, (n, tile_n)

    def one(p, nd):
        nd_t = nd.T.astype(jnp.float32)                     # (3, M)
        nd_sq = jnp.sum(nd * nd, axis=1)[None, :]           # (1, M)
        mins, idxs = pl.pallas_call(
            _min_argmin_kernel,
            grid=(n // tile_n,),
            in_specs=[
                pl.BlockSpec((tile_n, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, m), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, 1), jnp.float32),
                jax.ShapeDtypeStruct((n, 1), jnp.int32),
            ],
            interpret=interpret,
        )(p.astype(jnp.float32), nd_t, nd_sq)
        return jnp.maximum(mins[:, 0], 0.0), idxs[:, 0]

    return jax.vmap(one)(points, nodes)
