"""Kernel micro-benchmark harness — the analog of the reference's
models/test_operations.py (index_max timing at B=8, C=128, N=163840, M=512),
covering this framework's grouping/segment ops on the real TPU.

Usage: python scripts/bench_kernels.py [--big]
  --big uses the reference's original N=163840 to compare against its published
  protocol; default uses the KITTI training shape N=16384.
"""

import argparse
import sys
import time

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from usip_tpu import ops


def timeloop(name, fn, iters=30):
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(i)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:48s} {dt:9.3f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true")
    args = ap.parse_args()
    b, c, m = 8, 128, 512
    n = 163840 if args.big else 16384
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, m, size=(b, n)).astype(np.int32))
    pc = jnp.asarray((rng.normal(size=(b, n, 3)) * 20).astype(np.float32))
    node = jnp.asarray((rng.normal(size=(b, m, 3)) * 20).astype(np.float32))
    key = jax.random.PRNGKey(0)
    print(f"shapes: B={b} N={n} M={m} C={c}")

    segmax = jax.jit(lambda t, f, i: ops.masked_scatter_max(f + t, i, m, "fast"))
    timeloop("masked_scatter_max fast (index_max analog)",
             lambda i: segmax(jnp.float32(i) * 1e-6, f, ids))
    segnat = jax.jit(lambda t, f, i: ops.masked_scatter_max(f + t, i, m,
                                                            "native"))
    timeloop("masked_scatter_max native (argmax-gather)",
             lambda i: segnat(jnp.float32(i) * 1e-6, f, ids))
    assign = jax.jit(lambda t, p, nd: ops.assign_points_to_nodes(p + t, nd).ids)
    timeloop("point->node assignment (query_topk analog)",
             lambda i: assign(jnp.float32(i) * 1e-6, pc, node))
    bq = jax.jit(lambda k, p, nd: ops.ball_query(p, nd, 2.0, 64, key=k).idx)
    timeloop("ball_query r=2 k=64 (ball_query analog)",
             lambda i: bq(jax.random.fold_in(key, i), pc, node))
    fps = jax.jit(lambda k, p: ops.farthest_point_sampling(k, p[:, :2048], m)[1])
    timeloop("fps 2048->512",
             lambda i: fps(jax.random.fold_in(key, i), pc))


if __name__ == "__main__":
    main()
