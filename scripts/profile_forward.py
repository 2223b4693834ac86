"""Per-component timing of the KITTI detector forward on the real TPU.

Each timed function gets a fresh scalar perturbation per iteration (so no result
caching can hide work) and the loop is fenced by fetching a scalar reduction to
host. Identifies the hot ops to tile with Pallas (SURVEY.md §7 hard parts)."""

import sys
import time

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from usip_tpu.config import get_config
from usip_tpu.models import Detector
from usip_tpu.nn.layers import SharedMLP
from usip_tpu import ops


def timeit(name, fn, *args, iters=20):
    """fn(t, *args) -> pytree; t is a fresh scalar each iteration."""

    @jax.jit
    def wrapped(t, *a):
        out = fn(t, *a)
        return jax.tree_util.tree_reduce(
            lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), out, 0.0)

    float(wrapped(jnp.asarray(0.0), *args))  # compile
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(iters):
        acc += float(wrapped(jnp.asarray(float(i)) * 1e-6, *args))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    cfg = get_config("kitti")
    b, n, m = 8, cfg.data.input_pc_num, cfg.data.node_num
    s = cfg.detector.surface_normal_len
    rng = np.random.default_rng(0)
    pc = jnp.asarray((rng.normal(size=(b, n, 3)) * 20).astype(np.float32))
    sn = jnp.asarray(rng.normal(size=(b, n, s)).astype(np.float32))
    node = jnp.asarray((rng.normal(size=(b, m, 3)) * 20).astype(np.float32))
    f64 = jnp.asarray(rng.normal(size=(b, n, 64)).astype(np.float32))
    f128 = jnp.asarray(rng.normal(size=(b, n, 128)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, m, size=(b, n)).astype(np.int32))
    key = jax.random.PRNGKey(0)

    model = Detector(cfg.detector)
    variables = jax.jit(
        lambda k: model.init(k, pc, sn, node, train=False))(jax.random.PRNGKey(0))

    print(f"config: B={b} N={n} M={m}", flush=True)
    timeit("full forward",
           lambda t, pc, sn, node: model.apply(variables, pc + t, sn, node,
                                               train=False),
           pc, sn, node)
    timeit("fps nodes (subset n/8)",
           lambda t, p: ops.sample_nodes(key, p + t, m, 8), pc)
    timeit("assignment argmin (N x M)",
           lambda t, p, nd: ops.assign_points_to_nodes(p + t, nd, 1).ids,
           pc, node)
    timeit("pairwise sqdist (N x M) only",
           lambda t, p, nd: ops.pairwise_sqdist(p + t, nd), pc, node)
    timeit("sqdist+argmin fused (N x M)",
           lambda t, p, nd: jnp.argmin(ops.pairwise_sqdist(p + t, nd), -1),
           pc, node)
    timeit("masked_scatter_max native C=64",
           lambda t, f, i: ops.masked_scatter_max(f + t, i, m, "native"),
           f64, ids)
    timeit("masked_scatter_max onehot C=64",
           lambda t, f, i: ops.masked_scatter_max(f + t, i, m, "onehot"),
           f64, ids)
    timeit("masked_scatter_max native C=128",
           lambda t, f, i: ops.masked_scatter_max(f + t, i, m, "native"),
           f128, ids)
    timeit("masked_scatter_max onehot C=128",
           lambda t, f, i: ops.masked_scatter_max(f + t, i, m, "onehot"),
           f128, ids)
    timeit("segment_mean_count",
           lambda t, p, i: ops.segment_mean_count(p + t, i, m), pc, ids)
    timeit("scatter_back C=64",
           lambda t, f, i: ops.scatter_back(f + t, i),
           jnp.zeros((b, m, 64)), ids)
    timeit("knn nodes M x M k=16",
           lambda t, nd: ops.knn(nd + t, nd, 16)[1], node)
    timeit("single-side chamfer M x N",
           lambda t, nd, p: jnp.min(ops.pairwise_dist(nd + t, p), axis=2),
           node, pc)

    mlp = SharedMLP((64, 64, 64), normalization="batch")
    x7 = jnp.concatenate([pc, sn], axis=-1)
    v = mlp.init(jax.random.PRNGKey(0), x7, train=False)
    timeit("first_pointnet MLP (eval)",
           lambda t, x: mlp.apply(v, x + t, train=False), x7)


if __name__ == "__main__":
    main()
