"""Per-component timing of the KITTI detector forward on the real TPU.

Identifies the hot ops to tile with Pallas (SURVEY.md §7 hard parts)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from usip_tpu.config import get_config
from usip_tpu.models import Detector
from usip_tpu.nn.layers import PointwiseLayer, SharedMLP
from usip_tpu import ops


def timeit(name, fn, *args, iters=20):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:40s} {dt:8.3f} ms")
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

    print(f"config: B={b} N={n} M={m}")
    timeit("full forward", lambda pc, sn, node: model_apply(pc, sn, node),
           pc, sn, node)
    timeit("fps nodes (subset n/8)",
           lambda k, p: ops.sample_nodes(k, p, m, 8), key, pc)
    timeit("assignment argmin (N x M)",
           lambda p, nd: ops.assign_points_to_nodes(p, nd, 1), pc, node)
    timeit("pairwise sqdist (N x M) only",
           lambda p, nd: ops.pairwise_sqdist(p, nd), pc, node)
    timeit("masked_scatter_max native C=64",
           lambda f, i: ops.masked_scatter_max(f, i, m, "native"), f64, ids)
    timeit("masked_scatter_max onehot C=64",
           lambda f, i: ops.masked_scatter_max(f, i, m, "onehot"), f64, ids)
    timeit("masked_scatter_max native C=128",
           lambda f, i: ops.masked_scatter_max(f, i, m, "native"), f128, ids)
    timeit("masked_scatter_max onehot C=128",
           lambda f, i: ops.masked_scatter_max(f, i, m, "onehot"), f128, ids)
    timeit("segment_mean_count",
           lambda p, i: ops.segment_mean_count(p, i, m), pc, ids)
    timeit("scatter_back C=64",
           lambda f, i: ops.scatter_back(f, i),
           jnp.zeros((b, m, 64)), ids)
    timeit("knn nodes M x M k=16",
           lambda nd: ops.knn(nd, nd, 16), node)
    timeit("single-side chamfer M x N",
           lambda nd, p: jnp.min(ops.pairwise_dist(nd, p), axis=2), node, pc)

    # shared MLP flops check: N x (7->64->64->64)
    mlp = SharedMLP((64, 64, 64), normalization="batch")
    x7 = jnp.concatenate([pc, sn], axis=-1)
    v = mlp.init(jax.random.PRNGKey(0), x7, train=False)
    timeit("first_pointnet MLP (eval)",
           lambda x: mlp.apply(v, x, train=False), x7)


cfg = get_config("kitti")
_model = Detector(cfg.detector)
_variables = None


def model_apply(pc, sn, node):
    global _variables
    if _variables is None:
        _variables = jax.jit(
            lambda k: _model.init(k, pc, sn, node, train=False))(
                jax.random.PRNGKey(0))
    return _model.apply(_variables, pc, sn, node, train=False)


if __name__ == "__main__":
    main()
