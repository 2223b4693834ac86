"""Fine-grained timing of the som trunk's stages at KITTI shapes, hunting the
~2.4 ms the coarse decomposition leaves unattributed (PERFORMANCE.md "where
the time goes": trunk 6.9 ms = assignment 1.4 + 2x scatter-max ~3.1 +
pointnets/gathers/casts ~2.4).

Also A/Bs the row-gather `scatter_back` (take_along_axis) against a one-hot
matmul formulation: per-row dynamic gathers can be issue-rate-bound on TPU
like scatters, while the one-hot form rides the MXU.

Pipelined timing (enqueue N, one fetch); run alone on the chip.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from usip_tpu.config import get_config
from usip_tpu import ops


def timeloop(name, fn, *args, iters=30):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(iters)]
        jnp.sum(jax.tree_util.tree_leaves(outs[-1])[0]).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:46s} {best*1e3:8.3f} ms/batch8", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    args = ap.parse_args()

    cfg = get_config("kitti")
    b, n, m = args.b, cfg.data.input_pc_num, cfg.data.node_num
    c1 = cfg.detector.c1
    rng = np.random.default_rng(0)
    pc = jnp.asarray((rng.normal(size=(b, n, 3)) * 20).astype(np.float32))
    node = jnp.asarray((rng.normal(size=(b, m, 3)) * 20).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, m, size=(b, n)).astype(np.int32))
    f64 = jnp.asarray(rng.normal(size=(b, n, c1 // 2)).astype(np.float32))
    nf64 = jnp.asarray(rng.normal(size=(b, m, c1 // 2)).astype(np.float32))
    nf128 = jnp.asarray(rng.normal(size=(b, m, c1)).astype(np.float32))

    timeloop("assignment (argmin B,N,M)",
             lambda p, q: ops.assign_points_to_nodes(
                 p, q, k=1, compute_dtype=jnp.bfloat16).ids, pc, node)
    timeloop("segment_mean_count (B,N,3)",
             lambda p, i: ops.segment_mean_count(p, i, m), pc, ids)
    timeloop("scatter_back 3ch (take_along_axis)",
             lambda f, i: ops.scatter_back(f, i), node, ids)
    timeloop("scatter_back 64ch (take_along_axis)",
             lambda f, i: ops.scatter_back(f, i), nf64, ids)
    timeloop("scatter_back 128ch (take_along_axis)",
             lambda f, i: ops.scatter_back(f, i), nf128, ids)

    def onehot_gather(f, i):
        oh = jax.nn.one_hot(i, m, dtype=jnp.bfloat16)          # (B, N, M)
        return jnp.einsum("bnm,bmc->bnc", oh, f.astype(jnp.bfloat16))

    timeloop("scatter_back 64ch (one-hot matmul bf16)", onehot_gather,
             nf64, ids)
    timeloop("scatter_back 128ch (one-hot matmul bf16)", onehot_gather,
             nf128, ids)
    timeloop("masked_scatter_max 64ch (fast)",
             lambda f, i: ops.masked_scatter_max(f, i, m, "fast"), f64, ids)

    # pointnet MLP cost in isolation (no BN-stat updates: eval mode)
    from usip_tpu.nn.layers import SharedMLP
    mlp = SharedMLP((c1 // 2,) * 3, activation="relu", normalization="batch",
                    dtype=jnp.bfloat16)
    x_aug = jnp.asarray(rng.normal(size=(b, n, 7)).astype(np.float32))
    v = mlp.init(jax.random.PRNGKey(0), x_aug, train=False)
    timeloop("first_pointnet MLPs only (7->64x3, eval)",
             lambda x: mlp.apply(v, x, train=False), x_aug)

    mlp2 = SharedMLP((c1, c1), activation="relu", normalization="batch",
                     dtype=jnp.bfloat16)
    x2 = jnp.asarray(rng.normal(size=(b, n, c1)).astype(np.float32))
    v2 = mlp2.init(jax.random.PRNGKey(0), x2, train=False)
    timeloop("second_pointnet MLPs only (128->128x2, eval)",
             lambda x: mlp2.apply(v2, x, train=False), x2)


if __name__ == "__main__":
    main()
