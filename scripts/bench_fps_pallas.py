"""On-chip A/B: Mosaic VMEM-resident FPS (`fps_pallas`) vs the XLA fori_loop
FPS at the KITTI detect shapes ((8,2048)->512 exact; (16,1024)->256 for the
bucketed t=2 preset default).

One Mosaic compile per run (wedge hazard, CLAUDE.md); health-probes with a
tiny XLA program before and after. Pipelined timing, value fetch at the end.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from usip_tpu.ops.pallas_kernels import fps_pallas
from usip_tpu.ops.sampling import farthest_point_sampling


def timeloop(name, fn, *args, iters=100):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(iters)]
        jnp.sum(jax.tree_util.tree_leaves(outs[-1])[0]).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:46s} {best*1e3:8.3f} ms", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--s", type=int, default=2048)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--t", type=int, default=1, help="bucketed-FPS factor")
    args = ap.parse_args()
    b, s, k = args.b * args.t, args.s // args.t, args.k // args.t

    rng = np.random.default_rng(0)
    pc = jnp.asarray((rng.normal(size=(b, s, 3)) * 20).astype(np.float32))
    first = jnp.asarray(rng.integers(0, s, size=(b,)).astype(np.int32))

    print("health probe:", jnp.sum(pc).block_until_ready(), flush=True)
    t0 = time.perf_counter()
    idx = fps_pallas(pc, first, k)
    jax.block_until_ready(idx)
    print(f"mosaic compile+run ok ({time.perf_counter()-t0:.1f}s)", flush=True)
    print("health probe:", jnp.sum(pc * 2).block_until_ready(), flush=True)

    # parity on chip
    _, idx_ref = farthest_point_sampling(jax.random.PRNGKey(0), pc, k)
    idx2 = fps_pallas(pc, idx_ref[:, 0], k)
    same = np.array_equal(np.asarray(idx2), np.asarray(idx_ref))
    print(f"on-chip parity vs XLA fori FPS: {same}", flush=True)

    timeloop(f"fps_pallas   ({b},{s})->{k}",
             lambda p, f: fps_pallas(p, f, k), pc, first)
    timeloop(f"fps XLA fori ({b},{s})->{k}",
             lambda key, p: farthest_point_sampling(key, p, k),
             jax.random.PRNGKey(1), pc)


if __name__ == "__main__":
    main()
