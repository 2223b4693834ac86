"""Probe: two-stage chunked exact top-k vs direct lax.top_k for the exact
ball-query path.

The exact ball query spends 59.3 ms in `lax.top_k` over (8, 512, 16384) K=64
(PERFORMANCE.md). The K smallest of a row are contained in the union of the
K smallest of each chunk, so a per-chunk top-K followed by a top-K over the
C*K candidates is *exact*; if TPU top_k cost grows superlinearly in row
length, the two-stage form wins. Also probes approx_min_k for scale and a
variant with chunk counts swept.

Pipelined timing, value fetch at the end; run alone on the chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeloop(name, fn, *args, iters=30):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(iters)]
        jnp.sum(outs[-1][1]).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:52s} {best*1e3:8.3f} ms", flush=True)
    return best


def twostage(scores, k, chunk):
    """Exact k-smallest per row via per-chunk k-smallest then candidate merge.

    scores (..., N) -> (vals ascending, idx int32), matching
    lax.top_k(-scores) up to order among exact ties.
    """
    *lead, n = scores.shape
    c = n // chunk
    s4 = scores.reshape(*lead, c, chunk)
    v1, i1 = jax.lax.top_k(-s4, k)                      # (..., c, k)
    v2, i2 = jax.lax.top_k(v1.reshape(*lead, c * k), k)  # (..., k)
    flat1 = (i1 + jnp.arange(c, dtype=i1.dtype)[..., :, None] * chunk
             ).reshape(*lead, c * k)
    idx = jnp.take_along_axis(flat1, i2, axis=-1)
    return -v2, idx


def main():
    b, m, n, k = 8, 512, 16384, 64
    rng = np.random.default_rng(0)
    # ball-query-like scores: mostly inf, in-ball rows carry uniform priorities
    prio = rng.uniform(size=(b, 1, n)).astype(np.float32)
    in_ball = rng.uniform(size=(b, m, n)) < 0.12
    scores = jnp.asarray(np.where(in_ball, np.broadcast_to(prio, (b, m, n)),
                                  np.inf).astype(np.float32))

    # parity first (direct vs two-stage; unique scores per row -> exact match)
    uniq = jnp.asarray(
        rng.permutation(n * b * m).reshape(b, m, n).astype(np.float32))
    nv, ni = jax.jit(lambda s: jax.lax.top_k(-s, k))(uniq)
    tv, ti = jax.jit(lambda s: twostage(s, k, 128))(uniq)
    print("parity vals:", bool(jnp.all(-nv == tv)),
          "idx:", bool(jnp.all(ni == ti)), flush=True)

    timeloop("direct lax.top_k       (8,512,16384) K=64",
             lambda s: jax.lax.top_k(-s, k), scores)
    for chunk in (128, 256, 512, 1024, 2048):
        timeloop(f"two-stage chunk={chunk:5d}",
                 lambda s, c=chunk: twostage(s, k, c), scores)
    timeloop("approx_min_k (reference point)",
             lambda s: jax.lax.approx_min_k(s, k), scores)


if __name__ == "__main__":
    main()
