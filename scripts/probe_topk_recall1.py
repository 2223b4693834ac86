"""Probe: can approx_min_k(recall_target=1.0) serve the *exact* top-k paths?

Follow-up to probe_topk_twostage (two-stage chunked exact top-k = 26.0 ms vs
59.5 ms direct at (8,512,16384) K=64; approx default = 3.9 ms). The TPU
PartialReduce emitter sizes its bucket count from ``recall_target``; at 1.0 it
must return every true top-k element, i.e. exact selection. If that holds at
~approx speed, the exact knn/ball trunks and the exact descriptor ball get a
~7x with no semantic deviation.

Checks value parity (set equality AND ascending-order equality) against
lax.top_k on unique scores, then times. Pipelined timing, value fetch at the
end; run alone on the chip.
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


def main():
    b, m, n, k = 8, 512, 16384, 64
    rng = np.random.default_rng(0)
    uniq = jnp.asarray(
        rng.permutation(n * b * m).reshape(b, m, n).astype(np.float32))

    ev, ei = jax.jit(lambda s: jax.lax.top_k(-s, k))(uniq)
    ev, ei = -np.asarray(ev), np.asarray(ei)

    for rt in (0.95, 0.999, 1.0):
        av, ai = jax.jit(
            lambda s, r=rt: jax.lax.approx_min_k(s, k, recall_target=r))(uniq)
        av, ai = np.asarray(av), np.asarray(ai)
        set_ok = all(
            set(ai[i, j]) == set(ei[i, j])
            for i in range(b) for j in range(0, m, 37))
        order_ok = bool(np.all(av == ev)) and bool(np.all(ai == ei))
        print(f"recall_target={rt}: set-equal={set_ok} "
              f"order+idx-equal={order_ok}", flush=True)

    prio = rng.uniform(size=(b, 1, n)).astype(np.float32)
    in_ball = rng.uniform(size=(b, m, n)) < 0.12
    scores = jnp.asarray(np.where(in_ball, np.broadcast_to(prio, (b, m, n)),
                                  np.inf).astype(np.float32))

    timeloop("direct lax.top_k", lambda s: jax.lax.top_k(-s, k), scores)
    for rt in (0.95, 0.999, 1.0):
        timeloop(f"approx_min_k recall_target={rt}",
                 lambda s, r=rt: jax.lax.approx_min_k(s, k, recall_target=r),
                 scores)
    timeloop("approx_min_k rt=1.0, aggregate_to_topk=False",
             lambda s: jax.lax.approx_min_k(
                 s, k, recall_target=1.0, aggregate_to_topk=False), scores)


if __name__ == "__main__":
    main()
