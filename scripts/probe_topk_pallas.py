"""Probe: Mosaic iterative-extraction exact smallest-k vs the two-stage XLA
form at the canonical grouped-trunk shape (8, 512, 16384) K=64.

One Mosaic compile per process (CLAUDE.md: bursts of back-to-back Mosaic
compiles at different tile sizes can wedge the remote backend) — run

  python scripts/probe_topk_pallas.py --mode twostage          # baseline
  python scripts/probe_topk_pallas.py --mode pallas --tile-rows 8
  python scripts/probe_topk_pallas.py --mode pallas --tile-rows 32

with a health probe between invocations. ``--parity`` additionally checks
bit-identity against lax.top_k on the same scores (adds a direct top_k
compile, no Mosaic).

Pipelined timing, value fetch at the end; run alone on the chip.
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

WATCHDOG_SECONDS = int(os.environ.get("BENCH_WATCHDOG_SECONDS", "1500"))


def _arm_watchdog():
    def fire():
        print(json.dumps({"error": f"watchdog: no result within "
                                   f"{WATCHDOG_SECONDS}s"}), flush=True)
        os._exit(17)
    t = threading.Timer(WATCHDOG_SECONDS, fire)
    t.daemon = True
    t.start()
    return t


def timeloop(name, fn, *args, iters=30):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(iters)]
        # value fetch, not block_until_ready: on the serving tunnel,
        # block_until_ready can return before queued programs execute
        float(jnp.sum(outs[-1][1]))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:52s} {best*1e3:8.3f} ms", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="pallas",
                    choices=["pallas", "twostage", "direct"])
    ap.add_argument("--tile-rows", type=int, default=8)
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from usip_tpu.ops.pallas_kernels import smallest_k_pallas
    from usip_tpu.ops.topk import smallest_k

    watchdog = _arm_watchdog()
    b, m, n, k = 8, 512, 16384, 64
    rng = np.random.default_rng(0)
    prio = rng.uniform(size=(b, 1, n)).astype(np.float32)
    in_ball = rng.uniform(size=(b, m, n)) < 0.12
    scores = jnp.asarray(np.where(in_ball, np.broadcast_to(prio, (b, m, n)),
                                  np.inf).astype(np.float32))

    if args.mode == "twostage":
        t = timeloop("two-stage smallest_k (auto chunk 512)",
                     lambda s: smallest_k(s, k), scores, iters=args.iters)
    elif args.mode == "direct":
        t = timeloop("direct lax.top_k",
                     lambda s: jax.lax.top_k(-s, k), scores,
                     iters=args.iters)
    else:
        t = timeloop(f"smallest_k_pallas tile_rows={args.tile_rows}",
                     lambda s: smallest_k_pallas(
                         s, k, tile_rows=args.tile_rows),
                     scores, iters=args.iters)
        if args.parity:
            pv, pi = jax.jit(lambda s: smallest_k_pallas(
                s, k, tile_rows=args.tile_rows))(scores)
            nv, ni = jax.jit(lambda s: jax.lax.top_k(-s, k))(scores)
            ok_v = bool(jnp.all(jnp.where(jnp.isinf(pv), -jnp.inf, pv)
                                == jnp.where(jnp.isinf(-nv), -jnp.inf, -nv)))
            fin = jnp.isfinite(pv)
            ok_i = bool(jnp.all(jnp.where(fin, pi, 0)
                                == jnp.where(fin, ni, 0)))
            print(json.dumps({"parity_vals": ok_v,
                              "parity_idx_finite": ok_i}), flush=True)
    print(json.dumps({"mode": args.mode, "tile_rows": args.tile_rows,
                      "ms": round(t * 1e3, 3)}), flush=True)
    watchdog.cancel()


if __name__ == "__main__":
    main()
