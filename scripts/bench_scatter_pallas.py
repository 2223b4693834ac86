"""Mosaic scatter-max experiment: in-VMEM node accumulators, S-way binning.

VERDICT round-1 item 8 / ROADMAP gap 2: XLA's scatter-max runs at ~11 ns per
row update (1.5 ms at KITTI scale) and every XLA-level alternative measured
worse (PERFORMANCE.md). The one unexplored shape is a Mosaic kernel that keeps
the (M, C) node state in VMEM and performs the read-modify-write loop on-core:

  * ids are staged through SMEM input blocks (the round-1 crash came from
    VMEM-resident (N, 1) ids — scalar reads need SMEM);
  * S independent accumulator copies (one per unroll slot) break the serial
    RMW dependency chain S-fold: slot s only ever touches acc[s*M : (s+1)*M],
    so the S dynamic stores in one loop iteration are hazard-free and can
    pipeline;
  * the S copies are max-merged once at the end of each batch row.

Replaces semantics of reference models/index_max_ext/index_max_cuda.cu:9-25
(forward only; training keeps the XLA scatter whose gradient is native).

Usage: python scripts/bench_scatter_pallas.py [--iters 30]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(n: int, m: int, c: int, tile: int, s_bins: int):
    steps = tile // s_bins

    def kernel(ids_ref, f_ref, out_ref, acc_ref):
        t = pl.program_id(1)
        nt = pl.num_programs(1)

        @pl.when(t == 0)
        def _():
            acc_ref[:] = jnp.full_like(acc_ref, -jnp.inf)

        def body(i, carry):
            for s in range(s_bins):
                r = i * s_bins + s
                idx = ids_ref[0, r // 128, r % 128]
                row = f_ref[0, pl.ds(r, 1), :]
                slot = s * m + idx
                cur = acc_ref[pl.ds(slot, 1), :]
                acc_ref[pl.ds(slot, 1), :] = jnp.maximum(cur, row)
            return carry

        jax.lax.fori_loop(0, steps, body, 0)

        @pl.when(t == nt - 1)
        def _():
            merged = acc_ref[0:m, :]
            for s in range(1, s_bins):
                merged = jnp.maximum(merged, acc_ref[s * m:(s + 1) * m, :])
            out_ref[0] = merged

    return kernel


@functools.partial(jax.jit, static_argnames=("m", "tile", "s_bins"))
def scatter_max_pallas(f, ids, m, tile=2048, s_bins=8):
    b, n, c = f.shape
    assert n % tile == 0 and tile % 128 == 0
    ids3 = ids.reshape(b, n // 128, 128)
    out = pl.pallas_call(
        make_kernel(n, m, c, tile, s_bins),
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile // 128, 128), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, c), lambda bi, ti: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, c), f.dtype),
        scratch_shapes=[pltpu.VMEM((s_bins * m, c), f.dtype)],
    )(ids3, f)
    return jnp.where(jnp.isneginf(out), 0.0, out)


@functools.partial(jax.jit, static_argnames=("m",))
def scatter_max_xla(f, ids, m):
    def one(fb, ib):
        seg = jax.ops.segment_max(fb, ib, num_segments=m)
        return jnp.where(jnp.isneginf(seg), 0.0, seg)
    return jax.vmap(one)(f, ids)


def bench(fn, args, iters):
    for _ in range(3):
        r = fn(*args)
    np.asarray(r)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    np.asarray(outs[-1])
    float(jnp.sum(outs[0]))
    t1 = time.perf_counter()
    return (t1 - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--m", type=int, default=512)
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--sbins", type=int, default=8)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    dt = jnp.dtype(args.dtype)
    for c in (64, 128):
        f = jax.random.normal(key, (args.b, args.n, c), dtype=dt)
        ids = jax.random.randint(jax.random.PRNGKey(1), (args.b, args.n), 0,
                                 args.m, dtype=jnp.int32)
        ref = np.asarray(scatter_max_xla(f, ids, args.m))
        try:
            got = np.asarray(scatter_max_pallas(f, ids, args.m, args.tile,
                                                args.sbins))
        except Exception as e:  # noqa: BLE001 — record the Mosaic failure mode
            print(f"C={c}: pallas FAILED: {type(e).__name__}: {e}")
            continue
        err = np.abs(ref - got).max()
        ms_x = bench(lambda a, b_: scatter_max_xla(a, b_, args.m), (f, ids),
                     args.iters)
        ms_p = bench(
            lambda a, b_: scatter_max_pallas(a, b_, args.m, args.tile,
                                             args.sbins), (f, ids), args.iters)
        print(f"C={c} dtype={dt.name} tile={args.tile} S={args.sbins}: "
              f"max|err|={err:.3e}  xla={ms_x:.3f} ms  pallas={ms_p:.3f} ms  "
              f"({ms_x / ms_p:.2f}x)")


if __name__ == "__main__":
    main()
