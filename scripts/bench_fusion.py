"""Standalone timing of the detector's kNN-fusion block (KNNFusionOnNodes) and
candidate layout levers, at the KITTI preset shapes (B=8, M=512, K=16,
C1=128, C2=512).

Round-2 VERDICT weak #4: the fusion block runs at ~19% MFU (2.4 ms measured in
context vs ~0.46 ms ideal for 8 x 11.3 GFLOP at 197 TFLOP/s bf16). Candidates:

  A. baseline      — current model code (concat[max, h] -> after MLPs)
  B. split-matmul  — after0 computed as W_h @ h + broadcast(W_m @ h_max + b):
                     mathematically identical (kernel rows split at the concat
                     boundary), but the h_max half runs once instead of K
                     times (-18% block FLOPs) and the (B, M, K, 2*C) concat is
                     never materialized (-134 MB of HBM round-trips at these
                     shapes).
  C. flat rows     — reshape (B, M, K, C) -> (B*M*K, C) before the MLPs.
  D. split + flat  — both.
  E. pallas        — the VMEM-resident fused Mosaic chain
                     (ops/pallas_kernels.fused_fusion_chain; --pallas-tile,
                     off by default: each tile size is a multi-minute Mosaic
                     compile through the remote tunnel and bursts of them
                     have wedged the backend — run ONE tile per process).

Timing: pipelined loop (enqueue N iterations, fetch one scalar) — the only
honest method on this transport (PERFORMANCE.md methodology).

Usage: python scripts/bench_fusion.py [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def make_params(key, cin, c2, dtype=jnp.float32):
    """He-normal weights for the 5-layer fusion stack (3 before + 2 after)."""
    ks = jax.random.split(key, 5)
    dims = [(cin, c2 // 2), (c2 // 2, c2 // 2), (c2 // 2, c2 // 2),
            (c2, c2), (c2, c2)]
    ws = [jax.random.normal(k, d, dtype) * np.sqrt(2.0 / d[0])
          for k, d in zip(ks, dims)]
    bs = [jnp.zeros((d[1],), dtype) for d in dims]
    return ws, bs


def fusion_baseline(ws, bs, h0, dt):
    """Current model dataflow: 3 before-layers, max over K, concat[max, h],
    2 after-layers, max over K. (Inference: BN folded as identity.)"""
    h = h0.astype(dt)
    for i in range(3):
        h = jax.nn.relu(h @ ws[i].astype(dt) + bs[i].astype(dt))
    h_max = jnp.max(h, axis=-2, keepdims=True)
    y = jnp.concatenate([jnp.broadcast_to(h_max, h.shape), h], axis=-1)
    for i in range(3, 5):
        y = jax.nn.relu(y @ ws[i].astype(dt) + bs[i].astype(dt))
    return jnp.max(y.astype(jnp.float32), axis=-2)


def fusion_split(ws, bs, h0, dt):
    """Split-matmul after0: kernel rows [0:C) hit the broadcast max once."""
    h = h0.astype(dt)
    for i in range(3):
        h = jax.nn.relu(h @ ws[i].astype(dt) + bs[i].astype(dt))
    h_max = jnp.max(h, axis=-2, keepdims=True)
    c = h.shape[-1]
    w4 = ws[3].astype(dt)
    side = h_max @ w4[:c] + bs[3].astype(dt)          # (B, M, 1, C2)
    y = jax.nn.relu(h @ w4[c:] + side)                # broadcast add over K
    y = jax.nn.relu(y @ ws[4].astype(dt) + bs[4].astype(dt))
    return jnp.max(y.astype(jnp.float32), axis=-2)


def flatten_wrap(fn):
    def wrapped(ws, bs, h0, dt):
        b, m, k, c = h0.shape
        out = fn(ws, bs, h0.reshape(b * m, k, c), dt)
        return out.reshape(b, m, -1)
    return wrapped


def time_variant(fn, ws, bs, h0, dt, iters):
    f = jax.jit(lambda x: fn(ws, bs, x, dt))
    out = f(h0)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        acc = h0
        outs = []
        for _ in range(iters):
            outs.append(f(acc))
        # single value fetch at the end
        float(jnp.sum(outs[-1]))
        dtv = (time.perf_counter() - t0) / iters
        best = min(best, dtv)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--m", type=int, default=512)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--c1", type=int, default=128)
    ap.add_argument("--c2", type=int, default=512)
    ap.add_argument("--pallas-tile", type=int, default=0,
                    help="also time fused_fusion_chain at this tile_m "
                         "(0 = skip; measured on v5e: 64->3.22 ms, "
                         "256->1.61, 512->1.69 vs XLA-split 1.48)")
    args = ap.parse_args()

    b, m, k, c1, c2 = args.b, args.m, args.k, args.c1, args.c2
    cin = 3 + c1
    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.normal(size=(b, m, k, cin)).astype(np.float32))
    ws, bs = make_params(jax.random.PRNGKey(0), cin, c2)

    flops = b * m * k * 2 * (cin * c2 // 2 + 2 * (c2 // 2) ** 2 + 2 * c2 * c2)
    flops_split = b * m * (k * 2 * (cin * c2 // 2 + 2 * (c2 // 2) ** 2
                                    + (c2 // 2) * c2 + c2 * c2)
                           + 2 * (c2 // 2) * c2)
    print(f"shapes: ({b},{m},{k},{cin}) c2={c2}; "
          f"baseline {flops/1e9:.2f} GFLOP/batch, split {flops_split/1e9:.2f}")

    variants = [
        ("A baseline", fusion_baseline, flops),
        ("B split", fusion_split, flops_split),
        ("C flat", flatten_wrap(fusion_baseline), flops),
        ("D split+flat", flatten_wrap(fusion_split), flops_split),
    ]
    if args.pallas_tile:
        from usip_tpu.ops.pallas_kernels import fused_fusion_chain

        def pallas_variant(ws, bs, h0, dt):
            # dt ignored: the kernel is bf16-weights/fp32-accumulate by design
            w4 = ws[3]
            split = (ws[0], ws[1], ws[2], w4[:c2 // 2], w4[c2 // 2:], ws[4])
            return fused_fusion_chain(h0, split, bs,
                                      tile_m=args.pallas_tile)

        variants.append((f"E pallas t{args.pallas_tile}", pallas_variant,
                         flops_split))

    ref_out = None
    for dt_name, dt in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
        for name, fn, fl in variants:
            ms, out = time_variant(fn, ws, bs, h0, dt, args.iters)
            out_arr = np.asarray(out).reshape(b, m, -1)
            if ref_out is None:
                ref_out = out_arr
            err = float(np.max(np.abs(out_arr - ref_out))) \
                if out_arr.shape == ref_out.shape else float("nan")
            mfu = fl / ms / 197e12 * (1.0 if dt_name == "bf16" else 2.0)
            print(f"  [{dt_name}] {name:14s} {ms*1e3:7.3f} ms  "
                  f"{fl/ms/1e12:6.1f} TFLOP/s  MFU {mfu*100:5.1f}%  "
                  f"max|d| vs A/bf16 {err:.2e}")


if __name__ == "__main__":
    main()
