"""Cross-implementation report: the ACTUAL reference source vs this framework.

Two jobs:

1. **Parity** — run the reference ``RPN_Detector`` (CPU, pure-torch extension
   shims, train/reference_runtime.py) with THIS framework's exported weights
   on the same inputs and report output deltas. Complements
   tests/test_reference_parity.py at configurable (default KITTI) scale.

2. **Baseline anchor** (--bench) — measure the reference detector's
   clouds/sec on this host's CPU at the export-tool protocol scale
   (save_keypoints.py:278,333-334). BENCH's ``vs_baseline`` denominator is an
   *estimated* 1080Ti figure (BASELINE.md); this gives one measured anchor on
   shared hardware.

Usage:
  python scripts/parity_vs_reference.py [--reference /root/reference]
      [--n 4096] [--m 256] [--batch 2] [--bench]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--m", type=int, default=256)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--bench", action="store_true",
                    help="also time the reference forward on CPU")
    ap.add_argument("--bench-iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import torch

    from usip_tpu.config import get_config
    from usip_tpu.models import Detector
    from usip_tpu.train import reference_runtime as rr

    torch.set_num_threads(os.cpu_count() or 1)
    cfg = get_config("kitti", **{
        "data.input_pc_num": args.n, "data.node_num": args.m,
        "detector.compute_dtype": "float32"})
    rng = np.random.default_rng(0)
    b = args.batch
    pc = (rng.normal(size=(b, args.n, 3)) * 10).astype(np.float32)
    sn = rng.normal(size=(b, args.n, 4)).astype(np.float32)
    node = pc[:, :args.m].copy()

    model = Detector(cfg.detector)
    variables = model.init(jax.random.PRNGKey(0), pc, sn, node, train=False)
    anchors, kp, sg = jax.jit(
        lambda v, a, c, d: model.apply(v, a, c, d, train=False))(
        variables, pc, sn, node)

    net = rr.build_reference_detector(cfg, args.reference, variables)
    xt = torch.as_tensor(pc.transpose(0, 2, 1))
    st = torch.as_tensor(sn.transpose(0, 2, 1))
    nt = torch.as_tensor(node.transpose(0, 2, 1))
    with torch.no_grad():
        r_anchor, r_kp, r_sg, _ = net(xt, st, nt, is_train=False, epoch=None)

    kp_diff = np.abs(np.asarray(kp) - r_kp.numpy().transpose(0, 2, 1))
    sg_diff = np.abs(np.asarray(sg) - r_sg.numpy())
    an_diff = np.abs(np.asarray(anchors) - r_anchor.numpy().transpose(0, 2, 1))
    print(f"parity @ B={b} N={args.n} M={args.m} (reference source on CPU, "
          f"our exported weights):")
    print(f"  anchors   max|d|={an_diff.max():.2e}")
    print(f"  keypoints max|d|={kp_diff.max():.2e} median={np.median(kp_diff):.2e}")
    print(f"  sigmas    max|d|={sg_diff.max():.2e}")
    ok = an_diff.max() < 1e-3 and kp_diff.max() < 1e-1 and \
        np.median(kp_diff) < 1e-4
    print(f"  parity: {'OK' if ok else 'DIVERGED'}")

    if args.bench:
        with torch.no_grad():
            net(xt, st, nt, is_train=False, epoch=None)  # warm
            t0 = time.perf_counter()
            for _ in range(args.bench_iters):
                net(xt, st, nt, is_train=False, epoch=None)
            dt = (time.perf_counter() - t0) / args.bench_iters
        print(f"reference forward on host CPU ({torch.get_num_threads()} "
              f"threads): {dt * 1e3:.1f} ms/batch{b} "
              f"= {b / dt:.2f} clouds/s")

    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
