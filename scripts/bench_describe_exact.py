"""Serving pipeline (FPS + detector + descriptor, ONE jitted program) with the
descriptor ball query's *exact* path, after two-stage smallest_k.

Round-2 baselines (PERFORMANCE.md): exact 109 clouds/s (separately-timed
stages), auto/bf16 350 clouds/s at 512 keypoints in the single program. The
exact ball's 59.3 ms lax.top_k now runs as the bit-identical two-stage form
(26.0 ms standalone). Pipelined timing; run alone on the chip.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from usip_tpu.config import get_config
from usip_tpu.models import Detector
from usip_tpu.models.descriptor import Descriptor
from usip_tpu import ops


def timeloop(name, fn, iters=30):
    out = fn(0)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(i)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    ms = best * 1e3
    print(f"{name:52s} {ms:8.2f} ms/batch8  ({8/ms*1000:7.1f} clouds/s)",
          flush=True)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=None,
                    help="keypoint count (default: the kitti node_num, 512; "
                         "the kitti descriptor preset uses 256)")
    args = ap.parse_args()
    cfg = get_config("kitti")
    b, n, m = 8, cfg.data.input_pc_num, args.m or cfg.data.node_num
    s = cfg.detector.surface_normal_len
    rng = np.random.default_rng(0)
    pc = jnp.asarray((rng.normal(size=(b, n, 3)) * 20).astype(np.float32))
    sn = jnp.asarray(rng.normal(size=(b, n, s)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    det = Detector(cfg.detector)
    node0 = ops.sample_nodes(key, pc, m, 8)
    det_vars = jax.jit(lambda k: det.init(k, pc, sn, node0, train=False))(
        jax.random.PRNGKey(0))

    for method, dtype in (("exact", "float32"), ("auto", "bfloat16")):
        dcfg = dataclasses.replace(cfg.descriptor, ball_method=method,
                                   ball_compute_dtype=dtype)
        desc = Descriptor(dcfg)
        desc_vars = jax.jit(
            lambda k: desc.init(k, pc, sn, pc[:, :m], key=k, train=False)
        )(jax.random.PRNGKey(2))

        @jax.jit
        def serve(pc, sn, k, desc=desc, desc_vars=desc_vars):
            node = ops.sample_nodes(k, pc, m, 8)
            _, kp, sig = det.apply(det_vars, pc, sn, node, train=False)
            d, _ = desc.apply(desc_vars, pc, sn, kp, key=k, train=False)
            return kp, sig, d

        timeloop(f"fps+detect+describe, ball {method}/{dtype}",
                 lambda i: serve(pc, sn, jax.random.fold_in(key, i)))


if __name__ == "__main__":
    main()
