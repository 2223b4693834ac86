"""A/B the exact knn/ball detector trunks before/after two-stage smallest_k.

Round-3 baseline (direct lax.top_k, PERFORMANCE.md): knn 62.6 ms / ball
65.6 ms forward-only at KITTI scale (batch 8, precomputed nodes) — the exact
selection was ~59 ms of it. smallest_k now auto-dispatches the two-stage
chunked form (bit-identical results). Pipelined timing; run alone on the chip.
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
    print(f"{name:46s} {ms:8.2f} ms/batch8  ({8/ms*1000:7.1f} clouds/s)",
          flush=True)


def main():
    cfg = get_config("kitti")
    b, n, m = 8, cfg.data.input_pc_num, cfg.data.node_num
    s = cfg.detector.surface_normal_len
    rng = np.random.default_rng(0)
    pc = jnp.asarray((rng.normal(size=(b, n, 3)) * 20).astype(np.float32))
    sn = jnp.asarray(rng.normal(size=(b, n, s)).astype(np.float32))
    key = jax.random.PRNGKey(1)
    node0 = ops.sample_nodes(key, pc, m, 8)

    for grouping in ("knn", "ball"):
        dcfg = dataclasses.replace(cfg.detector, grouping=grouping,
                                   group_method="exact")
        model = Detector(dcfg)
        variables = jax.jit(
            lambda k: model.init(k, pc, sn, node0, train=False)
        )(jax.random.PRNGKey(0))

        @jax.jit
        def fwd(pc, sn, node, t, model=model, variables=variables):
            return model.apply(variables, pc + t, sn, node, train=False)

        timeloop(f"{grouping} trunk exact, forward only",
                 lambda i: fwd(pc, sn, node0, i * 1e-6))


if __name__ == "__main__":
    main()
