"""Device-resident train-step throughput refresh (detector + descriptor).

Round-2 baselines (PERFORMANCE.md): detector train step 274-288 clouds/s
(288 with bucketed t=2 FPS), descriptor train step 272 (scan) / 269 (CGF) at
the kitti descriptor role. Round-3 changes in the step's path: Mosaic VMEM
FPS (exact t=1 default), two-stage exact top-k in the descriptor's exact
ball. Value-fetch timing (block_until_ready lies for state-chained programs
on this transport — PERFORMANCE.md methodology); run alone on the chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from usip_tpu.config import get_config
from usip_tpu.train.loop import init_detector_state
from usip_tpu.train.steps import (DescriptorBatch, DetectorBatch,
                                  make_descriptor_train_step,
                                  make_detector_train_step)


def chain_time(name, step0, state_and_fixed, iters=24, clouds_per_step=8):
    """Run `iters` state-chained steps, fetch one metric value at the end."""
    run = jax.jit(step0, donate_argnums=(0,))
    state, fixed = state_and_fixed
    state, metrics = run(state, *fixed(0))  # compile
    float(jax.tree_util.tree_leaves(metrics)[0])
    best = np.inf
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = run(state, *fixed(rep * iters + i + 1))
        float(jax.tree_util.tree_leaves(metrics)[0])  # value fetch
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:44s} {best*1e3:8.2f} ms/step "
          f"({clouds_per_step/best:7.1f} clouds/s)", flush=True)
    return state


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)

    # ---- detector train step (kitti preset, batch 8, device-resident) ----
    cfg = get_config("kitti", **{"data.device_sampling": False})
    b, n = 8, cfg.data.input_pc_num
    s = cfg.detector.surface_normal_len
    model, state = init_detector_state(cfg, seed=0)
    step = make_detector_train_step(cfg, model)

    batch = DetectorBatch(
        src_pc=jnp.asarray((rng.normal(size=(b, n, 3)) * 20).astype(np.float32)),
        src_sn=jnp.asarray(rng.normal(size=(b, n, s)).astype(np.float32)),
        dst_pc=jnp.asarray((rng.normal(size=(b, n, 3)) * 20).astype(np.float32)),
        dst_sn=jnp.asarray(rng.normal(size=(b, n, s)).astype(np.float32)))

    def fixed_det(i):
        return (batch, jax.random.fold_in(key, i), jnp.asarray(0))

    # bench_engine.py counts both siamese subsamples (batch*2 clouds/step);
    # match it so the numbers line up with the engine/PERFORMANCE tables
    chain_time("detector train step (siamese, batch 8)", step,
               (state, fixed_det), clouds_per_step=2 * b)

    # ---- descriptor train step (kitti descriptor role, batch 8) ----
    dcfg = get_config("kitti", role="descriptor",
                      **{"data.device_sampling": False})
    det_model, det_state = init_detector_state(dcfg, seed=0)
    from usip_tpu.train.descriptor_loop import init_descriptor_state
    desc_model, desc_state = init_descriptor_state(dcfg, seed=0)
    n2, s2 = dcfg.data.input_pc_num, dcfg.detector.surface_normal_len
    anc = jnp.asarray((rng.normal(size=(b, n2, 3)) * 20).astype(np.float32))
    asn = jnp.asarray(rng.normal(size=(b, n2, s2)).astype(np.float32))
    pos = jnp.asarray((rng.normal(size=(b, n2, 3)) * 20).astype(np.float32))
    psn = jnp.asarray(rng.normal(size=(b, n2, s2)).astype(np.float32))
    dbatch = DescriptorBatch(anc_pc=anc, anc_sn=asn, pos_pc=pos, pos_sn=psn,
                             neg_idx=jnp.asarray(np.roll(np.arange(b), 1)))
    dstep = make_descriptor_train_step(dcfg, det_model, desc_model,
                                       use_cgf=False)

    def step_desc(desc_state, batch, k, epoch, det_state=det_state):
        return dstep(desc_state, det_state, batch, k, epoch)

    def fixed_desc(i):
        return (dbatch, jax.random.fold_in(key, 10000 + i), jnp.asarray(0))

    chain_time(f"descriptor train step (scan, M={dcfg.data.node_num})",
               step_desc, (desc_state, fixed_desc), clouds_per_step=b)


if __name__ == "__main__":
    main()
