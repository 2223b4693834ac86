"""Same-process A/B of the descriptor step under the two wire forms.

The packed (B, 2, N, 3+S) single-buffer wire (steps.PackedPairBatch) was
built to save 4 of the 5 device_put RPCs per batch, but the first on-chip
re-measure read the PURE step (device-resident input, no wire at all) at
447-915 ms vs the 121 ms recorded with the 5-leaf DescriptorBatch — and
fp32 packing is equally slow, so it is the packed layout / in-jit slicing,
not the fp16 decode. This probe times the SAME make_descriptor_train_step
program on the SAME process/tunnel under both input forms to rule out
backend drift. One JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from usip_tpu.config import get_config
    from usip_tpu.train import steps
    from usip_tpu.train.descriptor_loop import init_descriptor_state
    from usip_tpu.train.loop import init_detector_state

    cfg = get_config("kitti", role="descriptor",
                     **{"train.batch_size": 8, "data.dataroot": "/tmp"})
    detector, det_state = init_detector_state(cfg, seed=0)
    descriptor, state = init_descriptor_state(cfg, seed=1)
    step_fn = steps.make_descriptor_train_step(cfg, detector, descriptor)

    b, n = cfg.train.batch_size, cfg.data.input_pc_num
    s = cfg.descriptor.surface_normal_len
    rng = np.random.default_rng(0)
    anc_pc = (rng.normal(size=(b, n, 3)) * 20).astype(np.float32)
    anc_sn = rng.normal(size=(b, n, s)).astype(np.float32)
    pos_pc = (rng.normal(size=(b, n, 3)) * 20).astype(np.float32)
    pos_sn = rng.normal(size=(b, n, s)).astype(np.float32)
    neg_idx = ((np.arange(b) + 3) % b).astype(np.int64)

    key = jax.random.PRNGKey(0)
    ep = jnp.asarray(0)
    out = {}
    forms = {
        "tuple5_f32": steps.DescriptorBatch(
            anc_pc=anc_pc, anc_sn=anc_sn, pos_pc=pos_pc, pos_sn=pos_sn,
            neg_idx=neg_idx),
        "packed_f16": steps.pack_pair_batch(
            anc_pc, anc_sn, pos_pc, pos_sn, neg_idx, wire="float16"),
    }
    for name, host_batch in forms.items():
        batch = jax.device_put(host_batch)
        st, m = step_fn(state, det_state, batch, key, ep)  # compile
        float(m["loss"])
        iters = 20
        t0 = time.perf_counter()
        for i in range(iters):
            st, m = step_fn(st, det_state, batch,
                            jax.random.fold_in(key, i), ep)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        out[name] = {"ms_per_step": round(dt * 1e3, 1),
                     "clouds_per_sec": round(iters and 2 * b / dt, 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
