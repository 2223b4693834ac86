"""AOT artifact serving throughput on the real chip.

Times (a) the portable cpu+tpu detector artifact (jax.export/StableHLO,
weights baked in, XLA FPS — no Mosaic custom calls), (b) the TPU-only
artifact that keeps the Mosaic fps_pallas kernel, and (c) the in-process
jitted paths with matching FPS backends, all at the bench.py protocol
(kitti preset, batch 8, pipelined, best of 3). Answers: what does AOT
portability cost at serving time, and does the TPU-only form close it?

Run on the real chip: python scripts/bench_artifact.py
"""

import json
import os
import shutil
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# same hazard as bench.py: a wedged remote backend blocks device calls in C++
# where Python signals can't reach — a daemon timer guarantees termination
WATCHDOG_SECONDS = int(os.environ.get("BENCH_WATCHDOG_SECONDS", "2700"))


def _arm_watchdog():
    def fire():
        print(json.dumps({"error": f"watchdog: no result within "
                                   f"{WATCHDOG_SECONDS}s (TPU backend "
                                   "unresponsive)"}), flush=True)
        os._exit(2)

    t = threading.Timer(WATCHDOG_SECONDS, fire)
    t.daemon = True
    t.start()
    return t


def main():
    import jax
    import jax.numpy as jnp

    from usip_tpu.config import get_config
    from usip_tpu.model_artifact import export_detector_artifact, load_artifact
    from usip_tpu.ops.sampling import force_xla_fps
    from usip_tpu.train.checkpoint import save_checkpoint
    from usip_tpu.train.loop import init_detector_state
    from usip_tpu.train.steps import make_detector_infer

    watchdog = _arm_watchdog()
    batch, iters = 8, 50
    cfg = get_config("kitti", **{"train.name": "bench_artifact"})
    n, s = cfg.data.input_pc_num, cfg.detector.surface_normal_len

    tmp = tempfile.mkdtemp(prefix="bench_artifact_")
    ckpt = os.path.join(tmp, "state.msgpack")
    art_path = os.path.join(tmp, "detector.usip")
    tpu_art_path = os.path.join(tmp, "detector_tpu.usip")
    model, state = init_detector_state(cfg, cfg.train.seed)
    save_checkpoint(ckpt, state)

    t0 = time.perf_counter()
    header = export_detector_artifact(cfg, ckpt, art_path, batch=batch,
                                      platforms=("cpu", "tpu"))
    export_s = time.perf_counter() - t0
    size_mb = os.path.getsize(art_path) / 1e6
    print(f"export: {export_s:.1f}s, {size_mb:.1f} MB, header={header}")
    export_detector_artifact(cfg, ckpt, tpu_art_path, batch=batch,
                             platforms=("tpu",))

    rng = np.random.default_rng(0)
    pc = jnp.asarray((rng.normal(size=(batch, n, 3)) * 20).astype(np.float32))
    sn_raw = rng.normal(size=(batch, n, s)).astype(np.float32)
    sn_raw[..., :3] /= np.linalg.norm(sn_raw[..., :3], axis=-1, keepdims=True)
    sn = jnp.asarray(sn_raw)

    def timed(fn, label):
        # raw (2,) uint32 keys — the artifact's pinned key arg layout,
        # accepted identically by the in-process infer
        keys = [jnp.asarray(jax.random.PRNGKey(i), jnp.uint32)
                for i in range(2 * iters + 2)]
        for w in range(2):  # compile + first-dispatch warmup
            out = fn(pc, sn, keys[w])
            jax.block_until_ready(out)
        best = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            for i in range(iters):
                out = fn(pc, sn, keys[2 + (rep % 2) * iters + i])
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        cps = batch * iters / best
        print(f"{label}: {cps:.1f} clouds/s ({best / iters * 1e3:.2f} ms/batch)")
        return cps

    art = load_artifact(art_path)
    art_cps = timed(lambda p, q, k: art(p, q, k), "artifact (AOT, xla fps)")

    tpu_art = load_artifact(tpu_art_path)
    tpu_art_cps = timed(lambda p, q, k: tpu_art(p, q, k),
                        "artifact (AOT, tpu-only, mosaic fps)")

    # apples-to-apples in-process jits: matching FPS backends
    infer = make_detector_infer(cfg, model)
    with force_xla_fps():  # tracing happens inside timed()'s warmup call
        jit_cps = timed(jax.jit(lambda p, q, k: infer(state, p, q, k)),
                        "in-process jit (xla fps)")
    jit_mosaic_cps = timed(jax.jit(lambda p, q, k: infer(state, p, q, k)),
                           "in-process jit (mosaic fps)")

    watchdog.cancel()
    print(json.dumps({
        "artifact_clouds_per_sec": round(art_cps, 1),
        "tpu_artifact_clouds_per_sec": round(tpu_art_cps, 1),
        "jit_xla_fps_clouds_per_sec": round(jit_cps, 1),
        "jit_mosaic_fps_clouds_per_sec": round(jit_mosaic_cps, 1),
        "aot_overhead_pct": round((jit_cps / art_cps - 1) * 100, 1),
        "tpu_aot_overhead_pct": round(
            (jit_mosaic_cps / tpu_art_cps - 1) * 100, 1),
        "export_seconds": round(export_s, 1),
        "artifact_mb": round(size_mb, 1)}))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
