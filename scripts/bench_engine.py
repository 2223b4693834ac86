"""Training-engine throughput at KITTI scale (VERDICT round-1 item 2).

Builds a synthetic KITTI-layout npy tree (20480-pt clouds), then times:
  1. the pure jitted siamese train step (pipelined, device-resident batch),
  2. the full DetectorEngine epoch loop over the real loader stack
     (native C++ batch loader -> BatchLoader -> device prefetch -> step).

The round-1 gap was 333 vs 34-116 clouds/s; target is engine within ~1.5x of
the pure step. Run on the real chip: python scripts/bench_engine.py
"""

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_kitti_tree(root, seqs=9, frames=10, pts=20480, poses=False):
    from usip_tpu.data.loaders import KITTI_NP_FOLDER
    rng = np.random.default_rng(0)
    for seq in range(seqs):
        folder = os.path.join(root, "data_odometry_velodyne", "numpy",
                              f"{seq:02d}", KITTI_NP_FOLDER)
        os.makedirs(folder, exist_ok=True)
        pose_dir = os.path.join(root, "poses", f"{seq:02d}")
        if poses:
            os.makedirs(pose_dir, exist_ok=True)
        for i in range(frames):
            np.save(os.path.join(folder, f"{i:06d}.npy"),
                    (rng.normal(size=(pts, 8)) * 20).astype(np.float32))
            if poses:
                # straight 1.5 m-spaced trajectory: every neighbor within the
                # preset positive_radius is a valid positive
                pose = np.eye(4)
                pose[0, 3] = 1.5 * i
                np.savez(os.path.join(pose_dir, f"{i:06d}.npz"), pose=pose)


def bench_descriptor(extra):
    """Descriptor-engine streaming throughput (round-3 VERDICT weak #2):
    loader-only vs pure jitted descriptor step vs full DescriptorEngine epoch
    at the kitti descriptor preset (frozen detector + scan triplet)."""
    import jax
    import jax.numpy as jnp

    from usip_tpu.config import get_config
    from usip_tpu.data.descriptor_loaders import KittiDescriptorDataset
    from usip_tpu.data.pipeline import BatchLoader
    from usip_tpu.train.checkpoint import save_checkpoint
    from usip_tpu.train.descriptor_loop import DescriptorEngine
    from usip_tpu.train.loop import init_detector_state

    root = tempfile.mkdtemp(prefix="bench_kitti_desc_")
    try:
        frames = 16
        make_kitti_tree(root, seqs=9, frames=frames, poses=True)
        cfg = get_config("kitti", role="descriptor", **{
            "data.dataroot": root, "train.batch_size": 8,
            "train.log_every": 1000, "train.epochs": 2,
            "train.name": "bench_desc",
            "train.checkpoint_dir": os.path.join(root, "ckpt"), **extra})
        _, det_state = init_detector_state(cfg, seed=0)
        det_ckpt = os.path.join(root, "det.msgpack")
        save_checkpoint(det_ckpt, det_state)

        ds = KittiDescriptorDataset(cfg.data, "train",
                                    sn_len=cfg.descriptor.surface_normal_len)
        n_items = len(ds)
        print(f"descriptor dataset: {n_items} anchor/positive pairs, "
              f"input {cfg.data.input_pc_num} pts, M={cfg.data.node_num}, "
              f"wire {cfg.data.wire_dtype}")
        loader = BatchLoader(ds, cfg.train.batch_size, shuffle=True,
                             num_workers=cfg.data.num_workers)

        # -------- loader-only throughput (host side; 2 clouds per pair) ----
        t0 = time.perf_counter()
        nb = 0
        for batch in loader:
            nb += 1
        dt = time.perf_counter() - t0
        print(f"loader only: {nb} batches in {dt:.2f}s = "
              f"{nb * cfg.train.batch_size * 2 / dt:.1f} clouds/s")

        def mine(raw):
            return ds.mine_negative_indices(np.asarray(raw["seq"]),
                                            np.asarray(raw["pose"]))

        engine = DescriptorEngine(cfg, det_ckpt, train_loader=loader,
                                  mine_negatives=mine)

        # -------- pure jitted step (device-resident batch, pipelined) ------
        raw = next(iter(loader))
        batch = engine._device_batch(raw)
        key = jax.random.PRNGKey(0)
        ep = jnp.asarray(0)
        state = engine.state
        state, m = engine.step_fn(state, engine.det_state, batch, key, ep)
        float(m["loss"])
        iters = 30
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = engine.step_fn(state, engine.det_state, batch,
                                      jax.random.fold_in(key, i), ep)
        float(m["loss"])
        dt = time.perf_counter() - t0
        pure = iters * cfg.train.batch_size * 2 / dt
        print(f"pure step: {pure:.1f} clouds/s ({dt / iters * 1e3:.1f} ms/step)")
        engine.state = state

        # -------- full engine epoch (loader -> prefetch -> step) -----------
        engine.train_epoch(0)  # warm epoch (compile + page cache)
        t0 = time.perf_counter()
        engine.train_epoch(1)
        dt = time.perf_counter() - t0
        steps = n_items // cfg.train.batch_size
        eng = steps * cfg.train.batch_size * 2 / dt
        print(f"engine epoch: {steps} steps in {dt:.2f}s = {eng:.1f} clouds/s "
              f"({pure / eng:.2f}x off pure step)")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main():
    import jax
    import jax.numpy as jnp

    from usip_tpu.config import get_config
    from usip_tpu.data.loaders import KittiDataset
    from usip_tpu.data.pipeline import BatchLoader
    from usip_tpu.train.loop import DetectorEngine

    # extra dotted overrides from argv, e.g. data.wire_dtype=quant
    # (parsed before the tree build so a bad argument fails fast);
    # 'phase=descriptor' switches to the descriptor-engine bench
    import json as _json
    extra = {}
    phase = "detector"
    for a in sys.argv[1:]:
        if "=" not in a:
            raise SystemExit(f"bench_engine: arguments must be dotted "
                             f"config overrides key=value, got {a!r}")
        k, v = a.split("=", 1)
        if k == "phase":
            phase = v
            continue
        try:
            extra[k] = _json.loads(v)
        except _json.JSONDecodeError:
            extra[k] = v
    if phase == "descriptor":
        bench_descriptor(extra)
        return

    root = tempfile.mkdtemp(prefix="bench_kitti_")
    try:
        frames = 16
        make_kitti_tree(root, seqs=9, frames=frames)
        cfg = get_config("kitti", **{
            "data.dataroot": root, "train.batch_size": 8,
            "train.log_every": 1000, "train.epochs": 2,
            "train.name": "bench_engine",
            "train.checkpoint_dir": os.path.join(root, "ckpt"), **extra})
        ds = KittiDataset(cfg.data, "train", sn_len=cfg.detector.surface_normal_len)
        n_items = len(ds)
        print(f"dataset: {n_items} clouds of 20480 pts")
        if cfg.data.device_sampling:
            from usip_tpu.data.loaders import ParentCloudDataset
            ds = ParentCloudDataset(ds)
            print(f"device_sampling on: parent {cfg.data.parent_pc_num} pts, "
                  f"wire {cfg.data.wire_dtype}")

        loader = BatchLoader(ds, cfg.train.batch_size, shuffle=True,
                             num_workers=cfg.data.num_workers)

        # -------- loader-only throughput (host side) --------
        t0 = time.perf_counter()
        nb = 0
        for batch in loader:
            nb += 1
        dt = time.perf_counter() - t0
        print(f"loader only: {nb} batches in {dt:.2f}s = "
              f"{nb * cfg.train.batch_size * 2 / dt:.1f} clouds/s")

        engine = DetectorEngine(cfg, loader)

        # -------- pure jitted step (device-resident batch, pipelined) --------
        raw = next(iter(loader))
        batch = engine._device_batch(raw)
        key = jax.random.PRNGKey(0)
        ep = jnp.asarray(0)
        state = engine.state
        state, m = engine.train_step(state, batch, key, ep)  # compile
        float(m["loss"])
        iters = 30
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = engine.train_step(state, batch,
                                         jax.random.fold_in(key, i), ep)
        # value fetch, not block_until_ready: on the serving tunnel,
        # block_until_ready can return before queued steps execute
        float(m["loss"])
        dt = time.perf_counter() - t0
        pure = iters * cfg.train.batch_size * 2 / dt
        print(f"pure step: {pure:.1f} clouds/s ({dt / iters * 1e3:.1f} ms/step)")
        engine.state = state

        # -------- full engine epoch (loader -> prefetch -> step) --------
        engine.train_epoch(0)  # warm epoch (compile + page cache)
        t0 = time.perf_counter()
        engine.train_epoch(1)
        dt = time.perf_counter() - t0
        steps = n_items // cfg.train.batch_size
        eng = steps * cfg.train.batch_size * 2 / dt
        print(f"engine epoch: {steps} steps in {dt:.2f}s = {eng:.1f} clouds/s "
              f"({pure / eng:.2f}x off pure step)")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
