"""One process of a 2-process data-parallel train run (tests/test_multiprocess.py).

Run as ``python tests/mp_worker.py <process_id> <coordinator_port> <out_dir>``.
Each process owns 4 virtual CPU devices; after ``initialize_distributed`` the
global mesh spans all 8 and the ordinary engine pieces (``make_mesh`` /
``replicate`` / ``shard_batch`` / the jitted train step) run unchanged — the
multi-host path the reference has no analog of (its ``nn.DataParallel`` is
single-host only, models/keypoint_detector.py:34-37).

Each process feeds only its LOCAL slice of the global batch (per-host loading);
process 0 alone writes the checkpoint. Prints one ``RESULT {json}`` line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, port, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon

    from usip_tpu.parallel import (initialize_distributed, make_mesh,
                                   replicate, shard_batch)
    initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)

    import jax.numpy as jnp
    import numpy as np

    from usip_tpu.config import get_config
    from usip_tpu.data.synthetic import SyntheticDataset
    from usip_tpu.models import Detector
    from usip_tpu.train import (DetectorBatch, TrainState, make_adam,
                                make_detector_train_step)
    from usip_tpu.train.checkpoint import save_checkpoint

    # mirrors tests/test_train.py::test_data_parallel_matches_single_device
    # (fp32 so the cross-process Gloo all-reduce only moves reduction order)
    cfg = get_config(
        "modelnet",
        **{"data.input_pc_num": 128, "data.node_num": 16,
           "detector.c1": 16, "detector.c2": 32, "detector.node_knn_k": 4,
           "train.batch_size": 8, "train.lr": 1e-3,
           "detector.compute_dtype": "float32"})
    model = Detector(cfg.detector)
    n, m, s = (cfg.data.input_pc_num, cfg.data.node_num,
               cfg.detector.surface_normal_len)
    dummy = (jnp.zeros((2, n, 3)), jnp.zeros((2, n, s)), jnp.zeros((2, m, 3)))
    variables = model.init(jax.random.PRNGKey(0), *dummy, train=False)
    state = TrainState.create(variables, make_adam(cfg.train.lr))

    ds = SyntheticDataset(size=8, input_pc_num=n, surface_normal_len=s, seed=3)
    raw = ds.batch(np.random.default_rng(0), cfg.train.batch_size)
    half = cfg.train.batch_size // 2
    local = {k: np.asarray(v)[pid * half:(pid + 1) * half]
             for k, v in raw.items()}

    mesh = make_mesh()  # all 8 global devices
    state = replicate(mesh, state)
    batch = DetectorBatch(**shard_batch(mesh, local))

    step = jax.jit(make_detector_train_step(cfg, model))
    key = jax.random.PRNGKey(5)
    losses = []
    for i in range(2):
        state, metrics = step(state, batch, jax.random.fold_in(key, i),
                              jnp.asarray(0))
        losses.append(float(metrics["loss"]))

    # every process calls save; only process 0 may write its file
    save_checkpoint(os.path.join(out_dir, f"proc{pid}.msgpack"), state)
    print("RESULT " + json.dumps({
        "pid": pid,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": len(jax.local_devices()),
        "losses": losses,
    }), flush=True)


if __name__ == "__main__":
    main()
