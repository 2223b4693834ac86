"""True multi-process data parallelism: 2 processes x 4 virtual CPU devices
with a real coordinator + Gloo collectives (the CPU stand-in for a 2-host TPU
pod over DCN). Certifies SURVEY §2.5's multi-node row with execution, not just
code: the unchanged engine pieces (make_mesh / replicate / shard_batch / the
jitted detector train step) run per-host data loading, cross-process gradient
all-reduce, and process-0-only checkpointing — and match the single-process
8-device run bit-for-tolerance."""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_losses() -> list:
    """The same 2 train steps on this process's own 8-device mesh."""
    from usip_tpu.config import get_config
    from usip_tpu.data.synthetic import SyntheticDataset
    from usip_tpu.models import Detector
    from usip_tpu.parallel import make_mesh, replicate, shard_batch
    from usip_tpu.train import (DetectorBatch, TrainState, make_adam,
                                make_detector_train_step)

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

    mesh = make_mesh(8)
    state = replicate(mesh, state)
    batch = DetectorBatch(**shard_batch(
        mesh, {k: np.asarray(v) for k, v in raw.items()}))
    step = jax.jit(make_detector_train_step(cfg, model))
    key = jax.random.PRNGKey(5)
    losses = []
    for i in range(2):
        state, metrics = step(state, batch, jax.random.fold_in(key, i),
                              jnp.asarray(0))
        losses.append(float(metrics["loss"]))
    return losses


def test_two_process_train_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device count
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, f"no RESULT line in:\n{out[-3000:]}"
        r = json.loads(line[-1][len("RESULT "):])
        results[r["pid"]] = r

    for r in results.values():
        assert r["process_count"] == 2
        assert r["global_devices"] == 8
        assert r["local_devices"] == 4
    # both processes observe the identical replicated loss
    np.testing.assert_array_equal(results[0]["losses"], results[1]["losses"])

    # and it matches this process's own single-process 8-device run to
    # cross-process-reduction-order tolerance
    ref = _single_process_losses()
    np.testing.assert_allclose(results[0]["losses"], ref, rtol=2e-5)

    # process-0-only checkpointing: exactly one writer
    assert os.path.exists(tmp_path / "proc0.msgpack")
    assert not os.path.exists(tmp_path / "proc1.msgpack")


def test_cli_multihost_train(tmp_path):
    """The full user surface: two `train-detector` CLI processes with
    --coordinator-address/--num-processes/--process-id train one global model;
    only process 0 logs and writes checkpoints."""
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    common = [sys.executable, "-m", "usip_tpu.cli", "train-detector",
              "--dataset", "modelnet", "--synthetic", "--platform", "cpu",
              "--epochs", "1", "--batch-size", "4", "--num-devices", "8",
              "--name", "mp", "--checkpoints-dir", str(tmp_path),
              "--override", "data.input_pc_num=128",
              "--override", "data.node_num=16",
              "--override", "detector.c1=16",
              "--override", "detector.c2=32",
              "--override", "detector.node_knn_k=4",
              "--coordinator-address", f"127.0.0.1:{port}",
              "--num-processes", "2"]
    procs = [subprocess.Popen(common + ["--process-id", str(pid)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env,
                              cwd=REPO) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"CLI worker failed:\n{out[-3000:]}"
    # process 0 prints the training log; process 1 stays silent
    assert "[train]" in outs[0]
    assert "[train]" not in outs[1]
    assert os.path.exists(tmp_path / "mp" / "last.msgpack")
