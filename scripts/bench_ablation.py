"""Pipelined ablation timings of the detection path (no per-call sync)."""
import sys, time
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from usip_tpu.config import get_config
from usip_tpu.models import Detector
from usip_tpu import ops

cfg = get_config("kitti")
b, n, m = 8, cfg.data.input_pc_num, cfg.data.node_num
s = cfg.detector.surface_normal_len
rng = np.random.default_rng(0)
pc = jnp.asarray((rng.normal(size=(b, n, 3)) * 20).astype(np.float32))
sn = jnp.asarray(rng.normal(size=(b, n, s)).astype(np.float32))
model = Detector(cfg.detector)
variables = jax.jit(lambda k: model.init(k, pc, sn, jnp.zeros((1, m, 3)) + pc[:, :m, :], train=False))(jax.random.PRNGKey(0))
key = jax.random.PRNGKey(1)

def timeloop(name, fn, iters=30):
    out = fn(0); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(i)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:42s} {dt:8.2f} ms/batch8  ({b/dt*1000:7.1f} clouds/s)", flush=True)

@jax.jit
def full(pc, sn, k):
    node = ops.sample_nodes(k, pc, m, 8)
    return model.apply(variables, pc, sn, node, train=False)
timeloop("full detect (fps+forward)", lambda i: full(pc, sn, jax.random.fold_in(key, i)))

node0 = ops.sample_nodes(key, pc, m, 8)
@jax.jit
def fwd_only(pc, sn, node, t):
    return model.apply(variables, pc + t, sn, node, train=False)
timeloop("forward only (precomputed nodes)", lambda i: fwd_only(pc, sn, node0, i * 1e-6))

@jax.jit
def fps_only(pc, k):
    return ops.sample_nodes(k, pc, m, 8)
timeloop("fps only", lambda i: fps_only(pc, jax.random.fold_in(key, i)))

