"""Probe: why do chained (B,N,C) matmuls run far below one matmul's rate?

Reproduces the trunk-MLP anomaly (PERFORMANCE.md round-3: pointnet stacks at
~2% MFU): a single (8,16384,64)@(64,64) matmul measures ~0.015 ms but a
two-deep chain measured ~1.1 ms. Sweeps chain depth, 2-D vs 3-D layout,
dtype, and relu/BN-style interleaving to isolate the cause.

Pipelined timing (enqueue N, one value fetch); run alone on the chip.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeloop(name, fn, *args, iters=30):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(iters)]
        jnp.sum(outs[-1]).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:52s} {best*1e3:8.3f} ms", flush=True)
    return best


def main():
    b, n, c = 8, 16384, 64
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    x2 = x3.reshape(b * n, c)
    ws = [jnp.asarray(rng.normal(size=(c, c)).astype(np.float32) * 0.1)
          for _ in range(3)]

    def chain(x, k, dt):
        y = x.astype(dt)
        for i in range(k):
            y = y @ ws[i].astype(dt)
        return jnp.sum(y.astype(jnp.float32))

    for dt, tag in ((jnp.bfloat16, "bf16"), (jnp.float32, "fp32")):
        for k in (1, 2, 3):
            timeloop(f"3D (8,16384,64) chain x{k} {tag}",
                     lambda x, k=k, dt=dt: chain(x, k, dt), x3)
        for k in (1, 2, 3):
            timeloop(f"2D (131072,64) chain x{k} {tag}",
                     lambda x, k=k, dt=dt: chain(x, k, dt), x2)

    # relu between matmuls (the SharedMLP shape, no BN)
    def chain_relu(x, k, dt):
        y = x.astype(dt)
        for i in range(k):
            y = jax.nn.relu(y @ ws[i].astype(dt))
        return jnp.sum(y.astype(jnp.float32))

    timeloop("3D chain x3 bf16 + relu",
             lambda x: chain_relu(x, 3, jnp.bfloat16), x3)

    # BN-eval-style fp32 round trip between matmuls
    sc = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    def chain_bn(x, k):
        y = x.astype(jnp.bfloat16)
        for i in range(k):
            y = y @ ws[i].astype(jnp.bfloat16)
            y = (y.astype(jnp.float32) * sc).astype(jnp.bfloat16)
            y = jax.nn.relu(y)
        return jnp.sum(y.astype(jnp.float32))

    timeloop("3D chain x3 bf16 + fp32-BN-affine + relu",
             lambda x: chain_bn(x, 3), x3)

    # wider channels: is C=64 (half a lane tile) the issue?
    c2 = 128
    xw = jnp.asarray(rng.normal(size=(b, n, c2)).astype(np.float32))
    ws2 = [jnp.asarray(rng.normal(size=(c2, c2)).astype(np.float32) * 0.1)
           for _ in range(3)]

    def chainw(x, k, dt):
        y = x.astype(dt)
        for i in range(k):
            y = y @ ws2[i].astype(dt)
        return jnp.sum(y.astype(jnp.float32))

    for k in (1, 3):
        timeloop(f"3D (8,16384,128) chain x{k} bf16",
                 lambda x, k=k: chainw(x, k, jnp.bfloat16), xw)


if __name__ == "__main__":
    main()
