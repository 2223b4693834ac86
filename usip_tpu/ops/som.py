"""Self-organizing-map node training + potential-field initialization, jax-native.

Offline node-precomputation utilities matching reference ``util/som.py:57-418``
(SOM/BatchSOM with gaussian grid-neighborhood batch updates) and
``util/potential_field.py`` (repulsion-based uniform node placement). The released
training configs use FPS nodes from the loaders instead (SURVEY.md §2.2), but the
reference ships these as the documented node-initialization path, so the rebuild
carries them: vectorized (no per-node python loops), vmappable over batches.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def potential_field_init(node_num: int, dim: int = 3, iterations: int = 100,
                         learning_rate: float = 0.01, seed: int = 2017
                         ) -> np.ndarray:
    """Repulsion-based uniform placement in [-1, 1]^dim
    (util/potential_field.py:11-86): inverse-square node-node forces + linear wall
    force, 100 gradient steps, then row-major (x, then y) grid reorder.

    Deterministic: the reference seeds numpy with 2017 for the init.
    """
    rng = np.random.RandomState(seed)
    node = rng.rand(node_num, dim) * 2 - 1

    node_j = jnp.asarray(node)

    @jax.jit
    def step(nodes):
        # node-node: f(src->dst) = (dst - src) / |d|^3   (:21-26)
        diff = nodes[:, None, :] - nodes[None, :, :]        # (M, M, D) dst - src
        norm = jnp.linalg.norm(diff, axis=-1) + 1e-5
        force = jnp.sum(diff / (norm ** 3)[..., None], axis=1)
        # remove self-force (diff=0 contributes ~0 already, but be exact)
        # wall: -x * node_num / 1.5 per axis where |x| >= 0.01  (:28-39)
        wall = jnp.where(jnp.abs(nodes) < 0.01, 0.0,
                         -nodes * (node_num / 1.5))
        return nodes + (force + wall) * learning_rate

    for _ in range(iterations):
        node_j = step(node_j)
    node = np.asarray(node_j)

    # grid reorder (:74-86): sort by x, reshape to rows x cols, sort rows by y
    rows = int(np.sqrt(node_num))
    cols = rows
    if rows * cols == node_num:
        node = node[node[:, 0].argsort()]
        node = node.reshape(rows, cols, dim)
        for i in range(rows):
            node[i] = node[i][node[i][:, 1].argsort()]
        node = node.reshape(node_num, dim)
    return node.astype(np.float32)


def _grid_weighting(rows: int, cols: int, sigma: float) -> np.ndarray:
    """Gaussian grid-neighborhood weights (node_num, rows, cols)
    (util/som.py:97-120)."""
    n = rows * cols
    w = np.zeros((n, rows, cols), np.float32)
    d = 2 * np.pi * sigma * sigma
    for idx in range(n):
        ci, cj = idx // cols, idx % cols
        ax = np.exp(-np.power(np.arange(rows) - ci, 2) / d)
        ay = np.exp(-np.power(np.arange(cols) - cj, 2) / d)
        w[idx] = np.outer(ax, ay)
    return w


class SOMTrainer:
    """Batched SOM training (BatchSOM semantics, util/som.py:215-418).

    Usage::

        trainer = SOMTrainer(rows=8, cols=8)
        nodes = trainer.optimize(points)   # points (B, N, 3) -> nodes (B, M, 3)
    """

    def __init__(self, rows: int = 8, cols: int = 8, dim: int = 3,
                 sigma: float = 0.4, learning_rate: float = 0.5,
                 max_iteration: int = 60):
        self.rows, self.cols, self.dim = rows, cols, dim
        self.node_num = rows * cols
        self.sigma = sigma
        self.learning_rate = learning_rate
        self.max_iteration = max_iteration
        self._init_w = jnp.asarray(_grid_weighting(rows, cols, sigma))
        self._init_nodes = jnp.asarray(
            potential_field_init(self.node_num, dim))

    def _weighting(self, sigma: Array) -> Array:
        """w^(sigma0/sigma)^2 from the precomputed base (util/som.py:108-111)."""
        scale = 1.0 / ((sigma / self.sigma) ** 2)
        return jnp.exp(jnp.log(self._init_w + 1e-30) * scale)

    @functools.partial(jax.jit, static_argnums=0)
    def _update(self, nodes: Array, x: Array, iteration: Array) -> Array:
        """One batch update. nodes (B, M, D), x (B, N, D)."""
        m = self.node_num
        lr = self.learning_rate / (1 + 2 * iteration / self.max_iteration)
        sigma = self.sigma / (1 + 2 * iteration / self.max_iteration)

        def one(nodes_b, x_b):
            d2 = (jnp.sum(x_b ** 2, 1)[:, None] + jnp.sum(nodes_b ** 2, 1)[None]
                  - 2 * x_b @ nodes_b.T)                       # (N, M)
            ids = jnp.argmin(d2, axis=1)                        # (N,)
            counts = jax.ops.segment_sum(jnp.ones_like(ids, jnp.float32), ids,
                                         num_segments=m) + 1e-5
            occupied = (counts > 1e-4 + 1e-5).astype(jnp.float32)
            sums = jax.ops.segment_sum(x_b, ids, num_segments=m)
            means = sums / counts[:, None]                      # (M, D)
            # per-node pull of every node toward occupied cluster means,
            # gaussian-weighted on the SOM grid (util/som.py:346-396)
            diff = means[:, None, :] - nodes_b[None, :, :]      # (M_mean, M_node, D)
            diff = diff * occupied[:, None, None]
            w = self._weighting(sigma).reshape(m, m)            # (M_mean, M_node)
            delta = jnp.sum(diff * w[:, :, None], axis=0) * lr  # (M_node, D)
            return nodes_b + delta

        return jax.vmap(one)(nodes, x)

    def optimize(self, x: Array) -> Array:
        """Full schedule: max_iteration/3 warmup steps at iter=0, then the
        annealed loop (util/som.py:205-211). x (B, N, D) -> nodes (B, M, D)."""
        b = x.shape[0]
        nodes = jnp.broadcast_to(self._init_nodes, (b, self.node_num, self.dim))
        for _ in range(self.max_iteration // 3):
            nodes = self._update(nodes, x, jnp.asarray(0.0))
        for it in range(self.max_iteration):
            nodes = self._update(nodes, x, jnp.asarray(float(it)))
        return nodes
