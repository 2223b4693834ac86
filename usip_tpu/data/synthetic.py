"""Synthetic in-memory dataset: procedurally generated shapes with analytic
normals. Drives tests, benchmarks, and the end-to-end repeatability check without
any downloads (the test strategy the reference lacks — SURVEY.md §4)."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _unit(v, axis=-1):
    return v / (np.linalg.norm(v, axis=axis, keepdims=True) + 1e-12)


def sample_shape(rng: np.random.Generator, n: int) -> Tuple[np.ndarray, np.ndarray]:
    """One random shape (sphere/box/cylinder mix) -> (pc (n,3), sn (n,3))."""
    kind = rng.integers(0, 3)
    if kind == 0:  # sphere with radial normals, mild radius modulation
        d = _unit(rng.normal(size=(n, 3)))
        r = 1.0 + 0.2 * np.sin(4 * d[:, :1]) * np.cos(4 * d[:, 1:2])
        pc = d * r
        sn = d
    elif kind == 1:  # box surface
        face = rng.integers(0, 6, size=n)
        uv = rng.uniform(-1, 1, size=(n, 2))
        pc = np.zeros((n, 3))
        sn = np.zeros((n, 3))
        axis = face % 3
        sign = np.where(face < 3, 1.0, -1.0)
        for i in range(n):
            a = axis[i]
            others = [j for j in range(3) if j != a]
            pc[i, a] = sign[i]
            pc[i, others[0]], pc[i, others[1]] = uv[i]
            sn[i, a] = sign[i]
    else:  # cylinder with caps
        t = rng.uniform(0, 2 * np.pi, size=n)
        side = rng.uniform(size=n) < 0.7
        pc = np.zeros((n, 3))
        sn = np.zeros((n, 3))
        z = rng.uniform(-1, 1, size=n)
        pc[side] = np.stack([np.cos(t[side]), np.sin(t[side]), z[side]], 1)
        sn[side] = np.stack([np.cos(t[side]), np.sin(t[side]),
                             np.zeros(side.sum())], 1)
        cap = ~side
        r = np.sqrt(rng.uniform(size=cap.sum()))
        zc = np.where(rng.uniform(size=cap.sum()) < 0.5, 1.0, -1.0)
        pc[cap] = np.stack([r * np.cos(t[cap]), r * np.sin(t[cap]), zc], 1)
        sn[cap] = np.stack([np.zeros(cap.sum()), np.zeros(cap.sum()), zc], 1)
    return pc.astype(np.float32), sn.astype(np.float32)


class SyntheticDataset:
    """Object-style siamese dataset: each item yields two independent samplings of
    the same shape (the modelnet recipe, modelnet_shrec_loader.py:245-247)."""

    def __init__(self, size: int = 64, input_pc_num: int = 1024,
                 surface_normal_len: int = 3, seed: int = 0,
                 oversample: int = 4):
        self.size = size
        self.n = input_pc_num
        self.sn_len = surface_normal_len
        rng = np.random.default_rng(seed)
        self._clouds = []
        for _ in range(size):
            pc, sn = sample_shape(rng, input_pc_num * oversample)
            self._clouds.append((pc, sn))

    def __len__(self):
        return self.size

    def _sample(self, rng: np.random.Generator, idx: int):
        pc, sn = self._clouds[idx]
        sel = rng.choice(pc.shape[0], self.n, replace=False)
        pc, sn = pc[sel], sn[sel]
        if self.sn_len == 0:
            sn = np.zeros((self.n, 0), np.float32)
        elif self.sn_len > 3:
            extra = np.zeros((self.n, self.sn_len - 3), np.float32)
            sn = np.concatenate([sn, extra], axis=1)
        return pc, sn

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        # NB: not Python hash() — string hashing is salted per process
        # (PYTHONHASHSEED), which made "deterministic" tests vary across runs.
        rng = np.random.default_rng(np.random.SeedSequence([idx, 0x5EED]))
        src_pc, src_sn = self._sample(rng, idx)
        dst_pc, dst_sn = self._sample(rng, idx)
        return {"src_pc": src_pc, "src_sn": src_sn,
                "dst_pc": dst_pc, "dst_sn": dst_sn}

    def batch(self, rng: np.random.Generator, batch_size: int) -> Dict[str, np.ndarray]:
        idxs = rng.integers(0, self.size, size=batch_size)
        items = [self[int(i)] for i in idxs]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}
