"""Keypoint detector networks (TPU-native re-design of reference models/networks.py).

Three grouping variants behind one module:
  * ``som``  — point->node assignment + scatter-max feature pooling
               (RPN_Detector, networks.py:20-162; lite widths = RPN_DetectorLite,
               networks.py:165-307, selected via config c1/c2),
  * ``knn``  — k-nearest grouping around nodes (RPN_Detector_KNN, networks.py:482-608),
  * ``ball`` — fixed-radius ball grouping (RPN_Detector_Ball, networks.py:611-738).

All tensors are channels-last: pc ``(B, N, 3)``, sn ``(B, N, S)``, node ``(B, M, 3)``.
Outputs: recomputed nodes ``(B, M, 3)``, keypoints ``(B, M, 3)``, sigmas ``(B, M)``.

Everything upstream of the first shared-MLP is data preparation with no parameters;
we wrap it in stop_gradient exactly like the reference's ``.detach()`` calls
(networks.py:105-107,117,130).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from usip_tpu.config import DetectorConfig
from usip_tpu.nn.layers import PointwiseLayer, SharedMLP
from usip_tpu.ops import (
    assign_points_to_nodes,
    ball_query,
    gather_points,
    knn,
    masked_scatter_max,
    scatter_back,
    segment_mean_count,
)

Array = jax.Array

# mlp3 (keypoint/sigma head) init: N(0, 1e-4), zero bias (networks.py:70-71)
HEAD_INIT = nn.initializers.normal(stddev=1e-4)


class KNNFusionOnNodes(nn.Module):
    """GeneralKNNFusionModule (models/layers.py:375-440), channels-last.

    kNN of ``query`` into ``database``, gather + decentre, pre-MLP, per-query max,
    concat(max, features), post-MLP, per-query max. All conv layers carry
    activation+norm (the reference's MyConv2d stacks have no linear tail here).
    """

    features_before: Sequence[int]
    features_after: Sequence[int]
    k: int
    activation: str = "relu"
    normalization: Optional[str] = "batch"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, query: Array, database: Array, x: Array,
                 train: bool = False, bn_momentum: Array | float = 0.1) -> Array:
        _, idx = knn(jax.lax.stop_gradient(query),
                     jax.lax.stop_gradient(database), self.k)  # (B, M, K)
        neigh_coord = gather_points(database, idx)             # (B, M, K, 3)
        neigh_feat = gather_points(x, idx)                     # (B, M, K, C)
        decentered = jax.lax.stop_gradient(neigh_coord - query[:, :, None, :])
        h = jnp.concatenate([decentered, neigh_feat], axis=-1)
        for i, c in enumerate(self.features_before):
            h = PointwiseLayer(c, activation=self.activation,
                               normalization=self.normalization,
                               dtype=self.dtype,
                               name=f"before{i}")(h, train, bn_momentum)
        h_max = jnp.max(h, axis=-2, keepdims=True)             # (B, M, 1, C')
        # virtual concat [broadcast(h_max), h]: the split-kernel layer runs
        # the h_max half once instead of K times and never materializes the
        # (B, M, K, 2C') tensor (-18% block FLOPs, PERFORMANCE.md MFU section)
        y = (h_max, h)
        for i, c in enumerate(self.features_after):
            y = PointwiseLayer(c, activation=self.activation,
                               normalization=self.normalization,
                               dtype=self.dtype,
                               name=f"after{i}")(y, train, bn_momentum)
        return jnp.max(y, axis=-2).astype(jnp.float32)         # (B, M, C2)


class KeypointHead(nn.Module):
    """mlp1(512) -> mlp2(256) -> mlp3(4) producing keypoint offsets + sigma
    (networks.py:58-71,146-154)."""

    cfg: DetectorConfig

    @nn.compact
    def __call__(self, node_feature: Array, anchors: Array,
                 train: bool, bn_momentum: Array | float) -> Tuple[Array, Array]:
        cfg = self.cfg
        y = PointwiseLayer(512, activation=cfg.activation,
                           normalization=cfg.normalization, name="mlp1")(
            node_feature, train, bn_momentum)
        y = PointwiseLayer(256, activation=cfg.activation,
                           normalization=cfg.normalization, name="mlp2")(
            y, train, bn_momentum)
        y = PointwiseLayer(4, activation=None, normalization=None,
                           kernel_init=HEAD_INIT, name="mlp3")(y)
        keypoints = y[..., 0:3] + anchors
        sigmas = jax.nn.softplus(y[..., 3]) + cfg.sigma_lower_bound
        return keypoints, sigmas


def _dtype_of(cfg) -> "jnp.dtype | None":
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None


def sub_vars(variables, name):
    """One submodule's {params, batch_stats} slice of a full variables tree —
    for paths that replay submodules by name (sharded/TP/fused inference)."""
    out = {"params": variables["params"][name]}
    if "batch_stats" in variables and name in variables["batch_stats"]:
        out["batch_stats"] = variables["batch_stats"][name]
    return out


def som_trunk_eval(cfg, variables, pc, sn, node):
    """Eval-mode replay of ``Detector._som_trunk`` by submodule name, shared by
    the inference paths that re-implement the downstream stages (the
    tensor-parallel and fused-Pallas forwards). Numerically identical to the
    in-module trunk at ``train=False``; takes the full ``Config``."""
    dcfg = cfg.detector
    m = node.shape[1]
    dt = _dtype_of(dcfg)
    assign = assign_points_to_nodes(pc, node, k=dcfg.k, compute_dtype=dt)
    ids = assign.ids
    occ = assign.occupancy[..., None]
    pc_stack = jnp.tile(pc, (1, dcfg.k, 1))
    cluster_mean, _ = segment_mean_count(pc_stack, ids, m)
    centers = scatter_back(cluster_mean, ids)
    decentered = pc_stack - centers
    if dcfg.surface_normal_len:
        sn_stack = jnp.tile(sn, (1, dcfg.k, 1))
        x_aug = jnp.concatenate([decentered, sn_stack], axis=-1)
    else:
        x_aug = decentered
    c1 = dcfg.c1
    mlp1 = SharedMLP((c1 // 2,) * 3, activation=dcfg.activation,
                     normalization=dcfg.normalization, dtype=dt)
    f1 = mlp1.apply(sub_vars(variables, "first_pointnet"), x_aug,
                    train=False).astype(jnp.float32)
    n1 = masked_scatter_max(f1, ids, m, dcfg.scatter_backend) * occ
    s1 = scatter_back(n1, ids)
    mlp2 = SharedMLP((c1, c1), activation=dcfg.activation,
                     normalization=dcfg.normalization, dtype=dt)
    f2 = mlp2.apply(sub_vars(variables, "second_pointnet"),
                    jnp.concatenate([f1, s1], axis=-1),
                    train=False).astype(jnp.float32)
    n2 = masked_scatter_max(f2, ids, m, dcfg.scatter_backend) * occ
    return cluster_mean, n2


class Detector(nn.Module):
    """USIP keypoint detector; grouping variant selected by ``cfg.grouping``."""

    cfg: DetectorConfig

    @nn.compact
    def __call__(self, pc: Array, sn: Array, node: Array, train: bool = False,
                 bn_momentum: Array | float = 0.1) -> Tuple[Array, Array, Array]:
        cfg = self.cfg
        if cfg.grouping == "som":
            anchors, feat = self._som_trunk(pc, sn, node, train, bn_momentum)
        elif cfg.grouping in ("knn", "ball"):
            anchors, feat = self._group_trunk(pc, sn, node, train, bn_momentum)
        else:
            raise ValueError(f"unknown grouping {cfg.grouping!r}")

        knn_feature = KNNFusionOnNodes(
            features_before=(cfg.c2 // 2,) * 3,
            features_after=(cfg.c2, cfg.c2),
            k=cfg.node_knn_k,
            activation=cfg.activation,
            normalization=cfg.normalization,
            dtype=_dtype_of(cfg),
            name="knnlayer",
        )(anchors, anchors, feat, train, bn_momentum)
        aggregated = jnp.concatenate([feat, knn_feature], axis=-1)  # (B, M, C1+C2)
        keypoints, sigmas = KeypointHead(cfg, name="head")(
            aggregated, anchors, train, bn_momentum)
        return anchors, keypoints, sigmas

    # ---------------------------------------------------------------- trunks --

    def _som_trunk(self, pc, sn, node, train, bn_momentum):
        """SOM trunk: assignment -> cluster means -> decentre -> PointNet ->
        scatter-max -> scatter-back fusion -> PointNet -> scatter-max
        (networks.py:85-133)."""
        cfg = self.cfg
        b, n, _ = pc.shape
        m = node.shape[1]
        assign = assign_points_to_nodes(
            jax.lax.stop_gradient(pc), jax.lax.stop_gradient(node), k=cfg.k,
            compute_dtype=_dtype_of(cfg))
        ids = assign.ids                                   # (B, kN)
        occ = assign.occupancy[..., None]                  # (B, M, 1)
        pc_stack = jnp.tile(pc, (1, cfg.k, 1))             # (B, kN, 3)
        sn_stack = jnp.tile(sn, (1, cfg.k, 1)) if cfg.surface_normal_len else None
        cluster_mean, _ = segment_mean_count(pc_stack, ids, m)      # (B, M, 3)
        centers = scatter_back(cluster_mean, ids)                   # (B, kN, 3)
        decentered = jax.lax.stop_gradient(pc_stack - centers)
        if sn_stack is not None:
            x_aug = jnp.concatenate([decentered, sn_stack], axis=-1)
        else:
            x_aug = decentered
        c1 = cfg.c1
        dt = _dtype_of(cfg)
        f1 = SharedMLP((c1 // 2,) * 3, activation=cfg.activation,
                       normalization=cfg.normalization, dtype=dt,
                       name="first_pointnet")(
            x_aug, train, bn_momentum)                              # (B, kN, C1/2)
        f1 = f1.astype(jnp.float32)
        n1 = masked_scatter_max(f1, ids, m, cfg.scatter_backend) * occ
        s1 = scatter_back(n1, ids)                                  # (B, kN, C1/2)
        f2 = SharedMLP((c1, c1), activation=cfg.activation,
                       normalization=cfg.normalization, dtype=dt,
                       name="second_pointnet")(
            jnp.concatenate([f1, s1], axis=-1), train, bn_momentum)  # (B, kN, C1)
        f2 = f2.astype(jnp.float32)
        n2 = masked_scatter_max(f2, ids, m, cfg.scatter_backend) * occ
        return cluster_mean, n2

    def _group_trunk(self, pc, sn, node, train, bn_momentum):
        """kNN/ball trunk: fixed-size neighborhood per node, two conv stages with
        a mid max-fusion (networks.py:551-580, 679-710)."""
        cfg = self.cfg
        x_aug = jnp.concatenate([pc, sn], axis=-1) if cfg.surface_normal_len else pc
        if cfg.grouping == "knn":
            _, idx = knn(node, pc, cfg.group_k,
                         method=cfg.group_method)                   # (B, M, K)
        else:
            # the ball detector scans points in natural order (no permutation,
            # unlike the descriptor) — key=None reproduces that;
            # group_method='approx' opts into the bucketed selection instead
            idx = ball_query(pc, node, cfg.group_radius, cfg.group_k, key=None,
                             method=cfg.group_method).idx
        g = gather_points(x_aug, idx)                               # (B, M, K, C0)
        g_xyz = g[..., 0:3] - node[:, :, None, :]
        g = jnp.concatenate([g_xyz, g[..., 3:]], axis=-1)
        c1 = cfg.c1
        dt = _dtype_of(cfg)
        h = g
        for i in range(3):  # conv1..conv3, all with act+norm
            h = PointwiseLayer(c1 // 2, activation=cfg.activation,
                               normalization=cfg.normalization, dtype=dt,
                               name=f"conv{i + 1}")(h, train, bn_momentum)
        h_max = jnp.max(h, axis=-2, keepdims=True)
        y = (h, h_max)  # virtual concat [h, broadcast(h_max)] (split kernel)
        for i in range(3, 5):  # conv4, conv5, with act+norm
            y = PointwiseLayer(c1, activation=cfg.activation,
                               normalization=cfg.normalization, dtype=dt,
                               name=f"conv{i + 1}")(y, train, bn_momentum)
        feat = jnp.max(y, axis=-2).astype(jnp.float32)              # (B, M, C1)
        return node, feat
