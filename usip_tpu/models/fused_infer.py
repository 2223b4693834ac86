"""Eval-mode detector forward with the kNN-fusion stack on the fused Pallas
chain (cfg.detector.fusion_backend='pallas').

The som trunk and head are replayed by submodule name from the same variables
(the pattern of parallel/sharded_detector.py), so any trained/imported
checkpoint works unchanged; the fusion stack's five matmuls run VMEM-resident
via ops/pallas_kernels.fused_fusion_chain with BatchNorm folded into the
weights. Inference only — training always uses the XLA path (batch stats +
autodiff).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from usip_tpu.config import Config
from usip_tpu.models.detector import KeypointHead
from usip_tpu.nn.layers import SharedMLP
from usip_tpu.ops import (assign_points_to_nodes, gather_points, knn,
                          masked_scatter_max, scatter_back,
                          segment_mean_count)
from usip_tpu.ops.pallas_kernels import fused_fusion_chain, fusion_chain_params

Array = jax.Array


def _sub_vars(variables, name):
    out = {"params": variables["params"][name]}
    if "batch_stats" in variables and name in variables["batch_stats"]:
        out["batch_stats"] = variables["batch_stats"][name]
    return out


def _dtype_of(cfg):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None


def _som_trunk_eval(cfg, variables, pc, sn, node):
    """Eval replay of Detector._som_trunk (models/detector.py:142-178)."""
    dcfg = cfg.detector
    m = node.shape[1]
    assign = assign_points_to_nodes(pc, node, k=dcfg.k,
                                    compute_dtype=_dtype_of(dcfg))
    ids = assign.ids
    occ = assign.occupancy[..., None]
    pc_stack = jnp.tile(pc, (1, dcfg.k, 1))
    sn_stack = jnp.tile(sn, (1, dcfg.k, 1)) if dcfg.surface_normal_len else None
    cluster_mean, _ = segment_mean_count(pc_stack, ids, m)
    centers = scatter_back(cluster_mean, ids)
    decentered = pc_stack - centers
    x_aug = jnp.concatenate([decentered, sn_stack], axis=-1) \
        if sn_stack is not None else decentered
    c1 = dcfg.c1
    dt = _dtype_of(dcfg)
    mlp1 = SharedMLP((c1 // 2,) * 3, activation=dcfg.activation,
                     normalization=dcfg.normalization, dtype=dt)
    f1 = mlp1.apply(_sub_vars(variables, "first_pointnet"), x_aug,
                    train=False).astype(jnp.float32)
    n1 = masked_scatter_max(f1, ids, m, dcfg.scatter_backend) * occ
    s1 = scatter_back(n1, ids)
    mlp2 = SharedMLP((c1, c1), activation=dcfg.activation,
                     normalization=dcfg.normalization, dtype=dt)
    f2 = mlp2.apply(_sub_vars(variables, "second_pointnet"),
                    jnp.concatenate([f1, s1], axis=-1),
                    train=False).astype(jnp.float32)
    n2 = masked_scatter_max(f2, ids, m, dcfg.scatter_backend) * occ
    return cluster_mean, n2


def detector_infer_fused(cfg: Config, variables, pc: Array, sn: Array,
                         node: Array, interpret: bool = False
                         ) -> Tuple[Array, Array, Array]:
    """Full detector eval forward, fusion stack on the Pallas chain.

    Returns (anchors, keypoints, sigmas) like ``Detector.apply(train=False)``.
    Only the som grouping is wired (the bench/flagship trunk); knn/ball fall
    back to the XLA model in make_detector_infer.
    """
    dcfg = cfg.detector
    assert dcfg.grouping == "som", "fused inference wired for the som trunk"
    anchors, feat = _som_trunk_eval(cfg, variables, pc, sn, node)

    _, idx = knn(anchors, anchors, dcfg.node_knn_k)
    grouped = jnp.concatenate(
        [gather_points(anchors, idx) - anchors[:, :, None, :],
         gather_points(feat, idx)], axis=-1)
    ws, bs = fusion_chain_params(variables["params"]["knnlayer"],
                                 variables.get("batch_stats",
                                               {}).get("knnlayer", {}))
    bm = grouped.shape[0] * grouped.shape[1]
    # 256 measured best on v5e at the kitti shapes (PERFORMANCE.md)
    tile_m = next(t for t in (256, 128, 64, 32, 16, 8, 4, 2, 1)
                  if bm % t == 0)
    knn_feature = fused_fusion_chain(grouped, ws, bs, tile_m=tile_m,
                                     interpret=interpret)

    aggregated = jnp.concatenate([feat, knn_feature], axis=-1)
    head = KeypointHead(dcfg)
    keypoints, sigmas = head.apply(_sub_vars(variables, "head"), aggregated,
                                   anchors, False, 0.1)
    return anchors, keypoints, sigmas
