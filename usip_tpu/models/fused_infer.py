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
from usip_tpu.models.detector import KeypointHead, som_trunk_eval, sub_vars
from usip_tpu.ops import gather_points, knn
from usip_tpu.ops.pallas_kernels import fused_fusion_chain, fusion_chain_params

Array = jax.Array


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
    anchors, feat = som_trunk_eval(cfg, variables, pc, sn, node)

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
    keypoints, sigmas = head.apply(sub_vars(variables, "head"), aggregated,
                                   anchors, False, 0.1)
    return anchors, keypoints, sigmas
