"""Point-sharded detector forward: the cloud's N axis sharded across the mesh.

The SOM trunk is local-by-construction except for three tiny collectives, so a
cloud far beyond single-chip HBM runs exactly like the single-chip model:

  * point->node assignment: each shard argmins its own (B, n_local, M) block —
    no communication,
  * cluster means: local segment-sums + one ``psum`` of (B, M, 3) sums and
    (B, M) counts,
  * masked scatter-max: local segment-max + one elementwise ``pmax`` of the
    (B, M, C) node features,
  * node-level kNN fusion and the keypoint head run on the replicated (B, M, *)
    node tensors outside the shard_map.

This is the honest sequence-parallel analog for point clouds (SURVEY §5.7): the
O(N*M) work shards perfectly; only O(M*C) crosses ICI.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from usip_tpu.config import Config
from usip_tpu.models.detector import KNNFusionOnNodes, KeypointHead, _dtype_of
from usip_tpu.nn.layers import SharedMLP
from usip_tpu.parallel.sharded_ops import POINT_AXIS

Array = jax.Array


def _sub_vars(variables, name):
    return {"params": variables["params"][name],
            "batch_stats": variables["batch_stats"][name]}


def sharded_detector_forward(mesh: Mesh, cfg: Config, variables, pc: Array,
                             sn: Array, node: Array
                             ) -> Tuple[Array, Array, Array]:
    """SOM-detector forward with pc/sn sharded over the mesh's point axis.

    Args:
      mesh: 1-D mesh with axis ``points``.
      variables: the (replicated) flax variables of a ``Detector`` with
        ``grouping='som'`` and ``k=1``.
      pc (B, N, 3), sn (B, N, S): N must divide the mesh size. node (B, M, 3).

    Returns (anchors, keypoints, sigmas), replicated — numerically identical
    (up to reduction order) to ``Detector.apply`` on one device.
    """
    dcfg = cfg.detector
    assert dcfg.grouping == "som" and dcfg.k == 1, \
        "point sharding implemented for the som/k=1 detector"
    b, n, _ = pc.shape
    m = node.shape[1]
    c1 = dcfg.c1
    dt = _dtype_of(dcfg)

    mlp1 = SharedMLP((c1 // 2,) * 3, activation=dcfg.activation,
                     normalization=dcfg.normalization, dtype=dt)
    mlp2 = SharedMLP((c1, c1), activation=dcfg.activation,
                     normalization=dcfg.normalization, dtype=dt)
    v1 = _sub_vars(variables, "first_pointnet")
    v2 = _sub_vars(variables, "second_pointnet")

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, POINT_AXIS, None), P(None, POINT_AXIS, None),
                  P(), P(), P()),
        out_specs=(P(), P()))
    def trunk(pc_sh, sn_sh, node_r, v1, v2):
        axis = POINT_AXIS
        # local assignment (B, n_local)
        sq = (jnp.sum(pc_sh ** 2, -1)[..., None]
              + jnp.sum(node_r ** 2, -1)[:, None, :]
              - 2.0 * jnp.einsum("bnd,bmd->bnm", pc_sh, node_r,
                                 precision=jax.lax.Precision.HIGHEST))
        ids = jnp.argmin(sq, axis=-1).astype(jnp.int32)

        def seg_sum(x, width):
            return jax.vmap(lambda xb, ib: jax.ops.segment_sum(
                xb, ib, num_segments=m))(x, ids) if width else None

        sums = jax.vmap(lambda xb, ib: jax.ops.segment_sum(
            xb, ib, num_segments=m))(pc_sh, ids)
        counts = jax.vmap(lambda ib: jax.ops.segment_sum(
            jnp.ones_like(ib, jnp.float32), ib, num_segments=m))(ids)
        sums = jax.lax.psum(sums, axis)              # (B, M, 3)
        counts = jax.lax.psum(counts, axis)          # (B, M)
        mean = sums / (counts[..., None] + 1e-5)
        occ = (counts > 0).astype(jnp.float32)[..., None]

        centers = jnp.take_along_axis(mean, ids[..., None], axis=1)
        x_aug = jnp.concatenate([pc_sh - centers, sn_sh], axis=-1)
        f1 = mlp1.apply(v1, x_aug, train=False).astype(jnp.float32)

        def seg_max(f):
            out = jax.vmap(lambda fb, ib: jax.ops.segment_max(
                fb, ib, num_segments=m))(f, ids)
            out = jax.lax.pmax(out, axis)            # cross-shard node max
            return jnp.where(jnp.isneginf(out), 0.0, out) * occ

        n1 = seg_max(f1)                             # (B, M, C1/2) replicated
        s1 = jnp.take_along_axis(n1, ids[..., None], axis=1)
        f2 = mlp2.apply(v2, jnp.concatenate([f1, s1], -1),
                        train=False).astype(jnp.float32)
        n2 = seg_max(f2)                             # (B, M, C1)
        return mean, n2

    anchors, feat = trunk(pc, sn, node, v1, v2)

    knn_mod = KNNFusionOnNodes(
        features_before=(dcfg.c2 // 2,) * 3,
        features_after=(dcfg.c2, dcfg.c2),
        k=dcfg.node_knn_k, activation=dcfg.activation,
        normalization=dcfg.normalization, dtype=dt)
    knn_feat = knn_mod.apply(_sub_vars(variables, "knnlayer"), anchors, anchors,
                             feat, False, 0.1)
    aggregated = jnp.concatenate([feat, knn_feat], axis=-1)
    head = KeypointHead(dcfg)
    keypoints, sigmas = head.apply(_sub_vars(variables, "head"), aggregated,
                                   anchors, False, 0.1)
    return anchors, keypoints, sigmas
