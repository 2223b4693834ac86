"""Point-sharded distance reductions — the framework's sequence-parallel analog.

The reference materializes every dense ``BxMxN`` distance matrix on one GPU
(SURVEY.md §5.7); its scaling limit is the point count N. Here N shards across the
mesh's ``points`` axis: each device computes distances against its point shard and
reduces locally; cross-device combines are a two-stage min / masked top-k over ICI
(``shard_map`` + collectives). This lets chamfer/on-pc losses and ball grouping
scale to clouds far beyond single-chip HBM — the honest equivalent of
ring-attention/context-parallel for point-cloud workloads.

Composes with data parallelism: use a 2-D mesh ``(data, points)``; batch stays
sharded on ``data`` while these ops shard N on ``points``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from usip_tpu import losses as L
from usip_tpu.ops import pairwise_dist
from usip_tpu.ops.topk import smallest_k

Array = jax.Array

POINT_AXIS = "points"


def make_point_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    import numpy as np
    return Mesh(np.asarray(devices), (POINT_AXIS,))


def _two_stage_min(local_min: Array, local_idx: Array, axis: str
                   ) -> Tuple[Array, Array]:
    """Combine per-shard (min, global-argmin) across the mesh axis.

    all_gathers the (num_shards, ...) candidate mins (tiny: one scalar per query
    per shard) and picks the winner; returns replicated results.
    """
    mins = jax.lax.all_gather(local_min, axis)    # (S, B, M)
    idxs = jax.lax.all_gather(local_idx, axis)    # (S, B, M)
    best_shard = jnp.argmin(mins, axis=0)         # (B, M)
    take = lambda arr: jnp.take_along_axis(arr, best_shard[None], axis=0)[0]
    return take(mins), take(idxs)


def sharded_min_dist(src: Array, dst_shard: Array, axis: str = POINT_AXIS
                     ) -> Tuple[Array, Array]:
    """Inside shard_map: min distance from each (replicated) src point to the
    (sharded) dst cloud. Returns replicated (dist (B, M), global argmin (B, M))."""
    n_local = dst_shard.shape[1]
    shard_id = jax.lax.axis_index(axis)
    diff = pairwise_dist(src, dst_shard)                    # (B, M, n_local)
    local_min = jnp.min(diff, axis=2)
    local_idx = jnp.argmin(diff, axis=2) + shard_id * n_local
    return _two_stage_min(local_min, local_idx, axis)


def sharded_chamfer_probabilistic(mesh: Mesh, src: Array, dst: Array,
                                  sigma_src: Array, sigma_dst: Array
                                  ) -> L.ChamferOutput:
    """Probabilistic chamfer with the second point set sharded over the mesh.

    Numerically identical (up to reduction order) to
    ``losses.chamfer_probabilistic``; both keypoint sets are sharded on their
    point axes, distances computed shard-locally, combined over ICI.
    """
    n_dev = mesh.devices.size
    b, m, _ = src.shape
    n = dst.shape[1]
    assert m % n_dev == 0 and n % n_dev == 0, "point count must divide mesh"

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, POINT_AXIS, None), P(None, POINT_AXIS, None),
                  P(None, POINT_AXIS), P(None, POINT_AXIS)),
        out_specs=(P(), P(), P()))
    def _inner(src_sh, dst_sh, ssig_sh, dsig_sh):
        axis = POINT_AXIS
        shard = jax.lax.axis_index(axis)
        m_local = src_sh.shape[1]
        n_local = dst_sh.shape[1]
        # all_gather the full opposite point set per direction (point sets are
        # small relative to the N x M matrix, which never materializes fully)
        dst_full = jax.lax.all_gather(dst_sh, axis, axis=1, tiled=True)
        dsig_full = jax.lax.all_gather(dsig_sh, axis, axis=1, tiled=True)
        src_full = jax.lax.all_gather(src_sh, axis, axis=1, tiled=True)
        ssig_full = jax.lax.all_gather(ssig_sh, axis, axis=1, tiled=True)

        # forward: local src rows vs full dst
        diff_f = pairwise_dist(src_sh, dst_full)            # (B, m_local, N)
        fmin = jnp.min(diff_f, axis=2)
        fidx = jnp.argmin(diff_f, axis=2)
        sel_dsig = jnp.take_along_axis(dsig_full, fidx, axis=1)
        sig_f = (ssig_sh + sel_dsig) / 2.0
        fwd_sum = jnp.sum(jnp.log(sig_f) + fmin / sig_f)
        fwd_sum = jax.lax.psum(fwd_sum, axis) / (b * m)

        # backward: local dst rows vs full src
        diff_b = pairwise_dist(dst_sh, src_full)            # (B, n_local, M)
        bmin = jnp.min(diff_b, axis=2)
        bidx = jnp.argmin(diff_b, axis=2)
        sel_ssig = jnp.take_along_axis(ssig_full, bidx, axis=1)
        sig_b = (dsig_sh + sel_ssig) / 2.0
        bwd_sum = jnp.sum(jnp.log(sig_b) + bmin / sig_b)
        bwd_sum = jax.lax.psum(bwd_sum, axis) / (b * n)

        pure = (jax.lax.psum(jnp.sum(fmin), axis) / (b * m)
                + jax.lax.psum(jnp.sum(bmin), axis) / (b * n))
        inv_f_mean = jax.lax.psum(jnp.sum(1.0 / sig_f), axis) / (b * m)
        inv_b_mean = jax.lax.psum(jnp.sum(1.0 / sig_b), axis) / (b * n)
        w_f = (1.0 / sig_f) / inv_f_mean
        w_b = (1.0 / sig_b) / inv_b_mean
        weighted = (jax.lax.psum(jnp.sum(w_f * fmin), axis) / (b * m)
                    + jax.lax.psum(jnp.sum(w_b * bmin), axis) / (b * n))
        loss = fwd_sum + bwd_sum
        return loss, jax.lax.stop_gradient(pure), jax.lax.stop_gradient(weighted)

    loss, pure, weighted = _inner(src, dst, sigma_src, sigma_dst)
    return L.ChamferOutput(loss, pure, weighted)


def sharded_single_side_chamfer(mesh: Mesh, keypoints: Array, pc: Array) -> Array:
    """Keypoint->cloud min distance with the cloud sharded over the mesh.

    keypoints (B, M, 3) replicated (or data-sharded on a 2-D dp x sp mesh);
    pc (B, N, 3) sharded on N. Returns (B, M) — the on-pc loss for clouds too
    large for one chip.
    """
    from usip_tpu.parallel.mesh import DATA_AXIS
    ba = DATA_AXIS if DATA_AXIS in mesh.axis_names else None

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(ba), P(ba, POINT_AXIS, None)), out_specs=P(ba),
        # the all_gather+min result is replicated; the static checker can't
        # infer it through the reduction (numerically verified in tests)
        check_vma=False)
    def _inner(kp, pc_sh):
        diff = pairwise_dist(kp, pc_sh)          # (B, M, n_local)
        local_min = jnp.min(diff, axis=2)
        # pmin has no differentiation rule; all_gather+min is differentiable
        # and only moves the (S, B, M) candidate minima
        gathered = jax.lax.all_gather(local_min, POINT_AXIS)
        return jnp.min(gathered, axis=0)

    return _inner(keypoints, pc)


def sharded_knn_gather(mesh: Mesh, query: Array, database: Array,
                       features: Array, k: int) -> Tuple[Array, Array]:
    """kNN of replicated queries into a sharded database (+feature gather).

    Two-stage top-k: per-shard top-k (local (B, M, k) candidates), all_gather the
    candidates (k * num_shards per query — tiny), re-top-k globally. Returns
    (sqdists (B, M, k), gathered features (B, M, k, C)), replicated.
    """
    from usip_tpu.ops import pairwise_sqdist

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(None, POINT_AXIS, None), P(None, POINT_AXIS, None)),
        out_specs=(P(), P()),
        # outputs derive from all_gathered (replicated) candidates; the static
        # varying-mesh-axes checker can't see through the gather chain
        check_vma=False)
    def _inner(q, db_sh, f_sh):
        axis = POINT_AXIS
        sq = pairwise_sqdist(q, db_sh)                         # (B, M, n_local)
        d_loc, idx = smallest_k(sq, k)                         # local top-k
        cand_f = jnp.take_along_axis(
            f_sh[:, None, :, :],
            idx[..., None].repeat(f_sh.shape[-1], -1), axis=2)  # (B, M, k, C)
        # gather global candidates
        all_d = jax.lax.all_gather(d_loc, axis, axis=2, tiled=True)  # (B,M,S*k)
        all_f = jax.lax.all_gather(cand_f, axis, axis=2, tiled=True)  # (B,M,S*k,C)
        neg_top, sel = jax.lax.top_k(-all_d, k)                # (B, M, k)
        out_f = jnp.take_along_axis(
            all_f, sel[..., None].repeat(all_f.shape[-1], -1), axis=2)
        return -neg_top, out_f

    return _inner(query, database, features)


def sharded_ball_gather(mesh: Mesh, centers: Array, points: Array,
                        features: Array, radius: float, k: int,
                        priority: Array) -> Tuple[Array, Array, Array]:
    """Random-priority ball query + feature gather with the cloud sharded on N.

    The descriptor's grouping step (ops/grouping.py ball_query +
    gather_points) for clouds beyond one chip: ``points``/``features``/
    ``priority`` shard over the mesh's ``points`` axis, ``centers`` replicate.
    Each shard selects its k lowest-priority in-ball candidates; the
    per-shard winners (k * num_shards per center — tiny) all_gather and
    re-select globally, which is EXACTLY the unsharded selection because the
    global k lowest priorities are a subset of each shard's k lowest.

    Args:
      centers: ``(B, M, 3)`` replicated ball centers (keypoints).
      points: ``(B, N, 3)``, N sharded.
      features: ``(B, N, C)``, N sharded (e.g. concat(xyz, sn)).
      priority: ``(B, N)`` iid per-point priorities, N sharded — drawn by the
        caller (jax.random.uniform) so sharded and unsharded runs consume the
        identical permutation; parity-tested against ops.ball_query.

    Returns:
      ``(feats (B, M, k, C), valid (B, M, k), counts (B, M))`` replicated,
      with the unsharded op's cyclic padding applied to the gathered
      features (padded slots repeat in-ball features). DELIBERATE DEVIATION
      for empty balls: features are zero here, whereas the unsharded
      ``ball_query`` returns index 0 and callers gather point 0's features —
      zeros are the saner degenerate value and avoid gathering an arbitrary
      cross-shard point.
    """
    from usip_tpu.ops import pairwise_sqdist

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(None, POINT_AXIS, None), P(None, POINT_AXIS, None),
                  P(None, POINT_AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False)
    def _inner(c, p_sh, f_sh, pri_sh):
        axis = POINT_AXIS
        sq = pairwise_sqdist(c, p_sh)                       # (B, M, n_local)
        scores = jnp.where(sq <= radius * radius,
                           pri_sh[:, None, :], jnp.inf)
        s_loc, idx = smallest_k(scores, min(k, scores.shape[-1]))
        kk = s_loc.shape[-1]
        cand_f = jnp.take_along_axis(
            f_sh[:, None, :, :],
            idx[..., None].repeat(f_sh.shape[-1], -1), axis=2)  # (B, M, kk, C)
        all_s = jax.lax.all_gather(s_loc, axis, axis=2, tiled=True)
        all_f = jax.lax.all_gather(cand_f, axis, axis=2, tiled=True)
        neg_sel, sel = jax.lax.top_k(-all_s, k)              # (B, M, k)
        found = jnp.isfinite(-neg_sel)
        counts = jnp.sum(found, axis=-1).astype(jnp.int32)
        # cyclic padding over the selected slots (ops/grouping.py contract)
        slot = jnp.arange(k, dtype=jnp.int32)[None, None, :]
        denom = jnp.maximum(counts, 1)[..., None]
        wrapped = jnp.where(found, slot, slot % denom)
        sel = jnp.take_along_axis(sel, wrapped, axis=-1)
        feats = jnp.take_along_axis(
            all_f, sel[..., None].repeat(all_f.shape[-1], -1), axis=2)
        feats = jnp.where(counts[..., None, None] > 0, feats, 0.0)
        return feats, found, counts

    return _inner(centers, points, features, priority)
