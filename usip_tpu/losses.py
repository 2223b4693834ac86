"""Training losses, pure functions over channels-last tensors.

Transcribed semantics (not code) from reference models/losses.py:
  * probabilistic chamfer with per-pair averaged sigma (:44-99),
  * single-side chamfer / point-on-surface "keypoint must lie on the cloud" (:102-183),
  * scan-level descriptor triplet (:190-237),
  * CGF-style keypoint-level triplet (:240-369).

All pairwise distances ride the MXU via ops.pairwise_dist; min/gather reductions fuse
into the epilogue so the dense (B, M, N) matrices are never kept in fp32 HBM.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from usip_tpu.ops import pairwise_dist, safe_sqrt
from usip_tpu.ops.geometry import nearest_neighbor

Array = jax.Array


class ChamferOutput(NamedTuple):
    loss: Array             # scalar: optimized objective
    chamfer_pure: Array     # scalar: plain (unweighted) chamfer, detached
    chamfer_weighted: Array  # scalar: inverse-sigma weighted chamfer, detached


def chamfer_probabilistic(src: Array, dst: Array,
                          sigma_src: Optional[Array] = None,
                          sigma_dst: Optional[Array] = None) -> ChamferOutput:
    """Probabilistic chamfer loss between two keypoint sets.

    Args:
      src: (B, M, 3) source keypoints (already GT-transformed into dst frame).
      dst: (B, N, 3) destination keypoints.
      sigma_src: (B, M) uncertainties; sigma_dst: (B, N). If either is None the
        plain chamfer (sum of per-batch-mean min distances) is returned.

    With sigmas: per matched pair sigma_bar = (sigma_a + sigma_b)/2 and the loss is
    mean(log(sigma_bar) + d / sigma_bar) in both directions (losses.py:80-90).
    """
    # custom-VJP nearest neighbor: backward never re-materializes (B, M, N)
    fwd_min, fwd_idx = nearest_neighbor(src, dst)   # (B, M)
    bwd_min, bwd_idx = nearest_neighbor(dst, src)   # (B, N)

    if sigma_src is None or sigma_dst is None:
        loss = jnp.mean(fwd_min) + jnp.mean(bwd_min)
        return ChamferOutput(loss, jax.lax.stop_gradient(loss),
                             jax.lax.stop_gradient(loss))

    sel_sigma_dst = jnp.take_along_axis(sigma_dst, fwd_idx, axis=1)  # (B, M)
    sigma_fwd = (sigma_src + sel_sigma_dst) / 2.0
    forward_loss = jnp.mean(jnp.log(sigma_fwd) + fwd_min / sigma_fwd)

    sel_sigma_src = jnp.take_along_axis(sigma_src, bwd_idx, axis=1)  # (B, N)
    sigma_bwd = (sigma_dst + sel_sigma_src) / 2.0
    backward_loss = jnp.mean(jnp.log(sigma_bwd) + bwd_min / sigma_bwd)

    chamfer_pure = jax.lax.stop_gradient(jnp.mean(fwd_min) + jnp.mean(bwd_min))
    w_fwd = (1.0 / sigma_fwd) / jnp.mean(1.0 / sigma_fwd)
    w_bwd = (1.0 / sigma_bwd) / jnp.mean(1.0 / sigma_bwd)
    chamfer_weighted = jax.lax.stop_gradient(
        jnp.mean(w_fwd * fwd_min) + jnp.mean(w_bwd * bwd_min))
    return ChamferOutput(forward_loss + backward_loss, chamfer_pure, chamfer_weighted)


def single_side_chamfer(keypoints: Array, pc: Array) -> Array:
    """Min distance from each keypoint to the cloud, (B, M) (losses.py:119-143)."""
    dist, _ = nearest_neighbor(keypoints, pc)
    return dist


def point_on_surface(keypoints: Array, pc: Array, sn: Array) -> Array:
    """Squared cosine between (keypoint - nearest point) and the surface normal,
    (B, M, 1, 1)-shaped in the reference; here (B, M) (losses.py:146-183)."""
    _, idx = nearest_neighbor(jax.lax.stop_gradient(keypoints), pc)  # (B, M)
    pc_sel = jnp.take_along_axis(pc, idx[..., None], axis=1)   # (B, M, 3)
    sn_sel = jnp.take_along_axis(sn[..., 0:3], idx[..., None], axis=1)
    v = keypoints - pc_sel
    v_norm = safe_sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    v_unit = v / (v_norm + 1e-7)
    cos = jnp.sum(sn_sel * v_unit, axis=-1)         # (B, M)
    return cos * cos


def keypoint_on_pc(keypoints: Array, pc: Array, sn: Optional[Array] = None) -> Array:
    """Dispatch like KeypointOnPCLoss (losses.py:102-116): point_to_point when
    sn is None else point_to_plane."""
    if sn is None:
        return single_side_chamfer(keypoints, pc)
    return point_on_surface(keypoints, pc, sn)


# ---------------------------------------------------------------- descriptor ----

def _sigma_weights(sigmas: Array, sigma_max: float) -> Array:
    """clamp(sigma_max - sigma) normalized to mean 1, detached (losses.py:231-234).

    Guarded against an all-clamped batch (every sigma >= sigma_max — e.g. an
    untrained detector), where the reference's bare division yields NaN.
    """
    w = jnp.maximum(sigma_max - sigmas, 0.0)
    w = w / jnp.maximum(jnp.mean(w, axis=1, keepdims=True), 1e-8)
    return jax.lax.stop_gradient(w)


def desc_pair_scan_loss(anc_desc: Array, pos_desc: Array, neg_desc: Array,
                        anc_sigmas: Array, *, gamma: float,
                        sigma_max: float) -> Tuple[Array, Array]:
    """Scan-level triplet on min descriptor distances (losses.py:190-237).

    Args:
      anc_desc/pos_desc/neg_desc: (B, M, C) L2-normalized descriptors.
      anc_sigmas: (B, M).

    Returns:
      (per-keypoint weighted loss (B, M), active-triplet fraction (B,)).
    """
    d_pos = pairwise_dist(anc_desc, pos_desc)   # (B, M, M)
    min_pos = jnp.min(d_pos, axis=2)            # (B, M)
    d_neg = pairwise_dist(anc_desc, neg_desc)
    min_neg = jnp.min(d_neg, axis=2)
    before_clamp = min_pos - min_neg + gamma
    active = jnp.mean((before_clamp > 0).astype(jnp.float32), axis=1)
    weights = _sigma_weights(anc_sigmas, sigma_max)
    loss = weights * jnp.maximum(before_clamp, 0.0)
    return loss, active


def desc_cgf_loss(anc_keypoints: Array, anc_desc: Array, pos_keypoints: Array,
                  pos_desc: Array, anc_sigmas: Array, key: Array, *,
                  cgf_radius: float, gamma: float,
                  sigma_max: float) -> Tuple[Array, Array]:
    """CGF-style keypoint-level triplet (losses.py:240-369).

    ``anc_keypoints`` must already be GT-aligned to the pos frame. Positives are a
    random in-radius match; negatives mix (50/50 per keypoint) the closest
    outside-radius keypoint and a random outside-radius keypoint. Loss is rescaled by
    M / (#matched + 1) and sigma-weighted.
    """
    b, m, _ = anc_keypoints.shape
    desc_diff = pairwise_dist(anc_desc, pos_desc)          # (B, M, M)
    kp_diff = pairwise_dist(anc_keypoints, pos_keypoints)  # (B, M, M)

    k1, k2, k3 = jax.random.split(key, 3)
    pos_mask = kp_diff <= cgf_radius                       # (B, M, M)
    has_match = jnp.any(pos_mask, axis=2)                  # (B, M)

    # positive: random in-radius match (argmax of masked uniform noise)
    rand_pos = jax.random.uniform(k1, (b, m, m))
    nearby_idx = jnp.argmax(pos_mask.astype(jnp.float32) * rand_pos, axis=2)
    positive_dist = jnp.take_along_axis(desc_diff, nearby_idx[..., None],
                                        axis=2)[..., 0]   # (B, M)

    # negative candidate 1: closest keypoint outside the radius
    augmented = kp_diff + pos_mask.astype(jnp.float32) * 1000.0
    far_close_idx = jnp.argmin(augmented, axis=2)
    far_close_dist = jnp.take_along_axis(desc_diff, far_close_idx[..., None],
                                         axis=2)[..., 0]

    # negative candidate 2: random keypoint outside the radius
    outside_mask = kp_diff > cgf_radius
    rand_out = jax.random.uniform(k2, (b, m, m))
    outside_idx = jnp.argmax(rand_out * outside_mask.astype(jnp.float32), axis=2)
    outside_dist = jnp.take_along_axis(desc_diff, outside_idx[..., None],
                                       axis=2)[..., 0]

    select = (jax.random.uniform(k3, (b, m)) < 0.5).astype(jnp.float32)
    negative_dist = select * far_close_dist + (1.0 - select) * outside_dist

    match_count = jnp.sum(has_match.astype(jnp.float32), axis=1)       # (B,)
    scaling = jax.lax.stop_gradient(m / (match_count + 1.0))
    before_clamp = (positive_dist - negative_dist + gamma) * has_match.astype(
        jnp.float32)
    active = jnp.sum((before_clamp > 1e-5).astype(jnp.float32), axis=1) / (
        match_count + 1.0)
    weights = _sigma_weights(anc_sigmas, sigma_max)
    loss = weights * jnp.maximum(before_clamp, 0.0) * scaling[:, None]
    return loss, active


def descriptor_matching_accuracy(anc_keypoints: Array, anc_desc: Array,
                                 pos_keypoints: Array, pos_desc: Array, *,
                                 radius: float) -> Array:
    """Per-keypoint 1-NN descriptor matching accuracy, (B,).

    ``anc_keypoints`` must already be GT-aligned to the pos frame (same
    contract as :func:`desc_cgf_loss`). For each anchor keypoint that HAS a
    geometric match within ``radius`` (unmatchable boundary keypoints are
    excluded from the denominator), its nearest pos descriptor is looked up
    and counted correct when the matched pos keypoint lies within ``radius``
    of the aligned anchor. This is the registration-proxy metric: RANSAC
    recall is driven by exactly this inlier fraction, and the CGF/scan test
    LOSS is measured to diverge from it at long training (PERFORMANCE.md
    indoor 2x2: best-by-test-loss picked a checkpoint with lower registration
    recall). Used by ``train.select_best_by='match_acc'``.
    """
    desc_diff = pairwise_dist(anc_desc, pos_desc)          # (B, M, M)
    kp_diff = pairwise_dist(anc_keypoints, pos_keypoints)  # (B, M, M)
    has_match = jnp.any(kp_diff <= radius, axis=2)         # (B, M)
    nn_idx = jnp.argmin(desc_diff, axis=2)                 # (B, M)
    nn_kp_dist = jnp.take_along_axis(kp_diff, nn_idx[..., None],
                                     axis=2)[..., 0]       # (B, M)
    correct = (nn_kp_dist <= radius) & has_match
    denom = jnp.maximum(jnp.sum(has_match.astype(jnp.float32), axis=1), 1.0)
    return jnp.sum(correct.astype(jnp.float32), axis=1) / denom
