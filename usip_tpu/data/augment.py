"""On-device augmentation with explicit PRNG keys.

Replaces the reference's host-side numpy augmentation (data/augmentation.py and the
per-loader ``.augment()`` methods) with keyed, vmapped device transforms that run
inside the jitted train step — the host only ships raw clouds.

Two stages, matching the reference training recipe:
  1. ``shared_augment``: the loaders' data augmentation — one rotation/scale (and
     per-copy jitter) applied with *shared* parameters to both siamese copies
     (e.g. kitti_detector_loader.py:149-216).
  2. ``random_se3``: the ground-truth transform applied to the dst copy only,
     returning (R, scale, shift) for the chamfer alignment
     (data/augmentation.py:199-248, ``transform_pc_pytorch``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from usip_tpu.config import AugmentConfig

Array = jax.Array


def rotation_matrix(angles: Array) -> Array:
    """Euler XYZ rotation ``R = Rz @ Ry @ Rx`` (data/augmentation.py:15-26).

    angles: (..., 3) -> (..., 3, 3).
    """
    ax, ay, az = angles[..., 0], angles[..., 1], angles[..., 2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    one = jnp.ones_like(ax)
    zero = jnp.zeros_like(ax)
    rx = jnp.stack([jnp.stack([one, zero, zero], -1),
                    jnp.stack([zero, cx, -sx], -1),
                    jnp.stack([zero, sx, cx], -1)], -2)
    ry = jnp.stack([jnp.stack([cy, zero, sy], -1),
                    jnp.stack([zero, one, zero], -1),
                    jnp.stack([-sy, zero, cy], -1)], -2)
    rz = jnp.stack([jnp.stack([cz, -sz, zero], -1),
                    jnp.stack([sz, cz, zero], -1),
                    jnp.stack([zero, zero, one], -1)], -2)
    return rz @ ry @ rx


def _sample_angles(key: Array, rot_type: Optional[str], rot_perturbation: bool,
                   batch: int) -> Array:
    """Per-sample Euler angles for the given rotation regime, (B, 3)."""
    k_rot, k_pert = jax.random.split(key)
    if rot_type == "2d":
        y = jax.random.uniform(k_rot, (batch,)) * 2 * jnp.pi
        angles = jnp.stack([jnp.zeros_like(y), y, jnp.zeros_like(y)], -1)
    elif rot_type == "3d":
        angles = jax.random.uniform(k_rot, (batch, 3)) * 2 * jnp.pi
    elif rot_type is None:
        angles = jnp.zeros((batch, 3))
    else:
        raise ValueError(f"invalid rot_type {rot_type!r}")
    if rot_perturbation:
        sigma, clip = 0.06, 0.18
        pert = jnp.clip(sigma * jax.random.normal(k_pert, (batch, 3)), -clip, clip)
        angles = angles + pert
    return angles


class SE3(NamedTuple):
    """Ground-truth transform of the dst copy: p -> (R @ p) * scale + shift."""

    R: Array      # (B, 3, 3)
    scale: Array  # (B,)
    shift: Array  # (B, 3)


def _rotate(points: Array, R: Array) -> Array:
    """(B, N, 3) x (B, 3, 3): channels-last right-multiplication by R^T."""
    return jnp.einsum("bij,bnj->bni", R, points)


def random_se3(key: Array, pc: Array, sn: Array, node: Array, *,
               rot_type: Optional[str], scale_thre: float = 0.2,
               shift_thre: float = 0.2, rot_perturbation: bool = False
               ) -> Tuple[Array, Array, Array, SE3]:
    """Batched ``transform_pc_pytorch``: rotate + uniform scale + uniform shift.

    Args:
      pc: (B, N, 3); sn: (B, N, S) — only the first 3 channels rotate, and the
        scale/shift do not touch sn (augmentation.py:233-244); node: (B, M, 3).

    Returns transformed (pc, sn, node) and the GT ``SE3``.
    """
    b = pc.shape[0]
    k_ang, k_scale, k_shift = jax.random.split(key, 3)
    angles = _sample_angles(k_ang, rot_type, rot_perturbation, b)
    R = rotation_matrix(angles)
    scale = jax.random.uniform(k_scale, (b,), minval=1.0 - scale_thre,
                               maxval=1.0 + scale_thre)
    shift = jax.random.uniform(k_shift, (b, 3), minval=-shift_thre,
                               maxval=shift_thre)
    pc = _rotate(pc, R) * scale[:, None, None] + shift[:, None, :]
    node = _rotate(node, R) * scale[:, None, None] + shift[:, None, :]
    if sn.shape[-1] >= 3:
        sn = jnp.concatenate([_rotate(sn[..., 0:3], R), sn[..., 3:]], axis=-1)
    return pc, sn, node, SE3(R=R, scale=scale, shift=shift)


def shared_augment(key: Array, packs, cfg: AugmentConfig, *,
                   scale_low: float = 0.9, scale_high: float = 1.1,
                   shared_jitter: bool = False):
    """Loader-style train augmentation applied to a list of (pc, sn, node) packs
    with shared rotation/scale/shift parameters and (by default) per-pack jitter.

    Args:
      packs: sequence of (pc (B,N,3), sn (B,N,S), node (B,M,3)) tuples — the
        siamese src/dst copies.
      shared_jitter: the modelnet loader reuses the same jitter noise for both
        copies (modelnet_shrec_loader.py:195-201); lidar loaders draw per-copy
        noise (kitti_detector_loader.py:163-171).

    Rotation regime follows cfg (rot_horizontal / rot_3d / rot_perturbation);
    rotation applies to pc, sn[...,:3], node; jitter (if cfg.jitter) to pc/sn/node;
    scale to pc and node (not sn, matching the lidar loaders); shift only when
    cfg.translation_perturbation.
    """
    b = packs[0][0].shape[0]
    k_ang, k_scale, k_shift, k_jit = jax.random.split(key, 4)
    angles = _sample_angles(k_ang, cfg.rot_type, cfg.rot_perturbation, b)
    R = rotation_matrix(angles)
    scale = jax.random.uniform(k_scale, (b,), minval=scale_low, maxval=scale_high)
    shift = jax.random.uniform(k_shift, (b, 3), minval=-0.1, maxval=0.1)

    out = []
    jit_keys = jax.random.split(k_jit, len(packs))
    for i, (pc, sn, node) in enumerate(packs):
        pc = _rotate(pc, R)
        node = _rotate(node, R)
        if sn.shape[-1] >= 3:
            sn = jnp.concatenate([_rotate(sn[..., 0:3], R), sn[..., 3:]], axis=-1)
        if cfg.jitter:
            jk = jit_keys[0] if shared_jitter else jit_keys[i]
            kp, ks, kn = jax.random.split(jk, 3)
            pc = pc + jnp.clip(
                cfg.jitter_pc_sigma * jax.random.normal(kp, pc.shape),
                -cfg.jitter_pc_clip, cfg.jitter_pc_clip)
            sn = sn + jnp.clip(
                cfg.jitter_pc_sigma * jax.random.normal(ks, sn.shape),
                -cfg.jitter_pc_clip, cfg.jitter_pc_clip)
            node = node + jnp.clip(
                cfg.jitter_node_sigma * jax.random.normal(kn, node.shape),
                -cfg.jitter_node_clip, cfg.jitter_node_clip)
        pc = pc * scale[:, None, None]
        node = node * scale[:, None, None]
        if cfg.scale_sn:
            # modelnet scales normals too (modelnet_shrec_loader.py:233)
            sn = sn * scale[:, None, None]
        if cfg.translation_perturbation:
            pc = pc + shift[:, None, :]
            node = node + shift[:, None, :]
        out.append((pc, sn, node))
    return out


def random_height_scale(key: Array, pcs, low: float = 0.25, high: float = 1.2,
                        axis: int = 2):
    """Oxford's up-axis height scaling shared across copies
    (oxford_detector_loader.py:188-192). pcs: list of (B, N, 3).

    The reference scales ENU z *before* the ENU->cam flip; in camera coordinates
    (post-flip, how this framework stores oxford clouds) the up axis is y, so
    callers pass ``axis=1`` there.
    """
    b = pcs[0].shape[0]
    s = jax.random.uniform(key, (b,), minval=low, maxval=high)
    ones = jnp.ones_like(s)
    cols = [ones, ones, ones]
    cols[axis] = s
    factor = jnp.stack(cols, -1)[:, None, :]
    return [pc * factor for pc in pcs]


# ------------------------------------------------------- coordinate flips ----
# host-side helpers used by the lidar/indoor loaders (augmentation.py:251-278)

def coordinate_nwu_to_cam(points):
    """x <- -y, y <- -z, z <- x (numpy, (N, 3))."""
    import numpy as np
    out = np.copy(points)
    out[:, 0] = -points[:, 1]
    out[:, 1] = -points[:, 2]
    out[:, 2] = points[:, 0]
    return out


def coordinate_enu_to_cam(points):
    """x <- x, y <- -z, z <- y (numpy, (N, 3))."""
    import numpy as np
    out = np.copy(points)
    out[:, 1] = -points[:, 2]
    out[:, 2] = points[:, 1]
    return out
