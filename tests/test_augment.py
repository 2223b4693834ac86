"""Tests for on-device augmentation: rotation-matrix correctness, GT-transform
consistency, shared-augment parameter sharing."""

import jax
import jax.numpy as jnp
import numpy as np

from usip_tpu.config import AugmentConfig
from usip_tpu.data import augment


def _np_rotation(angles):
    """numpy transcription of angles2rotation_matrix (augmentation.py:15-26)."""
    ax, ay, az = angles
    Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)], [0, np.sin(ax), np.cos(ax)]])
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0], [-np.sin(ay), 0, np.cos(ay)]])
    Rz = np.array([[np.cos(az), -np.sin(az), 0], [np.sin(az), np.cos(az), 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def test_rotation_matrix_matches_reference(rng):
    angles = rng.uniform(0, 2 * np.pi, size=(5, 3)).astype(np.float32)
    R = np.asarray(augment.rotation_matrix(jnp.asarray(angles)))
    for i in range(5):
        np.testing.assert_allclose(R[i], _np_rotation(angles[i]), atol=1e-5)
        # proper rotation
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R[i]), 1.0, atol=1e-5)


def test_random_se3_consistency(rng):
    """Transformed pc must equal R @ pc * scale + shift with the returned params."""
    pc = rng.normal(size=(3, 50, 3)).astype(np.float32)
    sn = rng.normal(size=(3, 50, 4)).astype(np.float32)
    node = rng.normal(size=(3, 10, 3)).astype(np.float32)
    key = jax.random.PRNGKey(42)
    tpc, tsn, tnode, gt = augment.random_se3(
        key, jnp.asarray(pc), jnp.asarray(sn), jnp.asarray(node),
        rot_type="3d", scale_thre=0.2, shift_thre=0.5)
    R, scale, shift = map(np.asarray, (gt.R, gt.scale, gt.shift))
    ref = np.einsum("bij,bnj->bni", R, pc) * scale[:, None, None] + shift[:, None, :]
    np.testing.assert_allclose(np.asarray(tpc), ref, atol=1e-5)
    # normals rotate but don't scale/shift; reflectance channel untouched
    ref_sn3 = np.einsum("bij,bnj->bni", R, sn[..., :3])
    np.testing.assert_allclose(np.asarray(tsn)[..., :3], ref_sn3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tsn)[..., 3], sn[..., 3], atol=1e-6)
    # per-sample transforms differ
    assert not np.allclose(R[0], R[1])


def test_random_se3_2d_rotation_axis(rng):
    pc = rng.normal(size=(2, 20, 3)).astype(np.float32)
    sn = rng.normal(size=(2, 20, 3)).astype(np.float32)
    node = rng.normal(size=(2, 5, 3)).astype(np.float32)
    _, _, _, gt = augment.random_se3(
        jax.random.PRNGKey(0), jnp.asarray(pc), jnp.asarray(sn), jnp.asarray(node),
        rot_type="2d", scale_thre=0.0, shift_thre=0.0)
    R = np.asarray(gt.R)
    # 2d = rotation about y axis only: y-row/col is identity
    np.testing.assert_allclose(R[:, 1, :], [[0, 1, 0]] * 2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt.scale), 1.0)
    np.testing.assert_allclose(np.asarray(gt.shift), 0.0)


def test_shared_augment_shares_rotation(rng):
    """Both siamese copies must receive the same rotation/scale."""
    cfg = AugmentConfig(rot_3d=True, jitter=False)
    pc = rng.normal(size=(2, 30, 3)).astype(np.float32)
    sn = rng.normal(size=(2, 30, 4)).astype(np.float32)
    node = rng.normal(size=(2, 8, 3)).astype(np.float32)
    packs = [(jnp.asarray(pc), jnp.asarray(sn), jnp.asarray(node))] * 2
    out = augment.shared_augment(jax.random.PRNGKey(1), packs, cfg)
    np.testing.assert_allclose(np.asarray(out[0][0]), np.asarray(out[1][0]),
                               atol=1e-6)
    # rotation preserves pairwise distances (no jitter, shared scale)
    d_in = np.linalg.norm(pc[0, :1] - pc[0, 1:], axis=-1)
    d_out = np.linalg.norm(np.asarray(out[0][0])[0, :1] - np.asarray(out[0][0])[0, 1:],
                           axis=-1)
    ratio = d_out / d_in
    np.testing.assert_allclose(ratio, ratio[0], rtol=1e-4)  # uniform scale only


def test_height_scale(rng):
    pc = rng.normal(size=(2, 10, 3)).astype(np.float32)
    out = augment.random_height_scale(jax.random.PRNGKey(0), [jnp.asarray(pc)])
    o = np.asarray(out[0])
    np.testing.assert_allclose(o[..., :2], pc[..., :2], atol=1e-6)
    s = o[..., 2] / pc[..., 2]
    np.testing.assert_allclose(s, np.broadcast_to(s[:, :1], s.shape), rtol=1e-4)
    assert (s >= 0.25 - 1e-5).all() and (s <= 1.2 + 1e-5).all()


def test_coordinate_flips(rng):
    p = rng.normal(size=(5, 3)).astype(np.float32)
    nwu = augment.coordinate_nwu_to_cam(p)
    np.testing.assert_allclose(nwu[:, 0], -p[:, 1])
    np.testing.assert_allclose(nwu[:, 1], -p[:, 2])
    np.testing.assert_allclose(nwu[:, 2], p[:, 0])
    enu = augment.coordinate_enu_to_cam(p)
    np.testing.assert_allclose(enu[:, 0], p[:, 0])
    np.testing.assert_allclose(enu[:, 1], -p[:, 2])
    np.testing.assert_allclose(enu[:, 2], p[:, 1])


def test_shared_augment_scale_sn(rng):
    """modelnet scales normals with the cloud (modelnet_shrec_loader.py:233)."""
    pc = jnp.asarray(rng.normal(size=(2, 20, 3)).astype(np.float32))
    sn = jnp.asarray(rng.normal(size=(2, 20, 3)).astype(np.float32))
    node = jnp.asarray(rng.normal(size=(2, 5, 3)).astype(np.float32))
    cfg_on = AugmentConfig(jitter=False, scale_sn=True,
                           aug_scale_low=2.0, aug_scale_high=2.0)
    (opc, osn, onode), = augment.shared_augment(
        jax.random.PRNGKey(0), [(pc, sn, node)], cfg_on,
        scale_low=2.0, scale_high=2.0)
    np.testing.assert_allclose(np.asarray(osn), np.asarray(sn) * 2.0, atol=1e-5)
    cfg_off = AugmentConfig(jitter=False, scale_sn=False,
                            aug_scale_low=2.0, aug_scale_high=2.0)
    (_, osn2, _), = augment.shared_augment(
        jax.random.PRNGKey(0), [(pc, sn, node)], cfg_off,
        scale_low=2.0, scale_high=2.0)
    np.testing.assert_allclose(np.asarray(osn2), np.asarray(sn), atol=1e-5)
