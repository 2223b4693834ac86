"""Golden-value tests for losses against numpy transcriptions of the reference math
(models/losses.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from usip_tpu import losses


def _chamfer_oracle(src, dst, s_src, s_dst):
    """numpy transcription of ChamferLoss_Brute with sigmas (losses.py:80-97)."""
    b, m, _ = src.shape
    n = dst.shape[1]
    diff = np.linalg.norm(src[:, :, None, :] - dst[:, None, :, :], axis=3)  # BxMxN
    fwd_min, fwd_i = diff.min(2), diff.argmin(2)
    bwd_min, bwd_i = diff.min(1), diff.argmin(1)
    sel_dst = np.take_along_axis(s_dst, fwd_i, 1)
    sig_f = (s_src + sel_dst) / 2
    fwd = (np.log(sig_f) + fwd_min / sig_f).mean()
    sel_src = np.take_along_axis(s_src, bwd_i, 1)
    sig_b = (s_dst + sel_src) / 2
    bwd = (np.log(sig_b) + bwd_min / sig_b).mean()
    pure = fwd_min.mean() + bwd_min.mean()
    wf = (1 / sig_f) / (1 / sig_f).mean()
    wb = (1 / sig_b) / (1 / sig_b).mean()
    weighted = (wf * fwd_min).mean() + (wb * bwd_min).mean()
    return fwd + bwd, pure, weighted


def test_chamfer_probabilistic_golden(rng):
    src = rng.normal(size=(2, 6, 3)).astype(np.float32)
    dst = rng.normal(size=(2, 9, 3)).astype(np.float32)
    s_src = rng.uniform(0.5, 2.0, size=(2, 6)).astype(np.float32)
    s_dst = rng.uniform(0.5, 2.0, size=(2, 9)).astype(np.float32)
    out = losses.chamfer_probabilistic(jnp.asarray(src), jnp.asarray(dst),
                                       jnp.asarray(s_src), jnp.asarray(s_dst))
    ref_loss, ref_pure, ref_weighted = _chamfer_oracle(src, dst, s_src, s_dst)
    np.testing.assert_allclose(float(out.loss), ref_loss, rtol=1e-4)
    np.testing.assert_allclose(float(out.chamfer_pure), ref_pure, rtol=1e-4)
    np.testing.assert_allclose(float(out.chamfer_weighted), ref_weighted, rtol=1e-4)


def test_chamfer_no_sigma(rng):
    src = rng.normal(size=(1, 5, 3)).astype(np.float32)
    dst = rng.normal(size=(1, 7, 3)).astype(np.float32)
    out = losses.chamfer_probabilistic(jnp.asarray(src), jnp.asarray(dst))
    diff = np.linalg.norm(src[:, :, None] - dst[:, None], axis=3)
    ref = diff.min(2).mean() + diff.min(1).mean()
    np.testing.assert_allclose(float(out.loss), ref, rtol=1e-5)


def test_chamfer_gradient_finite(rng):
    src = jnp.asarray(rng.normal(size=(1, 5, 3)).astype(np.float32))
    dst = jnp.asarray(rng.normal(size=(1, 5, 3)).astype(np.float32))
    sig = jnp.ones((1, 5)) * 0.7

    def f(s):
        return losses.chamfer_probabilistic(s, dst, sig, sig).loss

    g = jax.grad(f)(src)
    assert np.isfinite(np.asarray(g)).all()


def test_single_side_chamfer_golden(rng):
    kp = rng.normal(size=(2, 4, 3)).astype(np.float32)
    pc = rng.normal(size=(2, 20, 3)).astype(np.float32)
    out = np.asarray(losses.single_side_chamfer(jnp.asarray(kp), jnp.asarray(pc)))
    ref = np.linalg.norm(kp[:, :, None] - pc[:, None], axis=3).min(2)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_point_on_surface_golden(rng):
    kp = rng.normal(size=(1, 4, 3)).astype(np.float32)
    pc = rng.normal(size=(1, 30, 3)).astype(np.float32)
    sn = rng.normal(size=(1, 30, 3)).astype(np.float32)
    sn /= np.linalg.norm(sn, axis=2, keepdims=True)
    out = np.asarray(losses.point_on_surface(jnp.asarray(kp), jnp.asarray(pc),
                                             jnp.asarray(sn)))
    # oracle: losses.py:146-183
    diff = np.linalg.norm(kp[:, :, None] - pc[:, None], axis=3)
    idx = diff.argmin(2)  # (1, 4)
    pc_sel = np.take_along_axis(pc, idx[..., None], 1)
    sn_sel = np.take_along_axis(sn, idx[..., None], 1)
    v = kp - pc_sel
    v = v / (np.linalg.norm(v, axis=2, keepdims=True) + 1e-7)
    ref = np.sum(sn_sel * v, axis=2) ** 2
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_desc_pair_scan_loss_golden(rng):
    b, m, c = 2, 6, 8
    anc = rng.normal(size=(b, m, c)).astype(np.float32)
    pos = rng.normal(size=(b, m, c)).astype(np.float32)
    neg = rng.normal(size=(b, m, c)).astype(np.float32)
    sig = rng.uniform(0.2, 2.5, size=(b, m)).astype(np.float32)
    gamma, sigma_max = 0.5, 3.0
    loss, active = losses.desc_pair_scan_loss(
        jnp.asarray(anc), jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(sig),
        gamma=gamma, sigma_max=sigma_max)
    # oracle (losses.py:200-237)
    dp = np.linalg.norm(anc[:, :, None] - pos[:, None], axis=3).min(2)
    dn = np.linalg.norm(anc[:, :, None] - neg[:, None], axis=3).min(2)
    before = dp - dn + gamma
    ref_active = (before > 0).mean(1)
    w = np.maximum(sigma_max - sig, 0)
    w = w / w.mean(1, keepdims=True)
    ref_loss = w * np.maximum(before, 0)
    np.testing.assert_allclose(np.asarray(loss), ref_loss, atol=1e-4)
    np.testing.assert_allclose(np.asarray(active), ref_active, atol=1e-6)


def test_desc_cgf_loss_properties(rng):
    """CGF loss structure: zero when no matches; positive dists from in-radius
    matches; scaling factor applied."""
    b, m, c = 1, 8, 4
    kp = rng.normal(size=(b, m, 3)).astype(np.float32) * 5
    anc_desc = rng.normal(size=(b, m, c)).astype(np.float32)
    pos_desc = rng.normal(size=(b, m, c)).astype(np.float32)
    sig = rng.uniform(0.1, 0.4, size=(b, m)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    # identical keypoints -> every anchor has a match at distance 0
    loss, active = losses.desc_cgf_loss(
        jnp.asarray(kp), jnp.asarray(anc_desc), jnp.asarray(kp),
        jnp.asarray(pos_desc), jnp.asarray(sig), key,
        cgf_radius=0.075, gamma=0.3, sigma_max=0.5)
    assert np.isfinite(np.asarray(loss)).all()
    assert loss.shape == (b, m)
    # far-apart keypoints -> no matches -> zero loss
    loss0, _ = losses.desc_cgf_loss(
        jnp.asarray(kp + 1000.0), jnp.asarray(anc_desc), jnp.asarray(kp),
        jnp.asarray(pos_desc), jnp.asarray(sig), key,
        cgf_radius=0.075, gamma=0.3, sigma_max=0.5)
    np.testing.assert_allclose(np.asarray(loss0), 0.0, atol=1e-6)
