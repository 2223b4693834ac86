"""Fast Global Registration (eval/fgr.py) — the native rebuild of the
reference's mex baseline (eval_indoor/fgr/fast_global_registration.cpp)."""

import numpy as np
import pytest

from usip_tpu.eval.fgr import (fast_global_registration, match_features,
                               optimize_pairwise)


def _pair(seed=0, n=200, noise=0.0, outlier_frac=0.0):
    """Src cloud + descriptors, dst = R src + t (+noise); descriptors shared."""
    rng = np.random.default_rng(seed)
    src = rng.uniform(-1, 1, size=(n, 3))
    theta = rng.uniform(0, 2 * np.pi)
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    t = rng.uniform(-0.5, 0.5, size=3)
    dst = src @ R.T + t + rng.normal(scale=noise, size=(n, 3))
    desc = np.tile(src, (1, 3)) + rng.normal(scale=0.005, size=(n, 9))
    desc_dst = desc.copy()
    if outlier_frac:
        k = int(n * outlier_frac)
        idx = rng.choice(n, k, replace=False)
        desc_dst[idx] = rng.normal(size=(k, 9))  # break those matches
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return src, desc, dst, desc_dst, T


def test_match_features_mutual_and_tuple():
    src, desc, dst, desc_dst, _ = _pair(seed=1)
    corres = match_features(desc, desc_dst, src, dst)
    assert len(corres) > 100
    # identical descriptors -> mutual NN is the identity map
    assert (corres[:, 0] == corres[:, 1]).mean() > 0.95


@pytest.mark.parametrize("noise", [0.0, 0.005])
def test_fgr_recovers_transform(noise):
    src, desc, dst, desc_dst, T = _pair(seed=2, noise=noise)
    Te, ncorr = fast_global_registration(src, desc, dst, desc_dst)
    assert ncorr >= 3
    src_t = src @ Te[:3, :3].T + Te[:3, 3]
    rmse = float(np.sqrt(np.mean(np.sum((src_t - dst) ** 2, axis=1))))
    assert rmse < max(0.02, 4 * noise), rmse


def test_fgr_robust_to_outlier_matches():
    """Geman-McClure GNC must shrug off 30% corrupted correspondences."""
    src, desc, dst, desc_dst, T = _pair(seed=3, outlier_frac=0.3)
    Te, _ = fast_global_registration(src, desc, dst, desc_dst)
    src_t = src @ Te[:3, :3].T + Te[:3, 3]
    good = np.linalg.norm(src_t - dst, axis=1) < 0.05
    assert good.mean() > 0.65  # true-match fraction recovered


def test_optimize_pairwise_identity_on_aligned():
    rng = np.random.default_rng(4)
    pts = rng.uniform(-1, 1, size=(50, 3))
    corres = np.stack([np.arange(50), np.arange(50)], 1)
    T = optimize_pairwise(pts, pts, corres, scale=1.0)
    np.testing.assert_allclose(T, np.eye(4), atol=1e-6)


def test_fgr_in_register_fragments():
    """estimator='fgr' path through the indoor fragment registration."""
    from usip_tpu.eval.indoor import register_fragments

    src, desc, dst, desc_dst, T = _pair(seed=5, n=120)
    # fragment convention: register pc2 onto pc1 -> trans maps kp2 into pc1
    reg = register_fragments(dst, src, dst, desc_dst, src, desc,
                             estimator="fgr")
    kp2_t = src @ reg.trans[:3, :3].T + reg.trans[:3, 3]
    rmse = float(np.sqrt(np.mean(np.sum((kp2_t - dst) ** 2, axis=1))))
    assert rmse < 0.05
    # knn-union (k=5) match candidates dilute the ratio ~1/(2k-1); the
    # writeLog gate is 0.025 (writeLog.m:52-53)
    assert reg.inlier_ratio > 0.1
    assert reg.ratio_aligned[0] > 0.9
