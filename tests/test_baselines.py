"""Baseline keypoint detector tests: corners of a box are ISS/Harris keypoints,
flat faces are not."""

import numpy as np
import pytest

from usip_tpu.eval.baselines import (baseline_keypoints, harris3d_keypoints,
                                     iss_keypoints, random_keypoints,
                                     sift3d_keypoints)


def _box_cloud(rng, per_face=400, jitter=0.0):
    """Axis-aligned unit box surface sampling."""
    pts = []
    for axis in range(3):
        for sign in (-1.0, 1.0):
            uv = rng.uniform(-1, 1, size=(per_face, 2))
            p = np.zeros((per_face, 3))
            p[:, axis] = sign
            others = [a for a in range(3) if a != axis]
            p[:, others[0]] = uv[:, 0]
            p[:, others[1]] = uv[:, 1]
            pts.append(p)
    pc = np.concatenate(pts)
    if jitter:
        pc = pc + rng.normal(scale=jitter, size=pc.shape)
    return pc.astype(np.float64)


def test_random_keypoints(rng):
    pc = rng.normal(size=(100, 3))
    kp = random_keypoints(rng, pc, 10)
    assert kp.shape == (10, 3)
    rows = {tuple(r) for r in pc}
    assert all(tuple(r) in rows for r in kp)


def test_iss_finds_corners(rng):
    # jittered box: faces have finite lambda3, so edge/corner saliency dominates
    # (a perfect box has lambda3 == 0 everywhere, degenerate for ISS NMS)
    pc = _box_cloud(rng, jitter=0.02)
    kp = iss_keypoints(pc, salient_radius=0.4, non_max_radius=0.4,
                       gamma_21=0.9, gamma_32=0.9, min_neighbors=5)
    assert kp.shape[0] > 0
    # detected keypoints concentrate on edges/corners (>=2 coords near +-1)
    near_extreme = (np.abs(np.abs(kp) - 1.0) < 0.25).sum(axis=1)
    assert (near_extreme >= 2).mean() > 0.6
    rand = pc[rng.choice(len(pc), len(kp), replace=False)]
    rand_extreme = (np.abs(np.abs(rand) - 1.0) < 0.25).sum(axis=1)
    assert near_extreme.mean() > rand_extreme.mean()


def test_harris_response_positive_on_corners(rng):
    pc = _box_cloud(rng, jitter=0.02)
    kp = harris3d_keypoints(pc, radius=0.4, min_neighbors=5)
    assert kp.shape[0] > 0
    near_extreme = (np.abs(np.abs(kp) - 1.0) < 0.25).sum(axis=1)
    assert (near_extreme >= 2).mean() > 0.5


def test_dispatch(rng):
    pc = rng.normal(size=(50, 3))
    kp = baseline_keypoints("random", pc, rng, num=5)
    assert kp.shape == (5, 3)
    with pytest.raises(KeyError):
        baseline_keypoints("nope", pc)


def _bump_plane(rng, n=900, bump_center=(0.0, 0.0), bump_h=0.5,
                bump_sigma=0.15):
    """Flat z=0 grid with one Gaussian bump: a single blob-scale z feature."""
    g = int(np.sqrt(n))
    xs, ys = np.meshgrid(np.linspace(-1, 1, g), np.linspace(-1, 1, g))
    pc = np.stack([xs.ravel(), ys.ravel(), np.zeros(g * g)], axis=1)
    d2 = (pc[:, 0] - bump_center[0]) ** 2 + (pc[:, 1] - bump_center[1]) ** 2
    pc[:, 2] = bump_h * np.exp(-d2 / (2 * bump_sigma ** 2))
    return pc + rng.normal(scale=1e-4, size=pc.shape)


def test_sift3d_fires_on_bump_not_plane(rng):
    pc = _bump_plane(rng)
    kp = sift3d_keypoints(pc, min_scale=0.08, n_octaves=2,
                          n_scales_per_octave=4, min_contrast=0.01)
    assert kp.shape[0] > 0
    # keypoints concentrate at the bump (blob center), not the flat field
    d_bump = np.linalg.norm(kp[:, :2], axis=1)
    assert (d_bump < 0.4).mean() > 0.6
    # a flat plane yields nothing above the contrast threshold
    flat = _bump_plane(rng, bump_h=0.0)
    kp_flat = sift3d_keypoints(flat, min_scale=0.08, n_octaves=2,
                               n_scales_per_octave=4, min_contrast=0.01)
    assert kp_flat.shape[0] == 0


def test_sift3d_max_keypoints_and_dispatch(rng):
    pc = _bump_plane(rng)
    kp = sift3d_keypoints(pc, min_scale=0.08, n_octaves=2,
                          n_scales_per_octave=4, min_contrast=0.01,
                          max_keypoints=3)
    assert kp.shape[0] <= 3
    kd = baseline_keypoints("sift", pc, min_scale=0.08, n_octaves=1,
                            n_scales_per_octave=3, min_contrast=0.01)
    assert kd.ndim == 2 and kd.shape[1] == 3


def test_sift_dispatch_subsamples_large_clouds(rng, caplog):
    """The export dispatch must not hand a LiDAR-scale cloud to the per-point
    sift loops — it warns and subsamples above sift_max_points (round-2
    ADVICE)."""
    import logging as pylogging

    pc = _bump_plane(rng)
    with caplog.at_level(pylogging.WARNING, logger="usip_tpu.eval.baselines"):
        kd = baseline_keypoints("sift", pc, rng, min_scale=0.08, n_octaves=1,
                                n_scales_per_octave=3, min_contrast=0.01,
                                sift_max_points=64)
    assert any("subsampling" in r.message for r in caplog.records)
    assert kd.ndim == 2 and kd.shape[1] == 3
    # opting out runs the full cloud without the warning
    caplog.clear()
    with caplog.at_level(pylogging.WARNING, logger="usip_tpu.eval.baselines"):
        baseline_keypoints("sift", pc, rng, min_scale=0.08, n_octaves=1,
                           n_scales_per_octave=3, min_contrast=0.01,
                           sift_max_points=None)
    assert not caplog.records
