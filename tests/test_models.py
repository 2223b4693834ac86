"""Shape / jit / variant tests for detector and descriptor models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from usip_tpu.config import DescriptorConfig, DetectorConfig
from usip_tpu.models import Descriptor, Detector

B, N, M, S = 2, 256, 32, 4


def _inputs(rng, sn_len=S):
    pc = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    sn = jnp.asarray(rng.normal(size=(B, N, sn_len)).astype(np.float32))
    node = jnp.asarray(rng.normal(size=(B, M, 3)).astype(np.float32))
    return pc, sn, node


@pytest.mark.parametrize("grouping", ["som", "knn", "ball"])
def test_detector_shapes(rng, grouping):
    cfg = DetectorConfig(grouping=grouping, c1=32, c2=64, node_knn_k=4, group_k=8,
                         surface_normal_len=S)
    pc, sn, node = _inputs(rng)
    model = Detector(cfg)
    variables = model.init(jax.random.PRNGKey(0), pc, sn, node, train=False)
    anchors, keypoints, sigmas = model.apply(variables, pc, sn, node, train=False)
    assert anchors.shape == (B, M, 3)
    assert keypoints.shape == (B, M, 3)
    assert sigmas.shape == (B, M)
    assert np.isfinite(np.asarray(keypoints)).all()
    assert (np.asarray(sigmas) >= cfg.sigma_lower_bound).all()


def test_detector_lite_widths(rng):
    """Indoor 'lite' variant = same architecture, c1=64/c2=256 (networks.py:165-307)."""
    cfg = DetectorConfig(grouping="som", c1=64, c2=256, node_knn_k=4,
                         surface_normal_len=S)
    pc, sn, node = _inputs(rng)
    model = Detector(cfg)
    v = model.init(jax.random.PRNGKey(0), pc, sn, node, train=False)
    # head input is c1 + c2 = 320
    k = v["params"]["head"]["mlp1"]["dense"]["kernel"]
    assert k.shape[0] == 64 + 256


def test_detector_jit_and_train_mode(rng):
    cfg = DetectorConfig(grouping="som", c1=32, c2=64, node_knn_k=4,
                         surface_normal_len=S)
    pc, sn, node = _inputs(rng)
    model = Detector(cfg)
    variables = model.init(jax.random.PRNGKey(0), pc, sn, node, train=False)

    @jax.jit
    def fwd(v, pc, sn, node, momentum):
        return model.apply(v, pc, sn, node, train=True, bn_momentum=momentum,
                           mutable=["batch_stats"])

    (anchors, keypoints, sigmas), mutated = fwd(variables, pc, sn, node, 0.1)
    assert "batch_stats" in mutated
    # running stats actually moved
    before = variables["batch_stats"]["first_pointnet"]["layer0"]["norm"]["mean"]
    after = mutated["batch_stats"]["first_pointnet"]["layer0"]["norm"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_detector_siamese_determinism(rng):
    """Same cloud in both siamese halves -> identical keypoints (eval mode)."""
    cfg = DetectorConfig(grouping="som", c1=32, c2=64, node_knn_k=4,
                         surface_normal_len=S)
    pc, sn, node = _inputs(rng)
    model = Detector(cfg)
    v = model.init(jax.random.PRNGKey(0), pc, sn, node, train=False)
    both = (jnp.concatenate([pc, pc]), jnp.concatenate([sn, sn]),
            jnp.concatenate([node, node]))
    _, kp, sig = model.apply(v, *both, train=False)
    np.testing.assert_allclose(np.asarray(kp[:B]), np.asarray(kp[B:]), atol=1e-5)


def test_detector_keypoints_near_anchors_at_init(rng):
    """Head init is N(0, 1e-4) with zero bias (networks.py:70-71): initial
    keypoints must sit (almost) exactly on the anchors."""
    cfg = DetectorConfig(grouping="som", c1=32, c2=64, node_knn_k=4,
                         surface_normal_len=S)
    pc, sn, node = _inputs(rng)
    model = Detector(cfg)
    v = model.init(jax.random.PRNGKey(0), pc, sn, node, train=False)
    anchors, keypoints, sigmas = model.apply(v, pc, sn, node, train=False)
    np.testing.assert_allclose(np.asarray(keypoints), np.asarray(anchors), atol=1e-2)
    # sigma ~ softplus(0) + lb
    np.testing.assert_allclose(np.asarray(sigmas), np.log(2.0) + cfg.sigma_lower_bound,
                               atol=1e-2)


@pytest.mark.parametrize("use_global", [False, True])
def test_descriptor_shapes_and_norm(rng, use_global):
    cfg = DescriptorConfig(descriptor_len=32, ball_radius=1.0, ball_nsamples=8,
                           use_global_context=use_global, surface_normal_len=S)
    pc, sn, node = _inputs(rng)
    kp = node
    model = Descriptor(cfg)
    v = model.init(jax.random.PRNGKey(0), pc, sn, kp, key=jax.random.PRNGKey(1),
                   train=False)
    desc, feats = model.apply(v, pc, sn, kp, key=jax.random.PRNGKey(1), train=False)
    assert desc.shape == (B, M, 32)
    assert feats.shape == (B, M, 8, 3 + S)
    norms = np.linalg.norm(np.asarray(desc), axis=-1)
    assert (norms <= 1.0 + 1e-4).all()
    np.testing.assert_allclose(norms[norms > 0.5], 1.0, atol=1e-2)


def test_detector_gradients_flow(rng):
    cfg = DetectorConfig(grouping="som", c1=32, c2=64, node_knn_k=4,
                         surface_normal_len=S)
    pc, sn, node = _inputs(rng)
    model = Detector(cfg)
    v = model.init(jax.random.PRNGKey(0), pc, sn, node, train=False)

    def loss_fn(params):
        _, kp, sig = model.apply({"params": params,
                                  "batch_stats": v["batch_stats"]},
                                 pc, sn, node, train=False)
        return jnp.sum(kp ** 2) + jnp.sum(sig)

    grads = jax.grad(loss_fn)(v["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(jnp.sum(jnp.abs(g))) > 0 for g in leaves)
    assert nonzero > len(leaves) * 0.8


@pytest.mark.parametrize("grouping", ["knn", "ball"])
def test_detector_group_method_approx(rng, grouping):
    """group_method='approx' (the LiDAR-scale opt-in, config.py) runs the
    knn/ball trunks end to end and produces keypoints statistically close to
    the exact selection (same weights, same inputs)."""
    pc, sn, node = _inputs(rng)
    out = {}
    for method in ("exact", "approx"):
        cfg = DetectorConfig(grouping=grouping, c1=32, c2=64, node_knn_k=4,
                             group_k=8, surface_normal_len=S,
                             group_method=method, group_radius=1.0)
        model = Detector(cfg)
        variables = model.init(jax.random.PRNGKey(0), pc, sn, node, train=False)
        _, kp, sg = model.apply(variables, pc, sn, node, train=False)
        assert np.isfinite(np.asarray(kp)).all()
        out[method] = np.asarray(kp)
    # same-init keypoints from approx neighbors stay near the exact ones
    med = np.median(np.linalg.norm(out["exact"] - out["approx"], axis=-1))
    assert med < 0.5, med
