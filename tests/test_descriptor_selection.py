"""Matching-accuracy registration proxy + best-checkpoint selection.

PERFORMANCE.md's indoor 2x2 measured that the CGF test LOSS diverges from
fragment-registration recall at long training (best-by-test-loss picked arm
D's epoch-72 checkpoint, recall 0.268, over the better 30-epoch one). These
tests cover the fix: ``losses.descriptor_matching_accuracy`` (the in-step
1-NN registration proxy, computable under the CGF GT alignment) and
``train.select_best_by='match_acc'`` gating in the descriptor engine.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from usip_tpu import losses
from usip_tpu.config import get_config
from usip_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from usip_tpu.train.descriptor_loop import DescriptorEngine
from usip_tpu.train.loop import init_detector_state

TINY = {"data.input_pc_num": 128, "data.node_num": 16,
        "detector.c1": 16, "detector.c2": 32, "detector.node_knn_k": 4,
        "descriptor.descriptor_len": 16, "descriptor.ball_nsamples": 8,
        "descriptor.ball_radius": 0.75, "descriptor.surface_normal_len": 4,
        "train.batch_size": 2, "train.log_every": 1000}


def _pad_desc(kp, dim=16):
    """Descriptors that ARE the keypoint coordinates (oracle features)."""
    m = kp.shape[-2]
    return jnp.concatenate([kp, jnp.zeros(kp.shape[:-1] + (dim - 3,))],
                           axis=-1)


def test_matching_accuracy_oracle():
    rng = np.random.default_rng(0)
    kp = jnp.asarray(rng.normal(size=(2, 8, 3)).astype(np.float32)) * 5.0
    # oracle descriptors on identical (already-aligned) keypoint sets: every
    # anchor's descriptor-NN is itself -> accuracy 1
    acc = losses.descriptor_matching_accuracy(
        kp, _pad_desc(kp), kp, _pad_desc(kp), radius=0.1)
    np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-6)

    # permuted pos set with consistently permuted descriptors: index tracking
    # must follow the permutation -> still 1
    perm = jnp.asarray(rng.permutation(8))
    kp_p = kp[:, perm]
    acc = losses.descriptor_matching_accuracy(
        kp, _pad_desc(kp), kp_p, _pad_desc(kp_p), radius=0.1)
    np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-6)


def test_matching_accuracy_adversarial_and_unmatchable():
    # keypoints on a line, spacing 1 >> radius; adversarial descriptors map
    # anchor i to pos (M-1-i) -> every match lands on a far keypoint -> 0
    m = 8
    line = jnp.stack([jnp.arange(m, dtype=jnp.float32),
                      jnp.zeros(m), jnp.zeros(m)], axis=-1)[None]
    rev = line[:, ::-1]
    acc = losses.descriptor_matching_accuracy(
        line, _pad_desc(rev), line, _pad_desc(line), radius=0.1)
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-6)

    # unmatchable anchors (no pos keypoint within radius) are excluded from
    # the denominator: anchor 0 shifted 100 away, the rest oracle-matched
    # -> accuracy stays 1 instead of 7/8
    anc = line.at[:, 0].add(jnp.asarray([100.0, 0.0, 0.0]))
    acc = losses.descriptor_matching_accuracy(
        anc, _pad_desc(anc), line, _pad_desc(anc), radius=0.1)
    np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-6)


def test_match_acc_metric_and_selection(tmp_path):
    """Engine end-to-end: the CGF train/eval step emits match_acc, and
    select_best_by='match_acc' gates best.msgpack on it (not on loss)."""
    cfg = get_config("scenenn", **dict(
        TINY, **{"train.select_best_by": "match_acc"}))
    assert cfg.descriptor.use_global_context  # scenenn = indoor preset
    np.random.seed(1234)
    _, state = init_detector_state(cfg, 0)
    ckpt = os.path.join(tmp_path, "det.msgpack")
    save_checkpoint(ckpt, state)
    engine = DescriptorEngine(cfg, ckpt, synthetic=True,
                              out_dir=os.path.join(tmp_path, "desc"))
    assert engine.use_cgf
    avg = engine.train_epoch(0)
    assert "match_acc" in avg
    assert 0.0 <= avg["match_acc"] <= 1.0

    # gating: higher match_acc wins even with a worse loss
    assert engine.maybe_save(0, {"loss": 0.5, "match_acc": 0.2})
    assert not engine.maybe_save(1, {"loss": 0.1, "match_acc": 0.1})
    assert engine.maybe_save(2, {"loss": 0.9, "match_acc": 0.3})
    best = os.path.join(engine.out_dir, "best.msgpack")
    _, meta = restore_checkpoint(best, engine.state)
    assert int(meta["epoch"]) == 2

    # resume restores the criterion score (not the loss)
    engine2 = DescriptorEngine(cfg, ckpt, synthetic=True,
                               out_dir=os.path.join(tmp_path, "desc2"))
    engine2.resume(best)
    assert engine2.best_test_loss == pytest.approx(-0.3)
    assert not engine2.maybe_save(3, {"loss": 0.0, "match_acc": 0.25})


def test_select_best_by_guards(tmp_path):
    """match_acc selection without the CGF objective (no GT alignment in-step)
    and unknown criteria are refused at engine construction."""
    np.random.seed(1234)
    cfg_out = get_config("kitti", **dict(
        TINY, **{"data.parent_pc_num": 160,
                 "train.select_best_by": "match_acc"}))
    assert not cfg_out.descriptor.use_cgf_loss
    _, state = init_detector_state(cfg_out, 0)
    ckpt = os.path.join(tmp_path, "det.msgpack")
    save_checkpoint(ckpt, state)
    with pytest.raises(ValueError, match="match_acc"):
        DescriptorEngine(cfg_out, ckpt, synthetic=True,
                         out_dir=os.path.join(tmp_path, "desc"))

    cfg_bad = get_config("scenenn", **dict(
        TINY, **{"train.select_best_by": "recall"}))
    with pytest.raises(ValueError, match="select_best_by"):
        DescriptorEngine(cfg_bad, ckpt, synthetic=True,
                         out_dir=os.path.join(tmp_path, "desc_bad"))
