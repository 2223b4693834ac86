"""Reference-checkpoint importer (train/torch_import.py): roundtrip through
the reference's state_dict naming, DataParallel prefix, validation errors,
and the CLI .pth conversion path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from usip_tpu.config import DetectorConfig, DescriptorConfig
from usip_tpu.models import Detector
from usip_tpu.models.descriptor import Descriptor
from usip_tpu.train.torch_import import (convert_descriptor_state_dict,
                                         convert_detector_state_dict,
                                         export_descriptor_state_dict,
                                         export_detector_state_dict,
                                         strip_data_parallel)


def _detector_vars(c1=16, c2=32, seed=0):
    cfg = DetectorConfig(grouping="som", c1=c1, c2=c2, node_knn_k=4,
                         surface_normal_len=3, compute_dtype="float32")
    model = Detector(cfg)
    return model.init(jax.random.PRNGKey(seed), jnp.zeros((2, 64, 3)),
                      jnp.zeros((2, 64, 3)), jnp.zeros((2, 8, 3)), train=False)


def _assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = {jax.tree_util.keystr(p): v for p, v in
          jax.tree_util.tree_leaves_with_path(b)}
    assert len(la) == len(lb)
    for p, v in la:
        np.testing.assert_allclose(np.asarray(v), np.asarray(lb[jax.tree_util.keystr(p)]),
                                   atol=1e-6, err_msg=jax.tree_util.keystr(p))


def test_detector_roundtrip():
    v = _detector_vars()
    sd = export_detector_state_dict(v)
    # reference conv shapes: (O, I, 1) for Conv1d modules, (O, I, 1, 1) for 2d
    assert sd["first_pointnet.layers.0.conv.weight"].ndim == 3
    assert sd["knnlayer_1.layers_before.0.conv.weight"].ndim == 4
    assert "mlp3.norm.weight" not in sd  # head mlp3 has no norm
    v2 = convert_detector_state_dict(sd, _detector_vars(seed=1))
    _assert_tree_equal(v["params"], v2["params"])
    _assert_tree_equal(v["batch_stats"], v2["batch_stats"])


def _group_detector_vars(grouping="ball", c1=16, c2=32, seed=0):
    cfg = DetectorConfig(grouping=grouping, c1=c1, c2=c2, node_knn_k=4,
                         group_k=8, group_radius=2.0, surface_normal_len=3,
                         compute_dtype="float32")
    model = Detector(cfg)
    return model.init(jax.random.PRNGKey(seed), jnp.zeros((2, 64, 3)),
                      jnp.zeros((2, 64, 3)), jnp.zeros((2, 8, 3)), train=False)


def test_group_detector_roundtrip():
    """RPN_Detector_Ball/KNN family (networks.py:482-738): conv1..5 trunk +
    shared knnlayer/head, auto-detected from the checkpoint keys."""
    from usip_tpu.train.torch_import import detect_detector_family

    v = _group_detector_vars("ball")
    sd = export_detector_state_dict(v)
    # grouped trunk exports MyConv2d-shaped kernels (O, I, 1, 1)
    assert sd["conv1.conv.weight"].ndim == 4
    assert "first_pointnet.layers.0.conv.weight" not in sd
    assert detect_detector_family(sd) == "group"
    assert detect_detector_family(
        export_detector_state_dict(_detector_vars())) == "som"
    v2 = convert_detector_state_dict(sd, _group_detector_vars("ball", seed=1))
    _assert_tree_equal(v["params"], v2["params"])
    _assert_tree_equal(v["batch_stats"], v2["batch_stats"])
    # the knn variant shares the exact state_dict layout
    v3 = convert_detector_state_dict(sd, _group_detector_vars("knn", seed=2))
    _assert_tree_equal(v["params"], v3["params"])


def test_detector_family_mismatch_is_actionable():
    """Feeding the released ball checkpoint to a som-preset model (or vice
    versa) raises an error naming the grouping override to use."""
    group_sd = export_detector_state_dict(_group_detector_vars("ball"))
    with pytest.raises(ValueError, match="detector.grouping=ball"):
        convert_detector_state_dict(group_sd, _detector_vars())
    som_sd = export_detector_state_dict(_detector_vars())
    with pytest.raises(ValueError, match="detector.grouping=som"):
        convert_detector_state_dict(som_sd, _group_detector_vars("ball"))


def test_detector_import_data_parallel_prefix():
    v = _detector_vars()
    sd = {f"module.{k}": val for k, val in export_detector_state_dict(v).items()}
    assert all(not k.startswith("module.") for k in strip_data_parallel(sd))
    v2 = convert_detector_state_dict(sd, _detector_vars(seed=1))
    _assert_tree_equal(v["params"], v2["params"])


def test_detector_import_rejects_wrong_width():
    sd = export_detector_state_dict(_detector_vars(c1=16, c2=32))
    with pytest.raises(ValueError, match="shape mismatch"):
        convert_detector_state_dict(sd, _detector_vars(c1=32, c2=64))


def test_descriptor_roundtrip():
    cfg = DescriptorConfig(descriptor_len=16, surface_normal_len=3,
                           compute_dtype="float32")
    model = Descriptor(cfg)
    args = (jnp.zeros((2, 64, 3)), jnp.zeros((2, 64, 3)), jnp.zeros((2, 8, 3)))
    v = model.init(jax.random.PRNGKey(0), *args, train=False)
    sd = export_descriptor_state_dict(v)
    assert sd["conv1.conv.weight"].shape == (4, 6, 1, 1)
    assert "conv5.norm.weight" not in sd  # conv5: activation/normalization None
    v2 = convert_descriptor_state_dict(
        sd, model.init(jax.random.PRNGKey(1), *args, train=False))
    _assert_tree_equal(v["params"], v2["params"])


def test_cli_import_torch_pth(tmp_path):
    """e2e: torch.save a reference-named state_dict -> import-torch CLI ->
    loadable full-state checkpoint with the same weights."""
    import torch

    from usip_tpu.cli import main
    from usip_tpu.config import get_config
    from usip_tpu.train.checkpoint import restore_checkpoint
    from usip_tpu.train.loop import init_detector_state

    overrides = ["detector.c1=16", "detector.c2=32", "detector.node_knn_k=4",
                 "detector.surface_normal_len=3",
                 "data.input_pc_num=64", "data.node_num=8"]
    cfg = get_config("modelnet", **{o.split("=")[0]: int(o.split("=")[1])
                                    for o in overrides})
    _, state = init_detector_state(cfg, 0)
    sd = {k: torch.tensor(v)
          for k, v in export_detector_state_dict(state.variables).items()}
    pth = tmp_path / "400_net_detector.pth"
    torch.save(sd, str(pth))

    out = tmp_path / "imported.msgpack"
    main(["import-torch", "--pth", str(pth), "--out", str(out),
          "--role", "detector", "--dataset", "modelnet"]
         + [a for o in overrides for a in ("--override", o)])
    assert out.exists()
    _, fresh = init_detector_state(cfg, 3)
    restored, meta = restore_checkpoint(str(out), fresh)
    assert meta["role"] == "detector"
    _assert_tree_equal(state.variables["params"], restored.variables["params"])


def test_descriptor_global_roundtrip():
    """DescriptorLiteOldGlobal (fc1..fc3 fusion stack) auto-detected from the
    checkpoint keys (networks.py:388-479)."""
    cfg = DescriptorConfig(descriptor_len=16, surface_normal_len=3,
                           compute_dtype="float32", use_global_context=True)
    model = Descriptor(cfg)
    args = (jnp.zeros((2, 64, 3)), jnp.zeros((2, 64, 3)), jnp.zeros((2, 8, 3)))
    v = model.init(jax.random.PRNGKey(0), *args, train=False)
    sd = export_descriptor_state_dict(v)
    assert sd["fc1.conv.weight"].shape == (32, 32, 1)  # Conv1d, not 2d
    assert "fc3.norm.weight" not in sd  # fc3: activation/normalization None
    v2 = convert_descriptor_state_dict(
        sd, model.init(jax.random.PRNGKey(1), *args, train=False))
    _assert_tree_equal(v["params"], v2["params"])
    _assert_tree_equal(v["batch_stats"], v2["batch_stats"])
