"""Import reference PyTorch checkpoints into this framework's flax variables.

The reference saves raw ``network.state_dict()`` files
(models/keypoint_detector.py:348-351: ``<epoch>_net_detector.pth``), optionally
carrying the ``nn.DataParallel`` ``module.`` prefix (stripped on load, see
oxford/train_descriptor.py:26-54 model_state_dict_parallel_convert). This
module maps those trees onto our flax param/batch_stats trees so USIP users can
bring trained weights across:

  reference RPN_Detector (networks.py:20-73)      ours (models/detector.py)
  ------------------------------------------      -------------------------
  first_pointnet.layers.{i}.conv.weight (O,I,1)   first_pointnet/layer{i}/dense/kernel (I,O)
  first_pointnet.layers.{i}.conv.bias             .../dense/bias
  first_pointnet.layers.{i}.norm.weight|bias      .../norm/scale|bias
  ...norm.running_mean|running_var                batch_stats .../norm/mean|var
  second_pointnet.layers.{i}.*                    second_pointnet/layer{i}/*
  knnlayer_1.layers_before.{i}.* (O,I,1,1)        knnlayer/before{i}/*
  knnlayer_1.layers_after.{i}.*                   knnlayer/after{i}/*
  mlp{1,2,3}.*                                    head/mlp{1,2,3}/*

  reference DescriptorLiteOld (networks.py:310-331): conv{1..5}.* -> conv{1..5}/*

The numerical equivalence of the two dataflows given identical weights is
pinned by tests/test_torch_parity.py; this importer is the inverse direction
of that test's weight export.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(value) -> np.ndarray:
    """torch.Tensor / array-like -> float32 numpy (host)."""
    if hasattr(value, "detach"):  # torch tensor without importing torch
        value = value.detach().cpu().numpy()
    return np.asarray(value, np.float32)


def strip_data_parallel(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Remove the DataParallel ``module.`` prefix when every key carries it
    (model_state_dict_parallel_convert 'to_single')."""
    keys = list(state_dict.keys())
    if keys and all(k.startswith("module.") for k in keys):
        return {k[len("module."):]: v for k, v in state_dict.items()}
    return dict(state_dict)


def _kernel(w) -> np.ndarray:
    """Conv1d/Conv2d 1x1 weight (O, I, 1[, 1]) -> Dense kernel (I, O)."""
    w = _np(w)
    while w.ndim > 2:
        if w.shape[-1] != 1:
            raise ValueError(f"expected 1x1 conv kernel, got shape {w.shape}")
        w = w[..., 0]
    return np.ascontiguousarray(w.T)


def _convert_layer(sd: Mapping[str, np.ndarray], src: str, params: dict,
                   stats: dict, module: str, layer: str) -> None:
    """One EquivariantLayer/MyConv2d -> one PointwiseLayer."""
    dst_p = params.setdefault(module, {}).setdefault(layer, {})
    dst_p["dense"] = {"kernel": _kernel(sd[f"{src}.conv.weight"]),
                      "bias": _np(sd[f"{src}.conv.bias"])}
    if f"{src}.norm.weight" in sd:
        dst_p["norm"] = {"scale": _np(sd[f"{src}.norm.weight"]),
                         "bias": _np(sd[f"{src}.norm.bias"])}
        stats.setdefault(module, {})[layer] = {
            "norm": {"mean": _np(sd[f"{src}.norm.running_mean"]),
                     "var": _np(sd[f"{src}.norm.running_var"])}}


_DETECTOR_LAYOUT: Tuple[Tuple[str, str, str], ...] = (
    # (reference module path, our module, our layer)
    ("first_pointnet.layers.0", "first_pointnet", "layer0"),
    ("first_pointnet.layers.1", "first_pointnet", "layer1"),
    ("first_pointnet.layers.2", "first_pointnet", "layer2"),
    ("second_pointnet.layers.0", "second_pointnet", "layer0"),
    ("second_pointnet.layers.1", "second_pointnet", "layer1"),
    ("knnlayer_1.layers_before.0", "knnlayer", "before0"),
    ("knnlayer_1.layers_before.1", "knnlayer", "before1"),
    ("knnlayer_1.layers_before.2", "knnlayer", "before2"),
    ("knnlayer_1.layers_after.0", "knnlayer", "after0"),
    ("knnlayer_1.layers_after.1", "knnlayer", "after1"),
    ("mlp1", "head", "mlp1"),
    ("mlp2", "head", "mlp2"),
    ("mlp3", "head", "mlp3"),
)

# RPN_Detector_KNN / RPN_Detector_Ball (networks.py:482-608, 611-738): the
# grouped trunk is conv1..conv5 (MyConv2d) instead of the two PointNets; the
# fusion layer and head are shared with the SOM variant. The two groupings
# have IDENTICAL state_dict keys — only the config's detector.grouping
# ('knn' vs 'ball') distinguishes them (e.g. the released Oxford model path
# BALL-16384-512-r2k64-k16, evaluation/save_keypoints.py:38, is ball).
_GROUP_DETECTOR_LAYOUT: Tuple[Tuple[str, str, str], ...] = (
    tuple((f"conv{i}", f"conv{i}", "") for i in range(1, 6)) + (
        ("knnlayer_1.layers_before.0", "knnlayer", "before0"),
        ("knnlayer_1.layers_before.1", "knnlayer", "before1"),
        ("knnlayer_1.layers_before.2", "knnlayer", "before2"),
        ("knnlayer_1.layers_after.0", "knnlayer", "after0"),
        ("knnlayer_1.layers_after.1", "knnlayer", "after1"),
        ("mlp1", "head", "mlp1"),
        ("mlp2", "head", "mlp2"),
        ("mlp3", "head", "mlp3"),
    ))


def detect_detector_family(state_dict: Mapping[str, Any]) -> str:
    """'som' for RPN_Detector(/Lite) checkpoints, 'group' for the
    RPN_Detector_KNN / RPN_Detector_Ball family (indistinguishable from keys
    alone — pick 'knn' or 'ball' from how the model was trained)."""
    sd = strip_data_parallel(state_dict)
    if "first_pointnet.layers.0.conv.weight" in sd:
        return "som"
    if "conv1.conv.weight" in sd and "knnlayer_1.layers_before.0.conv.weight" in sd:
        return "group"
    raise ValueError(
        "unrecognized detector state_dict (neither RPN_Detector's "
        "first_pointnet.* nor RPN_Detector_KNN/Ball's conv1..5 keys found) — "
        f"keys start with: {sorted(sd)[:4]}")

_DESCRIPTOR_LAYOUT: Tuple[Tuple[str, str, str], ...] = tuple(
    (f"conv{i}", f"conv{i}", "") for i in range(1, 6))

# DescriptorLiteOldGlobal (networks.py:388-479) adds the PPFNet-style global
# fusion stack fc1..fc3 on top of the lite conv trunk — same names our global
# descriptor uses.
_DESCRIPTOR_GLOBAL_LAYOUT: Tuple[Tuple[str, str, str], ...] = (
    _DESCRIPTOR_LAYOUT + tuple((f"fc{i}", f"fc{i}", "") for i in range(1, 4)))


def _convert(state_dict: Mapping[str, Any], variables: Mapping[str, Any],
             layout: Tuple[Tuple[str, str, str], ...]) -> Dict[str, Any]:
    sd = strip_data_parallel(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for src, module, layer in layout:
        if layer:
            _convert_layer(sd, src, params, stats, module, layer)
        else:
            # descriptor convN maps to a top-level module holding dense/norm
            tmp_p: Dict[str, Any] = {}
            tmp_s: Dict[str, Any] = {}
            _convert_layer(sd, src, tmp_p, tmp_s, module, "_")
            params[module] = tmp_p[module]["_"]
            if module in tmp_s:
                stats[module] = tmp_s[module]["_"]

    _validate_against(variables, params, stats)
    out = dict(variables)
    out["params"] = params
    if "batch_stats" in variables:
        out["batch_stats"] = stats
    return out


def _validate_against(variables, params, stats) -> None:
    """Exact tree-structure + shape match with the target model's variables."""
    import jax

    for name, ours, theirs in (("params", variables["params"], params),
                               ("batch_stats",
                                variables.get("batch_stats", {}), stats)):
        ref_paths = {tuple(str(getattr(p, "key", p)) for p in path): leaf.shape
                     for path, leaf in
                     jax.tree_util.tree_flatten_with_path(ours)[0]}
        new_paths = {tuple(str(getattr(p, "key", p)) for p in path): leaf.shape
                     for path, leaf in
                     jax.tree_util.tree_flatten_with_path(theirs)[0]}
        if ref_paths.keys() != new_paths.keys():
            missing = sorted(set(map("/".join, ref_paths)) -
                             set(map("/".join, new_paths)))
            extra = sorted(set(map("/".join, new_paths)) -
                           set(map("/".join, ref_paths)))
            raise ValueError(
                f"{name} tree mismatch; missing={missing[:6]} extra={extra[:6]}"
                " — wrong role/preset for this checkpoint?")
        for k, shape in ref_paths.items():
            if new_paths[k] != shape:
                raise ValueError(
                    f"{name} shape mismatch at {'/'.join(k)}: checkpoint "
                    f"{new_paths[k]} vs model {shape} — wrong width preset?")


def convert_detector_state_dict(state_dict: Mapping[str, Any],
                                variables: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference detector state_dict -> our Detector variables. Handles all
    four reference detectors: RPN_Detector(/Lite) and the grouped
    RPN_Detector_KNN/RPN_Detector_Ball family (layout auto-detected from the
    checkpoint keys).

    ``variables`` is a freshly initialized variable tree of the target model
    (provides the expected structure/shapes to validate against).
    """
    family = detect_detector_family(state_dict)
    model_family = "som" if "first_pointnet" in variables["params"] else "group"
    if family != model_family:
        want = ("detector.grouping=som" if family == "som" else
                "detector.grouping=ball (the released Oxford "
                "BALL-16384-512-r2k64-k16 model; radius 2, K 64) or "
                "detector.grouping=knn")
        raise ValueError(
            f"checkpoint is a {family!r}-family detector but the target model "
            f"is {model_family!r} — rebuild the config with {want}")
    layout = _DETECTOR_LAYOUT if family == "som" else _GROUP_DETECTOR_LAYOUT
    return _convert(state_dict, variables, layout)


def convert_descriptor_state_dict(state_dict: Mapping[str, Any],
                                  variables: Mapping[str, Any]
                                  ) -> Dict[str, Any]:
    """Reference DescriptorLiteOld(/Global) state_dict -> our Descriptor
    variables. The global-context fusion stack (fc1..fc3) is detected from the
    checkpoint keys."""
    sd = strip_data_parallel(state_dict)
    layout = _DESCRIPTOR_GLOBAL_LAYOUT if "fc1.conv.weight" in sd \
        else _DESCRIPTOR_LAYOUT
    return _convert(sd, variables, layout)


def export_detector_state_dict(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse mapping (ours -> reference-named torch-style arrays), used for
    roundtrip tests and for handing weights back to reference tooling. The
    grouped (knn/ball) trunk is detected from the variable tree."""
    layout = _DETECTOR_LAYOUT if "first_pointnet" in variables["params"] \
        else _GROUP_DETECTOR_LAYOUT
    return _export(variables, layout)


def export_descriptor_state_dict(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    layout = _DESCRIPTOR_GLOBAL_LAYOUT if "fc1" in variables["params"] \
        else _DESCRIPTOR_LAYOUT
    return _export(variables, layout)


def _export(variables, layout) -> Dict[str, np.ndarray]:
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}
    for src, module, layer in layout:
        p = params[module][layer] if layer else params[module]
        kern = np.asarray(p["dense"]["kernel"], np.float32).T
        extra_dims = (1, 1) if ("before" in src or "after" in src
                                or src.startswith("conv")) else (1,)
        out[f"{src}.conv.weight"] = kern.reshape(kern.shape + extra_dims)
        out[f"{src}.conv.bias"] = np.asarray(p["dense"]["bias"], np.float32)
        if "norm" in p:
            s = (stats[module][layer] if layer else stats[module])["norm"]
            out[f"{src}.norm.weight"] = np.asarray(p["norm"]["scale"], np.float32)
            out[f"{src}.norm.bias"] = np.asarray(p["norm"]["bias"], np.float32)
            out[f"{src}.norm.running_mean"] = np.asarray(s["mean"], np.float32)
            out[f"{src}.norm.running_var"] = np.asarray(s["var"], np.float32)
            out[f"{src}.norm.num_batches_tracked"] = np.asarray(0, np.int64)
    return out
