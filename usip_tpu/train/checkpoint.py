"""Checkpointing: full train state (params + batch_stats + optimizer + step),
atomic writes, exact resume.

Upgrades the reference's ``torch.save(state_dict)`` (keypoint_detector.py:348-351),
which drops optimizer state/epoch/RNG and has no resume path (SURVEY.md §5.4).
Format: flax msgpack of the state pytree + a small json sidecar with metadata.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(path: str, state: Any, metadata: Optional[Dict] = None) -> None:
    """Serialize a TrainState (or any pytree) to ``path`` (.msgpack) atomically.

    Multi-host runs write from process 0 only (state is replicated, so every
    process holds identical bytes; N writers racing one shared-filesystem path
    would interleave .tmp renames for nothing)."""
    if jax.process_count() > 1 and jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "step": _to_host(state.step),
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
    }
    data = serialization.to_bytes(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    if metadata is not None:
        with open(path + ".json", "w") as f:
            json.dump(metadata, f, indent=2, default=str)


def restore_checkpoint(path: str, state: Any) -> Tuple[Any, Optional[Dict]]:
    """Restore into a template TrainState (shapes/treedef must match)."""
    with open(path, "rb") as f:
        data = f.read()
    template = {
        "step": _to_host(state.step),
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
    }
    payload = serialization.from_bytes(template, data)
    # shape-validate params against the template model: flax's from_bytes
    # fills by tree position, so a width mismatch (e.g. a full-width detector
    # checkpoint fed to the indoor/lite pipeline) would otherwise surface as
    # a cryptic ScopeParamShapeError at first apply
    tmpl_leaves = jax.tree_util.tree_leaves_with_path(template["params"])
    load_leaves = jax.tree_util.tree_leaves(payload["params"])
    for (kp, t), v in zip(tmpl_leaves, load_leaves):
        ts, vs = getattr(t, "shape", None), getattr(v, "shape", None)
        if ts != vs:
            name = jax.tree_util.keystr(kp)
            raise ValueError(
                f"checkpoint {path!r} param {name} has shape {vs}, model "
                f"expects {ts} — the checkpoint was trained with different "
                "widths than this pipeline builds (e.g. a full-width "
                "detector checkpoint in the indoor/lite descriptor "
                "pipeline: retrain the detector with --lite, or override "
                "detector.c1/c2 to match)")
    new_state = state.replace(
        step=jax.numpy.asarray(payload["step"]),
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=jax.tree_util.tree_map(
            lambda t, v: v, state.opt_state, payload["opt_state"]),
    )
    meta = None
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return new_state, meta


def save_params_only(path: str, params: Any) -> None:
    """Inference-only export (the reference's `{epoch}_net_detector.pth` analog)."""
    if jax.process_count() > 1 and jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(_to_host(params)))
    os.replace(tmp, path)


def load_params_only(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(_to_host(template), f.read())
