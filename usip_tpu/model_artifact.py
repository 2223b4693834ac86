"""AOT-compiled, self-contained model artifacts via ``jax.export`` (StableHLO).

Serializes the jitted detect / describe programs with the checkpoint weights
baked in as constants, so a serving process can run them with nothing but jax
and the artifact bytes — no model code, config system, or checkpoint readers.
This is the TPU-native analog of a TorchScript/ONNX deployment export; the
reference has none (its deployment story is loading ``.pth`` files into the
full PyTorch model zoo, models/keypoint_detector.py:60-76).

Artifacts are single files: a JSON header (artifact kind, shapes, the config
fields a server needs for pre/post-processing) followed by the
``jax.export``-serialized program. Programs are lowered for an explicit
platform list (default cpu+tpu) and can be loaded on any of them; shapes are
static — one artifact per (batch, input_pc_num) serving configuration, matching
how XLA serving deployments pin shapes.

Calling convention:
  detector artifact:    (pc (B,N,3) f32, sn (B,N,S) f32, key uint32[2])
                        -> (keypoints (B,M,3), sigmas (B,M))
  descriptor artifact:  (pc (B,N,3), sn (B,N,S), kp (B,M,3), key uint32[2])
                        -> descriptors (B,M,D)

NMS / sigma-ranking stay host-side post-processing exactly as in the export
tool (eval/export.py select_keypoints) — they are numpy-cheap and
shape-dynamic by nature.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Optional, Sequence, Tuple

import numpy as np

_MAGIC = b"USIPART1"


def _export_program(fn, args, platforms: Sequence[str], uses_fps: bool):
    """Lower + export ``fn`` for ``platforms``.

    Multi-platform artifacts must stay free of Mosaic ``tpu_custom_call``s
    (they neither lower for cpu nor serialize portably), so FPS is pinned to
    the portable XLA path. A TPU-only artifact (``platforms=("tpu",)``) keeps
    the Mosaic VMEM-resident FPS kernel — the custom call round-trips
    jax.export when its safety check is explicitly waived — recovering the
    in-process headline throughput at serving time (PERFORMANCE.md, AOT
    section)."""
    import jax

    from usip_tpu.ops.sampling import assume_tpu_fps, force_xla_fps

    tpu_only = tuple(platforms) == ("tpu",)
    if tpu_only and uses_fps:
        checks = [jax.export.DisabledSafetyCheck.custom_call(
            "tpu_custom_call")]
        with assume_tpu_fps():
            return jax.export.export(jax.jit(fn), platforms=list(platforms),
                                     disabled_checks=checks)(*args)
    if uses_fps:
        with force_xla_fps():
            return jax.export.export(jax.jit(fn),
                                     platforms=list(platforms))(*args)
    return jax.export.export(jax.jit(fn), platforms=list(platforms))(*args)


def _write(path: str, header: dict, blob: bytes) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    hdr = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(hdr)))
        f.write(hdr)
        f.write(blob)


def _read(path: str) -> Tuple[dict, bytes]:
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a usip_tpu model artifact "
                             f"(bad magic {magic!r})")
        (hlen,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hlen).decode())
        blob = f.read()
    return header, blob


def export_detector_artifact(cfg, checkpoint: str, path: str, batch: int = 1,
                             platforms: Sequence[str] = ("cpu", "tpu")
                             ) -> dict:
    """Bake the detector checkpoint into an AOT program and write it.

    Returns the artifact header. The program includes on-device FPS node
    sampling (the same ``make_detector_infer`` the export tool jits), so the
    caller supplies only cloud + normals + a PRNG key.
    """
    import jax
    import jax.numpy as jnp

    from usip_tpu.train.checkpoint import restore_checkpoint
    from usip_tpu.train.loop import init_detector_state
    from usip_tpu.train.steps import make_detector_infer

    if cfg.detector.fusion_backend != "xla":
        # the Mosaic fused chain is off-default (measured slower) — always
        # export the XLA fusion path, even for TPU-only artifacts
        cfg = cfg.with_overrides(**{"detector.fusion_backend": "xla"})
    model, state = init_detector_state(cfg, cfg.train.seed)
    state, _ = restore_checkpoint(checkpoint, state)
    infer = make_detector_infer(cfg, model)

    def detect(pc, sn, key):
        return infer(state, pc, sn, key)

    n = cfg.data.input_pc_num
    s = cfg.detector.surface_normal_len
    args = (jax.ShapeDtypeStruct((batch, n, 3), jnp.float32),
            jax.ShapeDtypeStruct((batch, n, s), jnp.float32),
            jax.ShapeDtypeStruct((2,), jnp.uint32))
    exp = _export_program(detect, args, platforms, uses_fps=True)
    header = {"kind": "detector", "batch": batch, "input_pc_num": n,
              "sn_len": s, "node_num": cfg.data.node_num,
              "platforms": list(platforms), "dataset": cfg.data.dataset,
              "outputs": ["keypoints", "sigmas"]}
    _write(path, header, exp.serialize())
    return header


def export_descriptor_artifact(cfg, descriptor_checkpoint: str, path: str,
                               batch: int = 1, num_keypoints: int = 128,
                               platforms: Sequence[str] = ("cpu", "tpu")
                               ) -> dict:
    """Bake the descriptor into an AOT ``(pc, sn, kp, key) -> desc`` program.

    ``num_keypoints`` fixes the keypoint-set shape — use the serving
    pipeline's post-NMS ``desired_num`` (the export protocol's 128)."""
    import jax
    import jax.numpy as jnp

    from usip_tpu.train.checkpoint import restore_checkpoint
    from usip_tpu.train.descriptor_loop import init_descriptor_state

    desc_model, desc_state = init_descriptor_state(cfg, cfg.train.seed)
    desc_state, _ = restore_checkpoint(descriptor_checkpoint, desc_state)

    def describe(pc, sn, kp, key):
        desc, _ = desc_model.apply(desc_state.variables, pc, sn, kp, key=key,
                                   train=False)
        return desc

    n = cfg.data.input_pc_num
    s = cfg.descriptor.surface_normal_len
    m = num_keypoints
    args = (jax.ShapeDtypeStruct((batch, n, 3), jnp.float32),
            jax.ShapeDtypeStruct((batch, n, s), jnp.float32),
            jax.ShapeDtypeStruct((batch, m, 3), jnp.float32),
            jax.ShapeDtypeStruct((2,), jnp.uint32))
    exp = _export_program(describe, args, platforms, uses_fps=False)
    header = {"kind": "descriptor", "batch": batch, "input_pc_num": n,
              "sn_len": s, "keypoint_num": m,
              "descriptor_len": cfg.descriptor.descriptor_len,
              "platforms": list(platforms), "dataset": cfg.data.dataset,
              "outputs": ["descriptors"]}
    _write(path, header, exp.serialize())
    return header


def export_pipeline_artifact(cfg, detector_checkpoint: str,
                             descriptor_checkpoint: str, path: str,
                             batch: int = 1,
                             platforms: Sequence[str] = ("cpu", "tpu")
                             ) -> dict:
    """One fused AOT program: ``(pc, sn, key) -> (keypoints (B,M,3),
    sigmas (B,M), descriptors (B,M,D))`` — FPS, detector, and descriptor in a
    single device dispatch (the serving-optimal shape; descriptors cover every
    detector proposal, host-side selection picks paired rows afterwards via
    ``eval.export.select_keypoint_indices``)."""
    import jax
    import jax.numpy as jnp

    from usip_tpu.train.checkpoint import restore_checkpoint
    from usip_tpu.train.descriptor_loop import init_descriptor_state
    from usip_tpu.train.loop import init_detector_state
    from usip_tpu.train.steps import make_detector_infer

    if cfg.detector.fusion_backend != "xla":
        cfg = cfg.with_overrides(**{"detector.fusion_backend": "xla"})
    model, det_state = init_detector_state(cfg, cfg.train.seed)
    det_state, _ = restore_checkpoint(detector_checkpoint, det_state)
    infer = make_detector_infer(cfg, model)
    desc_model, desc_state = init_descriptor_state(cfg, cfg.train.seed)
    desc_state, _ = restore_checkpoint(descriptor_checkpoint, desc_state)

    def serve(pc, sn, key):
        kp, sig = infer(det_state, pc, sn, key)
        # distinct stream for the descriptor's ball sampling (FPS consumed key)
        desc, _ = desc_model.apply(desc_state.variables, pc, sn, kp,
                                   key=jax.random.fold_in(key, 1), train=False)
        return kp, sig, desc

    n = cfg.data.input_pc_num
    s = cfg.detector.surface_normal_len
    args = (jax.ShapeDtypeStruct((batch, n, 3), jnp.float32),
            jax.ShapeDtypeStruct((batch, n, s), jnp.float32),
            jax.ShapeDtypeStruct((2,), jnp.uint32))
    exp = _export_program(serve, args, platforms, uses_fps=True)
    header = {"kind": "pipeline", "batch": batch, "input_pc_num": n,
              "sn_len": s, "node_num": cfg.data.node_num,
              "descriptor_len": cfg.descriptor.descriptor_len,
              "platforms": list(platforms), "dataset": cfg.data.dataset,
              "outputs": ["keypoints", "sigmas", "descriptors"]}
    _write(path, header, exp.serialize())
    return header


class LoadedArtifact:
    """A deserialized artifact: ``header`` dict + direct ``__call__``."""

    def __init__(self, header: dict, exported):
        self.header = header
        self._exported = exported

    def __call__(self, *args):
        return self._exported.call(*args)


def load_artifact(path: str) -> LoadedArtifact:
    from jax import export as jexport
    header, blob = _read(path)
    return LoadedArtifact(header, jexport.deserialize(blob))


def run_detector_artifact(artifact_path: str, inputs: Sequence[str],
                          out_dir: str, num_keypoints: int = 128,
                          nms_radius: float = 0.0,
                          desc_artifact_path: Optional[str] = None,
                          seed: int = 0) -> dict:
    """Serve raw ``.npy`` clouds through a detector or fused pipeline artifact
    (same IO contract as the ``detect`` CLI command: ``<name>.keypoints.bin``
    (+``.desc.bin``) per cloud), without any model code or checkpoints.

    Clouds are subsampled/padded to the artifact's pinned (batch, N) shape;
    the ragged final batch is padded by repetition and trimmed. Keypoint
    selection (NMS -> sigma rank -> ensure count) is host-side, exactly the
    export tool's post-processing. With a ``pipeline`` artifact the
    descriptors come from the same fused dispatch; selection then picks
    paired keypoint/descriptor rows by index, and (unlike the two-artifact
    path, which re-describes the selected set) there is no pad-from-cloud —
    frames where NMS leaves fewer than ``num_keypoints`` proposals write
    fewer rows, like the reference without is_ensure_keypoint_num.
    """
    import jax

    from usip_tpu.data.common import subsample_fixed
    from usip_tpu.eval.export import (select_keypoint_indices,
                                      select_keypoints)

    art = load_artifact(artifact_path)
    pipeline = art.header["kind"] == "pipeline"
    if art.header["kind"] not in ("detector", "pipeline"):
        raise ValueError(f"{artifact_path}: kind={art.header['kind']!r}, "
                         "expected a detector or pipeline artifact")
    desc_art = None
    if desc_artifact_path is not None:
        if pipeline:
            raise ValueError("a pipeline artifact already embeds its "
                             "descriptor — drop --desc-artifact")
        desc_art = load_artifact(desc_artifact_path)
        if desc_art.header["kind"] != "descriptor":
            raise ValueError(f"{desc_artifact_path}: kind="
                             f"{desc_art.header['kind']!r}, expected "
                             "a descriptor artifact")
        if desc_art.header["keypoint_num"] != num_keypoints:
            raise ValueError(
                f"descriptor artifact was exported for "
                f"{desc_art.header['keypoint_num']} keypoints, "
                f"got --num-keypoints {num_keypoints}")

    b = art.header["batch"]
    n = art.header["input_pc_num"]
    s = art.header["sn_len"]
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    os.makedirs(out_dir, exist_ok=True)

    frames = 0
    for start in range(0, len(inputs), b):
        chunk = list(inputs[start:start + b])
        real = len(chunk)
        pcs, sns = [], []
        for path in chunk:
            data = np.load(path).astype(np.float32)
            if data.shape[1] < 3 + s:
                data = np.concatenate(
                    [data[:, :3],
                     np.zeros((data.shape[0], s), np.float32)], axis=1)
            fixed = subsample_fixed(rng, data[:, :3 + s], n)
            pcs.append(fixed[:, :3])
            sns.append(fixed[:, 3:3 + s])
        while len(pcs) < b:  # ragged tail: pad by repetition, trim after
            pcs.append(pcs[-1])
            sns.append(sns[-1])
        out = art(np.stack(pcs), np.stack(sns),
                  np.asarray(jax.random.fold_in(key, 2 * start)))
        if pipeline:
            kp, sig, all_desc = (np.asarray(x)[:real] for x in out)
            for i, path in enumerate(chunk):
                idx = select_keypoint_indices(kp[i], sig[i],
                                              nms_radius=nms_radius,
                                              desired_num=num_keypoints)
                name = os.path.splitext(os.path.basename(path))[0]
                kp[i][idx].astype(np.float32).tofile(
                    os.path.join(out_dir, f"{name}.keypoints.bin"))
                all_desc[i][idx].astype(np.float32).tofile(
                    os.path.join(out_dir, f"{name}.desc.bin"))
                frames += 1
            continue
        kp, sig = out
        kp, sig = np.asarray(kp)[:real], np.asarray(sig)[:real]
        selected = np.stack([
            select_keypoints(kp[i], sig[i], pcs[i], nms_radius=nms_radius,
                             desired_num=num_keypoints, rng=rng)
            for i in range(real)])
        desc = None
        if desc_art is not None:
            sel_in = selected
            if real < b:
                sel_in = np.concatenate(
                    [selected, np.repeat(selected[-1:], b - real, axis=0)])
            desc = np.asarray(desc_art(
                np.stack(pcs), np.stack(sns), sel_in,
                np.asarray(jax.random.fold_in(key, 2 * start + 1))))[:real]
        for i, path in enumerate(chunk):
            name = os.path.splitext(os.path.basename(path))[0]
            selected[i].astype(np.float32).tofile(
                os.path.join(out_dir, f"{name}.keypoints.bin"))
            if desc is not None:
                desc[i].astype(np.float32).tofile(
                    os.path.join(out_dir, f"{name}.desc.bin"))
            frames += 1
    return {"clouds": frames, "out": out_dir}
