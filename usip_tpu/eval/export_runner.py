"""Batched keypoint export over an eval dataset: jitted inference -> host NMS /
sigma ranking -> per-frame .bin tree (the reference's save_keypoints.py main loop,
:229-414)."""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from usip_tpu.config import Config
from usip_tpu.data.pipeline import BatchLoader
from usip_tpu.eval.export import select_keypoints, write_keypoints_bin
from usip_tpu.train.checkpoint import restore_checkpoint
from usip_tpu.train.loop import init_detector_state
from usip_tpu.train.steps import make_detector_infer


def make_eval_dataset(cfg: Config, synthetic: bool = False, seed: int = 0,
                      subset: str = "original"):
    if synthetic:
        from usip_tpu.data.synthetic import SyntheticDataset

        class _Wrap:
            def __init__(self):
                self.base = SyntheticDataset(
                    size=16, input_pc_num=cfg.data.input_pc_num,
                    surface_normal_len=cfg.detector.surface_normal_len, seed=seed)

            def __len__(self):
                return len(self.base)

            def __getitem__(self, i):
                item = self.base[i]
                return {"pc": item["src_pc"], "sn": item["src_sn"],
                        "seq": np.int64(0), "frame": np.int64(i)}

        return _Wrap()
    name = cfg.data.dataset
    from usip_tpu.data import eval_loaders as el
    sn = cfg.detector.surface_normal_len
    if name == "kitti":
        return el.KittiTestFrames(
            cfg.data, txt_root=os.path.join(cfg.data.dataroot, "kitti-reg-test"),
            numpy_root=os.path.join(cfg.data.dataroot, "data_odometry_velodyne",
                                    "numpy"), sn_len=sn)
    if name == "oxford":
        return el.OxfordTestFrames(cfg.data, sn_len=sn)
    if name == "scenenn":
        return el.RedwoodFrames(cfg.data, sn_len=sn)
    if name == "match3d":
        return el.Match3DEvalFrames(cfg.data, sn_len=sn)
    if name in ("modelnet", "shrec"):
        # subset picks original vs rotated — the repeatability protocol
        # exports BOTH trees and compares (modelnet_rotated_loader.py)
        return el.ModelNetRotatedFrames(cfg.data, sn_len=sn, subset=subset)
    raise KeyError(name)


def _place_batch(mesh, num_devices: int, *arrays, batch_size: int = 0):
    """Place host arrays for inference. Ragged tail batches (eval loaders run
    drop_last=False so every frame is exported, like the reference's
    save_keypoints.py:276-393 loop) are padded to ``batch_size`` by repeating
    the last row — one compiled shape, no tail-shape recompile through the
    slow remote-compile tunnel — and the true batch size is returned for
    trimming. Under a data mesh the batch axis is additionally sharded across
    devices (the reference's nn.DataParallel run_model analog,
    keypoint_detector.py:34-37)."""
    real_b = arrays[0].shape[0]
    target = max(batch_size, real_b)
    if mesh is not None:
        target += (-target) % num_devices
    pad = target - real_b
    if pad:
        arrays = tuple(
            np.concatenate([a, np.repeat(a[-1:], pad, axis=0)]) for a in arrays)
    if mesh is None:
        return tuple(jnp.asarray(a) for a in arrays) + (real_b,)
    from usip_tpu.parallel import shard_batch
    return tuple(shard_batch(mesh, np.asarray(a)) for a in arrays) + (real_b,)


def _frame_yaw_matrix(seed: int, seq: int, frame: int) -> np.ndarray:
    """Deterministic per-frame yaw (camera-frame vertical = y axis, the '2d'
    regime of data/augment.py:56-58): R = Ry(theta), theta ~ U(0, 2pi)."""
    theta = np.random.default_rng([seed, seq, frame]).uniform(0.0, 2 * np.pi)
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]], np.float32)


def run_export_with_descriptors(cfg: Config, detector_checkpoint: str,
                                descriptor_checkpoint: str, kp_out: str,
                                desc_out: str, nms_radius: float = 0.0,
                                desired_num: int = 128,
                                synthetic: bool = False,
                                batch_size: Optional[int] = None,
                                dataset=None,
                                frame_yaw_seed: Optional[int] = None) -> dict:
    """Export keypoints AND their descriptors as parallel .bin trees — the input
    format of the registration eval (evaluate_kitti.m:43-54).

    Keypoint selection (NMS + sigma top-K) happens first on host; the selected
    fixed-size keypoint set then goes back through the descriptor on device.

    ``frame_yaw_seed``: when set, each frame's cloud (and sn[...,:3]) is
    rotated by an independent per-frame yaw before detection+description, and
    the exported keypoints are rotated back to the original frame. The
    registration GT is unchanged, but descriptors are computed in mutually
    yaw-rotated contexts — the discriminating LiDAR protocol (the reference
    trains kitti with rot_horizontal for exactly this invariance,
    kitti/options_detector.py rot_horizontal): yaw-variant untrained features
    collapse while a yaw-augmentation-trained descriptor survives.
    """
    from usip_tpu.train.descriptor_loop import init_descriptor_state

    from usip_tpu.parallel import make_mesh, replicate

    mesh = make_mesh(cfg.train.num_devices) \
        if cfg.train.num_devices > 1 else None
    model, state = init_detector_state(cfg, cfg.train.seed)
    state, _ = restore_checkpoint(detector_checkpoint, state)
    infer = jax.jit(make_detector_infer(cfg, model))

    desc_model, desc_state = init_descriptor_state(cfg, cfg.train.seed)
    desc_state, _ = restore_checkpoint(descriptor_checkpoint, desc_state)
    if mesh is not None:
        state = replicate(mesh, state)
        desc_state = replicate(mesh, desc_state)

    @jax.jit
    def describe(pc, sn, kp, key):
        desc, _ = desc_model.apply(desc_state.variables, pc, sn, kp, key=key,
                                   train=False)
        return desc

    ds = dataset if dataset is not None else make_eval_dataset(cfg, synthetic)
    bs = batch_size or cfg.train.batch_size
    loader = BatchLoader(ds, bs, shuffle=False, num_workers=4, drop_last=False)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(321)
    frames = 0
    nd = cfg.train.num_devices
    for i, raw in enumerate(loader):
        pc_np, sn_np = np.asarray(raw["pc"]), np.asarray(raw["sn"])
        rots = None
        if frame_yaw_seed is not None:
            rots = [_frame_yaw_matrix(frame_yaw_seed, int(raw["seq"][b]),
                                      int(raw["frame"][b]))
                    for b in range(pc_np.shape[0])]
            pc_np = np.stack([pc_np[b] @ rots[b].T
                              for b in range(pc_np.shape[0])])
            if sn_np.shape[-1] >= 3:
                sn_np = np.concatenate(
                    [np.stack([sn_np[b, :, :3] @ rots[b].T
                               for b in range(sn_np.shape[0])]),
                     sn_np[..., 3:]], axis=-1)
        pc_in, sn_in, real_b = _place_batch(mesh, nd, pc_np, sn_np,
                                            batch_size=bs)
        kp, sig = infer(state, pc_in, sn_in, jax.random.fold_in(key, 2 * i))
        kp, sig = np.asarray(kp)[:real_b], np.asarray(sig)[:real_b]
        selected = np.stack([
            select_keypoints(kp[b], sig[b], pc_np[b],
                             nms_radius=nms_radius, desired_num=desired_num,
                             rng=rng)
            for b in range(kp.shape[0])])
        pc_in, sn_in, kp_in, real_b = _place_batch(mesh, nd, pc_np,
                                                   sn_np, selected,
                                                   batch_size=bs)
        desc = describe(pc_in, sn_in, kp_in, jax.random.fold_in(key, 2 * i + 1))
        desc = np.asarray(desc)[:real_b]
        for b in range(selected.shape[0]):
            seq, frame = int(raw["seq"][b]), int(raw["frame"][b])
            kp_write = selected[b] @ rots[b] if rots is not None \
                else selected[b]
            write_keypoints_bin(
                os.path.join(kp_out, f"{seq:02d}", f"{frame}.bin"), kp_write)
            write_keypoints_bin(
                os.path.join(desc_out, f"{seq:02d}", f"{frame}.bin"), desc[b])
            frames += 1
    return {"frames": frames}


def run_export(cfg: Config, checkpoint: Optional[str], out_dir: str,
               nms_radius: float = 0.0, desired_num: int = 128,
               synthetic: bool = False, batch_size: Optional[int] = None,
               dataset=None, timing: bool = True, method: str = "model",
               noise_sigma: float = 0.0, subset: str = "original",
               with_sigmas: bool = False, **baseline_kwargs) -> dict:
    """Returns summary stats (frames, mean keypoint count, clouds/sec).

    ``method``: 'model' (the trained detector) or a classical baseline
    ('random'/'iss'/'harris' — save_keypoints.py:289-325); ``noise_sigma`` adds
    gaussian noise to the input cloud (the export tool's robustness knob,
    save_keypoints.py:34). ``with_sigmas`` writes 4-column (xyz, sigma) bins —
    the form the reference's visualize_keypoints viewer consumes
    (visualize_keypoints/tools/load_keypoint.m reads Nx4); pad-from-cloud rows
    carry sigma=inf. Only the trained detector produces sigmas.
    """
    if with_sigmas and method != "model":
        raise ValueError("with_sigmas requires method='model' (classical "
                         "baselines carry no uncertainty estimate)")
    from usip_tpu.parallel import make_mesh, replicate

    mesh = make_mesh(cfg.train.num_devices) \
        if cfg.train.num_devices > 1 else None
    infer = None
    if method == "model":
        model, state = init_detector_state(cfg, cfg.train.seed)
        state, _ = restore_checkpoint(checkpoint, state)
        if mesh is not None:
            state = replicate(mesh, state)
        infer = jax.jit(make_detector_infer(cfg, model))

    ds = dataset if dataset is not None else make_eval_dataset(cfg, synthetic,
                                                              subset=subset)
    bs = batch_size or cfg.train.batch_size
    loader = BatchLoader(ds, bs, shuffle=False, num_workers=4, drop_last=False)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(123)

    frames = 0
    counts = []
    t_start = None
    for i, raw in enumerate(loader):
        pc_batch = raw["pc"]
        if noise_sigma > 0:
            pc_batch = pc_batch + rng.normal(
                scale=noise_sigma, size=pc_batch.shape).astype(pc_batch.dtype)
        if method == "model":
            pc_in, sn_in, real_b = _place_batch(mesh, cfg.train.num_devices,
                                                pc_batch, raw["sn"],
                                                batch_size=bs)
            kp, sig = infer(state, pc_in, sn_in, jax.random.fold_in(key, i))
            kp, sig = np.asarray(kp)[:real_b], np.asarray(sig)[:real_b]
        for b in range(pc_batch.shape[0]):
            if method == "model":
                selected = select_keypoints(kp[b], sig[b], pc_batch[b],
                                            nms_radius=nms_radius,
                                            desired_num=desired_num, rng=rng,
                                            return_sigmas=with_sigmas)
                if with_sigmas:
                    sel_kp, sel_sig = selected
                    selected = np.concatenate(
                        [sel_kp, sel_sig[:, None].astype(sel_kp.dtype)], axis=1)
            else:
                from usip_tpu.eval.baselines import baseline_keypoints
                from usip_tpu.eval.export import ensure_keypoint_number
                raw_kp = baseline_keypoints(method, pc_batch[b], rng,
                                            **({"num": desired_num}
                                               if method == "random"
                                               else baseline_kwargs))
                selected = ensure_keypoint_number(raw_kp, pc_batch[b],
                                                  desired_num, rng)
            counts.append(selected.shape[0])
            seq, frame = int(raw["seq"][b]), int(raw["frame"][b])
            path = os.path.join(out_dir, f"{seq:02d}", f"{frame}.bin")
            write_keypoints_bin(path, selected)
            frames += 1
        if i == 0:
            # timer starts after batch 0 is fully processed (device compile
            # AND its host NMS/write work) so numerator and window line up
            t_start = time.perf_counter()
            frames_at_start = frames
    elapsed = time.perf_counter() - (t_start or time.perf_counter())
    timed = max(frames - (frames_at_start if t_start else 0), 1)
    stats = {"frames": frames,
             "mean_keypoints": float(np.mean(counts)) if counts else 0.0,
             "clouds_per_sec": timed / elapsed if elapsed > 0 else 0.0}
    return stats


class FragmentFrames:
    """Eval dataset over an indoor fragment tree ``<pc_root>/<scene>/<i>.npy``
    (the layout of ``cli eval-indoor --pc-root`` and the real 3DMatch
    fragment dumps, match3d_eval_loader.py:39-57): yields fixed-size
    subsamples with (seq=scene index, frame=i) keys."""

    def __init__(self, cfg: Config, pc_root: str, scenes, sn_len: int = 4,
                 seed: int = 0):
        from usip_tpu.data.common import split_pc_sn, subsample_fixed
        self._split, self._sub = split_pc_sn, subsample_fixed
        self.cfg = cfg.data
        self.pc_root = pc_root
        self.sn_len = sn_len
        self._rng = np.random.default_rng(seed)
        self.items = []
        for si, scene in enumerate(scenes):
            folder = os.path.join(pc_root, scene)
            n = len([f for f in os.listdir(folder) if f.endswith(".npy")])
            for i in range(n):
                self.items.append((si, scene, i))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index):
        si, scene, frame = self.items[index]
        data = np.load(os.path.join(self.pc_root, scene, f"{frame}.npy"))
        data = self._sub(self._rng, data, self.cfg.input_pc_num)
        pc, sn = self._split(data, self.sn_len)
        return {"pc": pc, "sn": sn, "seq": np.int64(si),
                "frame": np.int64(frame)}


def run_export_fragments(cfg: Config, detector_checkpoint: str,
                         descriptor_checkpoint: str, pc_root: str,
                         out_root: str, scenes, nms_radius: float = 0.0,
                         desired_num: int = 256,
                         batch_size: Optional[int] = None) -> dict:
    """Export per-fragment keypoint+descriptor features as the combined
    ``<out_root>/<scene>/<i>.bin`` rows ``[x y z d_0..d_{D-1}]`` — the input
    of the indoor registration eval (register2Fragments.m:23-30 via
    Utils.load_descriptors; consumed by ``eval/indoor.py
    load_fragment_features`` and ``cli eval-indoor --result-root``)."""
    from usip_tpu.train.descriptor_loop import init_descriptor_state

    model, state = init_detector_state(cfg, cfg.train.seed)
    state, _ = restore_checkpoint(detector_checkpoint, state)
    infer = jax.jit(make_detector_infer(cfg, model))

    desc_model, desc_state = init_descriptor_state(cfg, cfg.train.seed)
    desc_state, _ = restore_checkpoint(descriptor_checkpoint, desc_state)

    @jax.jit
    def describe(pc, sn, kp, key):
        desc, _ = desc_model.apply(desc_state.variables, pc, sn, kp, key=key,
                                   train=False)
        return desc

    ds = FragmentFrames(cfg, pc_root, scenes,
                        sn_len=cfg.detector.surface_normal_len)
    bs = batch_size or cfg.train.batch_size
    loader = BatchLoader(ds, bs, shuffle=False, num_workers=2,
                         drop_last=False)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(321)
    frames = 0
    scene_names = list(scenes)
    for i, raw in enumerate(loader):
        pc_in, sn_in, real_b = _place_batch(None, 1, raw["pc"], raw["sn"],
                                            batch_size=bs)
        kp, sig = infer(state, pc_in, sn_in, jax.random.fold_in(key, 2 * i))
        kp, sig = np.asarray(kp)[:real_b], np.asarray(sig)[:real_b]
        selected = np.stack([
            select_keypoints(kp[b], sig[b], raw["pc"][b],
                             nms_radius=nms_radius, desired_num=desired_num,
                             rng=rng)
            for b in range(kp.shape[0])])
        pc_in, sn_in, kp_in, real_b = _place_batch(None, 1, raw["pc"],
                                                   raw["sn"], selected,
                                                   batch_size=bs)
        desc = describe(pc_in, sn_in, kp_in, jax.random.fold_in(key, 2 * i + 1))
        desc = np.asarray(desc)[:real_b]
        for b in range(selected.shape[0]):
            scene = scene_names[int(raw["seq"][b])]
            frame = int(raw["frame"][b])
            rows = np.concatenate(
                [selected[b].astype(np.float32),
                 desc[b].astype(np.float32)], axis=1)
            path = os.path.join(out_root, scene, f"{frame}.bin")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            rows.tofile(path)
            frames += 1
    return {"frames": frames, "scenes": len(scene_names)}
