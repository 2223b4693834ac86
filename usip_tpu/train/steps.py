"""Jitted siamese train/eval steps for the detector and descriptor.

One XLA program per step: on-device node FPS, shared augmentation, GT transform,
siamese forward over the concatenated batch (keypoint_detector.py:141-156), losses,
gradient, Adam update. The host only ships raw fixed-shape clouds and a PRNG key —
this subsumes the reference's DataLoader-worker augmentation + FPS hot loops
(SURVEY.md §3.1) into the compiled step.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from usip_tpu import losses
from usip_tpu.config import Config
from usip_tpu.data import augment
from usip_tpu.models import Descriptor, Detector
from usip_tpu.nn.layers import bn_momentum_schedule
from usip_tpu.ops import apply_se3, sample_nodes
from usip_tpu.train.state import TrainState

Array = jax.Array


class DetectorBatch(NamedTuple):
    """Raw host batch: two independent samples of each cloud (both un-augmented)."""

    src_pc: Array   # (B, N, 3)
    src_sn: Array   # (B, N, S)
    dst_pc: Array   # (B, N, 3)
    dst_sn: Array   # (B, N, S)


class ParentBatch(NamedTuple):
    """Wire-efficient batch: the parent cloud once; both siamese subsamples are
    drawn on device (cfg.data.device_sampling). Cuts host->device bytes ~2.5x
    vs DetectorBatch at kitti scale — the transfer is serialized with compute
    on remote-attached TPUs (PERFORMANCE.md).

    Contract for the default 'slice' sampling mode: parent rows must arrive in
    uniformly random order (both the native loader's partial Fisher-Yates and
    data/common.py subsample_fixed guarantee this), so that fixed windows of
    the row axis are uniform subsets. Use data.device_sampling_mode='topk' for
    parents whose row order is not randomized."""

    pc: Array   # (B, P, 3)
    sn: Array   # (B, P, S)


class PackedParentBatch(NamedTuple):
    """Single-buffer parent wire (cfg.data.wire_dtype='float16_packed'):
    [pc | sn] concatenated channels-last in one fp16 array. On
    latency-dominated transports (the remote serving tunnel: ~25-45 ms RPC
    *per transfer*, PERFORMANCE.md) one device_put instead of two can be
    worth more than byte-level compression — the 4-array 'quant' format
    LOST engine throughput (112 vs 160 clouds/s) despite 1.4x fewer bytes.
    See PERFORMANCE.md "wire format A/B" for the measured numbers."""

    x: Array  # (B, P, 3+S): [:, :, :3] coords, [:, :, 3:] normals


class QuantParentBatch(NamedTuple):
    """Quantized parent-cloud wire (cfg.data.wire_dtype='quant'): coords as
    int16 + normals as int8 with per-cloud fp32 scales. 10 bytes/pt at S=4 vs
    float16's 14, and a *uniform* coordinate grid (max_abs/32767 — ~1.5 mm at
    100 m LiDAR range) instead of fp16's range-dependent mantissa step
    (~4 cm at 100 m). Encoded by the engine's prefetch thread
    (train/loop.py _device_batch), decoded to fp32 on device before any
    geometry (_as_siamese)."""

    pc_q: Array      # (B, P, 3) int16
    sn_q: Array      # (B, P, S) int8
    pc_scale: Array  # (B, 1, 1) fp32: pc ~= pc_q * pc_scale
    sn_scale: Array  # (B, 1, S) fp32: sn ~= sn_q * sn_scale


def quantize_parent(pc: "np.ndarray", sn: "np.ndarray") -> QuantParentBatch:
    """Host-side encode (numpy) for the 'quant' wire format."""
    import numpy as np
    pc = np.asarray(pc, np.float32)
    sn = np.asarray(sn, np.float32)
    pc_s = np.maximum(np.max(np.abs(pc), axis=(1, 2), keepdims=True),
                      1e-12) / 32767.0
    sn_s = np.maximum(np.max(np.abs(sn), axis=1, keepdims=True),
                      1e-12) / 127.0
    pc_q = np.rint(pc / pc_s).astype(np.int16)
    sn_q = np.rint(sn / sn_s).astype(np.int8)
    return QuantParentBatch(pc_q, sn_q, pc_s.astype(np.float32),
                            sn_s.astype(np.float32))


def _device_subsample(key: Array, pc: Array, sn: Array, n: int):
    """Independent n-of-P uniform subsample without replacement per batch item
    (device analog of data/common.py subsample_fixed for P >= n): top-k of iid
    uniform scores is a uniform k-subset."""
    b, p, _ = pc.shape
    scores = jax.random.uniform(key, (b, p))
    _, idx = jax.lax.top_k(scores, n)                       # (B, n)
    take = jax.vmap(lambda x, i: x[i])
    return take(pc, idx), take(sn, idx)


def _as_siamese(key: Array, batch, cfg: Config):
    """Decode the wire format: cast to fp32 and, for ParentBatch, draw the two
    siamese subsamples on device.

    'slice' mode (default): src/dst are the first/last input_pc_num rows of the
    host-shuffled parent — zero device cost; each copy is a uniform subset and
    the pair shares 2n-P points deterministically (vs the reference's
    independent draws sharing hypergeometric ~n^2/P — at kitti scale 12288
    fixed vs 13107 +- 50). 'topk' mode draws two exactly-independent uniform
    subsets via top-k of iid scores (~30 ms/step at kitti scale)."""
    f32 = lambda x: x.astype(jnp.float32)
    if isinstance(batch, QuantParentBatch):
        batch = ParentBatch(pc=f32(batch.pc_q) * batch.pc_scale,
                            sn=f32(batch.sn_q) * batch.sn_scale)
    if isinstance(batch, PackedParentBatch):
        batch = ParentBatch(pc=batch.x[:, :, :3], sn=batch.x[:, :, 3:])
    if isinstance(batch, ParentBatch):
        n = cfg.data.input_pc_num
        pc, sn = f32(batch.pc), f32(batch.sn)
        if cfg.data.device_sampling_mode == "slice":
            return pc[:, :n], sn[:, :n], pc[:, -n:], sn[:, -n:]
        k_src, k_dst = jax.random.split(key)
        src_pc, src_sn = _device_subsample(k_src, pc, sn, n)
        dst_pc, dst_sn = _device_subsample(k_dst, pc, sn, n)
        return src_pc, src_sn, dst_pc, dst_sn
    return (f32(batch.src_pc), f32(batch.src_sn),
            f32(batch.dst_pc), f32(batch.dst_sn))


def _random_point_dropout(key: Array, pcs_sns, lower_limit: float):
    """Fixed-shape random point dropout (keypoint_detector.py:161-169).

    The reference shrinks the cloud to a random keep-ratio; XLA needs static
    shapes, so dropped points are instead *replaced by resampled kept points*
    (duplicates). For the max-pool/min-distance ops downstream this is
    behavior-equivalent to removal; cluster means see mild duplicate weighting.
    One keep-ratio per step like the reference (a python ``random.uniform``).
    """
    k_ratio, k_perm, k_fill = jax.random.split(key, 3)
    n = pcs_sns[0][0].shape[1]
    ratio = jax.random.uniform(k_ratio, (), minval=lower_limit, maxval=1.0)
    keep = jnp.round(ratio * n).astype(jnp.int32)
    perm = jax.random.permutation(k_perm, n)         # shared across batch, like
    kept_rank = jnp.argsort(perm)                    # the reference's np.choice
    fill = jax.random.randint(k_fill, (n,), 0, jnp.maximum(keep, 1))
    # position i keeps itself if its rank < keep, else takes a random kept point
    kept_positions = perm                            # positions in kept order
    replacement = kept_positions[fill]               # (n,) indices of kept pts
    idx = jnp.where(kept_rank < keep, jnp.arange(n), replacement)
    out = []
    for pc, sn in pcs_sns:
        out.append((pc[:, idx, :], sn[:, idx, :]))
    return out


def _prepare_detector_inputs(key: Array, batch: DetectorBatch, cfg: Config,
                             train: bool):
    """Device-side data prep: dropout -> height scale -> node FPS ->
    shared augment -> GT transform on dst. Returns src/dst packs + GT SE3."""
    k_sub, k_drop, k_height, k_node_s, k_node_d, k_shared, k_se3 = \
        jax.random.split(key, 7)
    src_pc, src_sn, dst_pc, dst_sn = _as_siamese(k_sub, batch, cfg)
    aug = cfg.augment
    if train and cfg.train.random_pc_dropout_lower_limit < 0.99:
        (src_pc, src_sn), (dst_pc, dst_sn) = _random_point_dropout(
            k_drop, [(src_pc, src_sn), (dst_pc, dst_sn)],
            cfg.train.random_pc_dropout_lower_limit)
    if train and aug.height_scale:
        # clouds are stored in camera coords; the reference's ENU-z scale is cam-y
        src_pc, dst_pc = augment.random_height_scale(
            k_height, [src_pc, dst_pc], aug.height_scale_low,
            aug.height_scale_high, axis=1)
    src_node = sample_nodes(k_node_s, src_pc, cfg.data.node_num,
                            cfg.data.fps_subsample_ratio,
                            parallel=cfg.data.fps_parallel)
    dst_node = sample_nodes(k_node_d, dst_pc, cfg.data.node_num,
                            cfg.data.fps_subsample_ratio,
                            parallel=cfg.data.fps_parallel)
    if train:
        packs = augment.shared_augment(
            k_shared, [(src_pc, src_sn, src_node), (dst_pc, dst_sn, dst_node)],
            aug, scale_low=aug.aug_scale_low, scale_high=aug.aug_scale_high,
            shared_jitter=aug.shared_jitter)
        (src_pc, src_sn, src_node), (dst_pc, dst_sn, dst_node) = packs
    # GT transform always applies to the dst copy (loaders do it in __getitem__
    # for both train and test modes)
    dst_pc, dst_sn, dst_node, gt = augment.random_se3(
        k_se3, dst_pc, dst_sn, dst_node, rot_type=aug.rot_type,
        scale_thre=aug.gt_scale_thre, shift_thre=aug.gt_shift_thre,
        rot_perturbation=aug.rot_perturbation)
    return (src_pc, src_sn, src_node), (dst_pc, dst_sn, dst_node), gt


def _detector_losses(cfg: Config, src_out, dst_out, src_pc, src_sn, dst_pc, dst_sn,
                     gt) -> Tuple[Array, Dict[str, Array]]:
    """Chamfer + keypoint-on-pc objective (keypoint_detector.py:182-204)."""
    (_, src_kp, src_sig) = src_out
    (_, dst_kp, dst_sig) = dst_out
    src_kp_t = apply_se3(src_kp, gt.R, gt.scale, gt.shift)
    chamfer = losses.chamfer_probabilistic(src_kp_t, dst_kp, src_sig, dst_sig)
    alpha = cfg.loss.keypoint_on_pc_alpha
    if cfg.loss.keypoint_on_pc_type == "point_to_plane":
        on_pc_src = jnp.mean(losses.point_on_surface(src_kp, src_pc, src_sn)) * alpha
        on_pc_dst = jnp.mean(losses.point_on_surface(dst_kp, dst_pc, dst_sn)) * alpha
    else:
        on_pc_src = jnp.mean(losses.single_side_chamfer(src_kp, src_pc)) * alpha
        on_pc_dst = jnp.mean(losses.single_side_chamfer(dst_kp, dst_pc)) * alpha
    total = chamfer.loss + on_pc_src + on_pc_dst
    metrics = {
        "loss": total,
        "chamfer": chamfer.loss,
        "chamfer_pure": chamfer.chamfer_pure,
        "chamfer_weighted": chamfer.chamfer_weighted,
        "keypoint_on_pc": on_pc_src + on_pc_dst,
        "sigma_mean": jnp.mean(jnp.concatenate([src_sig, dst_sig], axis=1)),
        "sigma_min": jnp.min(src_sig),
        "sigma_max": jnp.max(src_sig),
    }
    return total, metrics


def _siamese_apply(model: Detector, variables, src, dst, train: bool,
                   bn_momentum) -> Tuple[Any, Any, Any]:
    """Run both copies through one batched forward (keypoint_detector.py:141-156)."""
    b = src[0].shape[0]
    pc = jnp.concatenate([src[0], dst[0]], axis=0)
    sn = jnp.concatenate([src[1], dst[1]], axis=0)
    node = jnp.concatenate([src[2], dst[2]], axis=0)
    if train:
        (anchors, kp, sig), mutated = model.apply(
            variables, pc, sn, node, train=True, bn_momentum=bn_momentum,
            mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    else:
        anchors, kp, sig = model.apply(variables, pc, sn, node, train=False)
        new_stats = variables.get("batch_stats")
    split = lambda x: (x[:b], x[b:])
    (s_anc, d_anc), (s_kp, d_kp), (s_sig, d_sig) = split(anchors), split(kp), split(sig)
    return ((s_anc, s_kp, s_sig), (d_anc, d_kp, d_sig)), new_stats


def make_detector_train_step(cfg: Config, model: Detector):
    """Returns jit-ready ``step(state, batch, key, epoch) -> (state, metrics)``."""

    def train_step(state: TrainState, batch: DetectorBatch, key: Array,
                   epoch: Array):
        src, dst, gt = _prepare_detector_inputs(key, batch, cfg, train=True)
        momentum = bn_momentum_schedule(
            cfg.train.bn_momentum, epoch, cfg.train.bn_momentum_decay_step,
            cfg.train.bn_momentum_decay)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (src_out, dst_out), new_stats = _siamese_apply(
                model, variables, src, dst, train=True, bn_momentum=momentum)
            total, metrics = _detector_losses(
                cfg, src_out, dst_out, src[0], src[1], dst[0], dst[1], gt)
            return total, (new_stats, metrics)

        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # global gradient norm — the diagnose_network analog (util/util.py:43-53),
        # on-device so it rides the normal epoch-end metric fetch
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.apply_gradients(grads, new_stats)
        return new_state, metrics

    return train_step


def make_detector_loss_fn(cfg: Config, model: Detector):
    """Pure ``(params, batch_stats, batch, key, epoch) -> (loss, metrics)`` on the
    train data path (eval-mode BN, no stats mutation). Used for gradient-parity
    tests and diagnostics."""

    def loss_fn(params, batch_stats, batch: DetectorBatch, key: Array, epoch):
        src, dst, gt = _prepare_detector_inputs(key, batch, cfg, train=True)
        variables = {"params": params, "batch_stats": batch_stats}
        (src_out, dst_out), _ = _siamese_apply(
            model, variables, src, dst, train=False, bn_momentum=0.0)
        return _detector_losses(cfg, src_out, dst_out, src[0], src[1],
                                dst[0], dst[1], gt)

    return loss_fn


def make_detector_eval_step(cfg: Config, model: Detector):
    """Eval step (test_model, keypoint_detector.py:209-241): no augment, running
    BN stats, same losses."""

    def eval_step(state: TrainState, batch: DetectorBatch, key: Array):
        src, dst, gt = _prepare_detector_inputs(key, batch, cfg, train=False)
        (src_out, dst_out), _ = _siamese_apply(
            model, state.variables, src, dst, train=False, bn_momentum=0.0)
        _, metrics = _detector_losses(
            cfg, src_out, dst_out, src[0], src[1], dst[0], dst[1], gt)
        return metrics

    return eval_step


def make_detector_infer(cfg: Config, model: Detector):
    """Inference fn (run_model, keypoint_detector.py:247-251): nodes sampled on
    device, returns keypoints + sigmas.

    ``detector.fusion_backend='pallas'`` (som trunk only) routes the fusion
    stack through the VMEM-resident fused chain (models/fused_infer.py).

    Node sampling honors ``data.eval_fps_subsample_ratio`` when set — the
    reference's TEST loaders use a coarser FPS candidate recipe (1/4 subset,
    kitti_test_loader.py:74-131) than its train loaders; this is the eval
    path, so the eval recipe applies here."""
    eval_ratio = (cfg.data.eval_fps_subsample_ratio
                  or cfg.data.fps_subsample_ratio)
    use_fused = (cfg.detector.fusion_backend == "pallas"
                 and cfg.detector.grouping == "som")
    if use_fused:
        import jax as _jax

        from usip_tpu.models.fused_infer import detector_infer_fused
        interp = _jax.default_backend() == "cpu"

        def infer_fused(state: TrainState, pc: Array, sn: Array, key: Array):
            node = sample_nodes(key, pc, cfg.data.node_num, eval_ratio,
                                parallel=cfg.data.fps_parallel)
            _, kp, sig = detector_infer_fused(cfg, state.variables, pc, sn,
                                              node, interpret=interp)
            return kp, sig

        return infer_fused

    def infer(state: TrainState, pc: Array, sn: Array, key: Array):
        node = sample_nodes(key, pc, cfg.data.node_num, eval_ratio,
                            parallel=cfg.data.fps_parallel)
        _, kp, sig = model.apply(state.variables, pc, sn, node, train=False)
        return kp, sig

    return infer


# ------------------------------------------------------------- descriptor ----


class DescriptorBatch(NamedTuple):
    """Anchor/positive pair for descriptor training. ``neg_idx`` permutes the
    anchor batch to form negatives (in-batch mining,
    oxford_descriptor_loader.py:231-281 / models/keypoint_descriptor.py:149-151)."""

    anc_pc: Array    # (B, N, 3)
    anc_sn: Array    # (B, N, S)
    pos_pc: Array    # (B, N, 3)
    pos_sn: Array    # (B, N, S)
    neg_idx: Array   # (B,) int32


class PackedPairBatch(NamedTuple):
    """Single-buffer anchor/positive wire: ``[pc | sn]`` for both scans in ONE
    array (descriptor analog of :class:`PackedParentBatch`). On the remote
    serving tunnel each ``device_put`` leaf costs a ~25-45 ms RPC, so the
    5-leaf :class:`DescriptorBatch` spends ~125-225 ms/batch on transfers
    alone — measured 2.43x off the pure step at the kitti descriptor preset
    (PERFORMANCE.md descriptor-engine section). Decoded to fp32 on device at
    step entry (:func:`_as_pair`)."""

    x: Array         # (B, 2, N, 3+S): [:, 0] anchor, [:, 1] positive
    neg_idx: Array   # (B,) int32


def pack_pair_batch(anc_pc, anc_sn, pos_pc, pos_sn, neg_idx,
                    wire: str = "float16") -> PackedPairBatch:
    """Host-side (numpy) encode for the packed descriptor wire. ``wire``
    follows ``cfg.data.wire_dtype``: ``'float32'`` keeps full precision,
    anything else ships fp16 (the detector engine's measured-best wire)."""
    import numpy as np
    dt = np.float32 if wire == "float32" else np.float16
    anc = np.concatenate([np.asarray(anc_pc, dt), np.asarray(anc_sn, dt)],
                         axis=-1)
    pos = np.concatenate([np.asarray(pos_pc, dt), np.asarray(pos_sn, dt)],
                         axis=-1)
    return PackedPairBatch(x=np.stack([anc, pos], axis=1),
                           neg_idx=np.asarray(neg_idx, np.int32))


def _as_pair(batch):
    """Decode either descriptor wire to fp32 (anc_pc, anc_sn, pos_pc, pos_sn,
    neg_idx)."""
    f32 = lambda x: x.astype(jnp.float32)
    if isinstance(batch, PackedPairBatch):
        x = f32(batch.x)
        return (x[:, 0, :, :3], x[:, 0, :, 3:],
                x[:, 1, :, :3], x[:, 1, :, 3:], batch.neg_idx)
    return (f32(batch.anc_pc), f32(batch.anc_sn),
            f32(batch.pos_pc), f32(batch.pos_sn), batch.neg_idx)


def make_descriptor_train_step(cfg: Config, detector: Detector,
                               descriptor: Descriptor, use_cgf: bool = False,
                               eval_only: bool = False):
    """Returns ``step(desc_state, det_state, batch, key, epoch)``.

    The detector is frozen (run under stop_gradient / eval mode) and produces
    keypoints + sigmas for both scans; the descriptor trains with the scan triplet
    loss (outdoor) or the CGF keypoint triplet (indoor, use_cgf=True, where the
    anchor is GT-aligned to pos via a device-side random SE3 like
    scenenn_descriptor_loader.py:276-278).
    """
    if use_cgf and cfg.augment.height_scale:
        # anc is height-scaled AFTER detection but aligned with a gt applied
        # BEFORE scaling; S∘(R,s,t) != (R,s,t)∘S for anisotropic S, so CGF
        # radius matching would pair wrong keypoints. No released preset
        # combines these; refuse rather than train on wrong correspondences.
        raise NotImplementedError(
            "use_cgf with augment.height_scale: the post-detection height "
            "scale does not commute with the CGF GT alignment; disable one")

    def train_step(desc_state: TrainState, det_state: TrainState,
                   batch: DescriptorBatch, key: Array, epoch: Array):
        (k_node_a, k_node_p, k_se3, k_ball_a, k_ball_p, k_ball_n,
         k_cgf, k_height) = jax.random.split(key, 8)
        aug = cfg.augment
        anc_pc, anc_sn, pos_pc, pos_sn, neg_idx = _as_pair(batch)
        gt = None
        if use_cgf:
            # indoor: pos copy gets a GT transform; anchor keypoints are aligned
            # into the pos frame for the CGF loss
            anc_node = sample_nodes(k_node_a, anc_pc, cfg.data.node_num,
                                    cfg.data.fps_subsample_ratio,
                            parallel=cfg.data.fps_parallel)
            pos_pc, pos_sn, _, gt = augment.random_se3(
                k_se3, pos_pc, pos_sn,
                jnp.zeros((pos_pc.shape[0], 1, 3), pos_pc.dtype),
                rot_type=aug.rot_type, scale_thre=aug.gt_scale_thre,
                shift_thre=aug.gt_shift_thre,
                rot_perturbation=aug.rot_perturbation)
            pos_node = sample_nodes(k_node_p, pos_pc, cfg.data.node_num,
                                    cfg.data.fps_subsample_ratio,
                            parallel=cfg.data.fps_parallel)
        else:
            anc_node = sample_nodes(k_node_a, anc_pc, cfg.data.node_num,
                                    cfg.data.fps_subsample_ratio,
                            parallel=cfg.data.fps_parallel)
            pos_node = sample_nodes(k_node_p, pos_pc, cfg.data.node_num,
                                    cfg.data.fps_subsample_ratio,
                            parallel=cfg.data.fps_parallel)

        # frozen detector inference (run_model_siamese, no grad)
        det_vars = jax.lax.stop_gradient(det_state.variables)
        b = anc_pc.shape[0]
        pc = jnp.concatenate([anc_pc, pos_pc], axis=0)
        sn = jnp.concatenate([anc_sn, pos_sn], axis=0)
        node = jnp.concatenate([anc_node, pos_node], axis=0)
        _, kp, sig = detector.apply(det_vars, pc, sn, node, train=False)
        anc_kp, pos_kp = kp[:b], kp[b:]
        anc_sig = sig[:b]

        if aug.height_scale and not eval_only:
            # oxford: post-detector height scaling of clouds AND keypoints as
            # descriptor TRAIN augmentation (oxford/train_descriptor.py:123-130,
            # absent from its test loop); cam-frame up axis is y (ENU z
            # pre-flip)
            anc_pc, pos_pc, anc_kp, pos_kp = augment.random_height_scale(
                k_height, [anc_pc, pos_pc, anc_kp, pos_kp],
                aug.height_scale_low, aug.height_scale_high, axis=1)

        momentum = bn_momentum_schedule(
            cfg.train.bn_momentum, epoch, cfg.train.bn_momentum_decay_step,
            cfg.train.bn_momentum_decay)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": desc_state.batch_stats}

            def run(pcb, snb, kpb, kball, variables):
                if eval_only:
                    # eval uses running BN stats (keypoint_descriptor.py:162
                    # switches to .eval()); batch stats stay untouched
                    out = descriptor.apply(variables, pcb, snb, kpb,
                                           key=kball, train=False)
                    return out, {"batch_stats": variables["batch_stats"]}
                return descriptor.apply(
                    variables, pcb, snb, kpb, key=kball, train=True,
                    bn_momentum=momentum, mutable=["batch_stats"])

            (anc_desc, _), mut1 = run(anc_pc, anc_sn, anc_kp, k_ball_a, variables)
            variables = {"params": params, "batch_stats": mut1["batch_stats"]}
            (pos_desc, _), mut2 = run(pos_pc, pos_sn, pos_kp, k_ball_p, variables)
            new_stats = mut2["batch_stats"]
            extra = {}
            if use_cgf:
                anc_kp_aligned = apply_se3(anc_kp, gt.R, gt.scale, gt.shift)
                loss_bm, active = losses.desc_cgf_loss(
                    anc_kp_aligned, anc_desc, pos_kp, pos_desc, anc_sig, k_cgf,
                    cgf_radius=cfg.loss.cgf_radius,
                    gamma=cfg.loss.triple_loss_gamma,
                    sigma_max=cfg.loss.sigma_max)
                # registration-proxy selection metric (one extra (B,M,M)
                # reuse-shaped matmul — negligible next to the ball grouping);
                # the GT alignment the CGF objective already requires is what
                # makes it computable in-step
                extra["match_acc"] = jnp.mean(
                    jax.lax.stop_gradient(losses.descriptor_matching_accuracy(
                        anc_kp_aligned, anc_desc, pos_kp, pos_desc,
                        radius=cfg.loss.cgf_radius)))
            else:
                neg_desc = anc_desc[neg_idx]
                loss_bm, active = losses.desc_pair_scan_loss(
                    anc_desc, pos_desc, neg_desc, anc_sig,
                    gamma=cfg.loss.triple_loss_gamma,
                    sigma_max=cfg.loss.sigma_max)
            total = jnp.mean(loss_bm)
            # sigma stats like the reference's per-test prints
            # (match3d/train_detector.py:113-118, oxford/train_descriptor.py)
            metrics = {"loss": total, "active_percentage": jnp.mean(active),
                       "sigma_mean": jnp.mean(anc_sig),
                       "sigma_std": jnp.std(anc_sig),
                       "sigma_min": jnp.min(anc_sig),
                       "sigma_max": jnp.max(anc_sig), **extra}
            return total, (new_stats, metrics)

        if eval_only:
            _, (_, metrics) = loss_fn(desc_state.params)
            return desc_state, metrics
        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(desc_state.params)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = desc_state.apply_gradients(grads, new_stats)
        return new_state, metrics

    return train_step
