"""Point-sharded detector TRAINING: gradients + batch-norm statistics across a
cloud sharded over the mesh's ``points`` axis.

Completes the sequence-parallel story: the trainable trunk runs inside
``shard_map`` (assignment/MLPs local; cluster-mean psum; node-feature pmax; BN
statistics psum'd via the layers' ``axis_name``), the chamfer loss runs on the
replicated keypoint sets, and the on-pc loss reduces over the sharded cloud.
``jax.grad`` differentiates straight through the shard_map — its transpose
inserts the reverse collectives — so one step trains on clouds that exceed
single-chip HBM with single-device-identical math (collective reduction order
aside).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from usip_tpu import losses
from usip_tpu.config import Config
from usip_tpu.models.detector import KNNFusionOnNodes, KeypointHead, _dtype_of
from usip_tpu.nn.layers import SharedMLP
from usip_tpu.ops import apply_se3
from usip_tpu.parallel.mesh import DATA_AXIS
from usip_tpu.parallel.sharded_ops import POINT_AXIS

Array = jax.Array


def _batch_axis(mesh: Mesh):
    """'data' when the mesh also carries a data-parallel axis (2-D dp x sp)."""
    return DATA_AXIS if DATA_AXIS in mesh.axis_names else None


def sharded_trunk_apply(mesh: Mesh, cfg: Config, variables, pc: Array,
                        sn: Array, node: Array, train: bool,
                        bn_momentum) -> Tuple[Tuple[Array, Array], dict]:
    """SOM trunk with pc/sn sharded on N. Returns ((anchors, node features),
    new first/second pointnet batch_stats)."""
    dcfg = cfg.detector
    if dcfg.grouping != "som":
        raise NotImplementedError(
            "sharded_trunk_apply implements the som trunk only (point->node "
            f"argmin + scatter-max); got grouping={dcfg.grouping!r}. Use the "
            "unsharded Detector for knn/ball variants.")
    if dcfg.k != 1:
        raise NotImplementedError(
            "sharded_trunk_apply hardcodes k=1 nearest-node assignment; got "
            f"detector.k={dcfg.k}. The released configs all use k=1 "
            "(SURVEY §5.6); the k=3 averaging path is unsharded-only.")
    m = node.shape[1]
    c1 = dcfg.c1
    dt = _dtype_of(dcfg)
    ba = _batch_axis(mesh)
    # BN statistics must be global over every sharded dimension of the batch
    bn_axes = tuple(a for a in (ba, POINT_AXIS) if a is not None)
    mlp1 = SharedMLP((c1 // 2,) * 3, activation=dcfg.activation,
                     normalization=dcfg.normalization, dtype=dt,
                     axis_name=bn_axes if train else None)
    mlp2 = SharedMLP((c1, c1), activation=dcfg.activation,
                     normalization=dcfg.normalization, dtype=dt,
                     axis_name=bn_axes if train else None)
    v1 = {"params": variables["params"]["first_pointnet"],
          "batch_stats": variables["batch_stats"]["first_pointnet"]}
    v2 = {"params": variables["params"]["second_pointnet"],
          "batch_stats": variables["batch_stats"]["second_pointnet"]}

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(ba, POINT_AXIS, None), P(ba, POINT_AXIS, None),
                  P(ba), P(), P(), P()),
        out_specs=(P(ba), P(ba), P(), P()),
        # BN running stats are psum-replicated; the static varying-axes checker
        # can't see that through flax's mutable-collection plumbing. The parity
        # test below checks replication numerically.
        check_vma=False)
    def trunk(pc_sh, sn_sh, node_r, v1, v2, momentum):
        axis = POINT_AXIS
        pc_sg = jax.lax.stop_gradient(pc_sh)
        node_sg = jax.lax.stop_gradient(node_r)
        sq = (jnp.sum(pc_sg ** 2, -1)[..., None]
              + jnp.sum(node_sg ** 2, -1)[:, None, :]
              - 2.0 * jnp.einsum("bnd,bmd->bnm", pc_sg, node_sg,
                                 precision=jax.lax.Precision.HIGHEST))
        ids = jnp.argmin(sq, axis=-1).astype(jnp.int32)

        sums = jax.vmap(lambda xb, ib: jax.ops.segment_sum(
            xb, ib, num_segments=m))(pc_sg, ids)
        counts = jax.vmap(lambda ib: jax.ops.segment_sum(
            jnp.ones_like(ib, jnp.float32), ib, num_segments=m))(ids)
        sums = jax.lax.psum(sums, axis)
        counts = jax.lax.psum(counts, axis)
        mean = sums / (counts[..., None] + 1e-5)
        occ = (counts > 0).astype(jnp.float32)[..., None]

        centers = jnp.take_along_axis(mean, ids[..., None], axis=1)
        x_aug = jnp.concatenate([pc_sg - centers, sn_sh], axis=-1)

        if train:
            f1, mut1 = mlp1.apply(v1, x_aug, train=True, bn_momentum=momentum,
                                  mutable=["batch_stats"])
        else:
            f1, mut1 = mlp1.apply(v1, x_aug, train=False), {"batch_stats": v1["batch_stats"]}
        f1 = f1.astype(jnp.float32)

        def seg_max(f):
            out = jax.vmap(lambda fb, ib: jax.ops.segment_max(
                fb, ib, num_segments=m))(f, ids)
            # cross-shard max via all_gather+max (pmax has no transpose rule;
            # this is differentiable and only moves (S, B, M, C) node features)
            gathered = jax.lax.all_gather(out, axis)     # (S, B, M, C)
            out = jnp.max(gathered, axis=0)
            return jnp.where(jnp.isneginf(out), 0.0, out) * occ

        n1 = seg_max(f1)
        s1 = jnp.take_along_axis(n1, ids[..., None], axis=1)
        h = jnp.concatenate([f1, s1], axis=-1)
        if train:
            f2, mut2 = mlp2.apply(v2, h, train=True, bn_momentum=momentum,
                                  mutable=["batch_stats"])
        else:
            f2, mut2 = mlp2.apply(v2, h, train=False), {"batch_stats": v2["batch_stats"]}
        f2 = f2.astype(jnp.float32)
        n2 = seg_max(f2)
        return mean, n2, mut1["batch_stats"], mut2["batch_stats"]

    momentum = jnp.asarray(bn_momentum, jnp.float32)
    anchors, feat, bs1, bs2 = trunk(pc, sn, node, v1, v2, momentum)
    return (anchors, feat), {"first_pointnet": bs1, "second_pointnet": bs2}


def sharded_detector_apply(mesh: Mesh, cfg: Config, variables, pc: Array,
                           sn: Array, node: Array, train: bool = False,
                           bn_momentum=0.1):
    """Full detector forward (trainable) with the cloud sharded on N.

    Returns ((anchors, keypoints, sigmas), new_batch_stats).
    """
    dcfg = cfg.detector
    (anchors, feat), trunk_stats = sharded_trunk_apply(
        mesh, cfg, variables, pc, sn, node, train, bn_momentum)

    dt = _dtype_of(dcfg)
    knn_mod = KNNFusionOnNodes(
        features_before=(dcfg.c2 // 2,) * 3,
        features_after=(dcfg.c2, dcfg.c2),
        k=dcfg.node_knn_k, activation=dcfg.activation,
        normalization=dcfg.normalization, dtype=dt)
    head = KeypointHead(dcfg)
    vk = {"params": variables["params"]["knnlayer"],
          "batch_stats": variables["batch_stats"]["knnlayer"]}
    vh = {"params": variables["params"]["head"],
          "batch_stats": variables["batch_stats"]["head"]}
    if train:
        knn_feat, mutk = knn_mod.apply(vk, anchors, anchors, feat, True,
                                       bn_momentum, mutable=["batch_stats"])
        aggregated = jnp.concatenate([feat, knn_feat], axis=-1)
        (keypoints, sigmas), muth = head.apply(vh, aggregated, anchors, True,
                                               bn_momentum,
                                               mutable=["batch_stats"])
        new_stats = dict(trunk_stats,
                         knnlayer=mutk["batch_stats"],
                         head=muth["batch_stats"])
    else:
        knn_feat = knn_mod.apply(vk, anchors, anchors, feat, False, bn_momentum)
        aggregated = jnp.concatenate([feat, knn_feat], axis=-1)
        keypoints, sigmas = head.apply(vh, aggregated, anchors, False,
                                       bn_momentum)
        new_stats = variables["batch_stats"]
    return (anchors, keypoints, sigmas), new_stats


def make_sharded_detector_train_step(cfg: Config, mesh: Mesh):
    """Point-sharded siamese train step.

    The batch (already augmented, with GT SE3) arrives as explicit tensors —
    large-cloud pipelines prepare src/dst on host or upstream; this step does
    forward + losses + Adam with the N axis sharded. Signature:
    ``step(state, src_pc, src_sn, src_node, dst_pc, dst_sn, dst_node, gt_R,
    gt_scale, gt_shift, epoch) -> (state, metrics)``.
    """
    from usip_tpu.nn.layers import bn_momentum_schedule
    from usip_tpu.parallel.sharded_ops import sharded_single_side_chamfer

    def step(state, src_pc, src_sn, src_node, dst_pc, dst_sn, dst_node,
             gt_R, gt_scale, gt_shift, epoch):
        momentum = bn_momentum_schedule(
            cfg.train.bn_momentum, epoch, cfg.train.bn_momentum_decay_step,
            cfg.train.bn_momentum_decay)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            b = src_pc.shape[0]
            pc = jnp.concatenate([src_pc, dst_pc], axis=0)
            sn = jnp.concatenate([src_sn, dst_sn], axis=0)
            node = jnp.concatenate([src_node, dst_node], axis=0)
            (anchors, kp, sig), new_stats = sharded_detector_apply(
                mesh, cfg, variables, pc, sn, node, train=True,
                bn_momentum=momentum)
            s_kp, d_kp = kp[:b], kp[b:]
            s_sig, d_sig = sig[:b], sig[b:]
            s_kp_t = apply_se3(s_kp, gt_R, gt_scale, gt_shift)
            chamfer = losses.chamfer_probabilistic(s_kp_t, d_kp, s_sig, d_sig)
            alpha = cfg.loss.keypoint_on_pc_alpha
            on_pc = (jnp.mean(sharded_single_side_chamfer(mesh, s_kp, src_pc))
                     + jnp.mean(sharded_single_side_chamfer(mesh, d_kp,
                                                            dst_pc))) * alpha
            total = chamfer.loss + on_pc
            metrics = {"loss": total, "chamfer": chamfer.loss,
                       "chamfer_pure": chamfer.chamfer_pure,
                       "keypoint_on_pc": on_pc}
            return total, (new_stats, metrics)

        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_stats)
        return new_state, metrics

    return step


def make_sharded_descriptor_train_step(cfg: Config, mesh: Mesh,
                                       use_cgf: bool = False):
    """Point-sharded descriptor TRAIN step (the training analog of
    ``sharded_descriptor.sharded_describe``).

    A cloud that needs point sharding to *detect* can now be
    *described-trained* too: the frozen detector forward runs point-sharded
    (``sharded_detector_apply``), the descriptor's O(N) grouping runs through
    ``sharded_ops.sharded_ball_gather`` (per-shard candidate top-k + one tiny
    all_gather), and the conv stack + triplet loss + backward operate on the
    replicated (B, M, K, C) ball features — BN batch statistics are global by
    construction there (see ``describe_from_ball_feats``). Gradients flow only
    through the conv stack (grouping is under stop_gradient in the single-chip
    model too, models/descriptor.py:50-52), so no reverse collectives are
    needed beyond the gather's transpose.

    Signature (explicit tensors, nodes pre-sampled upstream, like
    ``make_sharded_detector_train_step``)::

        step(desc_state, det_state, anc_pc, anc_sn, anc_node,
             pos_pc, pos_sn, pos_node, neg_idx, key, epoch)
            -> (desc_state, metrics)

    ``use_cgf=False`` trains the outdoor scan triplet with in-batch negatives
    (``neg_idx`` permutes the anchor batch). CGF/indoor training aligns the
    anchor via a GT transform generated upstream — not wired here; use the
    unsharded step (indoor fragments are 5-10k points, far below the SP
    threshold).
    """
    import optax

    from usip_tpu.data import augment
    from usip_tpu.nn.layers import bn_momentum_schedule
    from usip_tpu.parallel.sharded_descriptor import describe_from_ball_feats
    from usip_tpu.parallel.sharded_ops import sharded_ball_gather

    if use_cgf:
        raise NotImplementedError(
            "sharded descriptor training implements the outdoor scan-triplet "
            "objective; the CGF/indoor preset operates on small fragments "
            "that do not need point sharding — use the unsharded step")

    dcfg = cfg.descriptor

    def _gather_balls(pc, sn, kp, key):
        b, n, _ = pc.shape
        x_aug = (jnp.concatenate([pc, sn], axis=-1)
                 if dcfg.surface_normal_len > 0 else pc)
        priority = jax.random.uniform(key, (b, n), dtype=jnp.float32)
        feats, _, _ = sharded_ball_gather(
            mesh, jax.lax.stop_gradient(kp), jax.lax.stop_gradient(pc),
            jax.lax.stop_gradient(x_aug), dcfg.ball_radius,
            dcfg.ball_nsamples, priority)
        g_xyz = feats[..., 0:3] - kp[:, :, None, :]
        return jnp.concatenate([g_xyz, feats[..., 3:]], axis=-1)

    def step(desc_state, det_state, anc_pc, anc_sn, anc_node,
             pos_pc, pos_sn, pos_node, neg_idx, key, epoch):
        k_ball_a, k_ball_p, k_height = jax.random.split(key, 3)
        aug = cfg.augment

        # frozen detector, point-sharded forward (run_model_siamese analog)
        det_vars = jax.lax.stop_gradient(det_state.variables)
        b = anc_pc.shape[0]
        pc = jnp.concatenate([anc_pc, pos_pc], axis=0)
        sn = jnp.concatenate([anc_sn, pos_sn], axis=0)
        node = jnp.concatenate([anc_node, pos_node], axis=0)
        (_, kp, sig), _ = sharded_detector_apply(
            mesh, cfg, det_vars, pc, sn, node, train=False)
        anc_kp, pos_kp = kp[:b], kp[b:]
        anc_sig = sig[:b]

        if aug.height_scale:
            # post-detector height scaling of clouds AND keypoints
            # (oxford/train_descriptor.py:123-130); elementwise, so it
            # operates on the sharded arrays transparently
            anc_pc, pos_pc, anc_kp, pos_kp = augment.random_height_scale(
                k_height, [anc_pc, pos_pc, anc_kp, pos_kp],
                aug.height_scale_low, aug.height_scale_high, axis=1)

        ball_a = _gather_balls(anc_pc, anc_sn, anc_kp, k_ball_a)
        ball_p = _gather_balls(pos_pc, pos_sn, pos_kp, k_ball_p)

        momentum = bn_momentum_schedule(
            cfg.train.bn_momentum, epoch, cfg.train.bn_momentum_decay_step,
            cfg.train.bn_momentum_decay)

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": desc_state.batch_stats}
            anc_desc, stats1 = describe_from_ball_feats(
                cfg, variables, ball_a, train=True, bn_momentum=momentum)
            variables = {"params": params, "batch_stats": stats1}
            pos_desc, new_stats = describe_from_ball_feats(
                cfg, variables, ball_p, train=True, bn_momentum=momentum)
            neg_desc = anc_desc[neg_idx]
            loss_bm, active = losses.desc_pair_scan_loss(
                anc_desc, pos_desc, neg_desc, anc_sig,
                gamma=cfg.loss.triple_loss_gamma,
                sigma_max=cfg.loss.sigma_max)
            total = jnp.mean(loss_bm)
            metrics = {"loss": total, "active_percentage": jnp.mean(active),
                       "sigma_mean": jnp.mean(anc_sig)}
            return total, (new_stats, metrics)

        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(desc_state.params)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = desc_state.apply_gradients(grads, new_stats)
        return new_state, metrics

    return step
