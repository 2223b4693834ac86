"""Channel-sharded (tensor-parallel) detector forward.

Shards the detector's FLOP-dominant stages — the node-kNN fusion block and the
keypoint head (~85% of forward FLOPs, PERFORMANCE.md MFU ledger) — across a
mesh's ``channels`` axis, Megatron-style:

  * **column-parallel** layers hold a kernel slice ``W[:, j*w:(j+1)*w]`` and
    produce a channel shard of the activation; bias/BN params are sliced the
    same way, so normalization + activation stay local,
  * **row-parallel** layers consume a channel-sharded activation with a kernel
    row slice and one ``psum`` rebuilds the full output, after which bias/BN
    run replicated,
  * pairing col->row means exactly one collective per layer pair; the only
    other traffic is the tiny (B, M, 4) head output.

Weights are genuinely sharded: ``shard_tp_params`` pre-splits every kernel into
a ``(n_shards, ...)`` stack that shard_map lays out one-slice-per-device, so
per-device parameter memory for these stages drops by the mesh size — the
actual point of TP for wide models (c1/c2 are free config axes here, unlike the
reference's fixed single-GPU widths).

The SOM trunk (O(N) scatter stages, no wide matmuls) runs replicated with the
exact single-chip ops; shard the cloud with
``sharded_detector.sharded_detector_forward`` instead/as well when N is the
limit. Inference-path only, like ``sharded_describe``. Numerically identical to
``Detector.apply`` up to psum reduction order when
``detector.compute_dtype='float32'`` (bf16 rounds each row-parallel partial
before the cross-device sum, so bf16 parity is approximate).

Reference scope: RPN_Detector's GeneralKNNFusionModule + mlp1-3 head
(/root/reference/models/networks.py:52-71,135-154) — the reference has no
model-parallel analog at all.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from usip_tpu.config import Config
from usip_tpu.models.detector import _dtype_of, som_trunk_eval
from usip_tpu.nn.layers import activation_fn
from usip_tpu.ops import gather_points, knn

Array = jax.Array

CHANNEL_AXIS = "channels"


def make_channel_mesh(num_devices: Optional[int] = None) -> Mesh:
    import numpy as np
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (CHANNEL_AXIS,))


# ------------------------------------------------------------- param slicing --

def _col(w: Array, d: int) -> Array:
    """(Cin, Cout) -> (d, Cin, Cout/d): contiguous column blocks per shard."""
    cin, cout = w.shape
    return w.reshape(cin, d, cout // d).transpose(1, 0, 2)


def _row(w: Array, d: int) -> Array:
    """(Cin, Cout) -> (d, Cin/d, Cout): contiguous row blocks per shard."""
    cin, cout = w.shape
    return w.reshape(d, cin // d, cout)


def _vec(v: Array, d: int) -> Array:
    """(C,) -> (d, C/d)."""
    return v.reshape(d, -1)


def _layer_vars(variables, block, name):
    p = variables["params"][block][name]
    out = {"w": p["dense"]["kernel"], "b": p["dense"]["bias"]}
    if "norm" in p:
        bs = variables["batch_stats"][block][name]["norm"]
        out.update(s=p["norm"]["scale"], sb=p["norm"]["bias"],
                   m=bs["mean"], v=bs["var"])
    return out


def shard_tp_params(cfg: Config, variables, n_shards: int):
    """Split the fusion-block + head params into per-shard stacks.

    Returns ``(tp, rp)``: ``tp`` maps name -> ``(n_shards, ...)`` arrays to be
    laid out one-slice-per-device (shard_map spec ``P(CHANNEL_AXIS)``), ``rp``
    the small replicated row-layer bias/BN params.
    """
    dcfg = cfg.detector
    d = n_shards
    c1, c2 = dcfg.c1, dcfg.c2
    c2h = c2 // 2
    for width, what in ((c2h, "c2/2"), (c1, "c1"), (512, "head mlp1"),
                        (256, "head mlp2")):
        assert width % d == 0, f"{what}={width} not divisible by {d} shards"

    tp, rp = {}, {}

    def col(key, lv):
        tp[key + "_w"] = _col(lv["w"], d)
        tp[key + "_b"] = _vec(lv["b"], d)
        for f in ("s", "sb", "m", "v"):
            tp[key + "_" + f] = _vec(lv[f], d)

    def row(key, lv, splits=None):
        if splits is None:
            tp[key + "_w"] = _row(lv["w"], d)
        else:
            off = 0
            for part, width in splits:
                tp[f"{key}_w{part}"] = _row(lv["w"][off:off + width], d)
                off += width
        rp[key + "_b"] = lv["b"]
        if "s" in lv:
            for f in ("s", "sb", "m", "v"):
                rp[key + "_" + f] = lv[f]

    col("before0", _layer_vars(variables, "knnlayer", "before0"))
    row("before1", _layer_vars(variables, "knnlayer", "before1"))
    col("before2", _layer_vars(variables, "knnlayer", "before2"))
    # after0 consumes the virtual concat (h_max, h) — split-kernel row shards
    row("after0", _layer_vars(variables, "knnlayer", "after0"),
        splits=(("max", c2h), ("h", c2h)))
    col("after1", _layer_vars(variables, "knnlayer", "after1"))
    # head mlp1 consumes concat(feat C1, knn C2)
    row("mlp1", _layer_vars(variables, "head", "mlp1"),
        splits=(("f", c1), ("k", c2)))
    col("mlp2", _layer_vars(variables, "head", "mlp2"))
    row("mlp3", _layer_vars(variables, "head", "mlp3"))
    return tp, rp


# ------------------------------------------------------------------ forward --

def tensor_parallel_detector_forward(mesh: Mesh, cfg: Config, variables,
                                     pc: Array, sn: Array, node: Array,
                                     tp_params=None
                                     ) -> Tuple[Array, Array, Array]:
    """SOM-detector forward with fusion-block/head channels sharded over
    ``mesh``'s ``channels`` axis. Same signature/returns as ``Detector.apply``
    (anchors, keypoints, sigmas), all replicated.

    ``tp_params``: the ``(tp, rp)`` pair from ``shard_tp_params``. Pass it in
    serving loops so the kernel reshape/slicing runs once at setup, not per
    call (when None it is recomputed here — fine for one-shot use)."""
    dcfg = cfg.detector
    assert dcfg.grouping == "som", "TP forward implemented for the som detector"
    d = mesh.devices.size
    c1 = dcfg.c1
    dt = _dtype_of(dcfg) or jnp.float32
    act = activation_fn(dcfg.activation)

    anchors, feat = som_trunk_eval(cfg, variables, pc, sn, node)

    # node-kNN grouping: tiny O(M^2), replicated (models/detector.py:62-67)
    _, idx = knn(anchors, anchors, dcfg.node_knn_k)
    neigh_coord = gather_points(anchors, idx)
    neigh_feat = gather_points(feat, idx)
    decentered = neigh_coord - anchors[:, :, None, :]
    h0 = jnp.concatenate([decentered, neigh_feat], axis=-1)  # (B, M, K, 3+C1)

    tp, rp = tp_params if tp_params is not None \
        else shard_tp_params(cfg, variables, d)

    def bn(y, m, v, s, b):
        y32 = (y.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-5)
        return (y32 * s + b).astype(y.dtype)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(CHANNEL_AXIS), P()), out_specs=P())
    def tp_block(h0, feat, tp, rp):
        t = lambda k: tp[k][0]
        ax = CHANNEL_AXIS

        # the head's PointwiseLayers are built WITHOUT dtype, i.e. always
        # fp32 (models/detector.py:96-103); only the fusion block honors
        # compute_dtype (models/detector.py:129-137)
        def col_layer(key, x, cdt=dt):
            y = (x.astype(cdt) @ t(key + "_w").astype(cdt)
                 + t(key + "_b").astype(cdt))
            return act(bn(y, t(key + "_m"), t(key + "_v"),
                          t(key + "_s"), t(key + "_sb")))

        def row_combine(key, partial, linear=False):
            y = jax.lax.psum(partial, ax) + rp[key + "_b"].astype(partial.dtype)
            if linear:
                return y
            return act(bn(y, rp[key + "_m"], rp[key + "_v"],
                          rp[key + "_s"], rp[key + "_sb"]))

        h = col_layer("before0", h0)                     # (B,M,K,c2h/d) local
        h = row_combine("before1", h.astype(dt) @ t("before1_w").astype(dt))
        h = col_layer("before2", h)                      # local
        h_max = jnp.max(h, axis=-2, keepdims=True)       # (B,M,1,c2h/d) local
        part = (h_max.astype(dt) @ t("after0_wmax").astype(dt)
                + h.astype(dt) @ t("after0_wh").astype(dt))
        y = row_combine("after0", part)                  # (B,M,K,C2) replicated
        y = col_layer("after1", y)                       # (B,M,K,c2/d) local
        knn_loc = jnp.max(y, axis=-2).astype(jnp.float32)  # (B,M,c2/d) local

        i = jax.lax.axis_index(ax)
        feat_loc = jax.lax.dynamic_slice_in_dim(feat, i * (c1 // d), c1 // d,
                                                axis=2)
        part = (feat_loc @ t("mlp1_wf") + knn_loc @ t("mlp1_wk"))
        y = row_combine("mlp1", part)                    # (B,M,512) replicated
        y = col_layer("mlp2", y, cdt=jnp.float32)        # (B,M,256/d) local
        out = row_combine("mlp3", y @ t("mlp3_w"), linear=True)
        return out.astype(jnp.float32)                   # (B,M,4) replicated

    y4 = tp_block(h0, feat, tp, rp)
    keypoints = y4[..., 0:3] + anchors
    sigmas = jax.nn.softplus(y4[..., 3]) + dcfg.sigma_lower_bound
    return anchors, keypoints, sigmas


# ------------------------------------------------- GSPMD tensor-parallel training --

# fusion-block + head layers whose channel dim is worth sharding (the trunk's
# widths are small and its scatter stages don't benefit)
TP_LAYER_NAMES = frozenset({"before0", "before1", "before2", "after0",
                            "after1", "mlp1", "mlp2"})


def make_dp_tp_mesh(dp: int, tp: int) -> Mesh:
    """2-D ``data x channels`` mesh over the first dp*tp devices."""
    import numpy as np
    devices = jax.devices()[:dp * tp]
    return Mesh(np.asarray(devices).reshape(dp, tp),
                ("data", CHANNEL_AXIS))


def tp_state_sharding(mesh: Mesh, state):
    """NamedSharding pytree for a ``TrainState``: fusion/head layer kernels
    channel-sharded on their output dim (their bias/BN vectors and the
    mirrored Adam moments follow), everything else replicated.

    This is the GSPMD form of tensor-parallel *training*: jit the ordinary
    train step with these input layouts and XLA's sharding propagation
    inserts the collectives — semantically identical to the replicated
    program, per-device parameter/optimizer memory for the wide layers
    divided by the mesh's ``channels`` size. Complements the explicit
    shard_map inference path above.
    """
    from jax.sharding import NamedSharding
    n = mesh.shape[CHANNEL_AXIS]

    def one(path, leaf):
        kp = jax.tree_util.keystr(path)
        if any(f"'{name}'" in kp for name in TP_LAYER_NAMES) \
                and hasattr(leaf, "ndim"):
            if leaf.ndim == 2 and kp.endswith("'kernel']") \
                    and leaf.shape[-1] % n == 0:
                return NamedSharding(mesh, P(None, CHANNEL_AXIS))
            if leaf.ndim == 1 and leaf.shape[0] % n == 0:
                return NamedSharding(mesh, P(CHANNEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, state)


def shard_state_tp(mesh: Mesh, state):
    """Lay a ``TrainState`` out on the mesh per ``tp_state_sharding``."""
    import numpy as np
    sh = tp_state_sharding(mesh, state)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s)
        if isinstance(x, (jax.Array, np.ndarray)) else x, state, sh)


__all__ = ["CHANNEL_AXIS", "TP_LAYER_NAMES", "make_channel_mesh",
           "make_dp_tp_mesh", "shard_state_tp", "shard_tp_params",
           "tensor_parallel_detector_forward", "tp_state_sharding"]
