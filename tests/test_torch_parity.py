"""Numerical parity against a torch transcription of the reference forward.

Builds the reference RPN_Detector dataflow (networks.py:75-162) op-for-op in
torch (CPU, channels-first like the reference), loads the *same* weights as the
flax model, and compares keypoints/sigmas with our channels-last JAX forward in
fp32 eval mode. This pins the architecture to the reference beyond shape tests:
any dataflow deviation (concat order, masking, decentering, head wiring) breaks
these tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from usip_tpu.config import DetectorConfig
from usip_tpu.models import Detector

B, N, M, S = 2, 128, 16, 3
C1, C2, KNN_K = 16, 32, 4


def _dense(params, name):
    """flax Dense params -> (weight (Cout, Cin), bias)."""
    p = params[name]["dense"]
    return (torch.tensor(np.asarray(p["kernel"]).T),
            torch.tensor(np.asarray(p["bias"])))


def _bn(params, batch_stats, name):
    p = params[name]["norm"]
    s = batch_stats[name]["norm"]
    return (torch.tensor(np.asarray(p["scale"])),
            torch.tensor(np.asarray(p["bias"])),
            torch.tensor(np.asarray(s["mean"])),
            torch.tensor(np.asarray(s["var"])))


def _layer(x, params, batch_stats, name, act=True, norm=True):
    """PointwiseLayer in torch, channels-first: x (B, Cin, ...) -> (B, Cout, ...)."""
    w, b = _dense(params, name)
    orig = x.shape
    flat = x.reshape(orig[0], orig[1], -1)               # (B, Cin, L)
    y = torch.einsum("oc,bcl->bol", w, flat) + b[None, :, None]
    if norm:
        scale, bias, mean, var = _bn(params, batch_stats, name)
        y = (y - mean[None, :, None]) / torch.sqrt(var[None, :, None] + 1e-5)
        y = y * scale[None, :, None] + bias[None, :, None]
    if act:
        y = F.relu(y)
    return y.reshape(orig[0], w.shape[0], *orig[2:])


def _torch_reference_forward(pc, sn, node, params, batch_stats, sigma_lb):
    """networks.py:75-162 transcribed with torch ops (eval mode, k=1)."""
    x = torch.tensor(pc).permute(0, 2, 1)        # B x 3 x N
    sn_t = torch.tensor(sn).permute(0, 2, 1)     # B x S x N
    nd = torch.tensor(node).permute(0, 2, 1)     # B x 3 x M

    # som.query_topk (util/som.py:17-54), k=1
    diff = x.unsqueeze(3) - nd.unsqueeze(2)      # B x 3 x N x M
    d2 = (diff ** 2).sum(dim=1)                  # B x N x M
    min_idx = d2.argmin(dim=2)                   # B x N
    mask = F.one_hot(min_idx, M).float()         # B x N x M
    mask_row_max = mask.max(dim=1).values        # B x M
    mask_row_sum = mask.sum(dim=1)               # B x M

    # cluster means (networks.py:94-99)
    masked = x.unsqueeze(3) * mask.unsqueeze(1)  # B x 3 x N x M
    cluster_mean = masked.sum(dim=2) / (mask_row_sum.unsqueeze(1) + 1e-5)

    # decentre (networks.py:104-108)
    centers = (mask.unsqueeze(1) * cluster_mean.unsqueeze(2)).sum(dim=3)
    x_dec = x - centers
    x_aug = torch.cat([x_dec, sn_t], dim=1)      # B x (3+S) x N

    # first pointnet: 3 layers, last linear (layers.py:524-544)
    fp = "first_pointnet"
    h = _layer(x_aug, params[fp], batch_stats[fp], "layer0")
    h = _layer(h, params[fp], batch_stats[fp], "layer1")
    f1 = _layer(h, params[fp], batch_stats[fp], "layer2", act=False, norm=False)

    def index_max_gather(feat):
        # index_max + gather + occupancy zeroing (networks.py:117-120)
        out = torch.full((feat.shape[0], feat.shape[1], M), -1e30)
        for b in range(feat.shape[0]):
            for n in range(feat.shape[2]):
                mcol = min_idx[b, n]
                out[b, :, mcol] = torch.maximum(out[b, :, mcol], feat[b, :, n])
        out = torch.where(out <= -1e29, torch.zeros_like(out), out)
        return out * mask_row_max.unsqueeze(1)

    n1 = index_max_gather(f1)                    # B x C x M
    s1 = torch.gather(n1, 2, min_idx.unsqueeze(1).expand(-1, n1.shape[1], -1))
    sp = "second_pointnet"
    h = _layer(torch.cat([f1, s1], dim=1), params[sp], batch_stats[sp], "layer0")
    f2 = _layer(h, params[sp], batch_stats[sp], "layer1", act=False, norm=False)
    n2 = index_max_gather(f2)                    # B x C1 x M

    # GeneralKNNFusionModule (layers.py:401-440)
    q = cluster_mean                              # B x 3 x M
    qd = (q.unsqueeze(3) - q.unsqueeze(2)).norm(dim=1)   # B x M x M
    knn_i = qd.topk(KNN_K, dim=2, largest=False).indices  # B x M x K
    neigh = torch.gather(q.unsqueeze(2).expand(-1, -1, M, -1), 3,
                         knn_i.unsqueeze(1).expand(-1, 3, -1, -1))
    feat_n = torch.gather(n2.unsqueeze(2).expand(-1, -1, M, -1), 3,
                          knn_i.unsqueeze(1).expand(-1, n2.shape[1], -1, -1))
    dec = neigh - q.unsqueeze(3)
    kn = "knnlayer"
    hh = torch.cat([dec, feat_n], dim=1)          # B x (3+C1) x M x K
    for i in range(3):
        hh = _layer(hh, params[kn], batch_stats[kn], f"before{i}")
    hmax = hh.max(dim=3, keepdim=True).values
    y = torch.cat([hmax.expand_as(hh), hh], dim=1)
    for i in range(2):
        y = _layer(y, params[kn], batch_stats[kn], f"after{i}")
    knn_feat = y.max(dim=3).values                # B x C2 x M

    agg = torch.cat([n2, knn_feat], dim=1)
    hd = "head"
    z = _layer(agg, params[hd], batch_stats[hd], "mlp1")
    z = _layer(z, params[hd], batch_stats[hd], "mlp2")
    z = _layer(z, params[hd], batch_stats[hd], "mlp3", act=False, norm=False)
    keypoints = z[:, 0:3, :] + cluster_mean
    sigmas = F.softplus(z[:, 3, :]) + sigma_lb
    return (keypoints.permute(0, 2, 1).numpy(), sigmas.numpy(),
            cluster_mean.permute(0, 2, 1).numpy())


def test_som_detector_matches_torch_reference(rng):
    cfg = DetectorConfig(grouping="som", c1=C1, c2=C2, node_knn_k=KNN_K,
                         surface_normal_len=S, sigma_lower_bound=1e-3,
                         compute_dtype="float32")
    pc = rng.normal(size=(B, N, 3)).astype(np.float32)
    sn = rng.normal(size=(B, N, S)).astype(np.float32)
    node = rng.normal(size=(B, M, 3)).astype(np.float32)

    model = Detector(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pc),
                           jnp.asarray(sn), jnp.asarray(node), train=False)
    anchors, kp, sig = model.apply(variables, jnp.asarray(pc), jnp.asarray(sn),
                                   jnp.asarray(node), train=False)

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    with torch.no_grad():
        t_kp, t_sig, t_mean = _torch_reference_forward(
            pc, sn, node, params, stats, cfg.sigma_lower_bound)

    np.testing.assert_allclose(np.asarray(anchors), t_mean, atol=2e-4)
    np.testing.assert_allclose(np.asarray(kp), t_kp, atol=2e-3)
    np.testing.assert_allclose(np.asarray(sig), t_sig, atol=2e-3)
