"""Pallas kernel correctness (interpreter mode on CPU; same kernel code compiles
for TPU via Mosaic)."""

import jax.numpy as jnp
import numpy as np

from usip_tpu.ops import pairwise_sqdist
from usip_tpu.ops.pallas_kernels import min_argmin_pallas


def test_min_argmin_matches_xla(rng):
    b, n, m = 2, 256, 128
    pc = jnp.asarray((rng.normal(size=(b, n, 3)) * 5).astype(np.float32))
    nodes = jnp.asarray((rng.normal(size=(b, m, 3)) * 5).astype(np.float32))
    mins, idxs = min_argmin_pallas(pc, nodes, tile_n=128, interpret=True)
    ref = pairwise_sqdist(pc, nodes)
    np.testing.assert_allclose(np.asarray(mins), np.asarray(jnp.min(ref, 2)),
                               atol=1e-3)
    np.testing.assert_array_equal(np.asarray(idxs),
                                  np.asarray(jnp.argmin(ref, 2)))


def test_fused_fusion_chain_matches_module(rng):
    """fused_fusion_chain (interpret mode) == KNNFusionOnNodes eval forward
    with BN folded: same grouped input, same weights, nontrivial running
    stats."""
    import jax
    import jax.numpy as jnp

    from usip_tpu.models.detector import KNNFusionOnNodes
    from usip_tpu.ops import gather_points, knn
    from usip_tpu.ops.pallas_kernels import (fused_fusion_chain,
                                             fusion_chain_params)

    b, m, k, cf = 2, 16, 4, 12
    q = jnp.asarray(rng.normal(size=(b, m, 3)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(b, m, cf)).astype(np.float32))
    mod = KNNFusionOnNodes(features_before=(32, 32, 32),
                           features_after=(64, 64), k=k,
                           dtype=jnp.bfloat16)
    v = mod.init(jax.random.PRNGKey(0), q, q, x, False, 0.1)
    # nontrivial running stats so the BN folding is actually exercised
    stats = jax.tree_util.tree_map(lambda a: a, v["batch_stats"])
    leaves, treedef = jax.tree_util.tree_flatten(stats)
    leaves = [jnp.asarray(rng.uniform(0.5, 1.5, size=l.shape), jnp.float32)
              for l in leaves]
    v = dict(v, batch_stats=jax.tree_util.tree_unflatten(treedef, leaves))

    ref = mod.apply(v, q, q, x, False, 0.1)

    _, idx = knn(q, q, k)
    grouped = jnp.concatenate(
        [gather_points(q, idx) - q[:, :, None, :], gather_points(x, idx)],
        axis=-1)
    ws, bs = fusion_chain_params(v["params"], v["batch_stats"])
    out = fused_fusion_chain(grouped, ws, bs, tile_m=8, interpret=True)
    ref_np = np.asarray(ref)
    scale = np.abs(ref_np).max() + 1e-6
    np.testing.assert_allclose(np.asarray(out) / scale, ref_np / scale,
                               atol=3e-2)
    # median agreement should be bf16-tight
    med = np.median(np.abs(np.asarray(out) - ref_np))
    assert med < 2e-2 * scale, med


def test_detector_infer_fused_matches_model(rng):
    """detector_infer_fused (interpret mode) == Detector.apply eval forward,
    end to end through the trunk replay + folded-BN fused chain."""
    import jax
    import jax.numpy as jnp

    from usip_tpu.config import get_config
    from usip_tpu.models import Detector
    from usip_tpu.models.fused_infer import detector_infer_fused

    cfg = get_config("modelnet", **{
        "data.input_pc_num": 128, "data.node_num": 16,
        "detector.c1": 16, "detector.c2": 32, "detector.node_knn_k": 4,
        "detector.compute_dtype": "float32"})
    b, n, m = 2, 128, 16
    pc = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    sn = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    node = pc[:, :m]
    model = Detector(cfg.detector)
    v = model.init(jax.random.PRNGKey(0), pc, sn, node, train=False)
    ref_a, ref_k, ref_s = model.apply(v, pc, sn, node, train=False)
    a, kp, sg = detector_infer_fused(cfg, v, pc, sn, node, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(ref_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(kp), np.asarray(ref_k), atol=1e-3)
    np.testing.assert_allclose(np.asarray(sg), np.asarray(ref_s), atol=1e-3)


def test_fps_pallas_matches_xla(rng):
    """fps_pallas (interpret mode) picks bit-identical indices to the XLA
    fori_loop FPS: same recurrence, same first-occurrence argmax tie-break."""
    import jax

    from usip_tpu.ops.pallas_kernels import fps_pallas
    from usip_tpu.ops.sampling import farthest_point_sampling

    b, s, k = 4, 256, 64
    pc = jnp.asarray((rng.normal(size=(b, s, 3)) * 10).astype(np.float32))
    key = jax.random.PRNGKey(3)
    samples, idx_ref = farthest_point_sampling(key, pc, k)
    first = idx_ref[:, 0]
    idx = fps_pallas(pc, first, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    # duplicated points exercise the tie-break
    pc_dup = jnp.concatenate([pc[:, : s // 2], pc[:, : s // 2]], axis=1)
    _, idx_ref2 = farthest_point_sampling(key, pc_dup, k)
    idx2 = fps_pallas(pc_dup, idx_ref2[:, 0], k, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx2), np.asarray(idx_ref2))


def test_fps_auto_backend_guards():
    """auto only picks Mosaic on TPU with lane-aligned fp32 planes."""
    from usip_tpu.ops.sampling import _use_pallas_fps

    pc = jnp.zeros((4, 256, 3), jnp.float32)
    # CPU backend (tests force cpu): auto must decline, explicit must win
    assert not _use_pallas_fps("auto", pc, 64)
    assert _use_pallas_fps("pallas", pc, 64)
    assert not _use_pallas_fps("xla", pc, 64)
    # unaligned S / wrong dtype / oversize are ineligible even on TPU
    assert not _use_pallas_fps("auto", jnp.zeros((4, 250, 3), jnp.float32), 64)
    assert not _use_pallas_fps("auto", pc.astype(jnp.bfloat16), 64)
    assert not _use_pallas_fps("auto", jnp.zeros((64, 16384, 3), jnp.float32), 64)


def test_smallest_k_pallas_matches_topk(rng):
    """smallest_k_pallas (interpret mode) is bit-identical to lax.top_k
    (negated) — values, indices, tie order — on ball-style rows: duplicated
    priorities (ties), +inf out-of-ball entries, an all-inf row, a row with
    fewer than k finite entries, and unaligned N (lane padding)."""
    import jax

    from usip_tpu.ops.pallas_kernels import smallest_k_pallas

    b, m, n, k = 2, 24, 640, 16
    prio = rng.integers(0, 80, size=(b, 1, n)).astype(np.float32)  # many ties
    in_ball = rng.uniform(size=(b, m, n)) < 0.25
    scores = np.where(in_ball, np.broadcast_to(prio, (b, m, n)), np.inf)
    scores[0, 0] = np.inf                    # empty ball
    scores[0, 1] = np.inf
    scores[0, 1, :3] = [5.0, 1.0, 5.0]       # fewer than k finite
    s = jnp.asarray(scores.astype(np.float32))

    nv, ni = jax.lax.top_k(-s, k)
    for tr in (8, 16):
        pv, pi = smallest_k_pallas(s, k, tile_rows=tr, interpret=True)
        np.testing.assert_array_equal(np.asarray(pv), np.asarray(-nv))
        np.testing.assert_array_equal(np.asarray(pi), np.asarray(ni))

    # unaligned N: matches ops.topk.smallest_k's pad-clamp convention on the
    # finite prefix (pad picks clamp to N-1, surfacing only past the finite
    # count, where direct top_k's inf indices are arbitrary anyway)
    s_u = jnp.asarray(rng.normal(size=(b, m, 500)).astype(np.float32))
    nv_u, ni_u = jax.lax.top_k(-s_u, k)
    pv_u, pi_u = smallest_k_pallas(s_u, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(pv_u), np.asarray(-nv_u))
    np.testing.assert_array_equal(np.asarray(pi_u), np.asarray(ni_u))


def test_smallest_k_pallas_row_tiling(rng):
    """tile_rows falls back to a divisor of the row count."""
    from usip_tpu.ops.pallas_kernels import smallest_k_pallas

    s = jnp.asarray(rng.normal(size=(6, 256)).astype(np.float32))
    import jax
    nv, ni = jax.lax.top_k(-s, 8)
    pv, pi = smallest_k_pallas(s, 8, tile_rows=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(pv), np.asarray(-nv))
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ni))


def test_smallest_k_pallas_grad_matches_topk(rng):
    """The custom VJP scatters the value cotangent like lax.top_k's gradient."""
    import jax

    from usip_tpu.ops.pallas_kernels import smallest_k_pallas

    s = jnp.asarray(rng.normal(size=(5, 384)).astype(np.float32))

    def f_ref(x):
        v, _ = jax.lax.top_k(-x, 8)
        return jnp.sum(jnp.sin(-v) * jnp.arange(1.0, 9.0))

    def f_pal(x):
        v, _ = smallest_k_pallas(x, 8, interpret=True)
        return jnp.sum(jnp.sin(v) * jnp.arange(1.0, 9.0))

    np.testing.assert_allclose(np.asarray(jax.grad(f_pal)(s)),
                               np.asarray(jax.grad(f_ref)(s)), atol=1e-6)


def test_smallest_k_method_pallas(rng):
    """ops.topk.smallest_k(method='pallas') routes to the Mosaic kernel
    (interpreted off-TPU) and agrees with the default path."""
    from usip_tpu.ops.topk import smallest_k

    s = jnp.asarray(rng.normal(size=(4, 4096)).astype(np.float32))
    dv, di = smallest_k(s, 16)
    pv, pi = smallest_k(s, 16, method="pallas")
    np.testing.assert_array_equal(np.asarray(pv), np.asarray(dv))
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(di))


def test_smallest_k_pallas_bf16_grad(rng):
    """grad of a bf16 primal works: the VJP returns the cotangent in the
    primal dtype (the forward silently upcasts to fp32)."""
    import jax

    from usip_tpu.ops.pallas_kernels import smallest_k_pallas

    s = jnp.asarray(rng.normal(size=(4, 256)), jnp.bfloat16)

    def f(x):
        v, _ = smallest_k_pallas(x, 8, interpret=True)
        return jnp.sum(v)

    g = jax.grad(f)(s)
    assert g.dtype == jnp.bfloat16
    # exactly one unit cotangent per selected position
    assert float(jnp.sum(g.astype(jnp.float32))) == 4 * 8


def test_smallest_k_pallas_odd_rows_and_bad_tile(rng):
    """Odd row counts fall back to the largest divisor (not silent 1-row
    tiles via repeated halving), and tile_rows < 1 is rejected."""
    import pytest

    from usip_tpu.ops.pallas_kernels import _smallest_k_impl, smallest_k_pallas

    s = jnp.asarray(rng.normal(size=(9, 256)).astype(np.float32))
    import jax
    nv, ni = jax.lax.top_k(-s, 8)
    pv, pi = smallest_k_pallas(s, 8, tile_rows=6, interpret=True)  # gcd -> 3
    np.testing.assert_array_equal(np.asarray(pv), np.asarray(-nv))
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ni))
    with pytest.raises(ValueError, match="tile_rows"):
        _smallest_k_impl(s, 8, 0, True)


def test_smallest_k_method_pallas_export_overrides(rng):
    """method='pallas' honors the sampling.py export overrides: under
    force_xla_fps it falls back to the (bit-identical) XLA two-stage form —
    portable artifacts must embed neither Mosaic custom calls nor
    interpret-mode pallas_calls."""
    import jax

    from usip_tpu.ops.sampling import force_xla_fps
    from usip_tpu.ops.topk import smallest_k

    s = jnp.asarray(rng.normal(size=(4, 4096)).astype(np.float32))
    dv, di = smallest_k(s, 16)
    with force_xla_fps():
        pv, pi = smallest_k(s, 16, method="pallas")
        # provable XLA-only lowering: no custom_call in the HLO
        text = jax.jit(lambda x: smallest_k(x, 16, method="pallas")) \
            .lower(s).as_text()
    assert "tpu_custom_call" not in text
    np.testing.assert_array_equal(np.asarray(pv), np.asarray(dv))
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(di))


def test_fps_dispatch_not_poisoned_by_jit_cache(rng):
    """Regression: the Mosaic/XLA FPS dispatch must be part of the jit cache
    key. It used to be resolved from trace-time globals INSIDE the jitted
    body, so whichever context traced a (shape, k) first won for the rest of
    the process — bench_artifact's portable export (force_xla_fps) silently
    downgraded every later in-process trace to XLA FPS, and conversely a TPU
    trace leaked Mosaic custom calls into portable jax.export artifacts
    (observed round 5: uniform ~708 clouds/s across arms, and a pallas-on-CPU
    lowering failure in a load-only process)."""
    import jax

    from usip_tpu.ops.sampling import (assume_tpu_fps, force_xla_fps,
                                       farthest_point_sampling)

    pts = jnp.asarray(rng.normal(size=(4, 1024, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    def trace(k, p):
        return str(jax.make_jaxpr(
            lambda kk, pp: farthest_point_sampling(kk, pp, 64))(k, p))

    with assume_tpu_fps():
        assert "pallas_call" in trace(key, pts)  # Mosaic kernel embedded
    # Same shapes, same process: the export override must still take effect.
    with force_xla_fps():
        assert "pallas_call" not in trace(key, pts)
    with assume_tpu_fps():
        assert "pallas_call" in trace(key, pts)
