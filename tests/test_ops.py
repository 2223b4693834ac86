"""Property tests for geometry/grouping/segment/sampling ops.

Follows (and supersedes) the reference's CPU-oracle pattern for its CUDA kernels
(models/index_max_ext/index_max.cpp:73-112 is the oracle for the GPU kernel): every
TPU op is checked against a transparent numpy transcription of the reference
semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from usip_tpu import ops


# ---------------------------------------------------------------- geometry ----

def test_pairwise_sqdist_matches_exact(rng):
    a = rng.normal(size=(2, 33, 3)).astype(np.float32)
    b = rng.normal(size=(2, 17, 3)).astype(np.float32)
    fast = ops.pairwise_sqdist(jnp.asarray(a), jnp.asarray(b))
    exact = ops.pairwise_sqdist(jnp.asarray(a), jnp.asarray(b), exact=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=1e-4)


def test_safe_sqrt_zero_gradient():
    g = jax.grad(lambda x: ops.safe_sqrt(x))(0.0)
    assert np.isfinite(g) and g == 0.0
    g1 = jax.grad(lambda x: ops.safe_sqrt(x))(4.0)
    np.testing.assert_allclose(g1, 0.25, rtol=1e-6)


def test_knn_against_numpy(rng):
    q = rng.normal(size=(2, 10, 3)).astype(np.float32)
    db = rng.normal(size=(2, 40, 3)).astype(np.float32)
    d, idx = ops.knn(jnp.asarray(q), jnp.asarray(db), k=5)
    d, idx = np.asarray(d), np.asarray(idx)
    for b in range(2):
        full = ((q[b, :, None, :] - db[b, None, :, :]) ** 2).sum(-1)
        ref_idx = np.argsort(full, axis=1)[:, :5]
        ref_d = np.take_along_axis(full, ref_idx, axis=1)
        np.testing.assert_allclose(np.sort(d[b], axis=1), np.sort(ref_d, axis=1),
                                   atol=1e-4)
        # indices must point at equally-near neighbors (ties may reorder)
        got_d = np.take_along_axis(full, idx[b], axis=1)
        np.testing.assert_allclose(np.sort(got_d, 1), np.sort(ref_d, 1), atol=1e-4)


def test_gather_points_shapes(rng):
    pts = jnp.asarray(rng.normal(size=(2, 16, 4)).astype(np.float32))
    idx2 = jnp.asarray(rng.integers(0, 16, size=(2, 5)))
    out = ops.gather_points(pts, idx2)
    assert out.shape == (2, 5, 4)
    idx3 = jnp.asarray(rng.integers(0, 16, size=(2, 3, 7)))
    out3 = ops.gather_points(pts, idx3)
    assert out3.shape == (2, 3, 7, 4)
    np.testing.assert_allclose(np.asarray(out3)[1, 2, 4],
                               np.asarray(pts)[1, np.asarray(idx3)[1, 2, 4]])


def test_apply_se3_roundtrip(rng):
    pts = rng.normal(size=(3, 20, 3)).astype(np.float32)
    theta = rng.uniform(0, 2 * np.pi, size=3)
    Rs = []
    for t in theta:
        Rs.append(np.array([[np.cos(t), -np.sin(t), 0],
                            [np.sin(t), np.cos(t), 0],
                            [0, 0, 1]], np.float32))
    R = np.stack(Rs)
    scale = rng.uniform(0.8, 1.2, size=(3,)).astype(np.float32)
    shift = rng.normal(size=(3, 3)).astype(np.float32)
    out = np.asarray(ops.apply_se3(jnp.asarray(pts), jnp.asarray(R),
                                   jnp.asarray(scale), jnp.asarray(shift)))
    ref = np.einsum("bij,bnj->bni", R, pts) * scale[:, None, None] + shift[:, None, :]
    np.testing.assert_allclose(out, ref, atol=1e-5)


# ---------------------------------------------------------------- grouping ----

def _assignment_oracle(points, nodes, k):
    """numpy transcription of util/som.py:17-54 (query_topk)."""
    b, n, _ = points.shape
    m = nodes.shape[1]
    sq = ((points[:, :, None, :] - nodes[:, None, :, :]) ** 2).sum(-1)  # (B,N,M)
    idx = np.argsort(sq, axis=2)[:, :, :k]  # (B,N,k) ascending
    ids = np.transpose(idx, (0, 2, 1)).reshape(b, k * n)  # k-major flatten
    counts = np.zeros((b, m), np.float32)
    for bb in range(b):
        for i in ids[bb]:
            counts[bb, i] += 1
    return ids, counts


@pytest.mark.parametrize("k", [1, 2])
def test_assign_points_to_nodes(rng, k):
    pts = rng.normal(size=(2, 50, 3)).astype(np.float32)
    nodes = rng.normal(size=(2, 8, 3)).astype(np.float32)
    res = ops.assign_points_to_nodes(jnp.asarray(pts), jnp.asarray(nodes), k=k)
    ref_ids, ref_counts = _assignment_oracle(pts, nodes, k)
    np.testing.assert_array_equal(np.asarray(res.ids), ref_ids)
    np.testing.assert_allclose(np.asarray(res.counts), ref_counts)
    np.testing.assert_array_equal(np.asarray(res.occupancy), (ref_counts > 0))


def test_ball_query_semantics(rng):
    """Check against a transcription of ball_query_cuda.cu:22-46: first-K in
    priority order within radius, cyclic padding, zero row when empty."""
    b, n, m, kk, radius = 2, 60, 7, 8, 0.7
    pts = rng.normal(size=(b, n, 3)).astype(np.float32)
    centers = rng.normal(size=(b, m, 3)).astype(np.float32)
    # far-away center to force an empty ball
    centers[0, 0] = 100.0
    key = jax.random.PRNGKey(7)
    res = ops.ball_query(jnp.asarray(pts), jnp.asarray(centers), radius, kk, key=key)
    idx, valid, counts = map(np.asarray, (res.idx, res.valid, res.counts))
    prio = np.asarray(jax.random.uniform(key, (b, n), dtype=jnp.float32))
    for bb in range(b):
        order = np.argsort(prio[bb])  # the implied permutation
        for mm in range(m):
            d = np.linalg.norm(pts[bb] - centers[bb, mm], axis=1)
            in_ball = [i for i in order if d[i] <= radius]
            expect = in_ball[:kk]
            c = len(expect)
            assert counts[bb, mm] == min(c, kk)
            if c == 0:
                np.testing.assert_array_equal(idx[bb, mm], 0)
                assert not valid[bb, mm].any()
                continue
            # first c slots: exact order; padded slots cycle
            np.testing.assert_array_equal(idx[bb, mm, :min(c, kk)], expect[:kk])
            for j in range(min(c, kk), kk):
                assert idx[bb, mm, j] == expect[j % c]
                assert not valid[bb, mm, j]


def test_ball_query_deterministic_order(rng):
    pts = rng.normal(size=(1, 30, 3)).astype(np.float32)
    centers = pts[:, :4].copy()
    res = ops.ball_query(jnp.asarray(pts), jnp.asarray(centers), 0.5, 4, key=None)
    idx, valid = np.asarray(res.idx), np.asarray(res.valid)
    for mm in range(4):
        d = np.linalg.norm(pts[0] - centers[0, mm], axis=1)
        expect = [i for i in range(30) if d[i] <= 0.5][:4]
        np.testing.assert_array_equal(idx[0, mm, :len(expect)], expect)


# ----------------------------------------------------------------- segment ----

def _masked_max_oracle(f, ids, m):
    """numpy transcription of index_max.cpp:73-112 + networks.py:117-120."""
    b, n, c = f.shape
    out = np.zeros((b, m, c), f.dtype)
    arg = np.zeros((b, m, c), np.int64)
    best = np.full((b, m, c), -np.inf)
    for bb in range(b):
        for i in range(n):
            node = ids[bb, i]
            upd = f[bb, i] > best[bb, node]  # strictly greater = first argmax wins
            best[bb, node] = np.where(upd, f[bb, i], best[bb, node])
            arg[bb, node] = np.where(upd, i, arg[bb, node])
    occupied = np.isfinite(best)
    out = np.where(occupied, best, 0.0)
    return out.astype(f.dtype), arg, occupied


@pytest.mark.parametrize("backend", ["fast", "native", "onehot"])
def test_masked_scatter_max_value(rng, backend):
    b, n, c, m = 2, 64, 6, 9
    f = rng.normal(size=(b, n, c)).astype(np.float32)
    ids = rng.integers(0, m, size=(b, n)).astype(np.int32)
    ids[0, :] = np.clip(ids[0, :], 0, m - 3)  # leave nodes m-2, m-1 empty
    out = ops.masked_scatter_max(jnp.asarray(f), jnp.asarray(ids), m, backend)
    ref, _, _ = _masked_max_oracle(f, ids, m)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


@pytest.mark.parametrize("backend", ["native", "onehot"])
def test_masked_scatter_max_gradient(rng, backend):
    """Gradient must flow only to the argmax point of each (node, channel)."""
    b, n, c, m = 1, 12, 3, 4
    f = rng.normal(size=(b, n, c)).astype(np.float32)
    ids = rng.integers(0, m, size=(b, n)).astype(np.int32)

    def loss(x):
        return jnp.sum(ops.masked_scatter_max(x, jnp.asarray(ids), m, backend))

    g = np.asarray(jax.grad(loss)(jnp.asarray(f)))
    _, arg, occupied = _masked_max_oracle(f, ids, m)
    expect = np.zeros_like(f)
    for mm in range(m):
        for cc in range(c):
            if occupied[0, mm, cc]:
                expect[0, arg[0, mm, cc], cc] += 1.0
    np.testing.assert_allclose(g, expect, atol=1e-6)


def test_masked_scatter_max_fast_gradient_total(rng):
    """'fast' splits tie gradients instead of first-argmax; totals per distinct
    value must still match the oracle's totals."""
    b, n, c, m = 1, 12, 3, 4
    f = rng.normal(size=(b, n, c)).astype(np.float32)
    ids = rng.integers(0, m, size=(b, n)).astype(np.int32)

    def loss(x):
        return jnp.sum(ops.masked_scatter_max(x, jnp.asarray(ids), m, "fast"))

    g = np.asarray(jax.grad(loss)(jnp.asarray(f)))
    _, arg, occupied = _masked_max_oracle(f, ids, m)
    expect = np.zeros_like(f)
    for mm in range(m):
        for cc in range(c):
            if occupied[0, mm, cc]:
                expect[0, arg[0, mm, cc], cc] += 1.0
    # no ties in random data -> identical to first-argmax gradient
    np.testing.assert_allclose(g, expect, atol=1e-6)


def test_segment_mean_count(rng):
    b, n, m = 2, 40, 6
    x = rng.normal(size=(b, n, 3)).astype(np.float32)
    ids = rng.integers(0, m, size=(b, n)).astype(np.int32)
    means, counts = ops.segment_mean_count(jnp.asarray(x), jnp.asarray(ids), m)
    for bb in range(b):
        for mm in range(m):
            sel = x[bb][ids[bb] == mm]
            cnt = len(sel)
            assert counts[bb, mm] == cnt
            ref = sel.sum(0) / (cnt + 1e-5) if cnt else np.zeros(3)
            np.testing.assert_allclose(np.asarray(means)[bb, mm], ref, atol=1e-5)


def test_scatter_back(rng):
    nf = jnp.asarray(rng.normal(size=(2, 5, 4)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 5, size=(2, 11)).astype(np.int32))
    out = np.asarray(ops.scatter_back(nf, ids))
    for bb in range(2):
        np.testing.assert_allclose(out[bb], np.asarray(nf)[bb][np.asarray(ids)[bb]])


# ---------------------------------------------------------------- sampling ----

def test_fps_properties(rng):
    pts = rng.normal(size=(2, 100, 3)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    samples, idxs = ops.farthest_point_sampling(key, jnp.asarray(pts), 16)
    assert samples.shape == (2, 16, 3)
    idxs = np.asarray(idxs)
    for bb in range(2):
        assert len(set(idxs[bb].tolist())) == 16  # distinct picks
    # FPS should spread: min pairwise distance among samples >> random subset's
    s = np.asarray(samples)
    def min_pair(x):
        d = np.linalg.norm(x[:, None] - x[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        return d.min()
    rnd = pts[0, :16]
    assert min_pair(s[0]) > min_pair(rnd) * 0.9


def test_fps_exact_recurrence(rng):
    """Bit-compare against the reference FPS recurrence given the same seed point."""
    pts = rng.normal(size=(1, 50, 3)).astype(np.float32)
    key = jax.random.PRNGKey(3)
    samples, idxs = ops.farthest_point_sampling(key, jnp.asarray(pts), 8)
    first = int(np.asarray(idxs)[0, 0])
    # numpy transcription of modelnet_shrec_loader.py:122-129
    chosen = [first]
    dists = ((pts[0] - pts[0, first]) ** 2).sum(1)
    for _ in range(7):
        far = int(np.argmax(dists))
        chosen.append(far)
        dists = np.minimum(dists, ((pts[0] - pts[0, far]) ** 2).sum(1))
    np.testing.assert_array_equal(np.asarray(idxs)[0], chosen)


def test_sample_nodes_shape(rng):
    pts = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
    nodes = ops.sample_nodes(jax.random.PRNGKey(1), pts, 32, subsample_ratio=4)
    assert nodes.shape == (2, 32, 3)


def test_nearest_neighbor_custom_vjp(rng):
    """Values and gradients must match the naive min-over-pairwise-dist form."""
    from usip_tpu.ops.geometry import nearest_neighbor

    src = jnp.asarray(rng.normal(size=(2, 6, 3)).astype(np.float32))
    dst = jnp.asarray(rng.normal(size=(2, 11, 3)).astype(np.float32))

    d, idx = nearest_neighbor(src, dst)
    ref = ops.pairwise_dist(src, dst, exact=True)
    np.testing.assert_allclose(np.asarray(d), np.asarray(jnp.min(ref, -1)),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.asarray(jnp.argmin(ref, -1)))

    def naive(s, t):
        return jnp.sum(jnp.min(ops.pairwise_dist(s, t, exact=True), -1) ** 2)

    def custom(s, t):
        return jnp.sum(nearest_neighbor(s, t)[0] ** 2)

    gs_ref, gt_ref = jax.grad(naive, argnums=(0, 1))(src, dst)
    gs, gt = jax.grad(custom, argnums=(0, 1))(src, dst)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gs_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_ref), atol=1e-5)


def test_nearest_neighbor_coincident_gradient(rng):
    """Zero (not nan) gradient when a src point coincides with its nearest dst."""
    from usip_tpu.ops.geometry import nearest_neighbor

    dst = jnp.asarray(rng.normal(size=(1, 5, 3)).astype(np.float32))
    src = dst[:, :2, :]  # exact coincidence
    g = jax.grad(lambda s: jnp.sum(nearest_neighbor(s, dst)[0]))(src)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


def test_fps_parallel_properties(rng):
    """Bucketed FPS (parallel=t): valid distinct indices per bucket, full
    coverage quality within a modest factor of exact FPS (PERFORMANCE.md
    multi-point lever)."""
    pts = rng.normal(size=(2, 256, 3)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    samples, idxs = ops.farthest_point_sampling(key, jnp.asarray(pts), 32,
                                                parallel=4)
    assert samples.shape == (2, 32, 3) and idxs.shape == (2, 32)
    idxs = np.asarray(idxs)
    for bb in range(2):
        assert len(set(idxs[bb].tolist())) == 32  # buckets are disjoint rows
        assert idxs[bb].min() >= 0 and idxs[bb].max() < 256
        # each chunk of 8 picks lives in its own row-bucket of 64
        for c in range(4):
            chunk = idxs[bb, c * 8:(c + 1) * 8]
            assert (chunk >= c * 64).all() and (chunk < (c + 1) * 64).all()
    np.testing.assert_allclose(np.asarray(samples),
                               pts[np.arange(2)[:, None], idxs])

    def cov(nodes, cloud):
        d = np.linalg.norm(cloud[:, None] - nodes[None], axis=-1)
        return d.min(1).mean()

    exact, _ = ops.farthest_point_sampling(key, jnp.asarray(pts), 32)
    for bb in range(2):
        c_par = cov(np.asarray(samples)[bb], pts[bb])
        c_exact = cov(np.asarray(exact)[bb], pts[bb])
        assert c_par <= c_exact * 1.35, (c_par, c_exact)


def test_fps_parallel_requires_divisibility(rng):
    pts = jnp.asarray(rng.normal(size=(1, 100, 3)).astype(np.float32))
    with pytest.raises(ValueError, match="divide"):
        ops.farthest_point_sampling(jax.random.PRNGKey(0), pts, 16, parallel=3)


def test_sample_nodes_parallel_fallback_and_shape(rng):
    pts = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
    nodes = ops.sample_nodes(jax.random.PRNGKey(1), pts, 32,
                             subsample_ratio=4, parallel=4)
    assert nodes.shape == (2, 32, 3)
    # non-divisible factor falls back to exact FPS instead of raising
    nodes_fb = ops.sample_nodes(jax.random.PRNGKey(1), pts, 30,
                                subsample_ratio=4, parallel=4)
    assert nodes_fb.shape == (2, 30, 3)


def test_ball_query_approx_contract(rng):
    """approx_min_k backend: in-ball-only indices, correct cyclic padding, and
    near-complete recall of the ball population at small fill (the sampling-
    distribution argument for the 7.6x descriptor speedup, PERFORMANCE.md)."""
    pts = jnp.asarray(rng.normal(size=(2, 512, 3)).astype(np.float32))
    centers = pts[:, :16]
    res = ops.ball_query(pts, centers, 0.7, 8, key=jax.random.PRNGKey(0),
                         method="approx")
    assert res.idx.shape == (2, 16, 8)
    d = np.linalg.norm(np.asarray(pts)[np.arange(2)[:, None, None],
                                       np.asarray(res.idx)]
                       - np.asarray(centers)[:, :, None], axis=-1)
    valid = np.asarray(res.valid)
    assert (d[valid] <= 0.7 + 1e-5).all()
    # center point is always in its own ball -> no ball is empty
    assert (np.asarray(res.counts) >= 1).all()
    # padded slots replicate real in-ball points (cyclic padding contract)
    assert (d <= 0.7 + 1e-5).all()


def test_ball_query_auto_matches_exact_distribution(rng):
    """'auto' stays exact for natural-order priorities; with random priorities
    exact and approx draw in-ball subsets of comparable size."""
    pts = jnp.asarray(rng.normal(size=(1, 8192, 3)).astype(np.float32))
    centers = pts[:, :8]
    exact = ops.ball_query(pts, centers, 0.5, 16, key=jax.random.PRNGKey(1),
                           method="exact")
    approx = ops.ball_query(pts, centers, 0.5, 16, key=jax.random.PRNGKey(1),
                            method="approx")
    ce, ca = np.asarray(exact.counts), np.asarray(approx.counts)
    assert (np.abs(ce.astype(int) - ca.astype(int)) <= 2).all(), (ce, ca)
    # natural-order auto == exact bit-for-bit
    nat_auto = ops.ball_query(pts, centers, 0.5, 16, key=None, method="auto")
    nat_exact = ops.ball_query(pts, centers, 0.5, 16, key=None, method="exact")
    np.testing.assert_array_equal(np.asarray(nat_auto.idx),
                                  np.asarray(nat_exact.idx))


def test_knn_approx_contract(rng):
    """knn(method='approx'): valid indices, ascending distances, and high
    neighbor recall vs exact top-k (the opt-in knn-trunk speedup,
    detector.group_method)."""
    q = jnp.asarray(rng.normal(size=(2, 32, 3)).astype(np.float32))
    db = jnp.asarray(rng.normal(size=(2, 4096, 3)).astype(np.float32))
    d_e, idx_e = ops.knn(q, db, 16)
    d_a, idx_a = ops.knn(q, db, 16, method="approx")
    assert idx_a.shape == (2, 32, 16)
    da = np.asarray(d_a)
    assert (np.diff(da, axis=-1) >= -1e-6).all()  # ascending
    # recall of the true 16-NN set
    recall = np.mean([
        len(set(np.asarray(idx_a)[b, i]) & set(np.asarray(idx_e)[b, i])) / 16
        for b in range(2) for i in range(32)])
    assert recall >= 0.85, recall
    with pytest.raises(ValueError):
        ops.knn(q, db, 16, method="bogus")


def test_ball_query_bf16_compute(rng):
    """compute_dtype=bfloat16 (the descriptor default): contract holds with
    bf16-tolerance on the radius; natural-order priorities ignore the dtype
    (iota indices >= 256 would collide in bf16)."""
    import jax.numpy as jnp
    pts = jnp.asarray(rng.normal(size=(2, 512, 3)).astype(np.float32))
    centers = pts[:, :16]
    res = ops.ball_query(pts, centers, 0.7, 8, key=jax.random.PRNGKey(0),
                         compute_dtype=jnp.bfloat16)
    d = np.linalg.norm(np.asarray(pts)[np.arange(2)[:, None, None],
                                       np.asarray(res.idx)]
                       - np.asarray(centers)[:, :, None], axis=-1)
    assert (d <= 0.7 * 1.01).all()  # bf16 boundary tolerance
    assert (np.asarray(res.counts) >= 1).all()
    nat_bf = ops.ball_query(pts, centers, 0.7, 8, key=None,
                            compute_dtype=jnp.bfloat16)
    nat_32 = ops.ball_query(pts, centers, 0.7, 8, key=None)
    np.testing.assert_array_equal(np.asarray(nat_bf.idx),
                                  np.asarray(nat_32.idx))


# ------------------------------------------------------------- smallest_k ----

def test_smallest_k_twostage_bit_parity(rng):
    """Two-stage chunked exact top-k is bit-identical to lax.top_k — values,
    indices, AND tie order — on unique, tied, and +inf-laden rows."""
    from usip_tpu.ops.topk import smallest_k

    n, k = 4096, 7  # divisible by the chunk (512)
    uniq = rng.permutation(3 * n).reshape(3, n).astype(np.float32)
    tied = rng.integers(0, 5, size=(3, n)).astype(np.float32)  # heavy ties
    few = np.full((3, n), np.inf, dtype=np.float32)
    few[:, ::97] = rng.normal(size=(3, few[:, ::97].shape[1])).astype(np.float32)
    some_inf = np.where(rng.uniform(size=(3, n)) < 0.9, np.inf,
                        tied).astype(np.float32)  # rows with < k finite entries
    for scores in (uniq, tied, few, some_inf):
        s = jnp.asarray(scores)
        dv, di = smallest_k(s, k, method="direct")
        tv, ti = smallest_k(s, k, method="twostage")
        np.testing.assert_array_equal(np.asarray(dv), np.asarray(tv))
        np.testing.assert_array_equal(np.asarray(di), np.asarray(ti))


def test_smallest_k_twostage_k_over_chunk_raises(rng):
    """Forced twostage with k > chunk raises a clear error (the auto path
    already falls back to direct for such k)."""
    from usip_tpu.ops.topk import _CHUNK, smallest_k

    s = jnp.asarray(rng.normal(size=(2, 8192)).astype(np.float32))
    with pytest.raises(ValueError, match="twostage"):
        smallest_k(s, _CHUNK + 1, method="twostage")
    v, i = smallest_k(s, _CHUNK + 1, method="auto")  # falls back to direct
    dv, di = smallest_k(s, _CHUNK + 1, method="direct")
    np.testing.assert_array_equal(np.asarray(v), np.asarray(dv))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(di))


def test_smallest_k_twostage_padding(rng):
    """Non-chunk-divisible rows pad with +inf; parity must still hold and no
    out-of-range index may surface while finite entries remain."""
    from usip_tpu.ops.topk import smallest_k

    for n in (4097, 4600, 5000):
        scores = rng.integers(0, 9, size=(2, n)).astype(np.float32)
        s = jnp.asarray(scores)
        dv, di = smallest_k(s, 9, method="direct")
        tv, ti = smallest_k(s, 9, method="twostage")
        np.testing.assert_array_equal(np.asarray(dv), np.asarray(tv))
        np.testing.assert_array_equal(np.asarray(di), np.asarray(ti))
        assert (np.asarray(ti) < n).all()


def test_smallest_k_auto_dispatch(rng):
    """auto = direct below the length threshold, two-stage above; both match
    lax.top_k; k > chunk falls back to direct."""
    from usip_tpu.ops import topk
    from usip_tpu.ops.topk import smallest_k

    small = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
    big = jnp.asarray(rng.normal(size=(2, topk._TWOSTAGE_MIN_N)).astype(np.float32))
    for s in (small, big):
        av, ai = smallest_k(s, 5, method="auto")
        neg, di = jax.lax.top_k(-s, 5)
        np.testing.assert_array_equal(np.asarray(av), -np.asarray(neg))
        np.testing.assert_array_equal(np.asarray(ai), np.asarray(di))
    wide_k = smallest_k(big, topk._CHUNK + 1, method="auto")
    neg, di = jax.lax.top_k(-big, topk._CHUNK + 1)
    np.testing.assert_array_equal(np.asarray(wide_k[1]), np.asarray(di))
    with pytest.raises(ValueError):
        smallest_k(small, 3, method="bogus")


def test_ball_query_exact_uses_twostage_consistently(rng):
    """ball_query's exact path at two-stage scale returns the same result as a
    hand-rolled direct-top_k transcription of its contract."""
    pts = jnp.asarray(rng.normal(size=(1, 4096, 3)).astype(np.float32))
    centers = pts[:, :8]
    res = ops.ball_query(pts, centers, 0.9, 6, key=None, method="exact")
    sq = np.asarray(ops.pairwise_sqdist(centers, pts))
    scores = np.where(sq <= 0.81, np.arange(4096, dtype=np.float32)[None, None],
                      np.inf)
    ref_idx = np.argsort(scores, axis=-1, kind="stable")[..., :6]
    counts = np.minimum(np.isfinite(scores).sum(-1), 6)
    got = np.asarray(res.idx)
    for j in range(8):
        c = int(counts[0, j])
        np.testing.assert_array_equal(got[0, j, :c], ref_idx[0, j, :c])
        assert int(np.asarray(res.counts)[0, j]) == c
