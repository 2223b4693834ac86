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
