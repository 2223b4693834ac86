"""SOM / potential-field tests."""

import jax.numpy as jnp
import numpy as np

from usip_tpu.ops.som import SOMTrainer, potential_field_init


def test_potential_field_spreads_nodes():
    nodes = potential_field_init(16, 2, iterations=60)
    assert nodes.shape == (16, 2)
    # nodes stay in a bounded region and are well separated
    assert np.abs(nodes).max() < 2.0
    d = np.linalg.norm(nodes[:, None] - nodes[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 0.05
    # deterministic (seeded like the reference)
    nodes2 = potential_field_init(16, 2, iterations=60)
    np.testing.assert_array_equal(nodes, nodes2)


def test_som_nodes_cover_data(rng):
    # two gaussian blobs; SOM nodes should end up near the data
    pts = np.concatenate([
        rng.normal(loc=-0.5, scale=0.1, size=(200, 3)),
        rng.normal(loc=0.5, scale=0.1, size=(200, 3)),
    ]).astype(np.float32)[None]  # (1, 400, 3)
    trainer = SOMTrainer(rows=4, cols=4, max_iteration=30)
    nodes = np.asarray(trainer.optimize(jnp.asarray(pts)))[0]
    assert nodes.shape == (16, 3)
    # mean distance from each data point to its nearest node is small
    d = np.linalg.norm(pts[0][:, None] - nodes[None], axis=-1).min(1)
    assert d.mean() < 0.35
    # improved substantially over the initial placement
    init = trainer._init_nodes
    d0 = np.linalg.norm(pts[0][:, None] - np.asarray(init)[None], axis=-1).min(1)
    assert d.mean() < d0.mean()
