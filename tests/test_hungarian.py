import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from multimodal_feature_learning_tpu.ops import batched_hungarian, hungarian


@pytest.mark.parametrize("n", [1, 2, 5, 10, 20])
def test_square_optimal_cost(n):
    rng = np.random.default_rng(n)
    for trial in range(5):
        cost = rng.normal(size=(n, n)).astype(np.float32) * 10
        col_to_row = np.asarray(hungarian(jnp.asarray(cost)))
        # valid permutation
        assert sorted(col_to_row.tolist()) == list(range(n))
        got = cost[col_to_row, np.arange(n)].sum()
        r, c = linear_sum_assignment(cost)
        expected = cost[r, c].sum()
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)


def test_rectangular_matches_scipy():
    """num_queries=20 rows, variable GT columns — the DVC matcher shape."""
    rng = np.random.default_rng(42)
    B, n_rows, n_cols = 4, 20, 10
    cost = rng.normal(size=(B, n_rows, n_cols)).astype(np.float32) * 5
    n_valid = np.array([10, 3, 1, 7])
    col_valid = np.arange(n_cols)[None] < n_valid[:, None]

    out = np.asarray(batched_hungarian(jnp.asarray(cost), jnp.asarray(col_valid)))
    for b in range(B):
        k = n_valid[b]
        r, c = linear_sum_assignment(cost[b, :, :k])
        expected = cost[b][r, c].sum()
        got_rows = out[b, :k]
        assert len(set(got_rows.tolist())) == k, "rows must be distinct"
        got = cost[b][got_rows, np.arange(k)].sum()
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)


def test_matcher_cost_ties():
    """Identical rows (common early in training) must still give a permutation."""
    cost = np.zeros((3, 8, 4), dtype=np.float32)
    col_valid = np.ones((3, 4), dtype=bool)
    out = np.asarray(batched_hungarian(jnp.asarray(cost), jnp.asarray(col_valid)))
    for b in range(3):
        assert len(set(out[b].tolist())) == 4
