"""Unrolled small-matrix Cholesky vs numpy reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from diffmpc_tpu.ops.smallchol import (
    cho_solve_small,
    cholesky_small,
    solve_psd_small,
)


@pytest.mark.parametrize("m", [1, 2, 3, 5, 8])
def test_cholesky_small_matches_numpy(m):
    rng = np.random.default_rng(m)
    B = 32
    L0 = rng.standard_normal((B, m, m))
    A = np.einsum("bij,bkj->bik", L0, L0) / m + 0.7 * np.eye(m)
    L = np.asarray(cholesky_small(jnp.asarray(A)))
    for b in range(B):
        np.testing.assert_allclose(L[b], np.linalg.cholesky(A[b]), atol=1e-10)


@pytest.mark.parametrize("m,k", [(1, 1), (3, 4), (6, 2), (8, 8)])
def test_cho_solve_small(m, k):
    rng = np.random.default_rng(m * 10 + k)
    B = 16
    L0 = rng.standard_normal((B, m, m))
    A = np.einsum("bij,bkj->bik", L0, L0) / m + 0.7 * np.eye(m)
    b = rng.standard_normal((B, m, k))
    L = cholesky_small(jnp.asarray(A))
    x = np.asarray(cho_solve_small(L, jnp.asarray(b)))
    for i in range(B):
        np.testing.assert_allclose(x[i], np.linalg.solve(A[i], b[i]), atol=1e-9)


def test_solve_psd_small_with_jitter():
    A = jnp.asarray([[[4.0]]])
    b = jnp.asarray([[[8.0]]])
    np.testing.assert_allclose(np.asarray(solve_psd_small(A, b)), 2.0)
    x = solve_psd_small(A, b, jitter=1.0)
    np.testing.assert_allclose(np.asarray(x), 8.0 / 5.0)
