"""pnqp unit tests vs exact active-set enumeration (SURVEY.md §4, row 3)."""

import jax.numpy as jnp
import numpy as np
import pytest

from diffmpc_tpu.ops import pnqp
from oracles import boxqp_enumerate


def random_boxqp(rng, B, m, tight=1.0):
    L = rng.standard_normal((B, m, m))
    H = np.einsum("bij,bkj->bik", L, L) / m + 0.5 * np.eye(m)
    q = rng.standard_normal((B, m)) * 2.0
    lower = -tight * np.ones((B, m))
    upper = tight * np.ones((B, m))
    return H, q, lower, upper


@pytest.mark.parametrize("m,tight", [(2, 0.5), (3, 0.3), (3, 5.0), (4, 1.0), (1, 0.2)])
def test_pnqp_matches_enumeration(m, tight):
    rng = np.random.default_rng(m * 100 + int(tight * 10))
    B = 64
    H, q, lower, upper = random_boxqp(rng, B, m, tight)
    res = pnqp(jnp.asarray(H), jnp.asarray(q), jnp.asarray(lower), jnp.asarray(upper))
    x_o = boxqp_enumerate(H, q, lower, upper)
    np.testing.assert_allclose(np.asarray(res.x), x_o, atol=1e-6)


def test_pnqp_interior_matches_newton():
    """Loose bounds: solution is the unconstrained Newton point, all free."""
    rng = np.random.default_rng(7)
    B, m = 32, 3
    H, q, lower, upper = random_boxqp(rng, B, m, tight=100.0)
    res = pnqp(jnp.asarray(H), jnp.asarray(q), jnp.asarray(lower), jnp.asarray(upper))
    x_newton = np.stack([np.linalg.solve(H[b], -q[b]) for b in range(B)])
    np.testing.assert_allclose(np.asarray(res.x), x_newton, atol=1e-6)
    assert bool(jnp.all(res.free_mask))


def test_pnqp_free_mask_and_factor_consistency():
    """The returned Cholesky factor must solve the masked system: for free
    dims, H_ff x_f = -(q_f + H_fc x_c) — the property the LQR gain
    computation relies on when reusing the factor."""
    rng = np.random.default_rng(8)
    B, m = 48, 3
    H, q, lower, upper = random_boxqp(rng, B, m, tight=0.4)
    res = pnqp(jnp.asarray(H), jnp.asarray(q), jnp.asarray(lower), jnp.asarray(upper))
    x = np.asarray(res.x)
    free = np.asarray(res.free_mask)
    chol = np.asarray(res.chol_free)
    for b in range(B):
        Hm = chol[b] @ chol[b].T
        fm = free[b]
        # masked system has identity rows/cols at clamped dims (+ tiny reg)
        expect = H[b] * np.outer(fm, fm) + np.diag(~fm)
        np.testing.assert_allclose(Hm, expect, atol=1e-6)
        # KKT stationarity on free dims
        g = H[b] @ x[b] + q[b]
        np.testing.assert_allclose(g[fm], 0.0, atol=1e-5)


def test_pnqp_clamped_at_bounds():
    """With a strongly biased q, some dims must sit exactly on the bounds."""
    B, m = 16, 2
    H = np.tile(np.eye(m), (B, 1, 1))
    q = np.tile(np.array([10.0, -10.0]), (B, 1))
    lower = -np.ones((B, m))
    upper = np.ones((B, m))
    res = pnqp(jnp.asarray(H), jnp.asarray(q), jnp.asarray(lower), jnp.asarray(upper))
    np.testing.assert_allclose(np.asarray(res.x[:, 0]), -1.0)
    np.testing.assert_allclose(np.asarray(res.x[:, 1]), 1.0)
    assert not bool(jnp.any(res.free_mask))
