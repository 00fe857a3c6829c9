"""Edge-case robustness: degenerate horizons, wide control spaces, tiny
batches, larger systems vs the dense oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmpc_tpu import MPC, LinDx, MPCConfig, QuadCost, mpc_solve
from diffmpc_tpu.models import AffineDynamics
from oracles import dense_lqr_kkt, random_lqr_problem


def test_horizon_one():
    """T=1: a single-stage QP (dynamics unused)."""
    rng = np.random.default_rng(1000)
    T, B, n, m = 1, 4, 3, 2
    C, c, F, f, x_init = random_lqr_problem(rng, T, B, n, m)
    ctrl = MPC(n, m, T, lqr_iter=2, exit_unconverged=False)
    xs, us, objs = ctrl(jnp.asarray(x_init), QuadCost(C, c), LinDx(F, f))
    # optimal u minimizes 0.5 tau'C tau + c'tau at fixed x = x_init:
    # u* = -Cuu^-1 (Cux x + cu)
    for b in range(B):
        Cb, cb = C[0, b], c[0, b]
        u_star = np.linalg.solve(Cb[n:, n:], -(Cb[n:, :n] @ x_init[b] + cb[n:]))
        np.testing.assert_allclose(np.asarray(us[0, b]), u_star, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xs[0]), x_init, atol=1e-12)


def test_more_controls_than_states():
    """m > n (wide control space) against the dense KKT oracle."""
    rng = np.random.default_rng(1001)
    T, B, n, m = 6, 4, 2, 4
    C, c, F, f, x_init = random_lqr_problem(rng, T, B, n, m)
    ctrl = MPC(n, m, T, lqr_iter=3, exit_unconverged=False)
    xs, us, _ = ctrl(jnp.asarray(x_init), QuadCost(C, c), LinDx(F, f))
    xs_o, us_o, _ = dense_lqr_kkt(C, c, F, f, x_init)
    np.testing.assert_allclose(np.asarray(us), us_o, atol=1e-6)


def test_batch_of_one():
    rng = np.random.default_rng(1002)
    T, B, n, m = 5, 1, 3, 1
    C, c, F, f, x_init = random_lqr_problem(rng, T, B, n, m)
    ctrl = MPC(n, m, T, lqr_iter=3, exit_unconverged=False)
    xs, us, objs = ctrl(jnp.asarray(x_init), QuadCost(C, c), LinDx(F, f))
    xs_o, us_o, _ = dense_lqr_kkt(C, c, F, f, x_init)
    np.testing.assert_allclose(np.asarray(us), us_o, atol=1e-6)
    assert objs.shape == (1,)


def test_larger_system_n6_m3():
    """n+m = 9 (just past the tiny-matrix design center) stays correct."""
    rng = np.random.default_rng(1003)
    T, B, n, m = 8, 4, 6, 3
    C, c, F, f, x_init = random_lqr_problem(rng, T, B, n, m)
    ctrl = MPC(n, m, T, lqr_iter=3, exit_unconverged=False)
    xs, us, _ = ctrl(jnp.asarray(x_init), QuadCost(C, c), LinDx(F, f))
    xs_o, us_o, _ = dense_lqr_kkt(C, c, F, f, x_init)
    np.testing.assert_allclose(np.asarray(us), us_o, atol=1e-5)


def test_affine_dynamics_through_mpc_matches_lindx():
    """AffineDynamics module path (nonlinear machinery on a linear model)
    must equal the LinDx fast path."""
    rng = np.random.default_rng(1004)
    T, B, n, m = 6, 8, 3, 2
    C, c, _, _, x_init = random_lqr_problem(rng, T, B, n, m)
    A = rng.standard_normal((n, n)) * 0.4
    Bm = rng.standard_normal((n, m)) * 0.4
    cv = rng.standard_normal(n) * 0.1
    dyn = AffineDynamics(jnp.asarray(A), jnp.asarray(Bm), jnp.asarray(cv))
    F = np.broadcast_to(np.concatenate([A, Bm], -1), (T, B, n, n + m))
    f = np.broadcast_to(cv, (T, B, n))

    cfg = dict(lqr_iter=8, eps=0.0, not_improved_lim=10**6, exit_unconverged=False,
               detach_unconverged=False)
    lin_sol = MPC(n, m, T, **cfg)(jnp.asarray(x_init), QuadCost(C, c), LinDx(jnp.asarray(F), jnp.asarray(f)))
    mod_sol = MPC(n, m, T, **cfg)(jnp.asarray(x_init), QuadCost(C, c), dyn)
    np.testing.assert_allclose(
        np.asarray(mod_sol[1]), np.asarray(lin_sol[1]), atol=1e-5
    )


def test_zero_cost_noop():
    """All-zero linear term with PSD cost and stable dynamics: solution is
    near-zero controls from zero state."""
    T, B, n, m = 5, 3, 2, 1
    nm = n + m
    C = np.broadcast_to(np.eye(nm), (T, B, nm, nm))
    c = np.zeros((T, B, nm))
    F = np.broadcast_to(np.concatenate([0.5 * np.eye(n), np.ones((n, m))], -1), (T, B, n, nm))
    f = np.zeros((T, B, n))
    x_init = np.zeros((B, n))
    ctrl = MPC(n, m, T, lqr_iter=2, exit_unconverged=False)
    xs, us, objs = ctrl(jnp.asarray(x_init), QuadCost(C, c), LinDx(F, f))
    np.testing.assert_allclose(np.asarray(us), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(objs), 0.0, atol=1e-10)


def test_friendly_shape_errors():
    config_args = dict(n_state=3, n_ctrl=1, T=5, exit_unconverged=False)
    ctrl = MPC(**config_args)
    C = jnp.eye(4)
    c = jnp.zeros(4)
    F = jnp.zeros((3, 4))
    with pytest.raises(ValueError, match="x_init must be"):
        ctrl(jnp.zeros((2, 5)), QuadCost(C, c), LinDx(F))
    with pytest.raises(ValueError, match="QuadCost.C trailing"):
        ctrl(jnp.zeros((2, 3)), QuadCost(jnp.eye(5), jnp.zeros(5)), LinDx(F))
    with pytest.raises(ValueError, match="LinDx.F trailing"):
        ctrl(jnp.zeros((2, 3)), QuadCost(C, c), LinDx(jnp.zeros((3, 5))))
    with pytest.raises(ValueError, match="both set or both None"):
        MPC(u_lower=-1.0, **config_args)(jnp.zeros((2, 3)), QuadCost(C, c), LinDx(F))
