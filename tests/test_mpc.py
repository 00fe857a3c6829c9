"""MPC orchestration tests (SURVEY.md §4: LQR-through-MPC, box-DDP, iLQR).

Covers the reference's ``MPC.forward`` semantics: shape expansion, LinDx /
QuadCost fast paths, box constraints, nonlinear iLQR on the pendulum, slew
rate penalty, unconverged handling, and gradient flow into dynamics params
(driver eval configs 1-3)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmpc_tpu import MPC, GradMethods, LinDx, MPCConfig, QuadCost, mpc_solve
from diffmpc_tpu.models import PendulumDx
from oracles import dense_lqr_kkt, random_lqr_problem


def test_mpc_lin_quad_matches_kkt_oracle():
    """Eval config 1: unconstrained LinDx+QuadCost through the full MPC path
    must equal the dense KKT solve in one iteration."""
    rng = np.random.default_rng(20)
    T, B, n, m = 10, 32, 3, 2
    C, c, F, f, x_init = random_lqr_problem(rng, T, B, n, m)
    ctrl = MPC(n, m, T, lqr_iter=5, exit_unconverged=False, eps=1e-10)
    xs, us, objs = ctrl(jnp.asarray(x_init), QuadCost(C, c), LinDx(F, f))
    xs_o, us_o, _ = dense_lqr_kkt(C, c, F, f, x_init)
    np.testing.assert_allclose(np.asarray(xs), xs_o, atol=1e-6)
    np.testing.assert_allclose(np.asarray(us), us_o, atol=1e-6)
    assert objs.shape == (B,)


def test_mpc_unbatched_cost_and_time_invariant_shapes():
    """Reference shape flexibility: C (nm, nm), c (nm,), F (n, nm)."""
    rng = np.random.default_rng(21)
    T, B, n, m = 6, 4, 3, 2
    nm = n + m
    L = rng.standard_normal((nm, nm))
    C1 = L @ L.T / nm + 0.5 * np.eye(nm)
    c1 = rng.standard_normal(nm)
    F1 = rng.standard_normal((n, nm)) * 0.3
    x_init = jnp.asarray(rng.standard_normal((B, n)))

    ctrl = MPC(n, m, T, lqr_iter=3, exit_unconverged=False)
    xs, us, objs = ctrl(x_init, QuadCost(jnp.asarray(C1), jnp.asarray(c1)), LinDx(jnp.asarray(F1)))

    C = np.broadcast_to(C1, (T, B, nm, nm))
    c = np.broadcast_to(c1, (T, B, nm))
    F = np.broadcast_to(F1, (T, B, n, nm))
    f = np.zeros((T, B, n))
    xs_o, us_o, _ = dense_lqr_kkt(C, c, F, f, np.asarray(x_init))
    np.testing.assert_allclose(np.asarray(us), us_o, atol=1e-6)


def test_mpc_box_constrained_projected_stationarity():
    """Eval config 2 shape (box-DDP n=4, m=2, T=20): KKT conditions of the
    condensed problem hold at the returned solution."""
    rng = np.random.default_rng(22)
    T, B, n, m = 20, 16, 4, 2
    C, c, F, f, x_init = random_lqr_problem(rng, T, B, n, m)
    lo, hi = -0.5, 0.5
    ctrl = MPC(
        n, m, T, u_lower=lo, u_upper=hi, lqr_iter=40, exit_unconverged=False,
        eps=1e-12, not_improved_lim=1000,
    )
    xs, us, objs = ctrl(jnp.asarray(x_init), QuadCost(C, c), LinDx(F, f))
    us = np.asarray(us)
    assert us.max() <= hi + 1e-9 and us.min() >= lo - 1e-9
    assert (np.abs(us) > hi - 1e-6).sum() > 0, "want active constraints"

    def total_cost(us_flat):
        us_ = us_flat.reshape(T, B, m)

        def step(x, inp):
            Ft, ft, ut = inp
            tau = jnp.concatenate([x, ut], axis=-1)
            return jnp.einsum("bij,bj->bi", Ft, tau) + ft, x

        _, xs_ = jax.lax.scan(step, jnp.asarray(x_init), (jnp.asarray(F), jnp.asarray(f), us_))
        tau = jnp.concatenate([xs_, us_], axis=-1)
        return jnp.sum(
            0.5 * jnp.einsum("tbi,tbij,tbj->", tau, jnp.asarray(C), tau)
            + jnp.einsum("tbi,tbi->", jnp.asarray(c), tau)
        )

    g = np.asarray(jax.grad(total_cost)(jnp.asarray(us.ravel()))).reshape(T, B, m)
    at_lo = us <= lo + 1e-6
    at_hi = us >= hi - 1e-6
    free = ~(at_lo | at_hi)
    np.testing.assert_allclose(g[free], 0.0, atol=5e-5)
    assert (g[at_lo] >= -1e-5).all() and (g[at_hi] <= 1e-5).all()


def swingup_problem(B=4, T=20, dtype=jnp.float64, th0_frac=1.0):
    dx = PendulumDx.default(dtype)
    q, p = dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)
    th0 = np.pi * th0_frac * np.ones(B)
    x_init = jnp.asarray(
        np.stack([np.cos(th0), np.sin(th0), np.zeros(B)], axis=-1), dtype
    )
    return dx, cost, x_init


def test_pendulum_ilqr_decreases_cost():
    """Eval config 3 shape: nonlinear iLQR on the pendulum from hanging."""
    B, T = 8, 20
    dx, cost, x_init = swingup_problem(B, T)
    ctrl = MPC(
        3, 1, T, u_lower=-2.0, u_upper=2.0, lqr_iter=30,
        exit_unconverged=False, detach_unconverged=False, eps=1e-6,
    )
    sol = ctrl.solve(x_init, cost, dx)
    # cost of doing nothing
    zero_u = jnp.zeros((T, B, 1), x_init.dtype)

    def roll(x, ut):
        return dx.forward(x, ut), x

    _, xs0 = jax.lax.scan(roll, x_init, zero_u)
    tau0 = jnp.concatenate([xs0, zero_u], axis=-1)
    C, cvec = cost
    obj0 = jnp.sum(
        0.5 * jnp.einsum("tbi,ij,tbj->b", tau0, C, tau0)
        + jnp.einsum("i,tbi->b", cvec, tau0)
    )
    assert bool(jnp.all(sol.objs < obj0)), (sol.objs, obj0)
    assert bool(jnp.all(jnp.isfinite(sol.xs))) and bool(jnp.all(jnp.isfinite(sol.us)))
    assert bool(jnp.all(jnp.abs(sol.us) <= 2.0 + 1e-9))


def test_grad_methods_agree_on_pendulum():
    B, T = 4, 8
    dx, cost, x_init = swingup_problem(B, T)
    sols = {}
    for gm in [GradMethods.AUTO_DIFF, GradMethods.ANALYTIC, GradMethods.FINITE_DIFF]:
        ctrl = MPC(
            3, 1, T, u_lower=-2.0, u_upper=2.0, lqr_iter=10,
            grad_method=gm, exit_unconverged=False, eps=1e-9,
        )
        sols[gm] = ctrl.solve(x_init, cost, dx)
    u_ad = np.asarray(sols[GradMethods.AUTO_DIFF].us)
    np.testing.assert_allclose(np.asarray(sols[GradMethods.ANALYTIC].us), u_ad, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(sols[GradMethods.FINITE_DIFF].us), u_ad, atol=1e-4
    )


def test_analytic_check_mode_runs():
    B, T = 2, 5
    dx, cost, x_init = swingup_problem(B, T)
    ctrl = MPC(
        3, 1, T, u_lower=-2.0, u_upper=2.0, lqr_iter=3,
        grad_method=GradMethods.ANALYTIC_CHECK, exit_unconverged=False,
    )
    ctrl.solve(x_init, cost, dx)  # must not raise


def test_nonquadratic_cost_callable():
    """Callable cost module path: quadraticized per iteration (ref
    ``approximate_cost``)."""
    B, T = 4, 10
    dx, _, _ = swingup_problem(B, T)
    # start slightly off the hanging equilibrium: at exactly theta = pi the
    # swing-up problem has a first-order saddle (k = 0) and iLQR only escapes
    # through numerical symmetry breaking
    th0 = np.pi * (0.55 + 0.08 * np.arange(B))
    x_init = jnp.asarray(
        np.stack([np.cos(th0), np.sin(th0), np.zeros(B)], axis=-1), jnp.float64
    )
    q = jnp.asarray([1.0, 1.0, 0.1, 0.001], jnp.float64)
    goal = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float64)

    def cost_fn(tau):
        d = tau - goal
        return 0.5 * jnp.sum(q * d * d) + 0.01 * jnp.sum(jnp.cosh(tau[3:]) - 1.0)

    ctrl = MPC(
        3, 1, T, u_lower=-2.0, u_upper=2.0, lqr_iter=15,
        exit_unconverged=False, eps=1e-8,
    )
    sol = ctrl.solve(x_init, cost_fn, dx)
    assert bool(jnp.all(jnp.isfinite(sol.objs)))
    # per-element do-nothing baseline (holding the initial state for T steps
    # costs at least T * cost(x_0, 0) only at an equilibrium; roll it out)
    zero_u = jnp.zeros((T, B, 1), x_init.dtype)

    def roll(x, ut):
        return dx.forward(x, ut), x

    _, xs0 = jax.lax.scan(roll, x_init, zero_u)
    tau0 = jnp.concatenate([xs0, zero_u], axis=-1)
    obj0 = jnp.sum(jax.vmap(jax.vmap(cost_fn))(tau0), axis=0)
    assert bool(jnp.all(sol.objs < obj0)), (sol.objs, obj0)


def test_slew_rate_penalty_reduces_slew():
    B, T = 4, 15
    dx, cost, x_init = swingup_problem(B, T, th0_frac=0.6)
    base = MPC(3, 1, T, u_lower=-2.0, u_upper=2.0, lqr_iter=20, exit_unconverged=False)
    slow = MPC(
        3, 1, T, u_lower=-2.0, u_upper=2.0, lqr_iter=20,
        exit_unconverged=False, slew_rate_penalty=5.0,
    )
    u_base = base.solve(x_init, cost, dx).us
    u_slow = slow.solve(x_init, cost, dx).us
    slew = lambda u: float(jnp.mean(jnp.abs(jnp.diff(u, axis=0))))
    assert slew(u_slow) < slew(u_base)
    assert u_slow.shape == u_base.shape


def test_exit_unconverged_raises():
    rng = np.random.default_rng(23)
    T, B, n, m = 5, 3, 3, 2
    C, c, F, f, x_init = random_lqr_problem(rng, T, B, n, m)
    ctrl = MPC(n, m, T, lqr_iter=1, eps=-1.0, exit_unconverged=True)
    with pytest.raises(RuntimeError, match="did not converge"):
        ctrl(jnp.asarray(x_init), QuadCost(C, c), LinDx(F, f))


def test_gradients_flow_to_dynamics_params():
    """The capability the repo exists for: d loss / d (g, m, l) through the
    MPC fixed point via the analytic KKT backward, vs finite differences."""
    B, T = 3, 10
    dx, cost, x_init = swingup_problem(B, T, th0_frac=0.7)
    config = MPCConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=12, eps=0.0,
        not_improved_lim=10**6, detach_unconverged=False,
        exit_unconverged=False, dtype=jnp.float64,
    )

    @jax.jit
    def loss(params):
        sol = mpc_solve(
            config, x_init, cost, dx.replace(params=params),
            u_lower=-2.0, u_upper=2.0,
        )
        return jnp.sum(sol.us**2) + jnp.sum(sol.xs[-1] ** 2)

    params = dx.params
    g = jax.grad(loss)(params)
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.max(jnp.abs(g))) > 0

    rng = np.random.default_rng(24)
    v = jnp.asarray(rng.standard_normal(params.shape))
    h = 1e-6
    fd = (float(loss(params + h * v)) - float(loss(params - h * v))) / (2 * h)
    an = float(jnp.sum(g * v))
    np.testing.assert_allclose(an, fd, rtol=5e-3, atol=1e-8)
