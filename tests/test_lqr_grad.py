"""Gradient parity for the analytic KKT backward (SURVEY.md §4 core test).

Three independent oracles pin the sign/index conventions of
``lqr_fixed_point``'s custom_vjp (SURVEY.md §7 hard-part 1):

1. autodiff through the unrolled Riccati+rollout solver (unconstrained),
2. central finite differences of a scalar loss along random directions,
3. both repeated for the box-constrained (box-DDP) solve with active
   constraints, where the solver is iterated to its fixed point first.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmpc_tpu.ops import lqr_rollout, riccati_backward, trajectory_cost
from diffmpc_tpu.ops.lqr_step import LqrSpec, lqr_fixed_point, lqr_step
from oracles import random_lqr_problem

NEG_INF = -1e18
POS_INF = 1e18


def solve_unconstrained(x_init, C, c, F, f):
    res = riccati_backward(C, c, F, f, x_init.shape[-1])
    return lqr_rollout(x_init, F, f, res.K, res.k)


from functools import partial


@partial(jax.jit, static_argnames=("iters",))
def solve_box(x_init, C, c, F, f, lo, hi, iters=30):
    """Iterate lqr_step to the box-DDP fixed point."""
    spec = LqrSpec(n_state=x_init.shape[-1], constrained=True)
    T, B = C.shape[0], C.shape[1]
    m = C.shape[-1] - x_init.shape[-1]
    u = jnp.zeros((T, B, m), dtype=x_init.dtype)
    K0 = jnp.zeros((T, B, m, x_init.shape[-1]), dtype=x_init.dtype)
    x, _ = lqr_rollout(x_init, F, f, K0, u)

    def body(_, xu):
        x, u = xu
        out = lqr_step(spec, x_init, C, c, F, f, x, u, u_lower=lo, u_upper=hi)
        return out.xs, out.us

    x, u = jax.lax.fori_loop(0, iters, body, (x, u))
    return x, u


def loss_of(xs, us, wx, wu):
    return jnp.sum(xs * wx) + jnp.sum(us * wu)


@pytest.fixture(scope="module")
def unc_problem():
    rng = np.random.default_rng(10)
    T, B, n, m = 5, 3, 3, 2
    C, c, F, f, x_init = random_lqr_problem(rng, T, B, n, m)
    wx = rng.standard_normal((T, B, n))
    wu = rng.standard_normal((T, B, m))
    return tuple(map(jnp.asarray, (C, c, F, f, x_init, wx, wu)))


def analytic_loss_unc(x_init, C, c, F, f, wx, wu):
    spec = LqrSpec(n_state=x_init.shape[-1], constrained=False)
    xs, us = jax.lax.stop_gradient(solve_unconstrained(x_init, C, c, F, f))
    lo = jnp.full(us.shape, NEG_INF)
    hi = jnp.full(us.shape, POS_INF)
    x, u = lqr_fixed_point(spec, x_init, C, c, F, f, xs, us, lo, hi)
    return loss_of(x, u, wx, wu)


def test_kkt_backward_matches_autodiff_unconstrained(unc_problem):
    C, c, F, f, x_init, wx, wu = unc_problem

    def unrolled_loss(x_init, C, c, F, f):
        xs, us = solve_unconstrained(x_init, C, c, F, f)
        return loss_of(xs, us, wx, wu)

    g_auto = jax.grad(unrolled_loss, argnums=(0, 1, 2, 3, 4))(x_init, C, c, F, f)
    g_kkt = jax.grad(analytic_loss_unc, argnums=(0, 1, 2, 3, 4))(
        x_init, C, c, F, f, wx, wu
    )
    names = ["x_init", "C", "c", "F", "f"]
    for name, ga, gk in zip(names, g_auto, g_kkt):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(ga), atol=1e-6, rtol=1e-6, err_msg=name
        )


def _directional_fd(loss_fn, args, argnum, direction, h=1e-5):
    args_p = list(args)
    args_m = list(args)
    args_p[argnum] = args[argnum] + h * direction
    args_m[argnum] = args[argnum] - h * direction
    return (loss_fn(*args_p) - loss_fn(*args_m)) / (2 * h)


def test_kkt_backward_matches_fd_unconstrained(unc_problem):
    C, c, F, f, x_init, wx, wu = unc_problem

    def fd_loss(x_init, C, c, F, f):
        xs, us = solve_unconstrained(x_init, C, c, F, f)
        return float(loss_of(xs, us, wx, wu))

    g_kkt = jax.grad(analytic_loss_unc, argnums=(0, 1, 2, 3, 4))(
        x_init, C, c, F, f, wx, wu
    )
    rng = np.random.default_rng(11)
    args = (x_init, C, c, F, f)
    for argnum, g in enumerate(g_kkt):
        v = jnp.asarray(rng.standard_normal(args[argnum].shape))
        if argnum == 1:  # keep C symmetric under perturbation
            v = 0.5 * (v + jnp.swapaxes(v, -1, -2))
        fd = _directional_fd(fd_loss, args, argnum, v)
        an = float(jnp.sum(g * v))
        np.testing.assert_allclose(an, fd, rtol=1e-5, atol=1e-7, err_msg=str(argnum))


@pytest.mark.parametrize("seed", range(6))
def test_kkt_backward_shape_fuzz_unconstrained(seed):
    """Shape fuzz for the core math: the analytic KKT backward must equal
    autodiff-through-the-unrolled-solver for random (T, B, n, m), including
    the edge layouts the fixed-shape tests never hit (T=1, n=1, m > n,
    B=1). Exact oracle, f64, so tolerances stay tight."""
    rng = np.random.default_rng(400 + seed)
    T = int(rng.integers(1, 9))
    B = int(rng.integers(1, 5))
    n = int(rng.integers(1, 6))
    m = int(rng.integers(1, 5))
    C, c, F, f, x_init = map(
        jnp.asarray, random_lqr_problem(rng, T, B, n, m)
    )
    wx = jnp.asarray(rng.standard_normal((T, B, n)))
    wu = jnp.asarray(rng.standard_normal((T, B, m)))

    def unrolled_loss(x_init, C, c, F, f):
        xs, us = solve_unconstrained(x_init, C, c, F, f)
        return loss_of(xs, us, wx, wu)

    g_auto = jax.grad(unrolled_loss, argnums=(0, 1, 2, 3, 4))(x_init, C, c, F, f)
    g_kkt = jax.grad(analytic_loss_unc, argnums=(0, 1, 2, 3, 4))(
        x_init, C, c, F, f, wx, wu
    )
    for name, ga, gk in zip(["x_init", "C", "c", "F", "f"], g_auto, g_kkt):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(ga), atol=1e-6, rtol=1e-6,
            err_msg=f"seed={seed} T={T} B={B} n={n} m={m} arg={name}",
        )


@pytest.mark.parametrize("seed", range(3))
def test_kkt_backward_shape_fuzz_box_fd(seed):
    """Box-constrained shape fuzz: analytic KKT backward (with tight-dim
    freezing) vs central finite differences at random shapes with active
    constraints."""
    rng = np.random.default_rng(500 + seed)
    T = int(rng.integers(2, 7))
    B = int(rng.integers(1, 4))
    n = int(rng.integers(2, 5))
    m = int(rng.integers(1, 4))
    C, c, F, f, x_init = map(
        jnp.asarray, random_lqr_problem(rng, T, B, n, m)
    )
    lo = jnp.full((T, B, m), -0.4)
    hi = jnp.full((T, B, m), 0.4)
    wx = jnp.asarray(rng.standard_normal((T, B, n)))
    wu = jnp.asarray(rng.standard_normal((T, B, m)))
    xs, us = solve_box(x_init, C, c, F, f, lo, hi)
    assert int(jnp.sum((us >= hi - 1e-8) | (us <= lo + 1e-8))) > 0
    spec = LqrSpec(n_state=n, constrained=True, tight_eps=1e-6)

    def analytic_loss(x_init, C, c, F, f):
        xs_, us_ = jax.lax.stop_gradient(solve_box(x_init, C, c, F, f, lo, hi))
        x, u = lqr_fixed_point(spec, x_init, C, c, F, f, xs_, us_, lo, hi)
        return loss_of(x, u, wx, wu)

    def fd_loss(x_init, C, c, F, f):
        xs_, us_ = solve_box(x_init, C, c, F, f, lo, hi)
        return float(loss_of(xs_, us_, wx, wu))

    g_kkt = jax.grad(analytic_loss, argnums=(0, 1, 2, 3, 4))(x_init, C, c, F, f)
    args = (x_init, C, c, F, f)
    for argnum, g in enumerate(g_kkt):
        v = jnp.asarray(rng.standard_normal(args[argnum].shape))
        if argnum == 1:
            v = 0.5 * (v + jnp.swapaxes(v, -1, -2))
        fd = _directional_fd(fd_loss, args, argnum, v, h=1e-5)
        an = float(jnp.sum(g * v))
        np.testing.assert_allclose(
            an, fd, rtol=2e-4, atol=1e-6,
            err_msg=f"seed={seed} T={T} B={B} n={n} m={m} arg={argnum}",
        )


@pytest.fixture(scope="module")
def box_problem():
    rng = np.random.default_rng(12)
    T, B, n, m = 5, 3, 3, 2
    C, c, F, f, x_init = random_lqr_problem(rng, T, B, n, m)
    # bounds tight enough that some constraints are active
    lo = -0.4 * np.ones((T, B, m))
    hi = 0.4 * np.ones((T, B, m))
    wx = rng.standard_normal((T, B, n))
    wu = rng.standard_normal((T, B, m))
    return tuple(map(jnp.asarray, (C, c, F, f, x_init, lo, hi, wx, wu)))


def test_box_solution_has_active_constraints(box_problem):
    C, c, F, f, x_init, lo, hi, wx, wu = box_problem
    xs, us = solve_box(x_init, C, c, F, f, lo, hi)
    n_active = int(jnp.sum((us >= hi - 1e-8) | (us <= lo + 1e-8)))
    assert n_active > 0, "fixture should exercise active constraints"
    assert bool(jnp.all(us <= hi + 1e-9)) and bool(jnp.all(us >= lo - 1e-9))


def test_box_fixed_point_stationarity(box_problem):
    """KKT check at the box-DDP fixed point: projected gradient of the
    condensed objective w.r.t. the stacked controls vanishes."""
    C, c, F, f, x_init, lo, hi, wx, wu = box_problem
    xs, us = solve_box(x_init, C, c, F, f, lo, hi)

    def total_cost(us_flat):
        us_ = us_flat.reshape(us.shape)

        def step(x, inp):
            Ft, ft, ut = inp
            tau = jnp.concatenate([x, ut], axis=-1)
            return jnp.einsum("bij,bj->bi", Ft, tau) + ft, x

        _, xs_ = jax.lax.scan(step, x_init, (F, f, us_))
        return jnp.sum(trajectory_cost(C, c, xs_, us_))

    g = jax.grad(total_cost)(us.ravel()).reshape(us.shape)
    at_lo = us <= lo + 1e-6
    at_hi = us >= hi - 1e-6
    free = ~(at_lo | at_hi)
    np.testing.assert_allclose(np.asarray(jnp.where(free, g, 0.0)), 0.0, atol=1e-5)
    assert bool(jnp.all(jnp.where(at_lo, g >= -1e-6, True)))
    assert bool(jnp.all(jnp.where(at_hi, g <= 1e-6, True)))


def test_kkt_backward_matches_fd_box(box_problem):
    C, c, F, f, x_init, lo, hi, wx, wu = box_problem
    spec = LqrSpec(n_state=x_init.shape[-1], constrained=True, tight_eps=1e-6)

    def analytic_loss(x_init, C, c, F, f):
        xs, us = jax.lax.stop_gradient(solve_box(x_init, C, c, F, f, lo, hi))
        x, u = lqr_fixed_point(spec, x_init, C, c, F, f, xs, us, lo, hi)
        return loss_of(x, u, wx, wu)

    def fd_loss(x_init, C, c, F, f):
        xs, us = solve_box(x_init, C, c, F, f, lo, hi)
        return float(loss_of(xs, us, wx, wu))

    g_kkt = jax.grad(analytic_loss, argnums=(0, 1, 2, 3, 4))(x_init, C, c, F, f)
    rng = np.random.default_rng(13)
    args = (x_init, C, c, F, f)
    for argnum, g in enumerate(g_kkt):
        v = jnp.asarray(rng.standard_normal(args[argnum].shape))
        if argnum == 1:
            v = 0.5 * (v + jnp.swapaxes(v, -1, -2))
        fd = _directional_fd(fd_loss, args, argnum, v, h=1e-5)
        an = float(jnp.sum(g * v))
        np.testing.assert_allclose(an, fd, rtol=2e-4, atol=1e-6, err_msg=str(argnum))
