"""Control-sequence parity against golden fixtures (BASELINE.md row
"Control-sequence parity <= 1e-4").

The reference binary is absent in this environment (SURVEY.md §0), so the
goldens are generated from the independent dense-KKT f64 oracle (for LQR)
and an independent f64 numpy implementation of the published box-DDP
recursion (for the constrained case) — written to
``tests/golden/*.npz`` on first run and committed, then asserted against on
every subsequent run. Any solver change that drifts a control sequence by
more than 1e-4 fails here.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmpc_tpu import MPC, MPCConfig, QuadCost, LinDx, mpc_solve
from diffmpc_tpu.models import PendulumDx
from oracles import dense_lqr_kkt, random_lqr_problem

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _golden(name, compute):
    path = os.path.join(GOLDEN_DIR, name + ".npz")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez(path, **compute())
    return dict(np.load(path))


def test_unconstrained_lqr_parity_vs_oracle_golden():
    """Eval config 1 (n=3, m=2, T=10, B=32): solver f32 controls vs the
    dense-KKT f64 oracle, 1e-4."""
    rng = np.random.default_rng(1234)
    T, B, n, m = 10, 32, 3, 2
    C, c, F, f, x_init = random_lqr_problem(rng, T, B, n, m)

    g = _golden(
        "lqr_unconstrained_n3m2T10B32",
        lambda: dict(us=dense_lqr_kkt(C, c, F, f, x_init)[1]),
    )
    ctrl = MPC(n, m, T, lqr_iter=4, exit_unconverged=False)
    as32 = lambda a: jnp.asarray(a, jnp.float32)
    _, us, _ = ctrl(as32(x_init), QuadCost(as32(C), as32(c)), LinDx(as32(F), as32(f)))
    np.testing.assert_allclose(np.asarray(us), g["us"], atol=1e-4)


def _boxddp_oracle_f64(C, c, F, f, x_init, lo, hi, iters=60):
    """Independent f64 numpy box-DDP: delta-formulation Riccati with the
    closed-form 1-D box QP (m=1) or projected coordinate descent (m>1),
    alpha=1 rollout with clamping, iterated to the fixed point."""
    T, B, nm = c.shape
    n = x_init.shape[-1]
    m = nm - n
    assert m == 1, "oracle written for m=1 fixtures"
    x = np.zeros((T, B, n))
    u = np.zeros((T, B, m))
    # initial rollout with zero controls
    x[0] = x_init
    for t in range(T - 1):
        tau = np.concatenate([x[t], u[t]], -1)
        x[t + 1] = np.einsum("bij,bj->bi", F[t], tau) + f[t]

    def total_cost(x, u):
        tau = np.concatenate([x, u], -1)
        return (
            0.5 * np.einsum("tbi,tbij,tbj->b", tau, C, tau)
            + np.einsum("tbi,tbi->b", c, tau)
        )

    best = total_cost(x, u)
    for _ in range(iters):
        tau_hat = np.concatenate([x, u], -1)
        c_delta = c + np.einsum("tbij,tbj->tbi", C, tau_hat)
        V = np.zeros((B, n, n))
        v = np.zeros((B, n))
        K = np.zeros((T, B, m, n))
        kff = np.zeros((T, B, m))
        for t in range(T - 1, -1, -1):
            Ft = F[t]
            Q = C[t] + np.einsum("bki,bkl,blj->bij", Ft, V, Ft)
            q = c_delta[t] + np.einsum("bki,bk->bi", Ft, v)
            h = Q[:, n, n] + 1e-9
            qu = q[:, n]
            kk = np.clip(-qu / h, lo - u[t, :, 0], hi - u[t, :, 0])
            g = h * kk + qu
            clamped = ((kk <= lo - u[t, :, 0] + 1e-9) & (g > 0)) | (
                (kk >= hi - u[t, :, 0] - 1e-9) & (g < 0)
            )
            kff[t, :, 0] = kk
            K[t, :, 0, :] = np.where(clamped[:, None], 0.0, -Q[:, n, :n] / h[:, None])
            Km = K[t]
            Qxx, Qxu, Qux, Quu = Q[:, :n, :n], Q[:, :n, n:], Q[:, n:, :n], Q[:, n:, n:]
            V = (
                Qxx
                + np.einsum("bij,bjk->bik", Qxu, Km)
                + np.einsum("bji,bjk->bik", Km, Qux)
                + np.einsum("bri,brs,bsj->bij", Km, Quu, Km)
            )
            V = 0.5 * (V + V.transpose(0, 2, 1))
            v = (
                q[:, :n]
                + np.einsum("bij,bj->bi", Qxu, kff[t])
                + np.einsum("bji,bj->bi", Km, q[:, n:] + np.einsum("bij,bj->bi", Quu, kff[t]))
            )
        # alpha-ladder line search like the solver
        accepted_x, accepted_u = x, u
        best_new = best.copy()
        chosen = np.zeros(B, bool)
        for a_idx in range(10):
            alpha = 0.2**a_idx
            x_try = np.zeros_like(x)
            u_try = np.zeros_like(u)
            x_try[0] = x_init
            for t in range(T):
                du = alpha * kff[t] + np.einsum("bij,bj->bi", K[t], x_try[t] - x[t])
                u_try[t] = np.clip(u[t] + du, lo, hi)
                if t < T - 1:
                    tau = np.concatenate([x_try[t], u_try[t]], -1)
                    x_try[t + 1] = np.einsum("bij,bj->bi", F[t], tau) + f[t]
            obj = total_cost(x_try, u_try)
            improve = (obj < best_new) & ~chosen
            accepted_x = np.where(improve[None, :, None], x_try, accepted_x)
            accepted_u = np.where(improve[None, :, None], u_try, accepted_u)
            best_new = np.where(improve, obj, best_new)
            chosen |= improve
        x, u = accepted_x, accepted_u
        best = best_new
    return x, u


def test_box_ddp_parity_vs_independent_oracle_golden():
    """Eval config 2 shape (m=1 variant): box-DDP fixed point in f32 vs an
    independent f64 numpy implementation of the published recursion."""
    rng = np.random.default_rng(4321)
    T, B, n, m = 20, 16, 4, 1
    C, c, F, f, x_init = random_lqr_problem(rng, T, B, n, m)
    lo, hi = -0.6, 0.6

    g = _golden(
        "boxddp_n4m1T20B16",
        lambda: dict(us=_boxddp_oracle_f64(C, c, F, f, x_init, lo, hi)[1]),
    )
    ctrl = MPC(
        n, m, T, u_lower=lo, u_upper=hi, lqr_iter=60, exit_unconverged=False,
        eps=1e-12, not_improved_lim=10**6,
    )
    as32 = lambda a: jnp.asarray(a, jnp.float32)
    _, us, _ = ctrl(as32(x_init), QuadCost(as32(C), as32(c)), LinDx(as32(F), as32(f)))
    np.testing.assert_allclose(np.asarray(us), g["us"], atol=1e-4)


def _pendulum_golden_case():
    rng = np.random.default_rng(777)
    th = rng.uniform(-np.pi, np.pi, 16)
    x = np.stack([np.cos(th), np.sin(th), rng.uniform(-1, 1, 16)], -1)
    return PendulumDx.default(jnp.float64), x, 3, 1, 20, (-2.0, 2.0)


def _cartpole_golden_case():
    from diffmpc_tpu.models import CartpoleDx

    rng = np.random.default_rng(779)
    th = rng.uniform(-0.3, 0.3, 16)
    x = np.stack(
        [rng.uniform(-0.5, 0.5, 16), rng.uniform(-0.5, 0.5, 16),
         np.cos(th), np.sin(th), rng.uniform(-0.5, 0.5, 16)], -1,
    )
    return CartpoleDx.default(jnp.float64), x, 5, 1, 20, (-10.0, 10.0)


def _quadrotor_golden_case():
    from diffmpc_tpu.models import QuadrotorDx

    rng = np.random.default_rng(778)
    x = np.stack(
        [rng.uniform(-0.5, 0.5, 16), rng.uniform(-0.5, 0.5, 16),
         rng.uniform(-0.3, 0.3, 16), rng.uniform(-0.3, 0.3, 16),
         rng.uniform(-0.3, 0.3, 16), rng.uniform(-0.3, 0.3, 16)], -1,
    )
    return QuadrotorDx.default(jnp.float64), x, 6, 2, 20, (0.0, 5.0)


def _acrobot_golden_case():
    from diffmpc_tpu.models import AcrobotDx

    rng = np.random.default_rng(881)
    th1 = rng.uniform(-0.05, 0.05, 16)
    th2 = rng.uniform(-0.05, 0.05, 16)
    x = np.stack(
        [np.cos(th1), np.sin(th1), np.cos(th2), np.sin(th2),
         rng.uniform(-0.05, 0.05, 16), rng.uniform(-0.05, 0.05, 16)], -1,
    )
    return AcrobotDx.default(jnp.float64), x, 6, 1, 40, (-4.0, 4.0)


def _vehicle_golden_case():
    from diffmpc_tpu.models import VehicleDx

    rng = np.random.default_rng(882)
    x = np.stack(
        [np.zeros(16), rng.uniform(-1.0, 1.0, 16),
         rng.uniform(-0.3, 0.3, 16), rng.uniform(3.0, 7.0, 16)], -1,
    )
    # asymmetric mixed box: accel [-6, 3], steer [-0.5, 0.5]
    return (
        VehicleDx.default(jnp.float64), x, 4, 2, 20,
        (np.array([-6.0, -0.5]), np.array([3.0, 0.5])),
    )


GOLDEN_ENV_CASES = {
    "pendulum_T20B16_f64": _pendulum_golden_case,
    "cartpole_T20B16_f64": _cartpole_golden_case,
    "quadrotor_T20B16_f64": _quadrotor_golden_case,
    "acrobot_T40B16_f64": _acrobot_golden_case,
    "vehicle_T20B16_f64": _vehicle_golden_case,
}


@pytest.mark.parametrize("fixture", sorted(GOLDEN_ENV_CASES))
def test_env_solve_golden_regression(fixture):
    """Regression pins for the nonlinear env zoo: each env's canonical
    f64 solve (pendulum swing-up, cartpole balance, quadrotor hover
    recovery with the m=2 asymmetric box, acrobot balance with the
    configuration-dependent mass matrix) has its controls frozen as a
    golden (generated by this solver, f64, CPU) — catches unintended
    behavior drift across refactors/kernels. One parametrized protocol;
    the per-env rows differ only in dynamics, seed, x_init, T, bounds
    (fixture names and RNG streams predate the refactor — the committed
    goldens are unchanged)."""
    dx, x_np, n, m, T, (lo, hi) = GOLDEN_ENV_CASES[fixture]()
    q, p = dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)
    x_init = jnp.asarray(x_np, jnp.float64)
    config = MPCConfig(
        n_state=n, n_ctrl=m, T=T, lqr_iter=15, eps=0.0,
        not_improved_lim=10**6, exit_unconverged=False,
        detach_unconverged=False, dtype=jnp.float64,
    )
    sol = jax.jit(
        lambda x: mpc_solve(config, x, cost, dx, u_lower=lo, u_upper=hi)
    )(x_init)
    g = _golden(
        fixture,
        lambda: dict(us=np.asarray(sol.us), objs=np.asarray(sol.objs)),
    )
    np.testing.assert_allclose(np.asarray(sol.us), g["us"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(sol.objs), g["objs"], atol=1e-5)
