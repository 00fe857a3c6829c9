"""Fused line-search rollout kernel vs the XLA ladder (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmpc_tpu.models import PendulumDx
from diffmpc_tpu.ops.lqr import lqr_linesearch_rollout, lqr_rollout, riccati_backward
from diffmpc_tpu.ops.pallas.rollout import linesearch_rollout_pallas
from oracles import random_lqr_problem


def _setup_linear(seed, T, B, n, m):
    rng = np.random.default_rng(seed)
    C, c, F, f, x_init = random_lqr_problem(rng, T, B, n, m)
    as32 = lambda a: jnp.asarray(a, jnp.float32)
    return tuple(map(as32, (C, c, F, f, x_init)))


@pytest.mark.parametrize("constrained", [False, True])
def test_fused_linesearch_matches_xla_linear(constrained):
    T, B, n, m = 6, 48, 3, 2
    C, c, F, f, x_init = _setup_linear(90 + constrained, T, B, n, m)
    u_hat = jnp.zeros((T, B, m), jnp.float32)
    x_hat, _ = lqr_rollout(x_init, F, f, jnp.zeros((T, B, m, n), jnp.float32), u_hat)
    kw = {}
    if constrained:
        kw = dict(
            u_lower=jnp.full((T, B, m), -0.5, jnp.float32),
            u_upper=jnp.full((T, B, m), 0.5, jnp.float32),
        )
        tau_hat = jnp.concatenate([x_hat, u_hat], -1)
        c_delta = c + jnp.einsum("tbij,tbj->tbi", C, tau_hat)
        res = riccati_backward(C, c_delta, F, None, n, u_hat=u_hat, **kw)
    else:
        tau_hat = jnp.concatenate([x_hat, u_hat], -1)
        c_delta = c + jnp.einsum("tbij,tbj->tbi", C, tau_hat)
        res = riccati_backward(C, c_delta, F, None, n)

    ref = lqr_linesearch_rollout(
        x_init, C, c, F, f, res.K, res.k, x_hat, u_hat, decay=0.5, max_iter=6, **kw
    )
    out = linesearch_rollout_pallas(
        x_init, C, c, F, f, res.K, res.k, x_hat, u_hat,
        decay=0.5, max_iter=6, interpret=True, **kw
    )
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha))
    np.testing.assert_allclose(np.asarray(out.us), np.asarray(ref.us), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.xs), np.asarray(ref.xs), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out.objs), np.asarray(ref.objs), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_array_equal(
        np.asarray(out.improved), np.asarray(ref.improved)
    )


def test_fused_linesearch_matches_xla_pendulum():
    """Nonlinear dynamics fused via entries_step."""
    T, B = 8, 32
    dx = PendulumDx.default(jnp.float32)
    q, p = dx.get_true_obj()
    rng = np.random.default_rng(95)
    th = rng.uniform(-np.pi, np.pi, B)
    x_init = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), rng.uniform(-1, 1, B)], -1), jnp.float32
    )
    u_hat = jnp.zeros((T, B, 1), jnp.float32)

    def roll(x, ut):
        return dx.forward(x, ut), x

    _, x_hat = jax.lax.scan(roll, x_init, u_hat)
    C = jnp.broadcast_to(jnp.diag(q), (T, B, 4, 4)).astype(jnp.float32)
    c = jnp.broadcast_to(p, (T, B, 4)).astype(jnp.float32)
    from diffmpc_tpu.ops.linearize import linearize_dynamics

    lin = linearize_dynamics(dx, x_hat, u_hat)
    tau_hat = jnp.concatenate([x_hat, u_hat], -1)
    c_delta = c + jnp.einsum("tbij,tbj->tbi", C, tau_hat)
    lo = jnp.full((T, B, 1), -2.0, jnp.float32)
    hi = jnp.full((T, B, 1), 2.0, jnp.float32)
    res = riccati_backward(C, c_delta, lin.F, None, 3, u_lower=lo, u_upper=hi, u_hat=u_hat)

    dynamics_fn = lambda x, u, t: dx.forward(x, u)
    ref = lqr_linesearch_rollout(
        x_init, C, c, lin.F, lin.f, res.K, res.k, x_hat, u_hat,
        u_lower=lo, u_upper=hi, dynamics_fn=dynamics_fn,
    )
    out = linesearch_rollout_pallas(
        x_init, C, c, lin.F, lin.f, res.K, res.k, x_hat, u_hat,
        u_lower=lo, u_upper=hi, dyn=dx, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha))
    np.testing.assert_allclose(np.asarray(out.us), np.asarray(ref.us), atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(out.objs), np.asarray(ref.objs), rtol=3e-4, atol=3e-4
    )


def test_entries_step_matches_forward():
    """The kernel-fusion step protocol must match forward() exactly."""
    import numpy as np

    for Dx in [PendulumDx]:
        dx = Dx.default(jnp.float32)
        rng = np.random.default_rng(96)
        B = 64
        n, m = dx.n_state, dx.n_ctrl
        if n == 3:
            th = rng.uniform(-np.pi, np.pi, B)
            x = np.stack([np.cos(th), np.sin(th), rng.uniform(-5, 5, B)], -1)
        u = rng.uniform(-3, 3, (B, m))
        x = jnp.asarray(x, jnp.float32)
        u = jnp.asarray(u, jnp.float32)
        ref = dx.forward(x, u)
        params = [dx.kernel_params()[i] for i in range(dx.kernel_params().shape[0])]
        ent = dx.entries_step(params, [x[:, i] for i in range(n)], [u[:, i] for i in range(m)])
        np.testing.assert_allclose(
            np.asarray(jnp.stack(ent, -1)), np.asarray(ref), atol=5e-6
        )


def test_cartpole_entries_step_matches_forward():
    from diffmpc_tpu.models import CartpoleDx

    dx = CartpoleDx.default(jnp.float32)
    rng = np.random.default_rng(97)
    B = 64
    th = rng.uniform(-np.pi, np.pi, B)
    x = jnp.asarray(
        np.stack(
            [rng.uniform(-1, 1, B), rng.uniform(-1, 1, B), np.cos(th), np.sin(th),
             rng.uniform(-2, 2, B)], -1,
        ),
        jnp.float32,
    )
    u = jnp.asarray(rng.uniform(-5, 5, (B, 1)), jnp.float32)
    ref = dx.forward(x, u)
    params = [dx.kernel_params()[i] for i in range(4)]
    ent = dx.entries_step(params, [x[:, i] for i in range(5)], [u[:, 0]])
    np.testing.assert_allclose(np.asarray(jnp.stack(ent, -1)), np.asarray(ref), atol=5e-6)
