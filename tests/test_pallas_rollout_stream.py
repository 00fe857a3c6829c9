"""Streaming line-search rollout kernel vs the XLA ladder (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmpc_tpu.models import PendulumDx
from diffmpc_tpu.ops.lqr import lqr_linesearch_rollout, lqr_rollout, riccati_backward
from diffmpc_tpu.ops.pallas.rollout_stream import linesearch_rollout_pallas_stream
from oracles import random_lqr_problem


@pytest.mark.parametrize("constrained", [False, True])
def test_stream_linesearch_matches_xla_linear(constrained):
    T, B, n, m = 7, 48, 3, 2
    rng = np.random.default_rng(910 + constrained)
    C, c, F, f, x_init = random_lqr_problem(rng, T, B, n, m)
    as32 = lambda a: jnp.asarray(a, jnp.float32)
    C, c, F, f, x_init = map(as32, (C, c, F, f, x_init))
    u_hat = jnp.zeros((T, B, m), jnp.float32)
    x_hat, _ = lqr_rollout(x_init, F, f, jnp.zeros((T, B, m, n), jnp.float32), u_hat)
    tau_hat = jnp.concatenate([x_hat, u_hat], -1)
    c_delta = c + jnp.einsum("tbij,tbj->tbi", C, tau_hat)
    kw = {}
    if constrained:
        kw = dict(
            u_lower=jnp.full((T, B, m), -0.5, jnp.float32),
            u_upper=jnp.full((T, B, m), 0.5, jnp.float32),
        )
        res = riccati_backward(C, c_delta, F, None, n, u_hat=u_hat, **kw)
    else:
        res = riccati_backward(C, c_delta, F, None, n)

    ref = lqr_linesearch_rollout(
        x_init, C, c, F, f, res.K, res.k, x_hat, u_hat, decay=0.5, max_iter=6, **kw
    )
    out = linesearch_rollout_pallas_stream(
        x_init, C, c, F, f, res.K, res.k, x_hat, u_hat,
        decay=0.5, max_iter=6, interpret=True, **kw
    )
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha))
    np.testing.assert_allclose(np.asarray(out.us), np.asarray(ref.us), atol=3e-4)
    np.testing.assert_allclose(np.asarray(out.xs), np.asarray(ref.xs), atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(out.objs), np.asarray(ref.objs), rtol=3e-4, atol=3e-4
    )
    np.testing.assert_array_equal(np.asarray(out.improved), np.asarray(ref.improved))


def test_stream_linesearch_pendulum_nonlinear():
    T, B = 9, 32
    dx = PendulumDx.default(jnp.float32)
    q, p = dx.get_true_obj()
    rng = np.random.default_rng(912)
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

    ref = lqr_linesearch_rollout(
        x_init, C, c, lin.F, lin.f, res.K, res.k, x_hat, u_hat,
        u_lower=lo, u_upper=hi, dynamics_fn=lambda x, u, t: dx.forward(x, u),
    )
    out = linesearch_rollout_pallas_stream(
        x_init, C, c, None, None, res.K, res.k, x_hat, u_hat,
        u_lower=lo, u_upper=hi, dyn=dx, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha))
    np.testing.assert_allclose(np.asarray(out.us), np.asarray(ref.us), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(out.objs), np.asarray(ref.objs), rtol=5e-4, atol=5e-4
    )
