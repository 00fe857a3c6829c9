"""Receding-horizon control loop: warm-started solves drive the pendulum
toward the upright goal (the reference's deployment pattern)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffmpc_tpu import MPCConfig, QuadCost
from diffmpc_tpu.models import PendulumDx
from diffmpc_tpu.receding import run_receding_horizon


def test_receding_horizon_stabilizes_pendulum():
    dtype = jnp.float32
    B, T, n_steps = 8, 15, 60
    dx = PendulumDx.default(dtype)
    q, p = dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)
    config = MPCConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=6, eps=1e-5,
        exit_unconverged=False, detach_unconverged=False, dtype=dtype,
    )
    # stabilization regime: within the short horizon's basin of attraction
    # (swing-up from hanging needs a lookahead longer than the pendulum
    # period to discover energy pumping — not a controller property this
    # test should depend on)
    rng = np.random.default_rng(60)
    th = rng.uniform(-0.8, 0.8, B)
    x0 = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), rng.uniform(-1, 1, B)], -1), dtype
    )

    run = jax.jit(
        lambda x: run_receding_horizon(
            config, x, cost, dx, n_steps, u_lower=-2.0, u_upper=2.0
        )
    )
    xs, us, objs = run(x0)
    assert xs.shape == (n_steps + 1, B, 3)
    assert us.shape == (n_steps, B, 1)
    assert bool(jnp.all(jnp.abs(us) <= 2.0 + 1e-6))
    # every element must end close to upright (cos ~ 1, small speed)
    tail = jnp.mean(xs[-10:], axis=0)
    assert bool(jnp.all(tail[:, 0] > 0.95)), np.asarray(tail)
    assert bool(jnp.all(jnp.abs(tail[:, 2]) < 0.5))


def test_gather_results_single_host():
    from diffmpc_tpu.parallel import make_mesh, shard_batch
    from diffmpc_tpu.parallel.mesh import gather_results

    mesh = make_mesh()
    x = shard_batch(mesh, jnp.arange(32.0).reshape(16, 2), 0)
    out = gather_results({"x": x})
    np.testing.assert_allclose(out["x"], np.arange(32.0).reshape(16, 2))
    assert isinstance(out["x"], np.ndarray)
