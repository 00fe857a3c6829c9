"""End-to-end imitation learning integration tests (SURVEY.md §4 row
"Integration": tiny IL run — loss decreases, learned params approach truth).
Driver eval configs 3-4 in miniature."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffmpc_tpu import MPCConfig, QuadCost
from diffmpc_tpu.models import CartpoleDx, PendulumDx
from diffmpc_tpu.parallel import (
    generate_expert_data,
    init_train_state,
    make_dp_train_step,
)


def test_pendulum_sysid_recovers_params():
    dtype = jnp.float32
    B, T = 64, 15
    true_dx = PendulumDx.default(dtype)
    q, p = true_dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)
    config = MPCConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=8, eps=1e-5,
        exit_unconverged=False, detach_unconverged=True, dtype=dtype,
    )
    rng = np.random.default_rng(40)
    th = rng.uniform(-np.pi, np.pi, B)
    thdot = rng.uniform(-1, 1, B)
    x_init = jnp.asarray(np.stack([np.cos(th), np.sin(th), thdot], -1), dtype)

    _, u_expert, _ = jax.jit(
        lambda x: generate_expert_data(config, cost, true_dx, x, -2.0, 2.0)
    )(x_init)

    params0 = jnp.asarray([8.0, 1.25, 0.8], dtype)  # true = (10, 1, 1)

    def make_problem(params):
        return cost, true_dx.replace(params=params)

    optimizer = optax.adam(5e-2)
    step = make_dp_train_step(
        config, make_problem, optimizer, mesh=None, u_lower=-2.0, u_upper=2.0
    )
    state = init_train_state(params0, optimizer)

    losses = []
    for _ in range(40):
        state, stats = step(state, x_init, u_expert)
        losses.append(float(stats.loss))

    assert losses[-1] < 0.5 * losses[0], losses[::10]
    err0 = np.abs(np.asarray(params0) - np.asarray(true_dx.params))
    err1 = np.abs(np.asarray(state.params) - np.asarray(true_dx.params))
    assert (err1 < err0).sum() >= 2, (err0, err1)
    assert float(stats.converged_frac) > 0.5


def test_nn_dynamics_imitation_gradients_flow_and_loss_decreases():
    """NNDynamics learner (ref C5/C8): MLP weights get nonzero gradients
    through the KKT backward and the imitation loss decreases.
    detach_unconverged must be off — early in training nothing converges and
    detaching would zero every gradient (box/convergence gradient death)."""
    import jax.random as jr

    from diffmpc_tpu.models import NNDynamics

    dtype = jnp.float32
    B, T = 32, 6
    true_dx = PendulumDx.default(dtype)
    q, p = true_dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)
    config = MPCConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=3, eps=1e-5,
        exit_unconverged=False, detach_unconverged=False, dtype=dtype,
    )
    rng = np.random.default_rng(42)
    th = rng.uniform(-0.6, 0.6, B)
    x_init = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), rng.uniform(-0.5, 0.5, B)], -1), dtype
    )
    _, u_expert, _ = jax.jit(
        lambda x: generate_expert_data(config, cost, true_dx, x, -2.0, 2.0)
    )(x_init)

    nn0 = NNDynamics.init(jr.PRNGKey(0), 3, 1, hidden=(16,), residual=True, dtype=dtype)

    def make_problem(params):
        return cost, nn0.replace(weights=params["w"], biases=params["b"])

    opt = optax.adam(3e-3)
    step = make_dp_train_step(config, make_problem, opt, None, -2.0, 2.0)
    state = init_train_state({"w": nn0.weights, "b": nn0.biases}, opt)
    losses, gnorms = [], []
    for _ in range(25):
        state, stats = step(state, x_init, u_expert)
        losses.append(float(stats.loss))
        gnorms.append(float(stats.grad_norm))
    assert max(gnorms) > 0, "gradients must reach the network weights"
    assert losses[-1] < 0.95 * losses[0], losses[::6]


def test_cartpole_cost_and_dynamics_learning_decreases_loss():
    dtype = jnp.float32
    B, T = 32, 10
    true_dx = CartpoleDx.default(dtype)
    q_true, p_true = true_dx.get_true_obj()
    true_cost = QuadCost(jnp.diag(q_true), p_true)
    config = MPCConfig(
        n_state=5, n_ctrl=1, T=T, lqr_iter=6, eps=1e-5,
        exit_unconverged=False, detach_unconverged=True, dtype=dtype,
    )
    rng = np.random.default_rng(41)
    p0 = rng.uniform(-0.5, 0.5, B)
    pdot = rng.uniform(-0.5, 0.5, B)
    th = rng.uniform(-0.3, 0.3, B)
    thdot = rng.uniform(-0.5, 0.5, B)
    x_init = jnp.asarray(
        np.stack([p0, pdot, np.cos(th), np.sin(th), thdot], -1), dtype
    )
    _, u_expert, _ = jax.jit(
        lambda x: generate_expert_data(config, true_cost, true_dx, x, -10.0, 10.0)
    )(x_init)

    params0 = {
        "dyn": jnp.asarray([9.0, 1.2, 0.08, 0.6], dtype),
        "logq": jnp.log(q_true) + 0.4,
    }
    goal = jnp.asarray([0.0, 0.0, 1.0, 0.0, 0.0, 0.0], dtype)

    def make_problem(params):
        dx = true_dx.replace(params=params["dyn"])
        q = jnp.exp(params["logq"])
        return QuadCost(jnp.diag(q), -q * goal), dx

    optimizer = optax.adam(2e-2)
    step = make_dp_train_step(
        config, make_problem, optimizer, mesh=None, u_lower=-10.0, u_upper=10.0
    )
    state = init_train_state(params0, optimizer)
    losses = []
    for _ in range(30):
        state, stats = step(state, x_init, u_expert)
        losses.append(float(stats.loss))
    assert losses[-1] < 0.6 * losses[0], losses[::5]
    assert np.isfinite(losses).all()
