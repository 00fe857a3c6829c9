"""Data-parallel imitation-learning training steps.

The reference's training loop (SURVEY.md §3.5, upstream ``empc/`` imitation
scripts) is single-process; this module is its TPU-native scaling
equivalent (driver eval configs 3-5): the scenario batch is sharded over the
mesh, each device solves its shard's MPC problems, and the parameter
gradient is ``psum``-reduced across devices inside a ``shard_map`` — the
explicit form of the collective XLA would insert under GSPMD, kept explicit
so the communication pattern is visible and testable (SURVEY.md §5.8).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..mpc import mpc_solve
from ..types import MPCConfig
from .mesh import BATCH_AXIS


class TrainState(NamedTuple):
    params: object  # dynamics (and/or cost) parameters being learned
    opt_state: object


class StepStats(NamedTuple):
    loss: jnp.ndarray  # () global mean imitation loss
    grad_norm: jnp.ndarray  # () global gradient norm
    converged_frac: jnp.ndarray  # () fraction of converged solves (global)


def imitation_loss(
    config: MPCConfig,
    params,
    make_dx: Callable,
    cost,
    x_init: jnp.ndarray,
    u_expert: jnp.ndarray,
    u_lower=None,
    u_upper=None,
):
    """MSE between the learned-model MPC controls and expert controls
    (SURVEY.md §3.5) — gradients flow through the analytic KKT backward of
    the final LQR step only."""
    sol = mpc_solve(
        config, x_init, cost, make_dx(params), u_lower=u_lower, u_upper=u_upper
    )
    per_elem = jnp.mean((sol.us - u_expert) ** 2, axis=(0, 2))  # (B_local,)
    return jnp.mean(per_elem), sol.info


def make_dp_train_step(
    config: MPCConfig,
    make_dx: Callable,
    cost,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    u_lower=None,
    u_upper=None,
):
    """Build a jitted data-parallel train step over ``mesh``.

    Returns ``step(state, x_init, u_expert) -> (state, StepStats)`` where
    ``x_init (B, n)`` / ``u_expert (T, B, m)`` are globally sharded on the
    batch axis. Inside ``shard_map`` each device computes its local loss
    gradient; ``jax.lax.pmean`` over the batch axis reduces gradients and
    stats across devices (ICI-routed on TPU pods).
    """

    def local_grads(params, x_init, u_expert):
        (loss, info), grads = jax.value_and_grad(
            lambda p: imitation_loss(
                config, p, make_dx, cost, x_init, u_expert, u_lower, u_upper
            ),
            has_aux=True,
        )(params)
        conv = jnp.mean(info.converged.astype(jnp.float32))
        # Explicit cross-device reductions (the reference has no equivalent;
        # SURVEY.md §2.3 "communication backend" row).
        loss = jax.lax.pmean(loss, BATCH_AXIS)
        grads = jax.lax.pmean(grads, BATCH_AXIS)
        conv = jax.lax.pmean(conv, BATCH_AXIS)
        return loss, grads, conv

    # check_vma=False: the iLQR while_loop initializes per-element carries
    # (done masks, best costs) from literals, which JAX's varying-manual-axes
    # tracker refuses to unify with batch-varying outputs inside shard_map.
    sharded_grads = jax.shard_map(
        local_grads,
        mesh=mesh,
        in_specs=(P(), P(BATCH_AXIS), P(None, BATCH_AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(state: TrainState, x_init, u_expert):
        loss, grads, conv = sharded_grads(state.params, x_init, u_expert)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return TrainState(params, opt_state), StepStats(loss, gnorm, conv)

    return step


def init_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params))
