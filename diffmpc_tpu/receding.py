"""Receding-horizon control loop utilities.

The reference's deployment pattern (SURVEY.md §3.5 / upstream experiment
scripts): at each environment step, solve the T-step MPC problem from the
current state, apply only the first control, and warm-start the next solve
with the time-shifted remainder (``u_init``/``prev_ctrl`` threading —
SURVEY.md §5.4: "warm-start control trajectories threaded explicitly as
carry state"). Fully jittable; scan it over an episode.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .mpc import mpc_solve
from .types import MPCConfig


class RecedingState(NamedTuple):
    x: jnp.ndarray  # (B, n) current environment state
    u_warm: jnp.ndarray  # (T, B, m) warm-start trajectory for the next solve
    prev_u: jnp.ndarray  # (B, m) last applied control (slew anchoring)


def receding_init(config: MPCConfig, x0: jnp.ndarray) -> RecedingState:
    T, m = config.T, config.n_ctrl
    B = x0.shape[0]
    z = jnp.zeros((T, B, m), x0.dtype)
    return RecedingState(x=x0, u_warm=z, prev_u=jnp.zeros((B, m), x0.dtype))


def receding_step(
    config: MPCConfig,
    state: RecedingState,
    cost,
    dx,
    env_step: Optional[Callable] = None,
    u_lower=None,
    u_upper=None,
):
    """One receding-horizon step.

    Solves from ``state.x`` warm-started with ``state.u_warm``, applies the
    first optimal control through ``env_step(x, u)`` (defaults to the model
    ``dx`` itself — model-predictive rollout), and shifts the solution one
    step for the next warm start (last slot repeated).

    Returns ``(new_state, (u_applied, solution))``; shaped for
    ``lax.scan`` over an episode.
    """
    sol = mpc_solve(
        config,
        state.x,
        cost,
        dx,
        u_init=state.u_warm,
        u_lower=u_lower,
        u_upper=u_upper,
        prev_ctrl=state.prev_u,
    )
    u0 = sol.us[0]
    stepper = env_step if env_step is not None else (lambda x, u: dx.forward(x, u))
    x_next = stepper(state.x, u0)
    u_warm = jnp.concatenate([sol.us[1:], sol.us[-1:]], axis=0)
    return RecedingState(x=x_next, u_warm=u_warm, prev_u=u0), (u0, sol)


def run_receding_horizon(
    config: MPCConfig,
    x0: jnp.ndarray,
    cost,
    dx,
    n_steps: int,
    env_step: Optional[Callable] = None,
    u_lower=None,
    u_upper=None,
):
    """Roll a receding-horizon controller for ``n_steps`` env steps under
    ``lax.scan``. Returns ``(states (n_steps+1, B, n), controls
    (n_steps, B, m), objs (n_steps, B))``."""

    def body(state, _):
        new_state, (u0, sol) = receding_step(
            config, state, cost, dx, env_step, u_lower, u_upper
        )
        return new_state, (state.x, u0, sol.objs)

    init = receding_init(config, x0)
    final, (xs, us, objs) = jax.lax.scan(body, init, None, length=n_steps)
    xs = jnp.concatenate([xs, final.x[None]], axis=0)
    return xs, us, objs
