"""Shared helpers for the imitation-learning example CLIs (ref C8)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def force_cpu_if_requested(args):
    if getattr(args, "cpu", False):
        jax.config.update("jax_platforms", "cpu")


def random_pendulum_x_init(B, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    th = rng.uniform(-np.pi, np.pi, B)
    thdot = rng.uniform(-1.0, 1.0, B)
    return jnp.asarray(np.stack([np.cos(th), np.sin(th), thdot], -1), dtype)


def random_cartpole_x_init(B, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    p = rng.uniform(-0.5, 0.5, B)
    pdot = rng.uniform(-0.5, 0.5, B)
    th = rng.uniform(-0.3, 0.3, B)  # near upright (stabilization task)
    thdot = rng.uniform(-0.5, 0.5, B)
    return jnp.asarray(
        np.stack([p, pdot, np.cos(th), np.sin(th), thdot], -1), dtype
    )
