#!/usr/bin/env python
"""Imitation learning of pendulum dynamics parameters through the MPC solver.

The reference's headline experiment (SURVEY.md §3.5, driver eval config 3):
1. generate expert controls by solving MPC with the TRUE dynamics (g, m, l);
2. start from perturbed dynamics parameters;
3. minimize MSE(learned-model MPC controls, expert controls) — gradients
   flow through the analytic KKT backward — and watch (g, m, l) recover.

Runs single-chip by default; ``--mesh`` shards the scenario batch over all
visible devices with psum gradient reduction (driver eval config 5 shape).
"""

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import common  # noqa: F401,E402 — sys.path bootstrap (run examples from a clean shell)
from diffmpc_tpu import MPCConfig, QuadCost
from diffmpc_tpu.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from diffmpc_tpu.models import PendulumDx
from diffmpc_tpu.parallel import (
    generate_expert_data,
    init_train_state,
    make_dp_train_step,
    make_mesh,
    shard_batch,
)
from diffmpc_tpu.utils.logging import CSVLogger, profile_trace, table_log

from common import random_pendulum_x_init


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--horizon", type=int, default=20)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--lr", type=float, default=5e-2)
    ap.add_argument("--lqr-iter", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mesh", action="store_true", help="shard batch over devices")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="results/il_pendulum")
    ap.add_argument("--ckpt-every", type=int, default=50)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--profile-dir", default=None)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import optax

    dtype = jnp.float32
    T, B = args.horizon, args.batch
    true_dx = PendulumDx.default(dtype)
    q, p = true_dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)
    config = MPCConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=args.lqr_iter, eps=1e-5,
        exit_unconverged=False, detach_unconverged=True, dtype=dtype,
    )

    x_init = random_pendulum_x_init(B, args.seed, dtype)
    print("generating expert data with true params", np.asarray(true_dx.params))
    t0 = time.time()
    _, u_expert, expert_objs = jax.jit(
        lambda x: generate_expert_data(config, cost, true_dx, x, -2.0, 2.0)
    )(x_init)
    jax.block_until_ready(u_expert)
    print(f"expert data: {B} trajectories in {time.time() - t0:.2f}s, "
          f"mean obj {float(jnp.mean(expert_objs)):.4f}")

    # perturbed initial guess for (g, m, l) — the sysid target
    rng = np.random.default_rng(args.seed + 1)
    params0 = jnp.asarray(
        np.asarray(true_dx.params) * rng.uniform(0.7, 1.3, 3), dtype
    )

    def make_problem(params):
        return cost, true_dx.replace(params=params)

    optimizer = optax.adam(args.lr)
    mesh = make_mesh() if args.mesh else None
    step = make_dp_train_step(
        config, make_problem, optimizer, mesh, u_lower=-2.0, u_upper=2.0
    )
    state = init_train_state(params0, optimizer)
    start = 0
    ckpt_dir = os.path.join(args.out, "ckpt")
    if args.resume and latest_step(ckpt_dir) is not None:
        start = latest_step(ckpt_dir)
        state = restore_checkpoint(ckpt_dir, state)
        print(f"resumed from step {start}")

    if mesh is not None:
        x_init = shard_batch(mesh, x_init, 0)
        u_expert = shard_batch(mesh, u_expert, 1)

    logger = CSVLogger(
        os.path.join(args.out, "train.csv"),
        ["step", "loss", "grad_norm", "converged_frac", "g", "m", "l", "dt"],
    )
    with profile_trace(args.profile_dir):
        for i in range(start, args.steps):
            t0 = time.time()
            state, stats = step(state, x_init, u_expert)
            stats = jax.device_get(stats)
            dt = time.time() - t0
            g_, m_, l_ = np.asarray(state.params)
            if i % 10 == 0 or i == args.steps - 1:
                table_log(
                    "il_pendulum",
                    (
                        ("step", i),
                        ("loss", float(stats.loss), "{:.3e}"),
                        ("g", g_, "{:.3f}"),
                        ("m", m_, "{:.3f}"),
                        ("l", l_, "{:.3f}"),
                        ("conv", float(stats.converged_frac), "{:.2f}"),
                    ),
                )
            logger.log(
                step=i, loss=float(stats.loss), grad_norm=float(stats.grad_norm),
                converged_frac=float(stats.converged_frac), g=g_, m=m_, l=l_, dt=dt,
            )
            if args.ckpt_every and (i + 1) % args.ckpt_every == 0:
                save_checkpoint(ckpt_dir, state, i + 1)
    logger.close()
    print("final params", np.asarray(state.params), "true", np.asarray(true_dx.params))


if __name__ == "__main__":
    main()
