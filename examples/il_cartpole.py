#!/usr/bin/env python
"""Cartpole MPC imitation learning: learn COST + DYNAMICS via KKT backward.

Driver eval config 4 (B=4096): expert controls come from MPC with the true
cartpole params and true quadratic cost; the learner recovers both the
physical parameters ``(g, m_cart, m_pole, l)`` and the (log-parameterized)
diagonal cost weights by MSE on controls, with all gradients flowing through
the analytic KKT fixed-point backward.
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
from diffmpc_tpu.models import CartpoleDx
from diffmpc_tpu.parallel import (
    generate_expert_data,
    init_train_state,
    make_dp_train_step,
    make_mesh,
    shard_batch,
)
from diffmpc_tpu.utils.logging import CSVLogger, table_log

from common import random_cartpole_x_init


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--horizon", type=int, default=20)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--lr", type=float, default=2e-2)
    ap.add_argument("--lqr-iter", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--learn", choices=["dynamics", "cost", "both"], default="both")
    ap.add_argument("--mesh", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="results/il_cartpole")
    ap.add_argument("--ckpt-every", type=int, default=50)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import optax

    dtype = jnp.float32
    T, B = args.horizon, args.batch
    true_dx = CartpoleDx.default(dtype)
    q_true, p_true = true_dx.get_true_obj()
    true_cost = QuadCost(jnp.diag(q_true), p_true)
    u_lim = 10.0
    config = MPCConfig(
        n_state=5, n_ctrl=1, T=T, lqr_iter=args.lqr_iter, eps=1e-5,
        exit_unconverged=False, detach_unconverged=True, dtype=dtype,
    )

    x_init = random_cartpole_x_init(B, args.seed, dtype)
    print("generating expert data; true params", np.asarray(true_dx.params))
    _, u_expert, _ = jax.jit(
        lambda x: generate_expert_data(config, true_cost, true_dx, x, -u_lim, u_lim)
    )(x_init)
    jax.block_until_ready(u_expert)

    rng = np.random.default_rng(args.seed + 1)
    dyn0 = jnp.asarray(np.asarray(true_dx.params) * rng.uniform(0.75, 1.25, 4), dtype)
    logq0 = jnp.asarray(
        jnp.log(q_true) + jnp.asarray(rng.uniform(-0.5, 0.5, q_true.shape[0]), dtype)
    )
    params0 = {}
    if args.learn in ("dynamics", "both"):
        params0["dyn"] = dyn0
    if args.learn in ("cost", "both"):
        params0["logq"] = logq0

    def make_problem(params):
        dx = true_dx.replace(params=params.get("dyn", true_dx.params))
        if "logq" in params:
            q = jnp.exp(params["logq"])
            # keep the true goal: p = -w * goal on state dims
            goal = jnp.asarray([0.0, 0.0, 1.0, 0.0, 0.0, 0.0], dtype)
            p = -q * goal
            cost = QuadCost(jnp.diag(q), p)
        else:
            cost = true_cost
        return cost, dx

    optimizer = optax.adam(args.lr)
    mesh = make_mesh() if args.mesh else None
    step = make_dp_train_step(
        config, make_problem, optimizer, mesh, u_lower=-u_lim, u_upper=u_lim
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
        ["step", "loss", "grad_norm", "converged_frac", "dt"],
    )
    for i in range(start, args.steps):
        t0 = time.time()
        state, stats = step(state, x_init, u_expert)
        stats = jax.device_get(stats)
        dt = time.time() - t0
        if i % 10 == 0 or i == args.steps - 1:
            msg = [("step", i), ("loss", float(stats.loss), "{:.3e}"),
                   ("conv", float(stats.converged_frac), "{:.2f}")]
            if "dyn" in state.params:
                msg.append(("dyn", np.round(np.asarray(state.params["dyn"]), 3)))
            table_log("il_cartpole", msg)
        logger.log(step=i, loss=float(stats.loss), grad_norm=float(stats.grad_norm),
                   converged_frac=float(stats.converged_frac), dt=dt)
        if args.ckpt_every and (i + 1) % args.ckpt_every == 0:
            save_checkpoint(ckpt_dir, state, i + 1)
    logger.close()
    if "dyn" in state.params:
        print("learned dyn", np.asarray(state.params["dyn"]),
              "true", np.asarray(true_dx.params))
    if "logq" in state.params:
        print("learned q", np.asarray(jnp.exp(state.params["logq"])),
              "true", np.asarray(q_true))


if __name__ == "__main__":
    main()
