#!/usr/bin/env python
"""Imitation learning of vehicle dynamics through the MPC solver.

The sysid recipe on the fifth env of the zoo — the kinematic-bicycle
vehicle (n=4, m=2, the canonical industrial MPC application): recover
``(wheelbase L, drag c_d)`` from expert lane-keeping controls by MSE
through the analytic KKT backward, with the asymmetric mixed box
(accel ``[-6, 3]``, steer ``|delta| <= 0.5``) active on the experts.

Log-parameterization (the quadrotor/acrobot idiom): adam steps on raw
parameters can drive the wheelbase or drag negative (broken kinematics);
learn ``log params`` instead.
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
from diffmpc_tpu.models import VehicleDx
from diffmpc_tpu.parallel import (
    generate_expert_data,
    init_train_state,
    make_dp_train_step,
    make_mesh,
    shard_batch,
)
from diffmpc_tpu.utils.logging import CSVLogger, table_log

from common import random_vehicle_x_init


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--horizon", type=int, default=20)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--lr", type=float, default=2e-2)
    ap.add_argument("--lqr-iter", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mesh", action="store_true", help="shard batch over devices")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="results/il_vehicle")
    ap.add_argument("--ckpt-every", type=int, default=50)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import optax

    dtype = jnp.float32
    T, B = args.horizon, args.batch
    true_dx = VehicleDx.default(dtype)
    q, p = true_dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)
    config = MPCConfig(
        n_state=4, n_ctrl=2, T=T, lqr_iter=args.lqr_iter, eps=1e-5,
        exit_unconverged=False, detach_unconverged=True, dtype=dtype,
    )
    u_lo = jnp.asarray([-true_dx.max_brake, -true_dx.max_steer], dtype)
    u_hi = jnp.asarray([true_dx.max_accel, true_dx.max_steer], dtype)

    x_init = random_vehicle_x_init(B, args.seed, dtype)
    print("generating expert data with true params", np.asarray(true_dx.params))
    t0 = time.time()
    _, u_expert, expert_objs = jax.jit(
        lambda x: generate_expert_data(config, cost, true_dx, x, u_lo, u_hi)
    )(x_init)
    jax.block_until_ready(u_expert)
    print(f"expert data: {B} trajectories in {time.time() - t0:.2f}s, "
          f"mean obj {float(jnp.mean(expert_objs)):.4f}")

    rng = np.random.default_rng(args.seed + 1)
    log_params0 = jnp.log(
        jnp.asarray(np.asarray(true_dx.params) * rng.uniform(0.7, 1.3, 2), dtype)
    )

    def make_problem(log_params):
        return cost, true_dx.replace(params=jnp.exp(log_params))

    optimizer = optax.adam(args.lr)
    mesh = make_mesh() if args.mesh else None
    step = make_dp_train_step(
        config, make_problem, optimizer, mesh, u_lower=u_lo, u_upper=u_hi
    )
    state = init_train_state(log_params0, optimizer)
    start = 0
    ckpt_dir = os.path.join(args.out, "ckpt")
    if args.resume and latest_step(ckpt_dir) is not None:
        start = latest_step(ckpt_dir)
        state = restore_checkpoint(ckpt_dir, state)
        print(f"resumed from step {start}")

    if mesh is not None:
        x_init = shard_batch(mesh, x_init, 0)
        u_expert = shard_batch(mesh, u_expert, 1)

    true = np.asarray(true_dx.params)
    logger = CSVLogger(
        os.path.join(args.out, "train.csv"),
        ["step", "loss", "grad_norm", "converged_frac",
         "wheelbase", "drag", "param_dist", "dt"],
    )
    for i in range(start, args.steps):
        t0 = time.time()
        state, stats = step(state, x_init, u_expert)
        stats = jax.device_get(stats)
        dt = time.time() - t0
        learned = np.exp(np.asarray(state.params))
        dist = float(np.linalg.norm(learned - true))
        if i % 10 == 0 or i == args.steps - 1:
            table_log(
                "il_vehicle",
                (
                    ("step", i),
                    ("loss", float(stats.loss), "{:.3e}"),
                    ("L", learned[0], "{:.3f}"),
                    ("c_d", learned[1], "{:.3f}"),
                    ("conv", float(stats.converged_frac), "{:.2f}"),
                ),
            )
        logger.log(
            step=i, loss=float(stats.loss), grad_norm=float(stats.grad_norm),
            converged_frac=float(stats.converged_frac),
            wheelbase=learned[0], drag=learned[1], param_dist=dist, dt=dt,
        )
        if args.ckpt_every and (i + 1) % args.ckpt_every == 0:
            save_checkpoint(ckpt_dir, state, i + 1)
    logger.close()
    learned = np.exp(np.asarray(state.params))
    print("final params", np.round(learned, 4), "true", true)
    print(f"param distance {np.linalg.norm(learned - true):.4f} "
          f"(init {np.linalg.norm(np.exp(np.asarray(log_params0)) - true):.4f})")


if __name__ == "__main__":
    main()
