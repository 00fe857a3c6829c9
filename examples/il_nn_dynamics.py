#!/usr/bin/env python
"""Imitation learning with a NEURAL dynamics model through the MPC solver.

The reference's ``NNDynamics`` workload (SURVEY.md §2.1 C5/C8): expert
controls come from MPC with the true pendulum physics; the learner's MPC
uses an MLP state-transition model whose weights are trained end-to-end by
MSE on controls — gradients flow through the analytic KKT backward into the
network via the (autodiff) linearization of the final iLQR step.
"""

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import common  # noqa: F401,E402 — sys.path bootstrap (run examples from a clean shell)
from diffmpc_tpu import GradMethods, MPCConfig, QuadCost
from diffmpc_tpu.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from diffmpc_tpu.models import NNDynamics, PendulumDx
from diffmpc_tpu.parallel import (
    generate_expert_data,
    init_train_state,
    make_dp_train_step,
    make_mesh,
    shard_batch,
)
from diffmpc_tpu.utils.logging import CSVLogger, table_log

from common import random_pendulum_x_init


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--horizon", type=int, default=15)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--hidden", type=int, nargs="+", default=[64, 64])
    ap.add_argument("--lqr-iter", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mesh", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="results/il_nn_dynamics")
    ap.add_argument("--ckpt-every", type=int, default=100)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import optax

    dtype = jnp.float32
    T, B = args.horizon, args.batch
    true_dx = PendulumDx.default(dtype)
    q, p = true_dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)
    # detach_unconverged=False: an untrained network rarely "converges" the
    # iLQR loop early in training, and detaching unconverged solves would
    # cut every gradient; keep fixed-point gradients for all elements.
    config = MPCConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=args.lqr_iter, eps=1e-5,
        grad_method=GradMethods.AUTO_DIFF,  # MLP: exact vmapped jacfwd
        exit_unconverged=False, detach_unconverged=False, dtype=dtype,
    )

    # Stabilization regime (near-upright starts): optimal controls stay
    # interior to the box. With a randomly-initialized network the swing-up
    # regime saturates every control dim and the KKT backward's tight-dim
    # masking kills all gradients (box-saturation gradient death — a known
    # property of differentiable MPC, Amos et al. §5).
    rng = np.random.default_rng(args.seed)
    th = rng.uniform(-0.6, 0.6, B)
    x_init = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), rng.uniform(-0.5, 0.5, B)], -1), dtype
    )
    _, u_expert, _ = jax.jit(
        lambda x: generate_expert_data(config, cost, true_dx, x, -2.0, 2.0)
    )(x_init)
    jax.block_until_ready(u_expert)

    nn0 = NNDynamics.init(
        jax.random.PRNGKey(args.seed), 3, 1, hidden=tuple(args.hidden),
        activation="tanh", residual=True, dtype=dtype,
    )

    def make_problem(params):
        return cost, nn0.replace(weights=params["w"], biases=params["b"])

    params0 = {"w": nn0.weights, "b": nn0.biases}
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
        ["step", "loss", "grad_norm", "converged_frac", "dt"],
    )
    for i in range(start, args.steps):
        t0 = time.time()
        state, stats = step(state, x_init, u_expert)
        stats = jax.device_get(stats)
        dt = time.time() - t0
        if i % 20 == 0 or i == args.steps - 1:
            table_log(
                "il_nn",
                (("step", i), ("loss", float(stats.loss), "{:.3e}"),
                 ("gnorm", float(stats.grad_norm), "{:.2e}"),
                 ("conv", float(stats.converged_frac), "{:.2f}"),
                 ("s/step", dt, "{:.2f}")),
            )
        logger.log(step=i, loss=float(stats.loss), grad_norm=float(stats.grad_norm),
                   converged_frac=float(stats.converged_frac), dt=dt)
        if args.ckpt_every and (i + 1) % args.ckpt_every == 0:
            save_checkpoint(ckpt_dir, state, i + 1)
    logger.close()
    print("done; final loss", float(stats.loss))


if __name__ == "__main__":
    main()
