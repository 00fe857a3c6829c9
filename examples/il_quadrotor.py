#!/usr/bin/env python
"""Imitation learning of planar-quadrotor dynamics through the MPC solver.

The sysid recipe of ``il_pendulum.py`` on the multi-control env (n=6, m=2,
asymmetric thrust box ``0 <= u <= max``): recover ``(g, mass, arm,
inertia)`` from expert hover-stabilization controls by MSE through the
analytic KKT backward.

Two quadrotor-specific twists over the pendulum script:

- **log-parameterization**: the params span three orders of magnitude
  (g ~ 10, inertia ~ 0.01); raw adam steps drive inertia negative (unstable
  dynamics, NaN) — learn ``log params`` instead (same idiom as
  il_cartpole's log cost weights).
- **identifiability**: expert controls pin the hover thrust ``g * mass``
  (and ``arm / inertia``) tightly, while ``g`` and ``mass`` individually
  stay coupled — the script reports both.
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
from diffmpc_tpu.models import QuadrotorDx
from diffmpc_tpu.parallel import (
    generate_expert_data,
    init_train_state,
    make_dp_train_step,
    make_mesh,
    shard_batch,
)
from diffmpc_tpu.utils.logging import CSVLogger, table_log


def random_quadrotor_x_init(B, seed, dtype, scale=0.25):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        np.stack(
            [
                rng.uniform(-scale, scale, B),     # px
                rng.uniform(-scale, scale, B),     # pz
                rng.uniform(-0.2, 0.2, B),         # phi
                rng.uniform(-0.2, 0.2, B),         # vx
                rng.uniform(-0.2, 0.2, B),         # vz
                rng.uniform(-0.2, 0.2, B),         # om
            ],
            -1,
        ),
        dtype,
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--horizon", type=int, default=20)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--lr", type=float, default=2e-2)
    ap.add_argument("--lqr-iter", type=int, default=14)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mesh", action="store_true", help="shard batch over devices")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="results/il_quadrotor")
    ap.add_argument("--ckpt-every", type=int, default=50)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import optax

    dtype = jnp.float32
    T, B = args.horizon, args.batch
    true_dx = QuadrotorDx.default(dtype)
    q, p = true_dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)
    config = MPCConfig(
        n_state=6, n_ctrl=2, T=T, lqr_iter=args.lqr_iter, eps=1e-5,
        exit_unconverged=False, detach_unconverged=True, dtype=dtype,
    )
    u_lo, u_hi = 0.0, true_dx.max_thrust

    x_init = random_quadrotor_x_init(B, args.seed, dtype)
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
        jnp.asarray(np.asarray(true_dx.params) * rng.uniform(0.75, 1.25, 4), dtype)
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

    logger = CSVLogger(
        os.path.join(args.out, "train.csv"),
        ["step", "loss", "grad_norm", "converged_frac",
         "g", "mass", "arm", "inertia", "dt"],
    )
    for i in range(start, args.steps):
        t0 = time.time()
        state, stats = step(state, x_init, u_expert)
        stats = jax.device_get(stats)
        dt = time.time() - t0
        g_, m_, a_, I_ = np.exp(np.asarray(state.params))
        if i % 10 == 0 or i == args.steps - 1:
            table_log(
                "il_quadrotor",
                (
                    ("step", i),
                    ("loss", float(stats.loss), "{:.3e}"),
                    ("g*mass", g_ * m_, "{:.3f}"),
                    ("arm/I", a_ / I_, "{:.2f}"),
                    ("conv", float(stats.converged_frac), "{:.2f}"),
                ),
            )
        logger.log(
            step=i, loss=float(stats.loss), grad_norm=float(stats.grad_norm),
            converged_frac=float(stats.converged_frac),
            g=g_, mass=m_, arm=a_, inertia=I_, dt=dt,
        )
        if args.ckpt_every and (i + 1) % args.ckpt_every == 0:
            save_checkpoint(ckpt_dir, state, i + 1)
    logger.close()
    learned = np.exp(np.asarray(state.params))
    true = np.asarray(true_dx.params)
    print("final params", np.round(learned, 4), "true", true)
    print(f"identified combinations: g*mass {learned[0]*learned[1]:.4f} "
          f"(true {true[0]*true[1]:.4f}), arm/inertia "
          f"{learned[2]/learned[3]:.2f} (true {true[2]/true[3]:.2f})")


if __name__ == "__main__":
    main()
