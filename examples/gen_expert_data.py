#!/usr/bin/env python
"""Generate expert MPC trajectories (ref C8 expert-data-generation script).

Solves batched MPC with the true cost/dynamics for the chosen environment
and writes (x_init, xs, us, objs) to an .npz for offline imitation learning.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import common  # noqa: F401,E402 — sys.path bootstrap (run examples from a clean shell)
from diffmpc_tpu import MPCConfig, QuadCost
from diffmpc_tpu.models import AcrobotDx, CartpoleDx, PendulumDx
from diffmpc_tpu.parallel import generate_expert_data

from common import (
    random_acrobot_x_init,
    random_vehicle_x_init,
    random_cartpole_x_init,
    random_pendulum_x_init,
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--env", choices=["pendulum", "cartpole", "acrobot", "vehicle"],
        default="pendulum",
    )
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--horizon", type=int, default=20)
    ap.add_argument("--lqr-iter", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="expert_data.npz")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.env == "pendulum":
        dx = PendulumDx.default()
        x_init = random_pendulum_x_init(args.batch, args.seed)
        u_lim = 2.0
        n, m = 3, 1
    elif args.env == "cartpole":
        dx = CartpoleDx.default()
        x_init = random_cartpole_x_init(args.batch, args.seed)
        u_lim = 10.0
        n, m = 5, 1
    elif args.env == "acrobot":  # near-upright balance experts (dt=0.01)
        dx = AcrobotDx.default()
        x_init = random_acrobot_x_init(args.batch, args.seed)
        u_lim = 4.0
        n, m = 6, 1
    else:  # vehicle: lane-keeping experts, asymmetric mixed box
        from diffmpc_tpu.models import VehicleDx

        dx = VehicleDx.default()
        x_init = random_vehicle_x_init(args.batch, args.seed)
        u_lim = None  # per-dim asymmetric bounds below
        n, m = 4, 2

    q, p = dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)
    config = MPCConfig(
        n_state=n, n_ctrl=m, T=args.horizon, lqr_iter=args.lqr_iter,
        eps=1e-5, exit_unconverged=False,
    )
    if u_lim is None:  # vehicle
        lo = jnp.asarray([-dx.max_brake, -dx.max_steer], jnp.float32)
        hi = jnp.asarray([dx.max_accel, dx.max_steer], jnp.float32)
    else:
        lo, hi = -u_lim, u_lim
    xs, us, objs = jax.jit(
        lambda x: generate_expert_data(config, cost, dx, x, lo, hi)
    )(x_init)
    np.savez(
        args.out,
        x_init=np.asarray(x_init),
        xs=np.asarray(xs),
        us=np.asarray(us),
        objs=np.asarray(objs),
        env=args.env,
    )
    print(f"wrote {args.out}: us {us.shape}, mean obj {float(jnp.mean(objs)):.4f}")


if __name__ == "__main__":
    main()
