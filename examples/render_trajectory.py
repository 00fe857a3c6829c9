#!/usr/bin/env python
"""Render an MPC-controlled trajectory to PNG frames / an animated GIF.

The reference's ``get_frame`` visualization surface (SURVEY.md §2.1 C6-C7):
runs the receding-horizon controller for an episode and renders each state.
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

import common  # noqa: F401,E402 — sys.path bootstrap (run examples from a clean shell)
from diffmpc_tpu import MPCConfig, QuadCost, run_receding_horizon
from diffmpc_tpu.models import AcrobotDx, CartpoleDx, PendulumDx, QuadrotorDx


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--env", choices=["pendulum", "cartpole", "quadrotor", "acrobot", "vehicle"],
        default="pendulum"
    )
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--horizon", type=int, default=15)
    ap.add_argument("--theta0", type=float, default=0.7, help="initial angle (rad)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="results/frames")
    ap.add_argument("--gif", default=None, help="optional output .gif path")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if args.env == "pendulum":
        dx = PendulumDx.default()
        x0 = jnp.asarray(
            [[np.cos(args.theta0), np.sin(args.theta0), 0.0]], jnp.float32
        )
        n, m, u_lo, u_hi = 3, 1, -2.0, 2.0
    elif args.env == "cartpole":
        dx = CartpoleDx.default()
        x0 = jnp.asarray(
            [[0.0, 0.0, np.cos(args.theta0), np.sin(args.theta0), 0.0]], jnp.float32
        )
        n, m, u_lo, u_hi = 5, 1, -10.0, 10.0
    elif args.env == "quadrotor":
        dx = QuadrotorDx.default()
        # displaced + tilted hover recovery; asymmetric thrust box 0..max
        x0 = jnp.asarray(
            [[0.5, 0.5, args.theta0 / 2, 0.0, 0.0, 0.0]], jnp.float32
        )
        n, m, u_lo, u_hi = 6, 2, 0.0, dx.max_thrust
    elif args.env == "acrobot":  # balance recovery from a small tilt
        # (dt=0.01 model — pass a longer --horizon, e.g. 40, for 0.4 s)
        dx = AcrobotDx.default()
        t0 = args.theta0 / 4
        x0 = jnp.asarray(
            [[np.cos(t0), np.sin(t0), np.cos(-t0), np.sin(-t0), 0.0, 0.0]],
            jnp.float32,
        )
        n, m, u_lo, u_hi = 6, 1, -4.0, 4.0
    else:  # vehicle: lane recovery from an offset at speed (theta0 = psi0)
        from diffmpc_tpu.models import VehicleDx

        dx = VehicleDx.default()
        x0 = jnp.asarray([[0.0, 1.0, args.theta0 / 2, 5.0]], jnp.float32)
        n, m = 4, 2
        u_lo = jnp.asarray([-dx.max_brake, -dx.max_steer], jnp.float32)
        u_hi = jnp.asarray([dx.max_accel, dx.max_steer], jnp.float32)

    q, p = dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)
    config = MPCConfig(
        n_state=n, n_ctrl=m, T=args.horizon, lqr_iter=8, eps=1e-5,
        exit_unconverged=False, detach_unconverged=False,
    )
    xs, us, _ = jax.jit(
        lambda x: run_receding_horizon(
            config, x, cost, dx, args.steps, u_lower=u_lo, u_upper=u_hi
        )
    )(x0)
    xs = np.asarray(xs)

    os.makedirs(args.out, exist_ok=True)
    paths = []
    for t in range(xs.shape[0]):
        fig, ax = plt.subplots(figsize=(4, 4))
        dx.get_frame(xs[t, 0], ax=ax)
        ax.set_title(f"t={t}")
        path = os.path.join(args.out, f"frame_{t:04d}.png")
        fig.savefig(path, dpi=60)
        plt.close(fig)
        paths.append(path)
    print(f"wrote {len(paths)} frames to {args.out}")

    if args.gif:
        try:
            from PIL import Image

            imgs = [Image.open(p) for p in paths]
            imgs[0].save(
                args.gif, save_all=True, append_images=imgs[1:], duration=50, loop=0
            )
            print(f"wrote {args.gif}")
        except ImportError:
            print("PIL not available; skipped GIF assembly")


if __name__ == "__main__":
    main()
