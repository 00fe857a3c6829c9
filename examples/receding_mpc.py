#!/usr/bin/env python
"""Closed-loop receding-horizon MPC — the deployment pattern.

The reference's intended use (SURVEY.md §3.5 / §5.4): at every environment
step, solve the T-step MPC problem from the CURRENT state, apply only the
first control, and warm-start the next solve with the time-shifted
remainder (``diffmpc_tpu.receding``). The whole episode is one
``lax.scan``-compiled program — B scenarios run the loop in lockstep.

``--plant-param-error`` steps the TRUE plant with perturbed physics while
the controller plans with the nominal model: the classic MPC robustness
demo (feedback through re-solving absorbs model mismatch that would wreck
an open-loop plan). ``--slew`` adds the slew-rate penalty with ``prev_ctrl``
anchoring across solves — the knob only matters in exactly this pattern.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import common  # noqa: F401,E402 — sys.path bootstrap (run from a clean shell)
from diffmpc_tpu import MPCConfig, QuadCost
from diffmpc_tpu.models import PendulumDx, VehicleDx
from diffmpc_tpu.receding import run_receding_horizon
from diffmpc_tpu.utils.logging import CSVLogger, table_log

from common import random_pendulum_x_init, random_vehicle_x_init


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--env", choices=["pendulum", "vehicle"], default="pendulum",
        help="pendulum swing-up, or vehicle lane keeping (the industrial "
        "closed-loop shape; plant error perturbs (L, c_d))",
    )
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--horizon", type=int, default=20)
    ap.add_argument("--env-steps", type=int, default=100)
    ap.add_argument("--lqr-iter", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--plant-param-error", type=float, default=0.0,
        help="relative perturbation of the plant's (g, m, l) vs the "
        "controller's nominal model (e.g. 0.15 = up to ±15%%)",
    )
    ap.add_argument(
        "--slew", type=float, default=0.0,
        help="slew-rate penalty weight (prev_ctrl anchored across solves)",
    )
    ap.add_argument("--out", default=None, help="optional CSV log path")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    dtype = jnp.float32
    T, B = args.horizon, args.batch
    if args.env == "pendulum":
        model = PendulumDx.default(dtype)  # what the controller plans with
        n, m = 3, 1
        u_lo, u_hi = -2.0, 2.0
        x0 = random_pendulum_x_init(B, args.seed, dtype)
    else:  # vehicle lane keeping
        model = VehicleDx.default(dtype)
        n, m = 4, 2
        u_lo = jnp.asarray([-model.max_brake, -model.max_steer], dtype)
        u_hi = jnp.asarray([model.max_accel, model.max_steer], dtype)
        x0 = random_vehicle_x_init(B, args.seed, dtype)
    q, p = model.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)
    config = MPCConfig(
        n_state=n, n_ctrl=m, T=T, lqr_iter=args.lqr_iter, eps=1e-5,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
        slew_rate_penalty=args.slew if args.slew > 0 else None, dtype=dtype,
    )

    # The plant the controls are APPLIED to (perturbed physics = model
    # mismatch; the controller never sees these parameters).
    rng = np.random.default_rng(args.seed + 1)
    plant_params = jnp.asarray(
        np.asarray(model.params)
        * (1.0 + args.plant_param_error
           * rng.uniform(-1.0, 1.0, np.asarray(model.params).shape[0])),
        dtype,
    )
    plant = model.replace(params=plant_params)

    @jax.jit
    def episode(x_init):
        return run_receding_horizon(
            config, x_init, cost, model, args.env_steps,
            env_step=lambda x, u: plant.forward(x, u),
            u_lower=u_lo, u_upper=u_hi,
        )

    print(
        f"closed-loop {args.env}: B={B}, T={T}, "
        f"{args.env_steps} env steps, plant error ±{args.plant_param_error:.0%}"
    )
    t0 = time.time()
    xs, us, objs = jax.block_until_ready(episode(x0))
    t_first = time.time() - t0
    t0 = time.time()
    xs, us, objs = jax.block_until_ready(episode(x0))
    t_warm = time.time() - t0

    xs = np.asarray(xs)
    if args.env == "pendulum":
        # Success = upright and slow at the end: state (cos th, sin th,
        # thdot), goal (1, 0, 0).
        upright = (xs[-1, :, 0] > 0.95) & (np.abs(xs[-1, :, 2]) < 1.0)
        goal = np.array([1.0, 0.0, 0.0])
    else:
        # Success = in lane, straight, near the reference speed at the
        # end: state (px, py, psi, v), goal (*, 0, 0, v_ref).
        upright = (
            (np.abs(xs[-1, :, 1]) < 0.1)
            & (np.abs(xs[-1, :, 2]) < 0.1)
            & (np.abs(xs[-1, :, 3] - model.v_ref) < 1.0)
        )
        goal = np.array([0.0, 0.0, 0.0, model.v_ref])
    # Stage cost of the CLOSED-LOOP trajectory under the nominal objective
    # (what the controller is actually judged on, mismatch included).
    goal_w = np.asarray(q)[:n]
    stage = (goal_w * (xs[:-1] - goal) ** 2).sum(-1)
    # slew over ALL control dims (steering matters for the vehicle)
    du = np.abs(np.diff(np.asarray(us), axis=0))
    table_log(
        "receding_mpc",
        (
            ("success_frac", float(upright.mean()), "{:.3f}"),
            ("mean_stage_cost", float(stage.mean()), "{:.4f}"),
            ("final_stage_cost", float(stage[-1].mean()), "{:.4f}"),
            ("mean_|du|", float(du.mean()), "{:.4f}"),
            ("ms_per_env_step", 1e3 * t_warm / args.env_steps, "{:.2f}"),
            ("compile_s", t_first - t_warm, "{:.1f}"),
        ),
    )
    if args.out:
        logger = CSVLogger(
            args.out, ["step", "mean_stage_cost", "mean_abs_u"]
        )
        us_np = np.asarray(us)
        for i in range(args.env_steps):
            logger.log(
                step=i,
                mean_stage_cost=float(stage[i].mean()),
                mean_abs_u=float(np.abs(us_np[i]).mean()),
            )
        logger.close()
    return float(upright.mean())


if __name__ == "__main__":
    main()
