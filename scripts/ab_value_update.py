"""A/B on real TPU: simplified (DDP-cancellation) value update vs the full
quadratic form inside the fused mega-kernel, at the pendulum headline shape
(m=1) and the quadrotor shape (m=2).

Variants are traced fresh in one process (riccati.VALUE_UPDATE_EXACT_REG
= 1e-6 enables the simplified form at trace time, -1.0 the full form) and
timed interleaved with per-variant minima. Fixed work: eps=0, exact
lqr_iter.

RESULT (2026-08-20, r4, interleaved minima): pendulum m=1 simplified
0.969x (3.128 vs 3.032 ms), quadrotor m=2 1.008x (3.146 vs 3.172 ms);
standalone Riccati pass 1.008x with bitwise-identical gains
(scripts/ab_riccati_value.py). NEUTRAL at every shape -> the full form is
the default (riccati.VALUE_UPDATE_EXACT_REG = -1.0); the identity, knob
and tests remain for future re-evaluation.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from diffmpc_tpu.models import PendulumDx, QuadrotorDx
from diffmpc_tpu.ops.pallas import riccati as R
from diffmpc_tpu.ops.pallas.ilqr import ilqr_solve_fused


def pendulum_case(B=1024, T=20):
    dx = PendulumDx.default(jnp.float32)
    q, p = dx.get_true_obj()
    C = jnp.broadcast_to(jnp.diag(q), (T, B, 4, 4))
    c = jnp.broadcast_to(p, (T, B, 4))
    rng = np.random.default_rng(0)
    th = rng.uniform(-np.pi, np.pi, B)
    x0 = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), rng.uniform(-1, 1, B)], -1),
        jnp.float32,
    )
    lo = jnp.full((T, B, 1), -2.0, jnp.float32)
    hi = jnp.full((T, B, 1), 2.0, jnp.float32)
    return "pendulum m=1", dx, C, c, x0, lo, hi, B


def quadrotor_case(B=1024, T=20):
    dx = QuadrotorDx.default(jnp.float32)
    q, p = dx.get_true_obj()
    C = jnp.broadcast_to(jnp.diag(q), (T, B, 8, 8))
    c = jnp.broadcast_to(p, (T, B, 8))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-0.4, 0.4, (B, 6)), jnp.float32)
    lo = jnp.zeros((T, B, 2), jnp.float32)
    hi = jnp.full((T, B, 2), 5.0, jnp.float32)
    return "quadrotor m=2", dx, C, c, x0, lo, hi, B


def run_case(case):
    name, dx, C, c, x0, lo, hi, B = case

    def make():
        def solve(x):
            fr = ilqr_solve_fused(
                x, C, c, dx, lo, hi, lqr_iter=10, eps=0.0
            )
            return fr.us, fr.objs

        return jax.jit(solve)

    fns = {}
    orig = R.VALUE_UPDATE_EXACT_REG
    # try/finally: a compile/first-run failure (common on the tunneled TPU)
    # must not leave the module global at -1.0 for the rest of the process
    # (advisor finding, round 3).
    try:
        for vname, bound in (("simplified", 1e-6), ("full", -1.0)):
            R.VALUE_UPDATE_EXACT_REG = bound
            t0 = time.perf_counter()
            compiled = make().lower(x0).compile()
            out = jax.block_until_ready(compiled(x0))
            print(f"{name} {vname}: compile+run {time.perf_counter()-t0:.1f}s",
                  flush=True)
            fns[vname] = (compiled, out)
    finally:
        R.VALUE_UPDATE_EXACT_REG = orig

    du = float(jnp.max(jnp.abs(fns["simplified"][1][0] - fns["full"][1][0])))
    dob = float(jnp.max(jnp.abs(fns["simplified"][1][1] - fns["full"][1][1])))
    print(f"{name}: max|du| {du:.2e} max|dobj| {dob:.2e} "
          f"(multi-iteration — chaos tolerance applies)", flush=True)

    best = {k: float("inf") for k in fns}
    for _ in range(6):
        for k in fns:
            t0 = time.perf_counter()
            for _ in range(8):
                o = fns[k][0](x0)
            jax.block_until_ready(o)
            best[k] = min(best[k], (time.perf_counter() - t0) / 8)
    for k in fns:
        print(f"{name} {k}: {best[k]*1e3:.3f} ms ({B/best[k]:,.0f} solves/s)",
              flush=True)
    print(f"{name}: simplified speedup {best['full']/best['simplified']:.3f}x",
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    run_case(pendulum_case())
    run_case(quadrotor_case())
