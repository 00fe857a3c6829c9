"""A/B on real TPU: m=2 active-set enumeration pnqp vs the serial
projected-Newton loop inside the fused quadrotor mega-kernel.

Both variants are traced in ONE process (riccati._PNQP_ENUM flipped at
trace time, programs compiled eagerly) and timed interleaved with
per-variant minima — CLAUDE.md measurement discipline. Fixed work:
eps=0, exact lqr_iter.

Context: scripts/ab_pnqp_slope.py measured the 8-iteration loop at ~6%
of the solve AND not fully converged (|u(4)-u(8)| ~ 3e-4); enumeration
is exact (tests/test_pallas_kkt.py-style oracle construction), so the
win is accuracy + whatever the shorter chain buys.
"""

import os
import time

# A live DIFFMPC_PNQP_ENUM overrides the R._PNQP_ENUM monkeypatch
# (riccati._pnqp_enum_mode prefers the env var), which would make both
# variants trace identically and the A/B vacuous — clear it up front.
if os.environ.pop("DIFFMPC_PNQP_ENUM", None) is not None:
    print("NOTE: cleared exported DIFFMPC_PNQP_ENUM for the A/B")

import jax
import jax.numpy as jnp
import numpy as np

from diffmpc_tpu.models import QuadrotorDx
from diffmpc_tpu.ops.pallas import riccati as R
from diffmpc_tpu.ops.pallas.ilqr import ilqr_solve_fused


def main():
    B, T, LQR_ITER = 1024, 20, 10
    dx = QuadrotorDx.default(jnp.float32)
    q, p = dx.get_true_obj()
    C = jnp.broadcast_to(jnp.diag(q), (T, B, 8, 8))
    c = jnp.broadcast_to(p, (T, B, 8))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-0.4, 0.4, (B, 6)), jnp.float32)
    lo = jnp.zeros((T, B, 2), jnp.float32)
    hi = jnp.full((T, B, 2), 5.0, jnp.float32)

    def make():
        # fresh function object per knob setting: the knob is read at trace
        # time, so each variant needs its own jit trace (a shared jitted fn
        # would reuse the first trace for both).
        def solve(x):
            fr = ilqr_solve_fused(
                x, C, c, dx, lo, hi, lqr_iter=LQR_ITER, pnqp_iter=8, eps=0.0
            )
            return fr.us, fr.objs

        return jax.jit(solve)

    fns = {}
    for name, knob in (("enum", ""), ("loop", "0")):
        R._PNQP_ENUM = knob
        t0 = time.perf_counter()
        compiled = make().lower(x0).compile()
        out = jax.block_until_ready(compiled(x0))
        print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        fns[name] = (compiled, out)
    R._PNQP_ENUM = ""

    du = float(jnp.max(jnp.abs(fns["enum"][1][0] - fns["loop"][1][0])))
    dobj = float(jnp.max(jnp.abs(fns["enum"][1][1] - fns["loop"][1][1])))
    # enum is the exact QP solve: its trajectories must never cost more
    worse = float(jnp.max(fns["enum"][1][1] - fns["loop"][1][1]))
    print(f"max|du| {du:.2e}, max|dobj| {dobj:.2e}, "
          f"max(obj_enum - obj_loop) {worse:.2e}", flush=True)

    best = {k: float("inf") for k in fns}
    for _ in range(6):
        for k in fns:
            t0 = time.perf_counter()
            for _ in range(8):
                o = fns[k][0](x0)
            jax.block_until_ready(o)
            best[k] = min(best[k], (time.perf_counter() - t0) / 8)
    for k in fns:
        print(f"{k}: {best[k]*1e3:.3f} ms ({B/best[k]:,.0f} solves/s)",
              flush=True)
    print(f"enum speedup {best['loop']/best['enum']:.3f}x", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
