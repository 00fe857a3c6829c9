"""A/B on real TPU: planar quadrotor (n=6, m=2) fused mega-kernel vs the
XLA path — the m>1 in-kernel pnqp on a real model at production batch.

Same-process interleaved timing (CLAUDE.md measurement discipline).

Since round 2 the DEFAULT budget is 24 MB, so the nm=8 problem
(riccati_vmem_bytes(20,6,2) ~ 12 MB) rides the resident mega-kernel as-is
— this script's hardware win is WHY the default was raised. Run with
DIFFMPC_VMEM_BUDGET_MB=10 to reproduce the old streaming-kernel dispatch
(experiment knob, see ops/pallas/riccati.py).
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from diffmpc_tpu import MPCConfig, QuadCost, mpc_solve
from diffmpc_tpu.models import QuadrotorDx


def main():
    B, T = 1024, 20
    dx = QuadrotorDx.default(jnp.float32)
    q, p = dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        np.stack(
            [rng.uniform(-0.5, 0.5, B), rng.uniform(-0.5, 0.5, B),
             rng.uniform(-0.3, 0.3, B), rng.uniform(-0.3, 0.3, B),
             rng.uniform(-0.3, 0.3, B), rng.uniform(-0.3, 0.3, B)],
            -1,
        ),
        jnp.float32,
    )
    base = MPCConfig(
        n_state=6, n_ctrl=2, T=T, lqr_iter=10, eps=1e-5,
        exit_unconverged=False, detach_unconverged=False,
    )

    def make(config):
        @jax.jit
        def solve(x):
            sol = mpc_solve(config, x, cost, dx, u_lower=0.0, u_upper=5.0)
            return sol.us, sol.objs

        return solve

    fns = {}
    for name, up in (("pallas", True), ("xla", False)):
        solve = make(dataclasses.replace(base, use_pallas=up))
        t0 = time.perf_counter()
        out = jax.block_until_ready(solve(x0))
        print(f"{name}: first call (compile+run) {time.perf_counter()-t0:.1f}s",
              flush=True)
        fns[name] = (solve, out)

    dobj = float(jnp.max(jnp.abs(fns["pallas"][1][1] - fns["xla"][1][1])))
    frac = float(jnp.mean(
        jnp.abs(fns["pallas"][1][0] - fns["xla"][1][0]) < 1e-2
    ))
    print(f"per-scenario max-obj diff {dobj:.2e}, controls within 1e-2: "
          f"{frac:.3f}", flush=True)

    t_p = t_x = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(8):
            o = fns["pallas"][0](x0)
        jax.block_until_ready(o)
        t_p = min(t_p, (time.perf_counter() - t0) / 8)
        t0 = time.perf_counter()
        for _ in range(4):
            o = fns["xla"][0](x0)
        jax.block_until_ready(o)
        t_x = min(t_x, (time.perf_counter() - t0) / 4)
    print(
        f"quadrotor T={T} B={B}: pallas {t_p*1e3:.3f} ms ({B/t_p:,.0f}/s), "
        f"xla {t_x*1e3:.3f} ms ({B/t_x:,.0f}/s), speedup {t_x/t_p:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
