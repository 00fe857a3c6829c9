"""A/B on real TPU: fused mega-kernel (padded to the 1024-lane tile) vs the
XLA orchestration at SMALL batches.

The dispatch floor ``B >= TILE_B // 2 = 512`` (mpc._would_use_fused) was set
as a <=2x-padding-waste policy, not a measurement: the kernel pads any B up
to one (S, 128) tile internally (ops/pallas/ilqr.py), so a B=128 problem
costs the same kernel time as B=1024 while the XLA path scales down. This
measures where the crossover actually is. Interleaved same-process A/B per
CLAUDE.md measurement discipline.

MEASURED (2026-08-18, T=20 pendulum, single dispatch, time-shared chip):
the fused kernel wins at EVERY batch size — fused/xla 0.74 (B=1), 0.90
(B=4-8), 0.83-0.88 (B=16-32), 0.77 (B=64), 0.66 (B=128), 0.49 (B=256),
0.30 (B=512), 0.17 (B=1024). Kernel time is flat (~3.5 ms single-dispatch
incl. ~2 ms dispatch overhead) while the XLA path's T-sequential scans
never get cheap. The floor was REMOVED on this data (mpc._would_use_fused).
Sizes via DIFFMPC_AB_SIZES=1,4,8 env.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from diffmpc_tpu import MPCConfig, QuadCost, mpc_solve
from diffmpc_tpu.mpc import _expand_bound, _expand_cost
from diffmpc_tpu.models import PendulumDx
from diffmpc_tpu.ops.pallas.ilqr import ilqr_solve_fused


def main():
    T, LQR_ITER = 20, 10
    dx = PendulumDx.default(jnp.float32)
    q, p = dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)

    import os

    sizes = tuple(
        int(s) for s in os.environ.get(
            "DIFFMPC_AB_SIZES", "64,128,256,512,1024"
        ).split(",")
    )
    for B in sizes:
        qc = _expand_cost(cost, T, B, jnp.float32)
        lo = _expand_bound(-2.0, T, B, 1, jnp.float32)
        hi = _expand_bound(2.0, T, B, 1, jnp.float32)
        rng = np.random.default_rng(B)
        th = rng.uniform(-np.pi, np.pi, B)
        x = jnp.asarray(
            np.stack([np.cos(th), np.sin(th), rng.uniform(-1, 1, B)], -1),
            jnp.float32,
        )

        @jax.jit
        def fused(xi):
            out = ilqr_solve_fused(
                xi, qc.C, qc.c, dx, lo, hi, lqr_iter=LQR_ITER, eps=1e-5
            )
            return out.objs

        config = MPCConfig(
            n_state=3, n_ctrl=1, T=T, lqr_iter=LQR_ITER, eps=1e-5,
            exit_unconverged=False, detach_unconverged=False,
            use_pallas=False,
        )

        @jax.jit
        def xla(xi):
            return mpc_solve(
                config, xi, cost, dx, u_lower=-2.0, u_upper=2.0
            ).objs

        o1 = jax.block_until_ready(fused(x))
        o2 = jax.block_until_ready(xla(x))
        dobj = float(jnp.max(jnp.abs(o1 - o2)))

        t_f = t_x = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            for _ in range(8):
                r = fused(x)
            jax.block_until_ready(r)
            t_f = min(t_f, (time.perf_counter() - t0) / 8)
            t0 = time.perf_counter()
            for _ in range(8):
                r = xla(x)
            jax.block_until_ready(r)
            t_x = min(t_x, (time.perf_counter() - t0) / 8)
        print(
            f"B={B:5d}: fused(padded) {t_f*1e3:7.3f} ms, xla {t_x*1e3:7.3f} ms, "
            f"fused/xla {t_f/t_x:5.2f}, max|dobj| {dobj:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
