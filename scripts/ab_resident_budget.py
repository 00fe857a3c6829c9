"""A/B on real TPU: long-horizon (T=128) pendulum solve with the
VMEM-RESIDENT mega-kernel (raised dispatch budget) vs the default-budget
dispatch (XLA orchestration + HBM-streaming Riccati/rollout kernels).

The 10 MB dispatch budget was an empirically-safe round-1 bound; the
quadrotor experiment (scripts/ab_quadrotor.py, 68x at 24 MB) shows the
chip has far more VMEM headroom. This measures whether long horizons
should also go resident before we raise the default.

Run with DIFFMPC_VMEM_BUDGET_MB=40 (T=128 nm=4 mega-kernel needs
~28 MB resident incl. scratch). The two variants are produced by
monkeypatching ``riccati.VMEM_BUDGET_BYTES`` between trace times —
``fits_vmem``/``experiment_compiler_params`` read the module global at
trace time, so each jitted closure bakes in its own dispatch. Interleaved
same-process timing per CLAUDE.md measurement discipline.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from diffmpc_tpu import MPCConfig, QuadCost, mpc_solve
from diffmpc_tpu.mpc import _would_use_fused
from diffmpc_tpu.models import PendulumDx
from diffmpc_tpu.ops.pallas import riccati


def main():
    B, T = 1024, 128
    dx = PendulumDx.default(jnp.float32)
    q, p = dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)
    rng = np.random.default_rng(0)
    th = rng.uniform(-np.pi, np.pi, B)
    x0 = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), rng.uniform(-1, 1, B)], -1),
        jnp.float32,
    )
    config = MPCConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=10, eps=1e-5,
        exit_unconverged=False, detach_unconverged=False, use_pallas=True,
    )

    def make(budget_mb):
        riccati.VMEM_BUDGET_BYTES = budget_mb * 1024 * 1024
        fused = _would_use_fused(
            config, B, dx, is_quad=True, constrained=True, is_lin=False
        )

        @jax.jit
        def solve(x):
            sol = mpc_solve(config, x, cost, dx, u_lower=-2.0, u_upper=2.0)
            return sol.us, sol.objs

        t0 = time.perf_counter()
        out = jax.block_until_ready(solve(x0))
        print(
            f"budget {budget_mb} MB: mega-kernel dispatch={fused}, "
            f"first call {time.perf_counter()-t0:.1f}s",
            flush=True,
        )
        return solve, out, fused

    # streaming variant pinned at the no-lift bound (NOT a magic 10: this is
    # riccati.NO_LIFT_VMEM_BYTES, the round-1 default budget)
    solve_s, out_s, fused_s = make(riccati.NO_LIFT_VMEM_BYTES // (1024 * 1024))
    solve_r, out_r, fused_r = make(40)
    assert not fused_s and fused_r, (fused_s, fused_r)
    riccati.VMEM_BUDGET_BYTES = riccati.DEFAULT_VMEM_BUDGET_BYTES

    dobj = float(jnp.max(jnp.abs(out_s[1] - out_r[1])))
    frac = float(jnp.mean(jnp.abs(out_s[0] - out_r[0]) < 1e-2))
    print(f"max-obj diff {dobj:.2e}, controls within 1e-2: {frac:.3f}",
          flush=True)

    t_s = t_r = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(4):
            o = solve_r(x0)
        jax.block_until_ready(o)
        t_r = min(t_r, (time.perf_counter() - t0) / 4)
        t0 = time.perf_counter()
        for _ in range(4):
            o = solve_s(x0)
        jax.block_until_ready(o)
        t_s = min(t_s, (time.perf_counter() - t0) / 4)
    print(
        f"T={T} B={B}: resident {t_r*1e3:.3f} ms ({B/t_r:,.0f}/s), "
        f"streaming {t_s*1e3:.3f} ms ({B/t_s:,.0f}/s), "
        f"resident speedup {t_s/t_r:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
