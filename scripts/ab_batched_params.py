"""A/B on real TPU: per-scenario dynamics params vs shared params on the
fused Pallas path (mega-kernel + fused KKT backward).

Per-scenario (domain-randomized) physics stages one (S, 128) VMEM tile per
parameter instead of SMEM scalars; this measures what that staging costs at
the bench shape and checks parity: a (B, P) params array whose rows all
equal the shared params must reproduce the shared-params solve exactly
(same kernel arithmetic, broadcast tile vs scalar).

Timing is strict alternation with per-variant minima (the tunneled chip is
time-shared; see CLAUDE.md measurement discipline).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from diffmpc_tpu import MPCConfig, QuadCost, mpc_solve
from diffmpc_tpu.models import PendulumDx


def main():
    B, T = 1024, 20
    dx = PendulumDx.default(jnp.float32)
    q, p = dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)
    rng = np.random.default_rng(0)
    th = rng.uniform(-np.pi, np.pi, B)
    x = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), rng.uniform(-1, 1, B)], -1),
        jnp.float32,
    )
    config = MPCConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=10, eps=1e-5,
        exit_unconverged=False, detach_unconverged=False, use_pallas=True,
    )

    # genuinely per-scenario physics for the timing run
    scale = jnp.asarray(rng.uniform(0.8, 1.2, (B, 3)), jnp.float32)
    params_b = dx.params * scale
    params_u = jnp.broadcast_to(dx.params, (B, 3))  # uniform rows

    @jax.jit
    def solve(params, xi):
        sol = mpc_solve(
            config, xi, cost, dx.replace(params=params),
            u_lower=-2.0, u_upper=2.0,
        )
        return sol.us, sol.objs

    @jax.jit
    def solve_shared(xi):
        sol = mpc_solve(config, xi, cost, dx, u_lower=-2.0, u_upper=2.0)
        return sol.us, sol.objs

    # --- parity: uniform (B, P) rows must reproduce the shared solve
    us_u, objs_u = jax.block_until_ready(solve(params_u, x))
    us_s, objs_s = jax.block_until_ready(solve_shared(x))
    du = float(jnp.max(jnp.abs(us_u - us_s)))
    print(f"uniform-rows vs shared-params max |du| = {du:.3e}", flush=True)

    # --- per-scenario grads through the fused KKT backward
    g = jax.jit(
        jax.grad(lambda pp: jnp.mean(solve(pp, x)[1]))
    )(params_b)
    assert g.shape == (B, 3) and bool(jnp.all(jnp.isfinite(g)))
    print(f"per-scenario grad rows finite, |g| = {float(jnp.linalg.norm(g)):.4f}",
          flush=True)

    # --- strict-alternation timing
    out = jax.block_until_ready(solve(params_b, x))
    t_b = t_s = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(8):
            out = solve(params_b, x)
        jax.block_until_ready(out)
        t_b = min(t_b, (time.perf_counter() - t0) / 8)
        t0 = time.perf_counter()
        for _ in range(8):
            out = solve_shared(x)
        jax.block_until_ready(out)
        t_s = min(t_s, (time.perf_counter() - t0) / 8)
    print(
        f"T={T} B={B}: per-scenario {t_b*1e3:.3f} ms, shared {t_s*1e3:.3f} ms, "
        f"overhead {t_b/t_s - 1:+.1%} ({B/t_b:,.0f} vs {B/t_s:,.0f} solves/s)",
        flush=True,
    )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
