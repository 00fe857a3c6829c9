"""A/B on real TPU: cost of the in-kernel projected-Newton loop at m=2.

The fused mega-kernel runs ``pnqp_iter`` serial Newton+Armijo iterations
per Riccati step in box mode (ops/pallas/riccati._pnqp_entries).  m=1 has
a closed form already; for m=2 the loop is the suspected dominant serial
chain of the quadrotor sweep.  This script measures the solve-level slope
in ``pnqp_iter`` under the fixed-work protocol (eps=0, exact lqr_iter —
CLAUDE.md measurement discipline), interleaving variants per round and
taking per-variant minima.

A large slope motivates the 3^m active-set enumeration (independent
candidate solves -> parallel ILP instead of the serial loop).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from diffmpc_tpu.models import QuadrotorDx
from diffmpc_tpu.ops.pallas.ilqr import ilqr_solve_fused

ITERS = (8, 4, 1)


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

    def make(pi):
        @jax.jit
        def solve(x):
            fr = ilqr_solve_fused(
                x, C, c, dx, lo, hi,
                lqr_iter=LQR_ITER, pnqp_iter=pi, eps=0.0,
            )
            return fr.us, fr.n_iters

        return solve

    fns = {}
    for pi in ITERS:
        f = make(pi)
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(x0))
        print(f"pnqp_iter={pi}: compile+run {time.perf_counter()-t0:.1f}s, "
              f"n_iters max {int(jnp.max(out[1]))}", flush=True)
        fns[pi] = (f, out)

    for pi in ITERS[1:]:
        d = float(jnp.max(jnp.abs(fns[pi][1][0] - fns[ITERS[0]][1][0])))
        print(f"max |u({pi}) - u({ITERS[0]})| = {d:.2e}", flush=True)

    best = {pi: float("inf") for pi in ITERS}
    for _ in range(6):
        for pi in ITERS:
            t0 = time.perf_counter()
            for _ in range(8):
                o = fns[pi][0](x0)
            jax.block_until_ready(o)
            best[pi] = min(best[pi], (time.perf_counter() - t0) / 8)
    for pi in ITERS:
        print(f"pnqp_iter={pi}: {best[pi]*1e3:.3f} ms "
              f"({B/best[pi]:,.0f} solves/s)", flush=True)
    # slope: ms per pnqp iteration across the whole solve
    a, b = ITERS[0], ITERS[-1]
    slope = (best[a] - best[b]) / (a - b)
    print(f"slope {slope*1e3:.4f} ms/pnqp_iter; loop share at pnqp_iter=8: "
          f"{(best[a]-best[b])/best[a]*100:.1f}% (+{b}-iter residual)",
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
