"""A/B on real TPU: rolled vs unrolled mega-kernel loops.

Round-1 unrolled the iLQR iterations and the line-search ladder in Python
(lqr_iter x n_alpha copies of the T-loops in the Mosaic program); the body
is iteration-independent, so fori_loop keeps the program O(1) in both
knobs. This measures BOTH effects:

- compile wall time (the motivation: the nm=8 quadrotor kernel took the
  unrolled program past a 10-minute compile),
- steady-state runtime, interleaved same-process (the thing that must not
  regress; see CLAUDE.md measurement discipline).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from diffmpc_tpu.mpc import _expand_bound, _expand_cost
from diffmpc_tpu.models import PendulumDx
from diffmpc_tpu.ops.pallas.ilqr import ilqr_solve_fused


def main():
    B, T, LQR_ITER = 1024, 20, 10
    dx = PendulumDx.default(jnp.float32)
    q, p = dx.get_true_obj()
    from diffmpc_tpu import QuadCost

    cost = _expand_cost(QuadCost(jnp.diag(q), p), T, B, jnp.float32)
    lo = _expand_bound(-2.0, T, B, 1, jnp.float32)
    hi = _expand_bound(2.0, T, B, 1, jnp.float32)
    rng = np.random.default_rng(0)
    th = rng.uniform(-np.pi, np.pi, B)
    x = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), rng.uniform(-1, 1, B)], -1),
        jnp.float32,
    )

    def make(unroll):
        @jax.jit
        def solve(xi):
            out = ilqr_solve_fused(
                xi, cost.C, cost.c, dx, lo, hi,
                lqr_iter=LQR_ITER, eps=1e-5, unroll=unroll,
            )
            return out.us, out.objs

        return solve

    results = {}
    for name, unroll in (("rolled", False), ("unrolled", True)):
        solve = make(unroll)
        t0 = time.perf_counter()
        out = jax.block_until_ready(solve(x))
        results[name] = dict(compile_s=time.perf_counter() - t0, fn=solve, out=out)
        print(f"{name}: first-call (compile+run) {results[name]['compile_s']:.1f}s",
              flush=True)

    du = float(jnp.max(jnp.abs(results["rolled"]["out"][0]
                               - results["unrolled"]["out"][0])))
    dobj = float(jnp.max(jnp.abs(results["rolled"]["out"][1]
                                 - results["unrolled"]["out"][1])))
    print(f"agreement: max|du| {du:.3e}, max|dobj| {dobj:.3e}", flush=True)

    t_r = t_u = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(8):
            o = results["rolled"]["fn"](x)
        jax.block_until_ready(o)
        t_r = min(t_r, (time.perf_counter() - t0) / 8)
        t0 = time.perf_counter()
        for _ in range(8):
            o = results["unrolled"]["fn"](x)
        jax.block_until_ready(o)
        t_u = min(t_u, (time.perf_counter() - t0) / 8)
    print(
        f"T={T} B={B} lqr_iter={LQR_ITER}: rolled {t_r*1e3:.3f} ms, "
        f"unrolled {t_u*1e3:.3f} ms, rolled/unrolled {t_r/t_u:.3f}",
        flush=True,
    )

    # Dispatch-amortized repeat (bench.py protocol): a single dispatch costs
    # ~2-3 ms through the tunnel, which can hide a kernel-level difference;
    # lax.map over n_sets problem sets amortizes it so the per-solve number
    # approaches pure kernel time.
    n_sets = 8
    ths = np.random.default_rng(1).uniform(-np.pi, np.pi, (n_sets, B))
    vels = np.random.default_rng(2).uniform(-1, 1, (n_sets, B))
    xs = jnp.asarray(np.stack([np.cos(ths), np.sin(ths), vels], -1),
                     jnp.float32)

    many = {}
    for name in ("rolled", "unrolled"):
        fn = results[name]["fn"]
        solve_many = jax.jit(lambda xsa, fn=fn: jax.lax.map(fn, xsa))
        jax.block_until_ready(solve_many(xs))
        many[name] = solve_many

    t_r = t_u = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(4):
            o = many["rolled"](xs)
        jax.block_until_ready(o)
        t_r = min(t_r, (time.perf_counter() - t0) / (4 * n_sets))
        t0 = time.perf_counter()
        for _ in range(4):
            o = many["unrolled"](xs)
        jax.block_until_ready(o)
        t_u = min(t_u, (time.perf_counter() - t0) / (4 * n_sets))
    print(
        f"amortized (lax.map x{n_sets}): rolled {t_r*1e3:.3f} ms/solve, "
        f"unrolled {t_u*1e3:.3f} ms/solve, rolled/unrolled {t_r/t_u:.3f}",
        flush=True,
    )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
