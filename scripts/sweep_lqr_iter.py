"""Headline operating-point sweep on real TPU (VERDICT r3 #5): solves/s vs
converged_frac across lqr_iter, cold start and warm start, at the bench
shape (pendulum T=20, B=1024).

The headline 977k solves/s @ converged_frac 0.68 is the lqr_iter=10 point;
this sweep records the full Pareto curve so that operating point is a
documented choice, not an accident. All variants are compiled eagerly in
one process and timed INTERLEAVED per round with per-variant minima
(CLAUDE.md measurement discipline) — cross-variant ratios are trustworthy;
absolute numbers carry the usual tunnel noise.

Output: one JSON line per (lqr_iter, start) with ms/batch, solves/s and
converged_frac; paste the table into DESIGN.md §3.
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from __graft_entry__ import _pendulum_setup, _x_init
from diffmpc_tpu import mpc_solve

ITERS = (5, 10, 15, 20)


def main():
    B, T = 1024, 20
    config0, cost, dx = _pendulum_setup(T=T)
    x0 = _x_init(B, seed=3)

    # Warm start: the receding-horizon pattern — re-solve from the rolled
    # control plan of a converged reference solve (same protocol as
    # bench.py's warm block).
    # (round-4 review catch: this lambda used config0 — lqr_iter=10 — so
    # the recorded 2026-08-20 table's warm rows were seeded from a 10-iter
    # solve, not the converged 30-iter one; fixed and re-measured)
    ref_cfg = dataclasses.replace(config0, lqr_iter=30)
    ref = jax.jit(
        lambda x: mpc_solve(ref_cfg, x, cost, dx, u_lower=-2.0, u_upper=2.0).us
    )(x0)
    u_warm = jnp.roll(jax.block_until_ready(ref), -1, axis=0)

    variants = {}
    for it in ITERS:
        cfg = dataclasses.replace(config0, lqr_iter=it)
        for start, u_init in (("cold", None), ("warm", u_warm)):

            def make(cfg=cfg, u_init=u_init):
                def f(x):
                    sol = mpc_solve(
                        cfg, x, cost, dx, u_init=u_init,
                        u_lower=-2.0, u_upper=2.0,
                    )
                    return sol.objs, sol.info.converged
                return jax.jit(f)

            t0 = time.perf_counter()
            fn = make().lower(x0).compile()
            out = jax.block_until_ready(fn(x0))
            print(
                f"lqr_iter={it} {start}: compile+run "
                f"{time.perf_counter()-t0:.1f}s",
                flush=True,
            )
            variants[(it, start)] = (fn, float(jnp.mean(out[1])))

    best = {k: float("inf") for k in variants}
    for _ in range(6):
        for k, (fn, _) in variants.items():
            t0 = time.perf_counter()
            for _ in range(8):
                o = fn(x0)
            jax.block_until_ready(o)
            best[k] = min(best[k], (time.perf_counter() - t0) / 8)

    for (it, start), (fn, conv) in variants.items():
        dt = best[(it, start)]
        print(json.dumps({
            "lqr_iter": it, "start": start,
            "ms_per_batch": round(dt * 1e3, 3),
            "solves_per_s": round(B / dt, 1),
            "converged_frac": round(conv, 4),
        }), flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
