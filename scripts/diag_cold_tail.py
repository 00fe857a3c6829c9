"""Diagnose the cold-convergence tail at the headline shape (VERDICT r4 #3).

The cold B=1024 pendulum sweep converges ~0.77 at the lqr_iter=10 default
and only ~0.96 even at lqr_iter=20 (results/r4_sweep_lqr_iter3.log) —
~4% of scenarios do not converge at 2x the budget. This script classifies
the unconverged population using the fused kernel's per-scenario stats:

- **budget-bound** (``n_iters == lqr_iter``, last improvement >= eps):
  still making progress when the budget ran out — a slow tail that more
  iterations fix.
- **plateau-frozen** (``n_iters < lqr_iter``, last improvement >= eps):
  frozen by ``not_improved_lim`` — the per-iteration improvement landed in
  the [eps, best_cost_eps) band 5 iterations running. More budget CANNOT
  help these (they are frozen out of the loop); only the knobs can.

For the plateau population the script then re-runs with the candidate
knob fixes (not_improved_lim=10^6; best_cost_eps=eps) to measure how much
of the tail each recovers, checks the alpha floor (line-search failure
signature), and prints a handful of stuck initial states.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/diag_cold_tail.py
       [--cpu] [--batch 1024]
"""

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", f"{_REPO}/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _pendulum_setup, _x_init
    from diffmpc_tpu.mpc import _expand_cost
    from diffmpc_tpu.ops.pallas.ilqr import ilqr_solve_fused

    print("backend:", jax.default_backend())
    B = args.batch
    T = 20
    config, cost, dx = _pendulum_setup(T=T)
    x = _x_init(B, seed=0)
    qc = _expand_cost(cost, T, B, jnp.float32)
    lo = jnp.full((T, B, 1), -2.0, jnp.float32)
    hi = jnp.full((T, B, 1), 2.0, jnp.float32)
    eps = config.eps
    interp = args.cpu

    def solve(lqr_iter, not_improved_lim=5, best_cost_eps=1e-4):
        fn = jax.jit(
            lambda xi: ilqr_solve_fused(
                xi, qc.C, qc.c, dx, lo, hi,
                lqr_iter=lqr_iter, pnqp_iter=8, reg=config.back_eps,
                decay=config.linesearch_decay,
                max_linesearch_iter=config.max_linesearch_iter,
                eps=eps, best_cost_eps=best_cost_eps,
                not_improved_lim=not_improved_lim,
                interpret=interp,
            )
        )
        return jax.block_until_ready(fn(x))

    alpha_floor = config.linesearch_decay ** (config.max_linesearch_iter - 1)

    print(f"\n== budget sweep (defaults: not_improved_lim=5, "
          f"best_cost_eps=1e-4, eps={eps:g}) ==")
    results = {}
    for it in (10, 20, 30, 50):
        r = solve(it)
        results[it] = r
        conv = np.asarray(r.converged)
        ni = np.asarray(r.n_iters)
        impr = np.asarray(r.last_improvement)
        al = np.asarray(r.alpha)
        un = ~conv
        budget_bound = un & (ni >= it)
        plateau = un & (ni < it)
        at_floor = un & (al <= alpha_floor * 1.001)
        print(
            f"lqr_iter={it:3d}: converged {conv.mean():.4f} | "
            f"unconverged {un.sum():4d} = budget-bound {budget_bound.sum():4d}"
            f" + plateau-frozen {plateau.sum():4d} | "
            f"alpha-floor among unconverged {at_floor.sum():4d} | "
            f"median unconv improvement {np.median(impr[un]) if un.any() else 0:.2e}"
        )

    # --- knob probes on the lqr_iter=50 tail ---
    print("\n== knob probes at lqr_iter=50 ==")
    r_nolimit = solve(50, not_improved_lim=10**6)
    conv_nl = np.asarray(r_nolimit.converged)
    print(f"not_improved_lim=1e6:        converged {conv_nl.mean():.4f}")
    r_strict = solve(50, best_cost_eps=eps)
    conv_bs = np.asarray(r_strict.converged)
    print(f"best_cost_eps=eps ({eps:g}): converged {conv_bs.mean():.4f}")
    r_both = solve(50, not_improved_lim=10**6, best_cost_eps=eps)
    conv_both = np.asarray(r_both.converged)
    print(f"both:                        converged {conv_both.mean():.4f}")

    # --- who is stuck at every setting? ---
    stuck = (~np.asarray(results[50].converged)) & (~conv_nl) & (~conv_both)
    th = np.degrees(np.arctan2(np.asarray(x)[:, 1], np.asarray(x)[:, 0]))
    om = np.asarray(x)[:, 2]
    print(f"\n== stuck at every setting: {stuck.sum()} scenarios ==")
    idx = np.flatnonzero(stuck)[:12]
    r50 = results[50]
    for i in idx:
        print(
            f"  theta0={th[i]:8.2f} deg  om0={om[i]:6.2f}  "
            f"obj={float(np.asarray(r50.objs)[i]):9.3f}  "
            f"alpha={float(np.asarray(r50.alpha)[i]):.4f}  "
            f"impr={float(np.asarray(r50.last_improvement)[i]):.2e}  "
            f"n_iters={int(np.asarray(r50.n_iters)[i])}"
        )
    if stuck.any():
        print(
            f"  angle stats of stuck set: |theta0| median "
            f"{np.median(np.abs(th[stuck])):.1f} deg "
            f"(all: {np.median(np.abs(th)):.1f}); "
            f"om0 median {np.median(om[stuck]):.2f}"
        )

    # --- do the unconverged still have meaningfully worse objectives? ---
    objs50 = np.asarray(results[50].objs)
    conv50 = np.asarray(results[50].converged)
    if (~conv50).any():
        print(
            f"\nobjective: converged median {np.median(objs50[conv50]):.3f}, "
            f"unconverged median {np.median(objs50[~conv50]):.3f}"
        )


if __name__ == "__main__":
    main()
