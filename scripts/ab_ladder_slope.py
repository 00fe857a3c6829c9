"""Interleaved timing of the fused iLQR kernel vs ``max_linesearch_iter``.

NOT an optimization A/B (changing n_alpha changes semantics) — a cost-model
probe: the per-alpha slope tells how much of an iteration the line-search
ladder costs, i.e. the upper bound for a ladder early exit. Also times a
rollout-free variant (lqr_iter sweep) for the per-iteration anchor.

RESULT (2026-08-17, T=20 B=1024 pendulum): ladder slope ~0.0094 ms/alpha
— the full 10-alpha ladder costs ~1% of an iteration; the Riccati sweep
dominates (~0.12 ms of the ~0.13 ms iteration slope from the lqr_iter
sweep). A ladder early exit is therefore NOT worth building; rejected.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

R = 4
ROUNDS = 8


def main():
    from __graft_entry__ import _pendulum_setup, _x_init
    from diffmpc_tpu.mpc import _expand_cost
    from diffmpc_tpu.ops.pallas.ilqr import ilqr_solve_fused

    B, T = 1024, 20
    config, cost, dx = _pendulum_setup(T=T)
    qc = _expand_cost(cost, T, B, jnp.float32)
    lo = jnp.full((T, B, 1), -2.0, jnp.float32)
    hi = jnp.full((T, B, 1), 2.0, jnp.float32)
    xs = jnp.stack([_x_init(B, seed=s) for s in range(R)])

    def make(n_alpha, lqr_iter=10):
        def one(x):
            fr = ilqr_solve_fused(
                x, qc.C, qc.c, dx, lo, hi,
                lqr_iter=lqr_iter, pnqp_iter=8, reg=1e-7,
                decay=0.2, max_linesearch_iter=n_alpha, delta_u=None,
                eps=1e-5, best_cost_eps=1e-4, not_improved_lim=5,
            )
            return fr.us, fr.objs, fr.n_iters

        return jax.jit(lambda s: jax.lax.map(one, s))

    variants = {
        "alpha=1": make(1),
        "alpha=4": make(4),
        "alpha=10": make(10),
        "alpha=10,iter=5": make(10, 5),
        "alpha=10,iter=20": make(10, 20),
    }
    info = {}
    for k, f in variants.items():
        o = jax.block_until_ready(f(xs))
        info[k] = float(np.mean(np.asarray(o[2])))
        print(f"compiled {k} (mean n_iters {info[k]:.2f})", flush=True)

    best = {k: float("inf") for k in variants}
    for _ in range(ROUNDS):
        for k, f in variants.items():
            t0 = time.perf_counter()
            jax.block_until_ready(f(xs))
            best[k] = min(best[k], (time.perf_counter() - t0) / R)
    for k, v in best.items():
        print(f"{k:18s} {v*1e3:8.3f} ms  (mean n_iters {info[k]:.2f})", flush=True)
    # slope per ladder-alpha per iteration
    d = (best["alpha=10"] - best["alpha=1"]) / 9.0
    print(f"ladder slope ~{d*1e3:.4f} ms per alpha (at mean iters above)", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
