"""Long-horizon hardware datum past T=128 (VERDICT r4 #4/missing #4).

The streaming kernel family's O(1)-in-T VMEM claim and its crossover vs
the resident family were only measured at T=128; SURVEY §1 frames the
horizon axis as ~20-1000. This script records on-chip data at T=512 and
T=1024 (where streaming is the only option at default budgets):

1. full ``mpc_solve`` (streaming mega-path) ms/batch + solves/s at
   B=1024 — the tracked-row shape;
2. bare Riccati pass: streaming kernel vs the sequential XLA scan vs the
   blocked parallel-in-time XLA form (``riccati_backward_blocked``,
   unconstrained) at B=8 and B=1024 — re-checking the
   sequential-vs-parallel-in-time crossover at these horizons.

Protocol: interleaved rounds, per-variant minima (CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/long_horizon.py
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", f"{_REPO}/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _pendulum_setup, _x_init
from diffmpc_tpu import mpc_solve


def timeit(fns, rounds=5, reps=5):
    best = {k: float("inf") for k in fns}
    for _ in range(rounds):
        for k, (fn, args) in fns.items():
            t0 = time.perf_counter()
            for _ in range(reps):
                o = fn(*args)
            jax.block_until_ready(o)
            best[k] = min(best[k], (time.perf_counter() - t0) / reps)
    return best


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    B = 1024

    # ---- 1. full solve at T=512 / T=1024 ----
    for T in (512, 1024):
        config, cost, dx = _pendulum_setup(T=T)
        x = _x_init(B, seed=11)
        fn = jax.jit(
            lambda xi, config=config, cost=cost, dx=dx: mpc_solve(
                config, xi, cost, dx, u_lower=-2.0, u_upper=2.0
            ).objs
        )
        t0 = time.time()
        jax.block_until_ready(fn(x))
        print(f"T={T} full solve: compile+first {time.time()-t0:.1f}s",
              flush=True)
        best = timeit({"solve": (fn, (x,))}, rounds=4, reps=4)
        dt = best["solve"]
        print(
            f"T={T} B={B} full mpc_solve: {dt*1e3:.2f} ms/batch "
            f"({B/dt:,.0f} solves/s)",
            flush=True,
        )

    # ---- 2. bare Riccati pass: streaming vs sequential vs blocked ----
    from diffmpc_tpu.ops.assoc_riccati import riccati_backward_blocked
    from diffmpc_tpu.ops.lqr import riccati_backward
    from diffmpc_tpu.ops.pallas.riccati_stream import (
        riccati_backward_pallas_stream,
    )

    n, m = 3, 1
    nm = n + m
    for T in (512, 1024):
        for Bp in (8, 1024):
            rng = np.random.default_rng(T + Bp)
            L = rng.normal(size=(T, Bp, nm, nm)).astype(np.float32)
            C = jnp.asarray(
                np.einsum("tbij,tbkj->tbik", L, L) / nm
                + 0.5 * np.eye(nm, dtype=np.float32)
            )
            c = jnp.asarray(rng.normal(size=(T, Bp, nm)).astype(np.float32))
            F = jnp.asarray(
                (rng.normal(size=(T, Bp, n, nm)) * 0.5).astype(np.float32)
            )
            f = jnp.asarray(
                (rng.normal(size=(T, Bp, n)) * 0.5).astype(np.float32)
            )
            fns = {
                "seq_xla": (
                    jax.jit(lambda C, c, F, f: riccati_backward(C, c, F, f, n).K),
                    (C, c, F, f),
                ),
                "blocked16_xla": (
                    jax.jit(
                        lambda C, c, F, f: riccati_backward_blocked(
                            C, c, F, f, n, n_blocks=16
                        ).K
                    ),
                    (C, c, F, f),
                ),
                "stream_pallas": (
                    jax.jit(
                        lambda C, c, F, f: riccati_backward_pallas_stream(
                            C, c, F, f, n
                        ).K
                    ),
                    (C, c, F, f),
                ),
            }
            for k, (fn, args) in fns.items():
                t0 = time.time()
                jax.block_until_ready(fn(*args))
                print(f"  T={T} B={Bp} {k}: compile {time.time()-t0:.1f}s",
                      flush=True)
            best = timeit(fns, rounds=5, reps=5)
            row = " | ".join(
                f"{k} {best[k]*1e3:.2f} ms" for k in fns
            )
            print(f"T={T} B={Bp} riccati pass: {row}", flush=True)


if __name__ == "__main__":
    main()
