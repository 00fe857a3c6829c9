"""Benchmark: batched pendulum MPC solves/s on one chip.

Driver contract: prints ONE JSON line
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.
Target (BASELINE.md): >= 10,000 pendulum MPC solves/s/chip at T=20, B=1024
(full iLQR solve with box constraints and learned-dynamics-compatible path).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SOLVES_PER_S = 10_000.0


def main():
    from diffmpc_tpu import mpc_solve
    from __graft_entry__ import _pendulum_setup, _x_init

    B, T = 1024, 20
    config, cost, dx = _pendulum_setup(T=T)

    @jax.jit
    def solve(x_init):
        sol = mpc_solve(
            config, x_init, cost, dx, u_lower=-2.0, u_upper=2.0
        )
        return sol.us, sol.objs, sol.info.converged

    # distinct problem sets so no solve is trivially cached
    n_sets = 8
    xs = [_x_init(B, seed=s) for s in range(n_sets)]

    # warmup / compile
    jax.block_until_ready(solve(xs[0]))
    jax.block_until_ready(solve(xs[1]))

    n_timed = 24
    t0 = time.perf_counter()
    for i in range(n_timed):
        us, objs, conv = solve(xs[i % n_sets])
    jax.block_until_ready((us, objs, conv))
    dt = time.perf_counter() - t0

    solves_per_s = n_timed * B / dt
    print(
        json.dumps(
            {
                "metric": "pendulum_mpc_solves_per_s_per_chip_T20_B1024",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
