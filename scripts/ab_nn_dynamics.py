"""A/B on real TPU: NN-dynamics imitation workload (SURVEY.md §3.5 /
eval-config-4 shape) on the fused Pallas path vs the XLA path.

A kernel-fusable MLP (hidden (16,16), < 1024 params) rides the mega-kernel
via NNDynamics.entries_step; the same problem with use_pallas=False takes
the XLA ladder. Same-dispatch A/B (both timed with on-device lax.map) so
tunnel contention cancels in the ratio.
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from diffmpc_tpu import MPCConfig, QuadCost, mpc_solve
from diffmpc_tpu.models import NNDynamics, PendulumDx


def timed(fn, *args, reps=4, loops=4):
    out = jax.block_until_ready(fn(*args))
    dt = float("inf")
    for _ in range(loops):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = min(dt, (time.perf_counter() - t0) / reps)
    return dt, out


def main():
    n, m, T, B = 3, 1, 15, 1024
    key = jax.random.PRNGKey(0)
    nn = NNDynamics.init(key, n, m, hidden=(16, 16), residual=True)
    assert nn.kernel_fusable
    true_dx = PendulumDx.default(jnp.float32)
    q, p = true_dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)

    rng = np.random.default_rng(0)
    th = rng.uniform(-np.pi, np.pi, B)
    x = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), rng.uniform(-1, 1, B)], -1), jnp.float32
    )

    def make(config):
        @jax.jit
        def solve(xi):
            sol = mpc_solve(config, xi, cost, nn, u_lower=-2.0, u_upper=2.0)
            return sol.us, sol.objs

        def loss(params, xi):
            sol = mpc_solve(
                config, xi, cost,
                nn.replace(weights=params[0], biases=params[1]),
                u_lower=-2.0, u_upper=2.0,
            )
            return jnp.mean(sol.us**2)

        grad = jax.jit(
            lambda params, xi: jax.grad(loss)(params, xi)
        )
        return solve, grad

    base = MPCConfig(
        n_state=n, n_ctrl=m, T=T, lqr_iter=8, eps=1e-5,
        exit_unconverged=False, detach_unconverged=False,
    )
    cfg_pl = dataclasses.replace(base, use_pallas=True)
    cfg_xla = dataclasses.replace(base, use_pallas=False)

    solve_pl, grad_pl = make(cfg_pl)
    solve_xla, grad_xla = make(cfg_xla)
    params = (nn.weights, nn.biases)

    dt_pl, out_pl = timed(solve_pl, x)
    dt_xla, out_xla = timed(solve_xla, x)
    obj_diff = float(jnp.max(jnp.abs(jnp.mean(out_pl[1]) - jnp.mean(out_xla[1]))))
    print(
        f"NN forward solve T={T} B={B} hidden(16,16): pallas {dt_pl*1e3:.3f} ms, "
        f"xla {dt_xla*1e3:.3f} ms, speedup {dt_xla/dt_pl:.2f}x, "
        f"mean-obj diff {obj_diff:.2e}",
        flush=True,
    )

    dt_gpl, g_pl = timed(grad_pl, params, x)
    dt_gxla, g_xla = timed(grad_xla, params, x)
    gnorm = lambda g: float(
        sum(jnp.sum(w**2) for w in jax.tree_util.tree_leaves(g)) ** 0.5
    )
    print(
        f"NN solve+grad: pallas {dt_gpl*1e3:.3f} ms, xla {dt_gxla*1e3:.3f} ms, "
        f"speedup {dt_gxla/dt_gpl:.2f}x, |g| pallas {gnorm(g_pl):.4f} "
        f"xla {gnorm(g_xla):.4f}",
        flush=True,
    )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
