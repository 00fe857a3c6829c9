"""A/B on real TPU: hoisted (data-parallel) linearization pre-pass in the
mega-kernel vs the round-1 in-sweep linearization.

The depth-blocked ILP experiment (scripts/ab_blocked_ilp.py) was rejected
because its 2x-ILP trade cost 2x flops. This is the ZERO-extra-flop
version of the same observation: the per-step linearization (jvp probes
through ``entries_step``) and the delta-form linear cost ``cd`` do not
depend on the value carry — ~20-30% of the sweep body's ops for the
pendulum (more for MLP dynamics, where the probes dominate) sit on the
serial dependency chain for no reason. ``hoist_lin=True`` computes them
in a pre-pass whose iterations are independent (no loop-carried value),
then the sweep reads VMEM scratch.

Protocol: fixed work (eps=0, exact lqr_iter), variants interleaved with
per-variant minima, every timing loop CLOSED BY A HOST FETCH of a
scalar-reduced result (CLAUDE.md async-dispatch trap).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_hoist_lin.py
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

from diffmpc_tpu import QuadCost
from diffmpc_tpu.models import NNDynamics, PendulumDx
from diffmpc_tpu.mpc import _expand_cost
from diffmpc_tpu.ops.pallas.ilqr import ilqr_solve_fused

N_DISPATCH = 20
N_ROUNDS = 6


def pendulum_case(T, B):
    dx = PendulumDx.default(jnp.float32)
    q, p = dx.get_true_obj()
    qc = _expand_cost(QuadCost(jnp.diag(q), p), T, B, jnp.float32)
    rng = np.random.default_rng(B)
    th = rng.uniform(-np.pi, np.pi, B)
    x = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), rng.uniform(-1, 1, B)], -1),
        jnp.float32,
    )
    lo = jnp.full((T, B, 1), -2.0, jnp.float32)
    hi = jnp.full((T, B, 1), 2.0, jnp.float32)
    return dx, qc, x, lo, hi


def nn_case(T, B):
    nn = NNDynamics.init(
        jax.random.PRNGKey(0), 3, 1, hidden=(16, 16), residual=True
    )
    dxp = PendulumDx.default(jnp.float32)
    q, p = dxp.get_true_obj()
    qc = _expand_cost(QuadCost(jnp.diag(q), p), T, B, jnp.float32)
    rng = np.random.default_rng(B + 1)
    th = rng.uniform(-np.pi, np.pi, B)
    x = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), rng.uniform(-1, 1, B)], -1),
        jnp.float32,
    )
    lo = jnp.full((T, B, 1), -2.0, jnp.float32)
    hi = jnp.full((T, B, 1), 2.0, jnp.float32)
    return nn, qc, x, lo, hi


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    cases = [
        ("pendulum T=20 B=1024", pendulum_case(20, 1024)),
        ("pendulum T=20 B=65536", pendulum_case(20, 65536)),
        ("nn-4-16-16-3 T=15 B=1024", nn_case(15, 1024)),
    ]
    for name, (dx, qc, x, lo, hi) in cases:
        def make(hoist):
            def f(xi):
                fr = ilqr_solve_fused(
                    xi, qc.C, qc.c, dx, lo, hi,
                    lqr_iter=10, pnqp_iter=8, eps=0.0,
                    not_improved_lim=10**6, hoist_lin=hoist,
                )
                return jnp.sum(fr.us) + jnp.sum(fr.objs)
            return jax.jit(f)

        fns = {"base": make(False), "hoist": make(True)}
        vals = {}
        for k, fn in fns.items():
            t0 = time.time()
            vals[k] = float(fn(x))
            print(f"  {name} {k}: compile+first {time.time()-t0:.1f}s",
                  flush=True)
        rel = abs(vals["base"] - vals["hoist"]) / (abs(vals["base"]) + 1e-9)
        print(f"  {name}: scalar-checksum rel diff {rel:.2e}", flush=True)

        best = {k: float("inf") for k in fns}
        for _ in range(N_ROUNDS):
            for k, fn in fns.items():
                t0 = time.perf_counter()
                for _ in range(N_DISPATCH):
                    r = fn(x)
                _ = float(r)  # guaranteed drain
                best[k] = min(
                    best[k], (time.perf_counter() - t0) / N_DISPATCH
                )
        print(
            f"{name}: base {best['base']*1e3:.3f} ms | hoist "
            f"{best['hoist']*1e3:.3f} ms | speedup "
            f"{best['base']/best['hoist']:.3f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
