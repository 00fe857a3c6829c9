"""Interleaved A/B: shared-primal ``jax.linearize`` Jacobian probes vs the
committed per-column ``jax.jvp`` probes in the fused iLQR mega-kernel.

The OLD kernel module is materialized from ``git show HEAD:...ilqr.py`` and
imported as a sibling module inside ``diffmpc_tpu.ops.pallas`` so both
variants run (and are timed in strict alternation) in one process.
Shapes: the bench NN-dynamics config (T=15, B=1024, MLP 4-16-16-3) and the
pendulum flagship (T=20, B=1024).
"""

import importlib.util
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

R = 4  # on-device repetitions per dispatch
ROUNDS = 8


def load_old_ilqr():
    src = subprocess.run(
        ["git", "-C", "/root/repo", "show", "HEAD:diffmpc_tpu/ops/pallas/ilqr.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    path = "/tmp/_ilqr_old.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location(
        "diffmpc_tpu.ops.pallas._ilqr_old", path
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["diffmpc_tpu.ops.pallas._ilqr_old"] = mod
    spec.loader.exec_module(mod)
    return mod


def bench_pair(tag, make_solve, x_stack):
    import diffmpc_tpu.ops.pallas.ilqr as new_mod

    old_mod = load_old_ilqr()
    fns = {
        "new(linearize)": jax.jit(make_solve(new_mod.ilqr_solve_fused)),
        "old(jvp-probes)": jax.jit(make_solve(old_mod.ilqr_solve_fused)),
    }
    outs = {}
    for k, f in fns.items():
        outs[k] = jax.block_until_ready(f(x_stack))
        print(f"compiled {k}", flush=True)
    # parity first
    a = np.asarray(outs["new(linearize)"][0])
    b = np.asarray(outs["old(jvp-probes)"][0])
    print(f"{tag}: max|u_new - u_old| = {np.abs(a - b).max():.3e}", flush=True)

    best = {k: float("inf") for k in fns}
    for _ in range(ROUNDS):
        for k, f in fns.items():
            t0 = time.perf_counter()
            o = f(x_stack)
            jax.block_until_ready(o)
            best[k] = min(best[k], (time.perf_counter() - t0) / R)
    for k, v in best.items():
        print(f"{tag} {k:16s} {v*1e3:8.3f} ms", flush=True)
    print(
        f"{tag} speedup old/new = "
        f"{best['old(jvp-probes)'] / best['new(linearize)']:.3f}x",
        flush=True,
    )


def nn_case():
    from diffmpc_tpu.models import NNDynamics

    B, T, n, m = 1024, 15, 3, 1
    rng = np.random.default_rng(0)
    dx = NNDynamics.init(
        jax.random.PRNGKey(0), n, m, hidden=(16, 16), dtype=jnp.float32
    )
    C = jnp.broadcast_to(jnp.eye(n + m, dtype=jnp.float32), (T, B, n + m, n + m))
    c = jnp.zeros((T, B, n + m), jnp.float32)
    lo = jnp.full((T, B, m), -2.0, jnp.float32)
    hi = jnp.full((T, B, m), 2.0, jnp.float32)
    x0 = jnp.asarray(rng.normal(size=(B, n)) * 0.5, jnp.float32)
    xs = jnp.stack([x0 + 0.01 * i for i in range(R)])

    def make_solve(fused):
        def one(x):
            fr = fused(
                x, C, c, dx, lo, hi,
                lqr_iter=10, pnqp_iter=8, reg=1e-7,
                decay=0.2, max_linesearch_iter=10, delta_u=None,
                eps=1e-5, best_cost_eps=1e-4, not_improved_lim=5,
            )
            return fr.us, fr.objs

        return lambda s: jax.lax.map(one, s)

    bench_pair("nn(4-16-16-3) T=15", make_solve, xs)


def pendulum_case():
    from __graft_entry__ import _pendulum_setup, _x_init
    from diffmpc_tpu.mpc import _expand_cost

    B, T = 1024, 20
    config, cost, dx = _pendulum_setup(T=T)
    qc = _expand_cost(cost, T, B, jnp.float32)
    lo = jnp.full((T, B, 1), -2.0, jnp.float32)
    hi = jnp.full((T, B, 1), 2.0, jnp.float32)
    xs = jnp.stack([_x_init(B, seed=s) for s in range(R)])

    def make_solve(fused):
        def one(x):
            fr = fused(
                x, qc.C, qc.c, dx, lo, hi,
                lqr_iter=10, pnqp_iter=8, reg=1e-7,
                decay=0.2, max_linesearch_iter=10, delta_u=None,
                eps=1e-5, best_cost_eps=1e-4, not_improved_lim=5,
            )
            return fr.us, fr.objs

        return lambda s: jax.lax.map(one, s)

    bench_pair("pendulum T=20", make_solve, xs)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    nn_case()
    pendulum_case()
