"""A/B on real TPU: the STANDALONE Riccati backward kernel with the
simplified (DDP-cancellation) value update vs the full quadratic form, at
the bench shape (T=20, B=1024, m=1).

Purpose (VERDICT r3 #2c): BENCH_DETAILS riccati_pass_ms came in at 0.84 ms
in round 3 vs the ~0.63 ms known-good anchor — either tunnel contention
(that run was recompiling everything) or a real regression from the
round-3 value-update math. This interleaved same-process A/B separates the
two: both variants compiled eagerly, timed in strict alternation with
per-variant minima (CLAUDE.md measurement discipline), 50 sequential
dispatches per sample like bench.py's riccati block.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from diffmpc_tpu.models import PendulumDx
from diffmpc_tpu.mpc import _expand_cost
from diffmpc_tpu.ops.linearize import linearize_dynamics
from diffmpc_tpu.ops.pallas import riccati as R
from diffmpc_tpu.types import QuadCost


def main():
    B, T = 1024, 20
    dx = PendulumDx.default(jnp.float32)
    q, p = dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)
    qc = _expand_cost(cost, T, B, jnp.float32)
    rng = np.random.default_rng(0)
    th = rng.uniform(-np.pi, np.pi, B)
    x0 = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), rng.uniform(-1, 1, B)], -1),
        jnp.float32,
    )
    u0 = jnp.zeros((T, B, 1), jnp.float32)
    xs0 = jnp.broadcast_to(x0[:1], (T, B, 3))
    lin = jax.jit(lambda a, b: linearize_dynamics(dx, a, b))(xs0, u0)
    lo = jnp.full((T, B, 1), -2.0)
    hi = jnp.full((T, B, 1), 2.0)

    def make():
        def ric(C, c, F, f, uh):
            return R.riccati_backward_pallas(
                C, c, F, f, 3, u_lower=lo, u_upper=hi, u_hat=uh
            )

        return jax.jit(ric)

    args = (qc.C, qc.c, lin.F, lin.f, u0)
    fns = {}
    orig = R.VALUE_UPDATE_EXACT_REG
    try:
        # explicit bindings: after fd07c1e the module default is -1.0
        # (full form), so binding `orig` for the simplified arm would
        # measure full-vs-full (round-4 review catch, same fix as
        # ab_value_update.py)
        for vname, bound in (("simplified", 1e-6), ("full", -1.0)):
            R.VALUE_UPDATE_EXACT_REG = bound
            t0 = time.perf_counter()
            compiled = make().lower(*args).compile()
            out = jax.block_until_ready(compiled(*args))
            print(
                f"{vname}: compile+run {time.perf_counter()-t0:.1f}s",
                flush=True,
            )
            fns[vname] = (compiled, out)
    finally:
        R.VALUE_UPDATE_EXACT_REG = orig

    # gains parity between the two forms (single pass, no chaos):
    dK = float(
        jnp.max(jnp.abs(fns["simplified"][1].K - fns["full"][1].K))
    )
    print(f"max|dK| {dK:.2e}", flush=True)

    best = {k: float("inf") for k in fns}
    for _ in range(6):
        for k in fns:
            t0 = time.perf_counter()
            for _ in range(50):
                o = fns[k][0](*args)
            jax.block_until_ready(o)
            best[k] = min(best[k], (time.perf_counter() - t0) / 50)
    for k in fns:
        print(f"{k}: {best[k]*1e3:.4f} ms/pass", flush=True)
    print(
        f"simplified speedup {best['full']/best['simplified']:.3f}x "
        f"(anchor ~0.63 ms; r3 bench saw 0.8375 ms)",
        flush=True,
    )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
