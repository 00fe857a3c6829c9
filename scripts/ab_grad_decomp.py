"""Interleaved A/B decomposition of the solve+grad gap (T=20, B=1024).

Variants are timed in alternating rounds within one process (the tunneled
chip is time-shared; see CLAUDE.md measurement discipline) and we keep the
per-variant minimum. Each variant runs R on-device repetitions under one
dispatch (lax.map) so the ~2 ms dispatch RTT amortizes away.

Decomposition:
  fwd        forward mega-kernel solve only (config.backprop=False skips
             the differentiable fixed-point attach entirely)
  fwd+lin    + re-linearization at the solution (the fixed-point attach's
             forward work, WITHOUT the backward)
  grad       full solve + analytic KKT backward (jax.grad of a us-loss)
  kkt        kkt_backward_fused on fixed residuals (transforms + kernel)
  layouts    the kernel-layout transforms alone (no kernel)

fwd+lin - fwd   ≈ the attach's forward cost (re-linearization)
grad - fwd+lin  ≈ custom_vjp backward + cotangent routing
kkt - layouts   ≈ fused kernel compute alone
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _pendulum_setup, _x_init
from diffmpc_tpu import mpc_solve
from diffmpc_tpu.mpc import _expand_cost
from diffmpc_tpu.ops.linearize import linearize_dynamics
from diffmpc_tpu.ops.pallas.kkt import kkt_backward_fused
from diffmpc_tpu.ops.pallas.riccati import _from_kernel_layout, _to_kernel_layout

R = 8  # on-device repetitions per dispatch
ROUNDS = 12


def main():
    B, T, n, m = 1024, 20, 3, 1
    nm = n + m
    config, cost, dx = _pendulum_setup(T=T)
    x = _x_init(B, seed=0)
    xs_stack = jnp.stack([_x_init(B, seed=s) for s in range(R)])

    config_nb = dataclasses.replace(config, backprop=False)

    def solve_fwd(xi):
        # forward only: backprop=False skips the fixed-point attach
        sol = mpc_solve(config_nb, xi, cost, dx, u_lower=-2.0, u_upper=2.0)
        return sol.us, sol.objs

    def solve_lin(xi):
        # forward + the gradient-attach forward work, but no backward
        sol = mpc_solve(config, xi, cost, dx, u_lower=-2.0, u_upper=2.0)
        return sol.us, sol.objs

    def train_loss(params, xi):
        sol = mpc_solve(
            config, xi, cost, dx.replace(params=params), u_lower=-2.0, u_upper=2.0
        )
        return jnp.mean(sol.us**2)

    fns = {}
    fns["fwd"] = jax.jit(lambda xs: jax.lax.map(solve_fwd, xs))
    fns["fwd+lin"] = jax.jit(lambda xs: jax.lax.map(solve_lin, xs))
    fns["grad"] = jax.jit(
        lambda xs: jax.lax.map(lambda xi: jax.grad(train_loss)(dx.params, xi), xs)
    )

    # fixed residuals for the bare-kernel variants
    rng = np.random.default_rng(0)
    us = jax.block_until_ready(fns["fwd+lin"](xs_stack))[0][0]
    xs = jnp.asarray(rng.normal(size=(T, B, n)), jnp.float32)
    qc = _expand_cost(cost, T, B, jnp.float32)
    lin = jax.jit(lambda a, b: linearize_dynamics(dx, a, b))(xs, us)
    tau = jnp.concatenate([xs, us], axis=-1)
    r = jnp.asarray(rng.normal(size=(T, B, nm)), jnp.float32)
    tight = jnp.zeros((T, B, m), bool)

    def kkt_one(args):
        C, c, F, rr, tt = args
        return kkt_backward_fused(C, c, F, rr, tt, tight)

    def layouts_one(args):
        C, c, F, rr, tt = args
        ins = [
            _to_kernel_layout(C, 1),
            _to_kernel_layout(c, 1),
            _to_kernel_layout(F, 1),
            _to_kernel_layout(rr, 1),
            _to_kernel_layout(tt, 1),
        ]
        return [_from_kernel_layout(i) for i in ins]

    kkt_args = (qc.C, qc.c, lin.F, r, tau)
    stacked = tuple(jnp.stack([a + 1e-6 * i for i in range(R)]) for a in kkt_args)
    fns["kkt"] = jax.jit(lambda s: jax.lax.map(kkt_one, s))
    fns["layouts"] = jax.jit(lambda s: jax.lax.map(layouts_one, s))

    args = {
        "fwd": (xs_stack,),
        "fwd+lin": (xs_stack,),
        "grad": (xs_stack,),
        "kkt": (stacked,),
        "layouts": (stacked,),
    }

    # warm up every variant (compile) before any timing
    for k, f in fns.items():
        jax.block_until_ready(f(*args[k]))
        print(f"compiled {k}", flush=True)

    best = {k: float("inf") for k in fns}
    for rnd in range(ROUNDS):
        row = []
        for k, f in fns.items():
            t0 = time.perf_counter()
            out = f(*args[k])
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / R
            best[k] = min(best[k], dt)
            row.append(f"{k}={dt*1e3:.3f}")
        print(f"round {rnd}: " + " ".join(row), flush=True)
    for k, v in best.items():
        print(f"{k:10s} {v*1e3:8.3f} ms", flush=True)
    print(
        f"attach forward (fwd+lin - fwd):  {(best['fwd+lin']-best['fwd'])*1e3:.3f} ms",
        flush=True,
    )
    print(
        f"backward total (grad - fwd+lin): {(best['grad']-best['fwd+lin'])*1e3:.3f} ms",
        flush=True,
    )
    print(
        f"kernel compute (kkt - layouts):  {(best['kkt']-best['layouts'])*1e3:.3f} ms",
        flush=True,
    )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
