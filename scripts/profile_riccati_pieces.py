"""In-kernel cost decomposition of the fused iLQR Riccati sweep.

Dispatch overhead on the tunneled chip is comparable to the kernel time, so
each variant runs the sweep REPS times INSIDE one kernel, serially dependent
(rep r's initial value function is seeded from rep r-1's output, so Mosaic
cannot hoist or DCE the loop), and the per-sweep cost is the slope
(t[REPS=9] - t[REPS=1]) / 8. Variants stub pieces to attribute the cost:

  full       — the ric_body math as committed in ops/pallas/ilqr.py
  no_lin     — Jacobian probes replaced by V-dependent constants
  no_Qform   — skip W/Q/q formation, use C entries + V passthrough
  no_pnqp    — kt/K from cheap closed form instead of pnqp+masked solve
  no_Vup     — V_next = V + cheap touch (skip quadratic value update)
  rollout    — a T-step line-search-style rollout (per-op cost anchor)

RESULT (2026-08-17): inconclusive — the slopes came out NEGATIVE for most
variants (reps=9 faster per-dispatch than reps=1), i.e. Mosaic compiles the
two rep counts into programs whose constant overhead differs by more than
the 8-sweep delta, and tunnel contention swamps the rest. Stubbing pieces
also shifts register allocation for the WHOLE loop body, so piece costs are
wildly non-additive. Kept as a record of the methodology and its failure
mode: in-kernel repeat-slope decomposition does not give actionable signal
on this time-shared chip. The sweep-total numbers that ARE trustworthy come
from the lqr_iter sweep in ab_ladder_slope.py (~0.12 ms/iteration at
T=20 B=1024, i.e. ~6 us per Riccati step over 8 scenario tiles — within
~10x of the VPU op-count bound, mostly loop/register overhead).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffmpc_tpu.ops.pallas.riccati import (
    LANE,
    SUBLANE,
    _masked_chol_solve,
    _pnqp_entries,
    _to_kernel_layout,
)

T, B, n, m = 20, 1024, 3, 1
nm = n + m
N_DISPATCH = 30
ROUNDS = 6
REPS_HI = 9


def make_sweep_kernel(variant, entries_step, n_params, reps):
    def kernel(params_ref, C_ref, c_ref, xh_r, uh_r, lo_ref, hi_ref, K_o, k_o):
        params = [params_ref[j, 0] for j in range(n_params)]
        zero = jnp.zeros((SUBLANE, LANE), jnp.float32)
        one = jnp.ones((SUBLANE, LANE), jnp.float32)

        def dyn_lin(x, u):
            _, lin = jax.linearize(
                lambda xx, uu: entries_step(params, xx, uu), x, u
            )
            return lin

        def ric_body(s, Vv):
            t = T - 1 - s
            V = [[Vv[a * n + b] for b in range(n)] for a in range(n)]
            v = [Vv[n * n + a] for a in range(n)]
            xh = [xh_r[0, t, a] for a in range(n)]
            uh = [uh_r[0, t, a] for a in range(m)]

            if variant == "no_lin":
                # V-dependent stand-ins (not DCE-able, no tangent evals)
                Ft = [
                    [V[k][k] * 1e-6 + (one if j == k else zero) for j in range(nm)]
                    for k in range(n)
                ]
            else:
                lin = dyn_lin(xh, uh)
                Fcols = []
                for j in range(n):
                    seed = [one if a == j else zero for a in range(n)]
                    Fcols.append(lin(seed, [zero] * m))
                for j in range(m):
                    seed = [one if a == j else zero for a in range(m)]
                    Fcols.append(lin([zero] * n, seed))
                Ft = [[Fcols[j][k] for j in range(nm)] for k in range(n)]

            tau = xh + uh
            cd = [
                c_ref[0, t, a]
                + sum(C_ref[0, t, a, b] * tau[b] for b in range(nm))
                for a in range(nm)
            ]

            if variant == "no_Qform":
                Q = [
                    [C_ref[0, t, a, b] + (V[0][0] * 1e-6 if a == b else zero)
                     for b in range(nm)]
                    for a in range(nm)
                ]
                q = [cd[a] + Ft[0][a] * 1e-6 for a in range(nm)]
            else:
                W = [
                    [sum(V[k][l] * Ft[l][j] for l in range(n)) for j in range(nm)]
                    for k in range(n)
                ]
                Q = [[None] * nm for _ in range(nm)]
                for a in range(nm):
                    for b in range(a, nm):
                        val = C_ref[0, t, a, b] + sum(
                            Ft[k][a] * W[k][b] for k in range(n)
                        )
                        Q[a][b] = val
                        if b != a:
                            Q[b][a] = val
                q = [cd[a] + sum(Ft[k][a] * v[k] for k in range(n)) for a in range(nm)]

            Quu = [[Q[n + a][n + b] for b in range(m)] for a in range(m)]
            Qux = [[Q[n + a][b] for b in range(n)] for a in range(m)]
            qu = [q[n + a] for a in range(m)]

            if variant == "no_pnqp":
                inv = 1.0 / (Quu[0][0] + 1e-7)
                kt = [-qu[0] * inv]
                K = [[-Qux[0][b] * inv for b in range(n)]]
            else:
                lo_d = [lo_ref[0, t, a] - uh[a] for a in range(m)]
                hi_d = [hi_ref[0, t, a] - uh[a] for a in range(m)]
                kt, frozen, _ = _pnqp_entries(Quu, qu, lo_d, hi_d, m, 8, 1e-7)
                rhs_cols = [[Qux[a][b] for a in range(m)] for b in range(n)]
                K_cols = _masked_chol_solve(Quu, rhs_cols, frozen, m, 1e-7)
                K = [[-K_cols[b][a] for b in range(n)] for a in range(m)]

            for a in range(m):
                for b in range(n):
                    K_o[0, t, a, b] = K[a][b]
                k_o[0, t, a] = kt[a]

            if variant == "no_Vup":
                Vn = [[V[a][b] + (kt[0] * 1e-9 if a == b else zero)
                       for b in range(n)] for a in range(n)]
                vn = [v[a] + K[0][a] * 1e-9 for a in range(n)]
            else:
                QuuK = [
                    [sum(Quu[a][r] * K[r][j] for r in range(m)) for j in range(n)]
                    for a in range(m)
                ]
                Quuk = [sum(Quu[a][r] * kt[r] for r in range(m)) for a in range(m)]
                Vn = [[None] * n for _ in range(n)]
                for a in range(n):
                    for b in range(a, n):
                        qxuK_ab = sum(Q[a][n + r] * K[r][b] for r in range(m))
                        qxuK_ba = sum(Q[b][n + r] * K[r][a] for r in range(m))
                        kQk = sum(K[r][a] * QuuK[r][b] for r in range(m))
                        val = Q[a][b] + qxuK_ab + qxuK_ba + kQk
                        Vn[a][b] = val
                        if b != a:
                            Vn[b][a] = val
                vn = [
                    q[a]
                    + sum(Q[a][n + r] * kt[r] for r in range(m))
                    + sum(K[r][a] * (qu[r] + Quuk[r]) for r in range(m))
                    for a in range(n)
                ]

            return tuple(Vn[a][b] for a in range(n) for b in range(n)) + tuple(vn)

        def rep_body(r, seedv):
            init = tuple(seedv * 1e-30 for _ in range(n * n)) + tuple(
                seedv * 1e-30 for _ in range(n)
            )
            out = jax.lax.fori_loop(0, T, ric_body, init)
            return out[0]

        final = jax.lax.fori_loop(0, reps, rep_body, zero)
        k_o[0, 0, 0] = k_o[0, 0, 0] + final * 1e-30

    return kernel


def make_rollout_kernel(entries_step, n_params, reps):
    """T-step rollout with gain-feedback controls (line-search cost shape)."""

    def kernel(params_ref, C_ref, c_ref, xh_r, uh_r, lo_ref, hi_ref, K_o, k_o):
        params = [params_ref[j, 0] for j in range(n_params)]
        zero = jnp.zeros((SUBLANE, LANE), jnp.float32)

        def body(t, carry):
            obj = carry[0]
            x = list(carry[1:])
            u = []
            for a in range(m):
                acc = uh_r[0, t, a] + 0.5 * c_ref[0, t, n + a]
                for j in range(n):
                    acc = acc + C_ref[0, t, n + a, j] * (x[j] - xh_r[0, t, j])
                acc = jnp.clip(acc, lo_ref[0, t, a], hi_ref[0, t, a])
                u.append(acc)
            tau = x + u
            acc = None
            for a in range(nm):
                Ctau = sum(C_ref[0, t, a, b] * tau[b] for b in range(nm))
                term = (0.5 * Ctau + c_ref[0, t, a]) * tau[a]
                acc = term if acc is None else acc + term
            obj = obj + acc
            return (obj, *entries_step(params, x, u))

        def rep_body(r, seedv):
            x0 = [xh_r[0, 0, a] + seedv * 1e-30 for a in range(n)]
            out = jax.lax.fori_loop(0, T, body, (seedv * 1e-30, *x0))
            return out[0]

        final = jax.lax.fori_loop(0, reps, rep_body, zero)
        k_o[0, 0, 0] = final
        K_o[0, 0, 0, 0] = zero

    return kernel


def build(variant, reps, dx, params_arr, ins, in_specs):
    n_params = params_arr.shape[0]
    if variant == "rollout":
        kern = make_rollout_kernel(dx.entries_step, n_params, reps)
    else:
        kern = make_sweep_kernel(variant, dx.entries_step, n_params, reps)
    out_shapes = [
        jax.ShapeDtypeStruct((1, T, m, n, SUBLANE, LANE), jnp.float32),
        jax.ShapeDtypeStruct((1, T, m, SUBLANE, LANE), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec(s.shape, lambda g, nd=len(s.shape): (0,) * nd,
                     memory_space=pltpu.VMEM)
        for s in out_shapes
    ]
    f = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
    )
    return jax.jit(lambda *a: f(*a))


def main():
    from __graft_entry__ import _pendulum_setup

    config, cost, dx = _pendulum_setup(T=T)
    from diffmpc_tpu.mpc import _expand_cost

    qc = _expand_cost(cost, T, B, jnp.float32)
    rng = np.random.default_rng(0)
    params_arr = dx.kernel_params().astype(jnp.float32).reshape(-1, 1)

    xh = jnp.asarray(rng.normal(size=(T, B, n)), jnp.float32)
    uh = jnp.asarray(rng.normal(size=(T, B, m)) * 0.5, jnp.float32)
    lo = jnp.full((T, B, m), -2.0, jnp.float32)
    hi = jnp.full((T, B, m), 2.0, jnp.float32)

    ins = [params_arr]
    in_specs = [pl.BlockSpec((params_arr.shape[0], 1), lambda g: (0, 0),
                             memory_space=pltpu.SMEM)]

    def add(x):
        ins.append(x)
        in_specs.append(
            pl.BlockSpec((1,) + x.shape[1:],
                         lambda g, nd=x.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
        )

    add(_to_kernel_layout(qc.C.astype(jnp.float32), 1))
    add(_to_kernel_layout(qc.c.astype(jnp.float32), 1))
    add(_to_kernel_layout(xh, 1))
    add(_to_kernel_layout(uh, 1))
    add(_to_kernel_layout(lo, 1))
    add(_to_kernel_layout(hi, 1))

    variants = ["full", "no_lin", "no_Qform", "no_pnqp", "no_Vup", "rollout"]
    fns = {}
    for v in variants:
        for reps in (1, REPS_HI):
            fns[(v, reps)] = build(v, reps, dx, params_arr, ins, in_specs)
            jax.block_until_ready(fns[(v, reps)](*ins))
            print(f"compiled {v} reps={reps}", flush=True)

    best = {k: float("inf") for k in fns}
    for _ in range(ROUNDS):
        for k, f in fns.items():
            t0 = time.perf_counter()
            outs = [f(*ins) for _ in range(N_DISPATCH)]
            jax.block_until_ready(outs)
            best[k] = min(best[k], (time.perf_counter() - t0) / N_DISPATCH)

    print(f"\nper-sweep slope over {REPS_HI - 1} in-kernel reps "
          f"(T={T}, B={B}, n={n}, m={m}):", flush=True)
    full_slope = None
    for v in variants:
        slope = (best[(v, REPS_HI)] - best[(v, 1)]) / (REPS_HI - 1)
        if v == "full":
            full_slope = slope
        extra = "" if v == "full" else f"   piece ~{(full_slope - slope)*1e6:7.2f} us"
        print(f"{v:10s} sweep {slope*1e6:8.2f} us   "
              f"(reps1 {best[(v,1)]*1e3:6.3f} ms, reps{REPS_HI} "
              f"{best[(v,REPS_HI)]*1e3:6.3f} ms){extra}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
