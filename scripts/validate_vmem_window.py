"""Hardware validation of the 10-24 MB VMEM dispatch window (ADVICE r2 #1).

Round 2 raised the default resident-dispatch budget from 10 MB (the bound
needing no Mosaic window lift) to 24 MB (dispatches get
``vmem_limit_bytes=72 MB``), hardware-validated only at the nm=8 quadrotor
mega-kernel shape. Any OTHER shape whose footprint estimate lands in
(10, 24] MB now takes a resident kernel it never took before — if Mosaic
refuses to allocate it, the user sees a compile error where round 1 would
have silently streamed.

This script dispatches EVERY resident kernel family at representative
shapes spanning the window — near the 10 MB no-lift edge, mid-window, and
near the 24 MB budget edge, across the three env sizes (nm=4 pendulum,
nm=6 cartpole, nm=8 quadrotor) — on the real chip, checking compile + run
+ finite outputs. Families:

  1. mega-kernel iLQR          (ops/pallas/ilqr.py,    ilqr_vmem_bytes)
  2. composite Riccati         (ops/pallas/riccati.py, riccati_vmem_bytes)
  3. line-search rollout       (ops/pallas/rollout.py, riccati+rollout_scratch)
  4. fused KKT backward        (ops/pallas/kkt.py,     kkt_vmem_bytes)

Usage (one TPU process at a time; ~2-4 min, compile-dominated):
    python scripts/validate_vmem_window.py

RESULT (2026-08-19, TPU v5 lite): **36/36 OK** — every family x env x
window-edge shape (ilqr_mega/riccati/rollout/kkt x pendulum nm=4 /
cartpole nm=6 / quadrotor nm=8 x ~12/~17/~24 MB) compiles under the
lifted Mosaic window and runs finite. The 10-24 MB dispatch window is
hardware-validated across the whole resident-kernel surface, not just the
quadrotor mega-kernel shape (ADVICE r2 #1).

Wide-tile pass (run with DIFFMPC_SUBLANE=16 / =32 — estimators and
window_shapes scale automatically with the module tile): **36/36 OK at
sublane 16, 35/35 at 32** (2026-08-19) — the round-3 tile-height upgrade
is window-validated at every height the auto-pick can choose.
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

MB = 1024 * 1024


def pick_T(bytes_fn, n, m, target_bytes, T_max=4096):
    """Largest T whose footprint estimate is <= target_bytes."""
    best = None
    for T in range(2, T_max):
        if bytes_fn(T, n, m) <= target_bytes:
            best = T
        else:
            break
    return best


def window_shapes(bytes_fn, n, m, lo_b, hi_b):
    """(T, est) pairs landing just above the no-lift edge, mid-window, and
    at the budget edge — only those whose estimate is strictly in (lo, hi]."""
    out = []
    for target in (lo_b + 2 * MB, (lo_b + hi_b) // 2, hi_b):
        T = pick_T(bytes_fn, n, m, target)
        if T is None:
            continue
        est = bytes_fn(T, n, m)
        if lo_b < est <= hi_b and (T, est) not in out:
            out.append((T, est))
    return out


def envs():
    from diffmpc_tpu.models import CartpoleDx, PendulumDx, QuadrotorDx

    return [
        ("pendulum", PendulumDx.default(jnp.float32), 3, 1),
        ("cartpole", CartpoleDx.default(jnp.float32), 5, 1),
        ("quadrotor", QuadrotorDx.default(jnp.float32), 6, 2),
    ]


def problem(dx, n, m, T, B=1024):
    rng = np.random.default_rng(7)
    nm = n + m
    C = jnp.broadcast_to(jnp.eye(nm, dtype=jnp.float32), (T, B, nm, nm))
    c = jnp.asarray(rng.uniform(-0.3, 0.3, (T, B, nm)), jnp.float32)
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (B, n)), jnp.float32)
    lo = jnp.full((T, B, m), -2.0, jnp.float32)
    hi = jnp.full((T, B, m), 2.0, jnp.float32)
    return C, c, x, lo, hi


def run_one(fam, name, T, est, fn):
    t0 = time.perf_counter()
    try:
        out = jax.block_until_ready(fn())
        ok = all(
            bool(jnp.all(jnp.isfinite(o)))
            for o in jax.tree_util.tree_leaves(out)
            if hasattr(o, "dtype") and jnp.issubdtype(o.dtype, jnp.floating)
        )
        dt = time.perf_counter() - t0
        print(
            f"  OK  {fam:<12} {name:<9} T={T:<4} est={est/MB:5.1f}MB "
            f"finite={ok} ({dt:.1f}s incl compile)",
            flush=True,
        )
        return {"ok": True, "finite": ok, "s": round(dt, 1)}
    except Exception as e:  # the failure mode under test: Mosaic refusal
        print(f"  FAIL {fam:<12} {name:<9} T={T} est={est/MB:.1f}MB: {e!r}"[:300])
        return {"ok": False, "error": repr(e)[:200]}


def main():
    from diffmpc_tpu.ops.pallas import riccati as rmod
    from diffmpc_tpu.ops.pallas.ilqr import ilqr_solve_fused
    from diffmpc_tpu.ops.pallas.kkt import kkt_backward_fused, kkt_vmem_bytes
    from diffmpc_tpu.ops.pallas.riccati import (
        ilqr_vmem_bytes,
        riccati_backward_pallas,
        riccati_vmem_bytes,
        rollout_scratch_bytes,
    )
    from diffmpc_tpu.ops.pallas.rollout import linesearch_rollout_pallas

    lo_b, hi_b = rmod.NO_LIFT_VMEM_BYTES, rmod.VMEM_BUDGET_BYTES
    print(f"window: ({lo_b/MB:.0f}, {hi_b/MB:.0f}] MB on {jax.devices()[0].device_kind}")
    results = {}

    def rollout_bytes(T, n, m):
        return riccati_vmem_bytes(T, n, m) + rollout_scratch_bytes(T, n, m)

    for name, dx, n, m in envs():
        for fam, bytes_fn in (
            ("ilqr_mega", ilqr_vmem_bytes),
            ("riccati", riccati_vmem_bytes),
            ("rollout", rollout_bytes),
            ("kkt", kkt_vmem_bytes),
        ):
            for T, est in window_shapes(bytes_fn, n, m, lo_b, hi_b):
                C, c, x, lo, hi = problem(dx, n, m, T)
                if fam == "ilqr_mega":
                    fn = jax.jit(
                        lambda C=C, c=c, x=x, lo=lo, hi=hi: ilqr_solve_fused(
                            x, C, c, dx, lo, hi, lqr_iter=2, pnqp_iter=4
                        ).us
                    )
                elif fam == "riccati":
                    u0 = jnp.zeros((T, C.shape[1], m), jnp.float32)
                    fn = jax.jit(
                        lambda C=C, c=c, lo=lo, hi=hi, u0=u0: riccati_backward_pallas(
                            C, c,
                            jnp.zeros((T, C.shape[1], n, n + m), jnp.float32),
                            None, n, u_lower=lo, u_upper=hi, u_hat=u0,
                        ).K
                    )
                elif fam == "rollout":
                    B = C.shape[1]
                    K = jnp.zeros((T, B, m, n), jnp.float32)
                    k = jnp.full((T, B, m), 0.01, jnp.float32)
                    xh = jnp.zeros((T, B, n), jnp.float32)
                    uh = jnp.zeros((T, B, m), jnp.float32)
                    F = jnp.zeros((T, B, n, n + m), jnp.float32)
                    fn = jax.jit(
                        lambda C=C, c=c, x=x, F=F, K=K, k=k, xh=xh, uh=uh,
                        lo=lo, hi=hi: linesearch_rollout_pallas(
                            x, C, c, F, None, K, k, xh, uh,
                            u_lower=lo, u_upper=hi,
                        ).us
                    )
                else:  # kkt
                    B = C.shape[1]
                    r = jnp.asarray(
                        np.random.default_rng(9).uniform(-0.1, 0.1, (T, B, n + m)),
                        jnp.float32,
                    )
                    tau = jnp.zeros((T, B, n + m), jnp.float32)
                    tight = jnp.zeros((T, B, m), bool)
                    F = jnp.zeros((T, B, n, n + m), jnp.float32)
                    fn = jax.jit(
                        lambda C=C, c=c, F=F, r=r, tau=tau, tight=tight:
                        kkt_backward_fused(C, c, F, r, tau, tight)[1]
                    )
                results[f"{fam}/{name}/T{T}"] = run_one(fam, name, T, est, fn)

    n_fail = sum(1 for v in results.values() if not v["ok"])
    print(json.dumps({"total": len(results), "failures": n_fail}))
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
