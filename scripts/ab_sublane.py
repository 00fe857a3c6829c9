"""A/B on real TPU: entry-tile height (DIFFMPC_SUBLANE) for the fused iLQR.

Hypothesis (roofline work, round 3): at SUBLANE=8 every entry-op is exactly
one (8,128) vreg over 1024 scenarios, and the solve-level roofline (~30%
of the VPU bound) says the kernel is dominated by per-op issue/latency +
per-step scalar-core loop overhead, not ALU throughput. SUBLANE=16 makes each entry-op two
independent vregs (2048 scenarios/tile): same scalar work, 2x vector work
per op — up to 2x if the overhead hypothesis is right, ~1x if the VPU is
already saturated.

TILE height is bound at import (kernel shapes), so variants run as child
processes, ALTERNATED parent-side across rounds with per-variant minima —
the cross-process analog of the same-process interleaving discipline
(CLAUDE.md): contention bursts hit both variants equally in expectation and
minima discard them.

Usage: python scripts/ab_sublane.py            (parent; ~5-10 min)
       python scripts/ab_sublane.py --child    (internal)

RESULT (2026-08-19, TPU v5 lite, best-of-4 alternated rounds, ms/call):

    vs sublane 8:   B2048   S8 1.803  S16 1.567   -> 1.15x
                    B2048 eps=0 (fixed work) 1.704 -> 1.596  1.07x
                    B65536  S8 24.415 S16 18.114  -> 1.35x
    16 vs 32:       B4096   S16 1.939 S32 1.973   -> wash
                    B8192   S16 2.605 S32 2.268   -> 1.15x
                    B65536  S16 18.11 S32 16.40   -> 1.10x

Auto-upgrade policy shipped in riccati.pick_tile_sublane (used by the
mega-kernel, the fused KKT backward, and the standalone Riccati/rollout
kernels): tallest of {32,16,8} that exactly divides B and fits the VMEM
budget (B=1024 headline program unchanged; 65k ensemble ~4.0M solves/s).

Long-horizon STREAMING kernels (T=128, full mpc_solve, forced via
DIFFMPC_SUBLANE since the auto-pick is not plumbed there): S16 wins only
2-6% (B2048 4.69 -> 4.50-4.61 ms; B4096 8.53 -> 7.98-8.04 ms across 3
rounds) — the double-buffered DMA pipeline is already hiding most
per-step overhead, so the wide-tile win is mostly gone. Auto-pick
deliberately NOT extended to the streaming family on this data (manual
staging complexity for <6%); the env knob gives it to users who want it.

CLOSED 2026-08-20 (VERDICT r3 #7) at the shape with the least DMA slack —
the long-horizon ensemble (best-of-3 alternated rounds, ms/call):

    B8192_T128   S8  18.086   S16 17.139  -> 1.06x
    B65536_T128  S8 227.586   S16 227.805 -> 1.00x (wash)

At B=65,536 the pipeline is fully bandwidth/latency-hidden and the wide
tile buys nothing. Below the >=10%-anywhere-real adoption bar:
**rejected-with-data** — streaming family stays at S8 with the env knob.

SUBLANE 64 (2026-08-20, resident mega-kernel, DIFFMPC_VMEM_BUDGET_MB=48
to admit the ~35 MB tile; best-of-3 alternated rounds):

    B65536       S32 16.772   S64 16.227  -> 1.03x
    B65536_eps0  S32 16.040   S64 16.169  -> 0.99x (fixed work: wash)

The 8-16-32 ladder's returns (1.15x, 1.10x, ~1.0x) are exhausted: at
S=32 every entry-op already puts 4 independent vregs behind the serial
recursion and the VPU issue is saturated. S=64 rejected — the auto-pick
ladder stays {32, 16, 8} and the default VMEM budget stays 24 MB.
"""

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

ROUNDS = int(os.environ.get("AB_SUBLANE_ROUNDS", "4"))
SUBLANES = (8, 16)  # override: --sublanes 16,32


def child():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _pendulum_setup, _x_init
    from diffmpc_tpu import mpc_solve
    from diffmpc_tpu.mpc import _expand_cost
    from diffmpc_tpu.ops.pallas.ilqr import ilqr_solve_fused
    from diffmpc_tpu.ops.pallas.riccati import SUBLANE

    out = {"sublane": SUBLANE}

    def make(B, eps, T=20):
        config, cost, dx = _pendulum_setup(T=T)
        x = _x_init(B, seed=3)
        if T > 64:
            # long horizon: the full solve through mpc_solve (dispatches
            # the HBM-streaming kernels past the resident budget)
            @jax.jit
            def f(xi):
                return mpc_solve(
                    config, xi, cost, dx, u_lower=-2.0, u_upper=2.0
                ).us
            return f, x
        qc = _expand_cost(cost, T, B, jnp.float32)
        lo = jnp.full((T, B, 1), -2.0, jnp.float32)
        hi = jnp.full((T, B, 1), 2.0, jnp.float32)

        @jax.jit
        def f(xi):
            return ilqr_solve_fused(
                xi, qc.C, qc.c, dx, lo, hi,
                lqr_iter=10, pnqp_iter=8, reg=1e-7,
                decay=config.linesearch_decay,
                max_linesearch_iter=config.max_linesearch_iter,
                eps=eps,
                not_improved_lim=10**6 if eps == 0.0 else 5,
            ).us
        return f, x

    # case spec: B<batch>[_T<horizon>][_eps0]
    case_spec = os.environ.get(
        "AB_SUBLANE_CASES", "B2048,B2048_eps0,B65536"
    ).split(",")
    cases = {}
    for spec in case_spec:
        parts = spec.split("_")
        b = int(parts[0][1:])
        T = next((int(p[1:]) for p in parts[1:] if p.startswith("T")), 20)
        cases[spec] = make(b, 0.0 if "eps0" in parts else 1e-5, T=T)
    for name, (f, x) in cases.items():
        jax.block_until_ready(f(x))  # compile
        calls = 20 if int(name.split("_")[0][1:]) <= 8192 else 3
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(calls):
                r = f(x)
            jax.block_until_ready(r)
            best = min(best, (time.perf_counter() - t0) / calls)
        out[name + "_ms"] = round(best * 1e3, 4)
    print("CHILD_RESULT " + json.dumps(out), flush=True)


def main():
    sublanes = SUBLANES
    if "--sublanes" in sys.argv:
        sublanes = tuple(
            int(v) for v in sys.argv[sys.argv.index("--sublanes") + 1].split(",")
        )
    best = {s: {} for s in sublanes}
    for rnd in range(ROUNDS):
        for s in sublanes:  # alternate variants per round
            env = dict(os.environ)
            env["DIFFMPC_SUBLANE"] = str(s)
            env.setdefault("JAX_COMPILATION_CACHE_DIR", f"{_REPO}/.jax_cache")
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                env=env, capture_output=True, text=True, timeout=1500,
            )
            line = [l for l in res.stdout.splitlines() if l.startswith("CHILD_RESULT")]
            if not line:
                print(f"round {rnd} sublane {s} FAILED:\n{res.stderr[-1500:]}")
                sys.exit(1)
            d = json.loads(line[0][len("CHILD_RESULT "):])
            for k, v in d.items():
                if k.endswith("_ms"):
                    best[s][k] = min(best[s].get(k, float("inf")), v)
            print(f"round {rnd} sublane {s}: {d}", flush=True)
    print("\nbest-of-rounds (ms/call):")
    base = sublanes[0]
    for k in sorted(best[base]):
        row = "  ".join(
            f"S{s} {best[s][k]:8.3f}" for s in sublanes
        )
        r = best[base][k] / best[sublanes[-1]][k]
        print(f"  {k:<14} {row}  S{sublanes[-1]} speedup {r:5.2f}x")


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        main()
