"""A/B on real TPU: depth-blocked Riccati sweep vs the serial kernel.

VERDICT r4 #1 — the last untested mechanism behind the "structural"
roofline claim (~0.35 of the VPU bound at the headline shape, DESIGN.md
§3): trade flops for ILP by composing adjacent value maps so the serial
chain is T/D applies instead of T steps, with the composition work
data-parallel (ops/pallas/riccati_blocked.py has the math and phase
structure). Unconstrained sweep — the regime where the composition is
EXACT; if the mechanism cannot pay here it cannot pay in box mode either
(box would additionally need approximate active sets).

Protocol (CLAUDE.md measurement discipline): bare kernels timed with 50
sequential async dispatches per sample (lax.map adds ~0.85 ms/step to
bare kernels), variants interleaved per round, per-variant minima over
rounds; every timing loop CLOSED BY A HOST FETCH of a scalar-reduced
result (the r5 async-dispatch trap: block_until_ready on hot loops of
short programs intermittently returns at enqueue — a fetch guarantees
the drain). Fixed work by construction (the sweep has no early exit).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_blocked_ilp.py
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

from diffmpc_tpu.ops.pallas.riccati import riccati_backward_pallas
from diffmpc_tpu.ops.pallas.riccati_blocked import (
    riccati_backward_blocked_pallas,
)

N_DISPATCH = 50
N_ROUNDS = 6


def make_problem(T, B, n, m, seed):
    rng = np.random.default_rng(seed)
    nm = n + m
    V = rng.normal(size=(T, B, nm, nm)).astype(np.float32)
    C = np.einsum("tbij,tbkj->tbik", V, V) * 0.1 + np.eye(
        nm, dtype=np.float32
    )
    c = (rng.normal(size=(T, B, nm)) * 0.5).astype(np.float32)
    F = (rng.normal(size=(T, B, n, nm)) * 0.4).astype(np.float32)
    f = (rng.normal(size=(T, B, n)) * 0.2).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (C, c, F, f))


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    n, m = 3, 1
    shapes = [(20, 1024), (20, 65536), (128, 8192)]
    for T, B in shapes:
        C, c, F, f = make_problem(T, B, n, m, seed=T + B)

        variants = {
            "serial": jax.jit(
                lambda C, c, F, f: riccati_backward_pallas(C, c, F, f, n).K
            ),
            "blocked_D2": jax.jit(
                lambda C, c, F, f: riccati_backward_blocked_pallas(
                    C, c, F, f, n, block=2
                ).K
            ),
            "blocked_D4": jax.jit(
                lambda C, c, F, f: riccati_backward_blocked_pallas(
                    C, c, F, f, n, block=4
                ).K
            ),
        }
        # scalar-reduced twins for the timing loops (fetch-drained)
        timed = {
            k: jax.jit(lambda C, c, F, f, fn=fn: jnp.sum(fn(C, c, F, f)))
            for k, fn in variants.items()
        }

        # warm + correctness cross-check on device
        outs = {}
        for name, fn in variants.items():
            t0 = time.time()
            outs[name] = jax.block_until_ready(fn(C, c, F, f))
            print(f"  [{T}x{B}] {name}: compile+first {time.time()-t0:.1f}s")
        for name in ("blocked_D2", "blocked_D4"):
            d = float(jnp.max(jnp.abs(outs[name] - outs["serial"])))
            rel = d / float(jnp.max(jnp.abs(outs["serial"])))
            print(f"  [{T}x{B}] {name} vs serial: max|dK|={d:.2e} rel={rel:.2e}")

        for name, fn in timed.items():
            float(fn(C, c, F, f))  # warm + drain
        best = {name: float("inf") for name in variants}
        for _ in range(N_ROUNDS):
            for name, fn in timed.items():
                t0 = time.perf_counter()
                for _ in range(N_DISPATCH):
                    r = fn(C, c, F, f)
                _ = float(r)  # host fetch: guaranteed queue drain
                best[name] = min(
                    best[name], (time.perf_counter() - t0) / N_DISPATCH
                )
        s = best["serial"]
        print(
            f"T={T} B={B}: serial {s*1e3:.3f} ms | "
            f"D2 {best['blocked_D2']*1e3:.3f} ms "
            f"({s/best['blocked_D2']:.3f}x) | "
            f"D4 {best['blocked_D4']*1e3:.3f} ms "
            f"({s/best['blocked_D4']:.3f}x)"
        )


if __name__ == "__main__":
    main()
