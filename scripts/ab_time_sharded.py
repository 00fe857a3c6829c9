"""Real-TPU datum for the parallel-in-time Riccati (VERDICT r2 #7).

Grounds SURVEY.md §5.7(b) in hardware: a 1-device mesh degenerates
``riccati_backward_time_sharded``'s sharding, so on the single tunneled
chip we measure :func:`riccati_backward_blocked` — the SAME blocked
suffix-scan arithmetic the mesh version distributes (local suffix scans
batched over the D blocks + depth-D totals combine + one batched boundary
combine). On a real pod each device runs one block-column of this program
plus an all_gather of D tiny elements, so the single-chip blocked time is
an upper bound on the per-device critical path.

Interleaved same-process A/B (CLAUDE.md measurement discipline): the
sequential ``lax.scan`` Riccati vs blocked at several D vs the
``associative_scan`` formulation, long-horizon small-batch unconstrained
regime (T=4096-8192, B=8-16, n=m=4 — where SURVEY §5.7(b) claims the win).

RESULT (2026-08-19, 1x TPU v5 lite, f32, best-of-8 interleaved rounds,
ms/call):

    T=4096 B=8  n=m=4: sequential 36.4 | assoc 1126.9 | blocked D=32 20.8,
                       D=64 20.7, D=128 20.9  -> blocked 1.8x
    T=8192 B=16 n=m=4: sequential 73.6 | assoc 9090.5 | blocked D=64 54.0,
                       D=128 53.3, D=256 54.9 -> blocked 1.4x

- Grounds the round-2 virtual-CPU-mesh figures (1.76x / 1.4x) on hardware
  almost exactly.
- The O(log T) associative_scan is 30-120x SLOWER than sequential here:
  its 3x work + O(T)-wide element traffic swamp the depth win on a real
  chip even at B=8 (consistent with the round-2 B>=256 finding).
- Blocked time is floored by XLA per-scan-step overhead (~0.16 ms/step at
  T=4096: 20.7 ms / ~128 sequential steps), NOT arithmetic — D barely
  matters across 32-256. A Pallas blocked kernel could go further; not
  built (unconstrained-only niche path).
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

ROUNDS = 8
CALLS = 3


def problem(rng, T, B, n, m):
    nm = n + m
    # well-conditioned random LQR: SPD cost blocks, mildly contractive F
    M = rng.standard_normal((T, B, nm, nm)) * 0.3
    C = M @ M.transpose(0, 1, 3, 2) + 0.5 * np.eye(nm)
    c = rng.standard_normal((T, B, nm)) * 0.3
    F = rng.standard_normal((T, B, n, nm)) * (0.9 / np.sqrt(nm))
    f = rng.standard_normal((T, B, n)) * 0.05
    return (
        jnp.asarray(C, jnp.float32),
        jnp.asarray(c, jnp.float32),
        jnp.asarray(F, jnp.float32),
        jnp.asarray(f, jnp.float32),
    )


def bench_shape(T, B, n, m, blocks):
    from diffmpc_tpu.ops.assoc_riccati import (
        riccati_backward_assoc,
        riccati_backward_blocked,
    )
    from diffmpc_tpu.ops.lqr import riccati_backward

    rng = np.random.default_rng(42 + T)
    C, c, F, f = problem(rng, T, B, n, m)

    variants = {
        "sequential": jax.jit(lambda: riccati_backward(C, c, F, f, n).K),
        "assoc": jax.jit(lambda: riccati_backward_assoc(C, c, F, f, n).K),
    }
    for D in blocks:
        variants[f"blocked D={D}"] = jax.jit(
            lambda D=D: riccati_backward_blocked(C, c, F, f, n, n_blocks=D).K
        )

    ref = None
    for name, fn in variants.items():
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        print(f"  compiled {name} ({time.perf_counter()-t0:.0f}s)", flush=True)
        if ref is None:
            ref = np.asarray(out)
        else:
            err = float(np.max(np.abs(np.asarray(out) - ref)))
            assert err < 1e-2, (name, err)

    best = {k: float("inf") for k in variants}
    for _ in range(ROUNDS):
        for name, fn in variants.items():  # strict alternation
            t0 = time.perf_counter()
            for _ in range(CALLS):
                r = fn()
            jax.block_until_ready(r)
            best[name] = min(best[name], (time.perf_counter() - t0) / CALLS)

    print(f"T={T} B={B} n={n} m={m}:")
    seq = best["sequential"]
    for name, t in best.items():
        print(f"  {name:<14} {t*1e3:8.2f} ms   {seq/t:6.1f}x vs sequential",
              flush=True)
    return best


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    bench_shape(4096, 8, 4, 4, blocks=(32, 64, 128))
    bench_shape(8192, 16, 4, 4, blocks=(64, 128, 256))


if __name__ == "__main__":
    main()
