"""Real-TPU spot check of the AOT export path (diffmpc_tpu/aot.py).

Exports the B=1024 pendulum solve ON the axon backend (the Pallas
mega-kernel's Mosaic custom-call embedded in the artifact), loads it back,
and compares against the live mpc_solve — controls and objectives must
match exactly (same StableHLO → same program).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_aot_tpu.py
       ... check_aot_tpu.py <artifact.bin>   # verify a prebuilt artifact
                                             # (e.g. cross-lowered on a CPU
                                             # host with platforms=['tpu'])

RESULTS (2026-08-20, TPU v5 lite, B=1024 T=20):
- chip-exported artifact: bitwise-identical to the live solve
  (max|du| = max|dobj| = 0.0), 0.07 MB, first call 1.3 s on a warm cache.
- CPU-host cross-lowered artifact (platforms=['tpu'], fused dispatch
  auto-forced): also bitwise-identical on chip, same 2.3 ms/batch.
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

from __graft_entry__ import _pendulum_setup, _x_init
from diffmpc_tpu import mpc_solve
from diffmpc_tpu.aot import export_solve, load_solve


def scan_amortization(config, cost, dx, B, x):
    """VERDICT r4 weak #5: single-dispatch artifact serving measured ~2.28
    ms/batch (450k solves/s) vs ~1 ms live under lax.map — a 2x dispatch
    tax. Can an artifact be called INSIDE a scanned loop (the receding
    pattern) to recover the amortization? exp.call is jit-compatible, so
    it should inline into one compiled episode program. Measure: N=16
    warm-started solves per dispatch, artifact-in-scan vs live-in-scan vs
    artifact single-dispatch."""
    import jax.numpy as jnp

    N = 16
    blob = export_solve(
        config, cost, dx, B=B, u_lower=-2.0, u_upper=2.0, warm_start=True
    )
    solve = load_solve(blob)
    u0 = jnp.zeros((config.T, B, config.n_ctrl), jnp.float32)

    @jax.jit
    def ep_aot(x0, u_init):
        def step(u, _):
            sol = solve(x0, u)
            return jnp.roll(sol.us, -1, axis=0), sol.objs
        _, objs = jax.lax.scan(step, u_init, None, length=N)
        return objs

    @jax.jit
    def ep_live(x0, u_init):
        def step(u, _):
            sol = mpc_solve(config, x0, cost, dx, u_init=u,
                            u_lower=-2.0, u_upper=2.0)
            return jnp.roll(sol.us, -1, axis=0), sol.objs
        _, objs = jax.lax.scan(step, u_init, None, length=N)
        return objs

    @jax.jit
    def single(x0, u):
        return solve(x0, u).objs

    fns = {"artifact_in_scan": (ep_aot, (x, u0)),
           "live_in_scan": (ep_live, (x, u0)),
           "artifact_single_dispatch": (single, (x, u0))}
    outs = {}
    for k, (fn, args) in fns.items():
        t0 = time.time()
        outs[k] = jax.block_until_ready(fn(*args))
        print(f"{k}: compile+first {time.time()-t0:.1f}s", flush=True)
    da = float(jnp.max(jnp.abs(outs["artifact_in_scan"] - outs["live_in_scan"])))
    print(f"scan parity max|dobj| = {da:.2e}")

    best = {k: float("inf") for k in fns}
    for _ in range(6):
        for k, (fn, args) in fns.items():
            reps = 2 if "scan" in k else 2 * N
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn(*args)
            jax.block_until_ready(r)
            best[k] = min(best[k], (time.perf_counter() - t0) / reps)
    per_batch = {
        "artifact_in_scan": best["artifact_in_scan"] / N,
        "live_in_scan": best["live_in_scan"] / N,
        "artifact_single_dispatch": best["artifact_single_dispatch"],
    }
    for k, dt in per_batch.items():
        print(f"{k}: {dt*1e3:.3f} ms/batch ({B/dt:,.0f} solves/s)")
    print(
        f"scan amortization recovers "
        f"{per_batch['artifact_single_dispatch']/per_batch['artifact_in_scan']:.2f}x "
        f"over single dispatch; artifact-in-scan vs live-in-scan "
        f"{per_batch['live_in_scan']/per_batch['artifact_in_scan']:.3f}x"
    )


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    config, cost, dx = _pendulum_setup(T=20)
    B = 1024
    x = _x_init(B, seed=7)

    if "--scan" in sys.argv:
        return scan_amortization(config, cost, dx, B, x)
    sharded = "--sharded" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--sharded"]
    if argv:  # verify a prebuilt (e.g. cross-lowered) artifact
        blob = open(argv[0], "rb").read()
        print(f"loaded prebuilt artifact {argv[0]} ({len(blob)/1e6:.2f} MB)")
    elif sharded:
        # Fused shard_map artifact (VERDICT r4 missing #1) on the only
        # real-TPU mesh this box has: 1 device. Exercises the manual-SPMD
        # export with the REAL Mosaic custom call executing inside the
        # shard_map program (the 8-device layout is pinned on the CPU
        # mesh by tests/test_aot.py; the kernel-under-shard_map execution
        # is what only hardware can validate).
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:1]), ("batch",))
        t0 = time.time()
        blob = export_solve(
            config, cost, dx, B=B, u_lower=-2.0, u_upper=2.0, mesh=mesh
        )
        from diffmpc_tpu.aot import read_manifest

        m = read_manifest(blob)
        assert m["mesh"]["form"] == "shard_map_fused", m["mesh"]
        print(
            f"exported SHARDED {len(blob)/1e6:.2f} MB in {time.time()-t0:.1f}s "
            f"(mesh={m['mesh']})"
        )
    else:
        t0 = time.time()
        blob = export_solve(config, cost, dx, B=B, u_lower=-2.0, u_upper=2.0)
        print(f"exported {len(blob)/1e6:.2f} MB in {time.time()-t0:.1f}s")

    solve = load_solve(blob)
    t0 = time.time()
    got = jax.block_until_ready(solve(x))
    print(f"artifact first call (compile) {time.time()-t0:.1f}s")
    want = jax.block_until_ready(
        jax.jit(
            lambda xi: mpc_solve(config, xi, cost, dx, u_lower=-2.0, u_upper=2.0)
        )(x)
    )
    du = float(jnp.max(jnp.abs(got.us - want.us)))
    dobj = float(jnp.max(jnp.abs(got.objs - want.objs)))
    n_timed = 20
    t0 = time.time()
    for _ in range(n_timed):
        r = solve(x)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / n_timed
    print(
        f"max|du|={du:.2e} max|dobj|={dobj:.2e} "
        f"artifact solve {dt*1e3:.2f} ms/batch "
        f"({B/dt:,.0f} solves/s incl. dispatch)"
    )
    assert du <= 1e-5 and dobj <= 1e-3, "artifact diverges from live solve"
    print("PASS")


if __name__ == "__main__":
    main()
