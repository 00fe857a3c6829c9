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


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    config, cost, dx = _pendulum_setup(T=20)
    B = 1024
    x = _x_init(B, seed=7)

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
