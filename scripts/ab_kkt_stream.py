"""A/B on real TPU: streaming fused KKT backward vs the composite backward
for shapes over the resident kernel's VMEM budget."""

import time

import jax
import jax.numpy as jnp
import numpy as np

import diffmpc_tpu.ops.pallas.kkt as km
from diffmpc_tpu.ops import lqr_step as ls


def bench(tag, T, B, n, m):
    rng = np.random.default_rng(42)
    nm = n + m
    A = rng.normal(size=(T, B, nm, nm)).astype(np.float32) * 0.3
    C = jnp.asarray(A @ A.swapaxes(-1, -2) + np.eye(nm, dtype=np.float32))
    c = jnp.asarray(rng.normal(size=(T, B, nm)).astype(np.float32))
    F = jnp.asarray(rng.normal(size=(T, B, n, nm)).astype(np.float32) * 0.4)
    x_star = jnp.asarray(rng.normal(size=(T, B, n)).astype(np.float32))
    u_star = jnp.asarray(rng.uniform(-0.9, 0.9, size=(T, B, m)).astype(np.float32))
    lo = jnp.full((T, B, m), -1.0, jnp.float32)
    hi = jnp.full((T, B, m), 1.0, jnp.float32)
    gx = jnp.asarray(rng.normal(size=(T, B, n)).astype(np.float32))
    gu = jnp.asarray(rng.normal(size=(T, B, m)).astype(np.float32))
    spec = ls.LqrSpec(n_state=n, constrained=True, use_pallas=True)
    res = (x_star[0], C, c, F, jnp.zeros((T, B, n)), x_star, u_star, lo, hi)
    grads = (gx, gu)

    assert not km.kkt_fits_vmem(T, n, m)

    def run(fn, reps=20):
        out = jax.block_until_ready(fn(res, grads))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(res, grads)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps, out

    f_stream = jax.jit(lambda r, g: ls._kkt_backward_impl(spec, r, g)[:5])
    dt_s, out_s = run(f_stream)

    orig_tile = km.TILE_B
    km.TILE_B = 1 << 30  # force the composite path at trace time
    try:
        f_comp = jax.jit(lambda r, g: ls._kkt_backward_impl(spec, r, g)[:5])
        dt_c, out_c = run(f_comp)
    finally:
        km.TILE_B = orig_tile

    diff = max(
        float(jnp.max(jnp.abs(a - b))) for a, b in zip(out_s, out_c)
    )
    print(
        f"{tag}: stream {dt_s*1e3:.3f} ms, composite {dt_c*1e3:.3f} ms, "
        f"speedup {dt_c/dt_s:.2f}x, max|diff| {diff:.2e}",
        flush=True,
    )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    bench("cartpole-shaped T=20 n=5 m=1 B=4096", 20, 4096, 5, 1)
    bench("pendulum long-T T=128 n=3 m=1 B=1024", 128, 1024, 3, 1)
