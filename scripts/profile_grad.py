"""Decompose the solve+grad gap at the bench shape (T=20, B=1024, pendulum).

Every piece is timed under one dispatch of R on-device repetitions
(lax.map over R distinct problem sets) — single dispatches over the axon
tunnel have a ~1.1 ms RTT floor that hides sub-ms kernels.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _pendulum_setup, _x_init
from diffmpc_tpu import mpc_solve
from diffmpc_tpu.mpc import _expand_cost
from diffmpc_tpu.ops.linearize import linearize_dynamics
from diffmpc_tpu.ops import lqr_step as ls
from diffmpc_tpu.ops.pallas.kkt import kkt_backward_fused
from diffmpc_tpu.ops.pallas.riccati import _to_kernel_layout, _from_kernel_layout

R = 8  # on-device repetitions per dispatch


def timeit(tag, fn, *args, loops=4):
    f = jax.jit(lambda *a: jax.lax.map(fn, a))
    stacked = tuple(
        jnp.stack([x + 1e-6 * i for i in range(R)]) for x in args
    )
    out = jax.block_until_ready(f(*stacked))
    dt = float("inf")
    for _ in range(loops):
        t0 = time.perf_counter()
        out = f(*stacked)
        jax.block_until_ready(out)
        dt = min(dt, (time.perf_counter() - t0) / R)
    print(f"{tag:45s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    B, T = 1024, 20
    n, m = 3, 1
    nm = n + m
    config, cost, dx = _pendulum_setup(T=T)
    x = _x_init(B, seed=0)

    def fwd(args):
        (xi,) = args
        sol = mpc_solve(config, xi, cost, dx, u_lower=-2.0, u_upper=2.0)
        return sol.us, sol.objs

    def train_loss(params, xi):
        sol = mpc_solve(
            config, xi, cost, dx.replace(params=params), u_lower=-2.0, u_upper=2.0
        )
        return jnp.mean(sol.us**2)

    def g_full(args):
        (xi,) = args
        return jax.grad(train_loss)(dx.params, xi)

    rng = np.random.default_rng(0)
    us, _ = jax.block_until_ready(jax.jit(lambda xi: fwd((xi,)))(x))
    xs = jnp.asarray(rng.normal(size=(T, B, n)), jnp.float32)
    qc = _expand_cost(cost, T, B, jnp.float32)
    lin = jax.jit(lambda a, b: linearize_dynamics(dx, a, b))(xs, us)
    tau = jnp.concatenate([xs, us], axis=-1)
    r = jnp.asarray(rng.normal(size=(T, B, nm)), jnp.float32)
    tight = jnp.zeros((T, B, m), bool)

    def kkt(args):
        C, c, F, rr, tt = args
        return kkt_backward_fused(C, c, F, rr, tt, tight)

    def layouts(args):
        C, c, F, rr, tt = args
        ins = [
            _to_kernel_layout(C, 1),
            _to_kernel_layout(c, 1),
            _to_kernel_layout(F, 1),
            _to_kernel_layout(rr, 1),
            _to_kernel_layout(tt, 1),
        ]
        return [_from_kernel_layout(i) for i in ins]

    def lin_F(params):
        return linearize_dynamics(dx.replace(params=params), xs, us).F

    dF_ct = jnp.asarray(rng.normal(size=(T, B, n, nm)), jnp.float32)

    def lin_vjp(args):
        (ct,) = args
        return jax.vjp(lin_F, dx.params)[1](ct)

    spec = ls.LqrSpec(n_state=n, constrained=True, use_pallas=True)
    lo = jnp.full((T, B, m), -2.0)
    hi = jnp.full((T, B, m), 2.0)

    def kkt_dispatch(args):
        C, c, F, rr = args
        res = (x, C, c, F, jnp.zeros((T, B, n)), xs, us, lo, hi)
        return ls._kkt_backward_impl(spec, res, (rr[..., :n], rr[..., n:]))[:5]

    def kkt_composite(args):
        C, c, F, rr = args
        res = (x, C, c, F, jnp.zeros((T, B, n)), xs, us, lo, hi)
        import diffmpc_tpu.ops.pallas.kkt as km
        old = km.TILE_B
        km.TILE_B = 1 << 30
        try:
            return ls._kkt_backward_impl(spec, res, (rr[..., :n], rr[..., n:]))[:5]
        finally:
            km.TILE_B = old

    t_fwd = timeit("forward solve (mega-kernel)", fwd, x)
    t_grad = timeit("full grad (solve+backward)", g_full, x)
    timeit("kkt_backward_fused kernel", kkt, qc.C, qc.c, lin.F, r, tau)
    timeit("kkt dispatch (fused)", kkt_dispatch, qc.C, qc.c, lin.F, r)
    timeit("kkt composite (pallas riccati + XLA)", kkt_composite, qc.C, qc.c, lin.F, r)
    timeit("layout transforms only", layouts, qc.C, qc.c, lin.F, r, tau)
    timeit("linearize VJP (params cotangent)", lin_vjp, dF_ct)
    print(f"grad - forward delta: {(t_grad - t_fwd)*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
