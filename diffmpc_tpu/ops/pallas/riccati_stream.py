"""Streaming Pallas Riccati kernel for long horizons.

The VMEM-resident kernel in :mod:`.riccati` holds the whole horizon's
coefficients on-chip, capping ``T`` at a few dozen steps (SURVEY.md §5.7:
"long context" in this domain is a long horizon). This variant keeps the
inputs in HBM and double-buffers per-timestep slices through VMEM with
async DMA (pallas_guide double-buffering pattern): while step ``t``
computes, step ``t-1``'s coefficients are in flight, and each step's gains
are DMA'd back out. Per-tile VMEM is O(per-step slice), independent of
``T`` — horizons of thousands of steps run at kernel speed.

Same contract and entry-tile math as :func:`.riccati.riccati_backward_pallas`
(the compute body shares its helpers); dispatched automatically when the
resident kernel's VMEM budget is exceeded.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..lqr import RiccatiResult
from .riccati import (
    out_struct,
    LANE,
    SUBLANE,
    TILE_B,
    _chol_entries,
    _cho_solve_entries,
    _masked_chol_solve,
    _pnqp_entries,
    _use_exact_value_update,
    _value_update,
    _from_kernel_layout,
    _to_kernel_layout,
)


def _make_kernel(T, n, m, mode, reg, pnqp_iter):
    nm = n + m
    exact_update = _use_exact_value_update(mode, m, reg)
    n_extra = 2 if mode == "box" else (1 if mode == "mask" else 0)
    n_out = 4 if mode == "box" else 3  # box adds the n_qp stats stream

    def kernel(*refs):
        # inputs (HBM/ANY): C, c, F, f, [lo, hi | mask]
        hbm_in = refs[: 4 + n_extra]
        out_hbm = refs[4 + n_extra : 4 + n_extra + n_out]
        K_hbm, k_hbm, free_hbm = out_hbm[:3]
        scr = refs[4 + n_extra + n_out :]
        bufs = scr[: 4 + n_extra]  # double-buffered input slices
        out_bufs = scr[4 + n_extra : 4 + n_extra + n_out]
        K_buf, k_buf, free_buf = out_bufs[:3]
        sem_in = scr[4 + n_extra + n_out]
        sem_out = scr[5 + n_extra + n_out]

        g = pl.program_id(0)

        def start_in(slot, t):
            for idx, hbm in enumerate(hbm_in):
                pltpu.make_async_copy(
                    hbm.at[g, t], bufs[idx].at[slot], sem_in.at[slot, idx]
                ).start()

        def wait_in(slot, t):
            for idx, hbm in enumerate(hbm_in):
                pltpu.make_async_copy(
                    hbm.at[g, t], bufs[idx].at[slot], sem_in.at[slot, idx]
                ).wait()

        start_in(0, T - 1)
        zero = jnp.zeros((SUBLANE, LANE), jnp.float32)

        def body(i, carry):
            Vv = carry
            t = T - 1 - i
            slot = jax.lax.rem(i, 2)
            nslot = jax.lax.rem(i + 1, 2)
            wait_in(slot, t)

            @pl.when(i + 1 < T)
            def _():
                start_in(nslot, t - 1)

            C_b, c_b, F_b, f_b = bufs[0], bufs[1], bufs[2], bufs[3]
            V = [[Vv[a * n + b] for b in range(n)] for a in range(n)]
            v = [Vv[n * n + a] for a in range(n)]
            Ft = [[F_b[slot, a, b] for b in range(nm)] for a in range(n)]

            W = [
                [sum(V[k][l] * Ft[l][j] for l in range(n)) for j in range(nm)]
                for k in range(n)
            ]
            z = [
                sum(V[k][l] * f_b[slot, l] for l in range(n)) + v[k]
                for k in range(n)
            ]
            Q = [[None] * nm for _ in range(nm)]
            for a in range(nm):
                for b in range(a, nm):
                    val = C_b[slot, a, b] + sum(Ft[k][a] * W[k][b] for k in range(n))
                    Q[a][b] = val
                    if b != a:
                        Q[b][a] = val
            q = [
                c_b[slot, a] + sum(Ft[k][a] * z[k] for k in range(n))
                for a in range(nm)
            ]

            Quu = [[Q[n + a][n + b] for b in range(m)] for a in range(m)]
            Qux = [[Q[n + a][b] for b in range(n)] for a in range(m)]
            qu = [q[n + a] for a in range(m)]

            if mode == "box":
                lo = [bufs[4][slot, a] for a in range(m)]
                hi = [bufs[5][slot, a] for a in range(m)]
                kt, frozen, n_qp = _pnqp_entries(Quu, qu, lo, hi, m, pnqp_iter, reg)
                out_bufs[3][slot, 0] = n_qp
                rhs_cols = [[Qux[a][b] for a in range(m)] for b in range(n)]
                K_cols = _masked_chol_solve(Quu, rhs_cols, frozen, m, reg)
                K = [[-K_cols[b][a] for b in range(n)] for a in range(m)]
            elif mode == "mask":
                frozen = [bufs[4][slot, a] for a in range(m)]
                rhs_cols = [[Qux[a][b] for a in range(m)] for b in range(n)] + [qu]
                sols = _masked_chol_solve(Quu, rhs_cols, frozen, m, reg)
                K = [[-sols[b][a] for b in range(n)] for a in range(m)]
                kt = [-sols[n][a] for a in range(m)]
            else:
                frozen = [zero] * m
                L = _chol_entries(Quu, m, reg)
                cols = [
                    _cho_solve_entries(L, [Qux[a][b] for a in range(m)], m)
                    for b in range(n)
                ]
                kcol = _cho_solve_entries(L, qu, m)
                K = [[-cols[b][a] for b in range(n)] for a in range(m)]
                kt = [-kcol[a] for a in range(m)]

            Vn, vn = _value_update(Q, q, Quu, qu, K, kt, n, m, exact_update)

            # emit this step's gains: stage in VMEM, DMA out, wait (the
            # slices are tiny; waiting immediately keeps the slot logic
            # trivial and still overlaps with the next input DMA)
            for a in range(m):
                for b in range(n):
                    K_buf[slot, a, b] = K[a][b]
                k_buf[slot, a] = kt[a]
                free_buf[slot, a] = 1.0 - frozen[a]
            outs = [
                pltpu.make_async_copy(
                    out_bufs[i].at[slot], out_hbm[i].at[g, t], sem_out.at[slot, i]
                )
                for i in range(n_out)
            ]
            for d in outs:
                d.start()
            for d in outs:
                d.wait()

            return tuple(Vn[a][b] for a in range(n) for b in range(n)) + tuple(vn)

        jax.lax.fori_loop(0, T, body, tuple(zero for _ in range(n * n + n)))

    return kernel


def riccati_backward_pallas_stream(
    C: jnp.ndarray,
    c: jnp.ndarray,
    F: jnp.ndarray,
    f: Optional[jnp.ndarray],
    n_state: int,
    *,
    u_lower: Optional[jnp.ndarray] = None,
    u_upper: Optional[jnp.ndarray] = None,
    u_hat: Optional[jnp.ndarray] = None,
    ctrl_mask: Optional[jnp.ndarray] = None,
    reg: float = 1e-9,
    pnqp_iter: int = 8,
    pnqp_eps: float = 1e-6,
    interpret: bool = False,
) -> RiccatiResult:
    """Same contract as :func:`.riccati.riccati_backward_pallas`, with
    O(1)-in-T VMEM via double-buffered HBM streaming."""
    n = n_state
    T, B = C.shape[0], C.shape[1]
    nm = C.shape[-1]
    m = nm - n
    dtype = C.dtype
    box = u_lower is not None
    mode = "box" if box else ("mask" if ctrl_mask is not None else "free")

    orig_B = B
    pad = (-B) % TILE_B
    if pad:
        C = jnp.concatenate(
            [C, jnp.broadcast_to(jnp.eye(nm, dtype=dtype), (T, pad, nm, nm))], axis=1
        )
        c = jnp.concatenate([c, jnp.zeros((T, pad, nm), dtype)], axis=1)
        F = jnp.concatenate([F, jnp.zeros((T, pad, n, nm), dtype)], axis=1)
        if f is not None:
            f = jnp.concatenate([f, jnp.zeros((T, pad, n), dtype)], axis=1)
        if box:
            u_lower = jnp.concatenate(
                [jnp.broadcast_to(u_lower, (T, orig_B, m)), jnp.full((T, pad, m), -1.0, dtype)],
                axis=1,
            )
            u_upper = jnp.concatenate(
                [jnp.broadcast_to(u_upper, (T, orig_B, m)), jnp.full((T, pad, m), 1.0, dtype)],
                axis=1,
            )
            u_hat = jnp.concatenate([u_hat, jnp.zeros((T, pad, m), dtype)], axis=1)
        if ctrl_mask is not None:
            ctrl_mask = jnp.concatenate([ctrl_mask, jnp.zeros((T, pad, m), bool)], axis=1)
        B += pad
    G = B // TILE_B
    if f is None:
        f = jnp.zeros((T, B, n), dtype)

    f32 = lambda x: x.astype(jnp.float32)
    ins = [
        _to_kernel_layout(f32(C), G),
        _to_kernel_layout(f32(c), G),
        _to_kernel_layout(f32(F), G),
        _to_kernel_layout(f32(f), G),
    ]
    if mode == "box":
        lo = jnp.broadcast_to(u_lower, (T, B, m)) - u_hat
        hi = jnp.broadcast_to(u_upper, (T, B, m)) - u_hat
        ins += [_to_kernel_layout(f32(lo), G), _to_kernel_layout(f32(hi), G)]
    elif mode == "mask":
        ins += [_to_kernel_layout(ctrl_mask.astype(jnp.float32), G)]

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_shapes = [
        out_struct((G, T, m, n, SUBLANE, LANE), ins),
        out_struct((G, T, m, SUBLANE, LANE), ins),
        out_struct((G, T, m, SUBLANE, LANE), ins),
    ]
    out_stage = [
        pltpu.VMEM((2, m, n, SUBLANE, LANE), jnp.float32),  # K stage
        pltpu.VMEM((2, m, SUBLANE, LANE), jnp.float32),  # k stage
        pltpu.VMEM((2, m, SUBLANE, LANE), jnp.float32),  # free stage
    ]
    if mode == "box":
        out_shapes.append(out_struct((G, T, 1, SUBLANE, LANE), ins))  # n_qp
        out_stage.append(pltpu.VMEM((2, 1, SUBLANE, LANE), jnp.float32))
    n_in = len(ins)
    n_out = len(out_shapes)
    scratch = (
        [pltpu.VMEM((2,) + x.shape[2:], jnp.float32) for x in ins]
        + out_stage
        + [
            pltpu.SemaphoreType.DMA((2, n_in)),
            pltpu.SemaphoreType.DMA((2, n_out)),
        ]
    )
    kernel = _make_kernel(T, n, m, mode, reg, pnqp_iter)
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[any_spec] * n_in,
        out_specs=[any_spec] * n_out,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*ins)
    K_l, k_l, free_l = outs[:3]

    K = _from_kernel_layout(K_l)[:, :orig_B].astype(dtype)
    k = _from_kernel_layout(k_l)[:, :orig_B].astype(dtype)
    free = _from_kernel_layout(free_l)[:, :orig_B] > 0.5
    if mode == "box":
        n_qp = _from_kernel_layout(outs[3])[:, :orig_B, 0].astype(jnp.int32)
    else:
        n_qp = jnp.zeros((T, orig_B), jnp.int32)
    return RiccatiResult(K, k, free, n_qp)
