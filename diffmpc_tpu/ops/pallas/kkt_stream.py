"""Streaming Pallas KKT backward for shapes over the VMEM budget.

:mod:`.kkt` holds the whole horizon's residuals on-chip, which caps it at
roughly pendulum-sized problems (T=20, n+m=4 — cartpole T=20 at n+m=6
already overflows the 10MB tile budget). This variant runs the same three
fused sweeps — masked auxiliary Riccati, differential rollout + cost
gradients, multiplier recursions + dynamics gradients — with all horizon
arrays resident in HBM, double-buffering per-timestep slices through VMEM
with async DMA (the :mod:`.riccati_stream` pattern). The inter-sweep
intermediates (gains ``K, k`` and the differential trajectory ``p``) are
staged to HBM between sweeps. Per-tile VMEM is O(per-step slice),
independent of ``T``.

Semantics and sign conventions are exactly those of
:func:`diffmpc_tpu.ops.lqr_step._kkt_backward_impl` (the reference's
``mpc/lqr_step.py`` backward, SURVEY.md §3.3); parity is pinned by
tests/test_pallas_kkt_stream.py against the XLA composite backward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kkt import (
    _aux_ric_step,
    _cost_grad_entries,
    _diff_roll_step,
    _dyn_grad_entries,
    _mult_step,
)
from .riccati import (
    LANE,
    SUBLANE,
    TILE_B,
    _from_kernel_layout,
    _to_kernel_layout,
    out_struct,
)

# stream ids (stable indices into the in-buffer / semaphore arrays)
_C, _c, _F, _r, _tau, _tight, _K, _k, _p = range(9)
# out-stream ids
_dC, _dc, _dF, _df, _dx0, _oK, _ok, _op = range(8)


def _make_kernel(T, n, m, reg):
    nm = n + m

    def kernel(*refs):
        hbm_in = refs[:6]  # C, c, F, r, tau, tight
        hbm_out = refs[6:14]  # dC, dc, dF, df, dx0, K_st, k_st, p_st
        scr = refs[14:]
        bufs = scr[:9]  # double-buffered input slices (C..p)
        stage = scr[9:17]  # output staging (dC, dc, dF, df, dx0, K, k, p)
        sem_in, sem_out = scr[17], scr[18]

        g = pl.program_id(0)
        # HBM source for each input stream: the first six are kernel inputs;
        # K/k/p are this kernel's own staging outputs, read back in later
        # sweeps (their write DMAs are waited before the sweep that reads).
        hbm_src = list(hbm_in) + [hbm_out[_oK], hbm_out[_ok], hbm_out[_op]]

        def start_in(streams, slot, t):
            for s in streams:
                pltpu.make_async_copy(
                    hbm_src[s].at[g, t], bufs[s].at[slot], sem_in.at[slot, s]
                ).start()

        def wait_in(streams, slot, t):
            for s in streams:
                pltpu.make_async_copy(
                    hbm_src[s].at[g, t], bufs[s].at[slot], sem_in.at[slot, s]
                ).wait()

        def flush_out(streams, slot, t):
            """Stage -> HBM for this step's outputs; start all, wait all
            (slices are tiny; immediate wait keeps slot logic trivial and
            still overlaps with the next input DMA)."""
            dmas = [
                pltpu.make_async_copy(
                    stage[s].at[slot], hbm_out[s].at[g, t], sem_out.at[slot, s]
                )
                for s in streams
            ]
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()

        zero = jnp.zeros((SUBLANE, LANE), jnp.float32)

        # ---- sweep 1 (backward): masked aux Riccati -> K, k staged to HBM
        s1 = (_C, _F, _r, _tight)
        start_in(s1, 0, T - 1)

        def ric_body(i, Vv):
            t = T - 1 - i
            slot = jax.lax.rem(i, 2)
            wait_in(s1, slot, t)

            @pl.when(i + 1 < T)
            def _():
                start_in(s1, jax.lax.rem(i + 1, 2), t - 1)

            K, kt, new_Vv = _aux_ric_step(
                n, m, reg,
                lambda a, b: bufs[_C][slot, a, b],
                lambda a, b: bufs[_F][slot, a, b],
                lambda a: bufs[_r][slot, a],
                lambda a: bufs[_tight][slot, a],
                Vv,
            )
            for a in range(m):
                for b in range(n):
                    stage[_oK][slot, a, b] = K[a][b]
                stage[_ok][slot, a] = kt[a]
            flush_out((_oK, _ok), slot, t)
            return new_Vv

        jax.lax.fori_loop(0, T, ric_body, tuple(zero for _ in range(n * n + n)))

        # ---- sweep 2 (forward): differential rollout p -> dC, dc; p staged
        s2 = (_K, _k, _F, _tau)
        start_in(s2, 0, 0)

        def roll_body(t, px):
            slot = jax.lax.rem(t, 2)
            wait_in(s2, slot, t)

            @pl.when(t + 1 < T)
            def _():
                start_in(s2, jax.lax.rem(t + 1, 2), t + 1)

            p, nxt = _diff_roll_step(
                n, m,
                lambda a, b: bufs[_K][slot, a, b],
                lambda a: bufs[_k][slot, a],
                lambda a, b: bufs[_F][slot, a, b],
                px,
            )
            tau = [bufs[_tau][slot, a] for a in range(nm)]
            dC = _cost_grad_entries(nm, p, tau)
            for a in range(nm):
                stage[_op][slot, a] = p[a]
                stage[_dc][slot, a] = p[a]
                for b in range(nm):
                    stage[_dC][slot, a, b] = dC[a][b]
            flush_out((_dC, _dc, _op), slot, t)
            return tuple(nxt)

        jax.lax.fori_loop(0, T, roll_body, tuple(zero for _ in range(n)))

        # ---- sweep 3 (backward): multipliers lam/mu -> dF, df, dx_init
        s3 = (_C, _c, _F, _r, _tau, _p)
        start_in(s3, 0, T - 1)

        def mult_body(i, carry):
            t = T - 1 - i
            slot = jax.lax.rem(i, 2)
            wait_in(s3, slot, t)

            @pl.when(i + 1 < T)
            def _():
                start_in(s3, jax.lax.rem(i + 1, 2), t - 1)

            lam_next = [carry[a] for a in range(n)]  # lam_{t+1}
            mu_next = [carry[n + a] for a in range(n)]  # mu_{t+1}
            tau = [bufs[_tau][slot, a] for a in range(nm)]
            p = [bufs[_p][slot, a] for a in range(nm)]
            dF, df = _dyn_grad_entries(n, nm, lam_next, mu_next, tau, p)
            for i2 in range(n):
                stage[_df][slot, i2] = df[i2]
                for j in range(nm):
                    stage[_dF][slot, i2, j] = dF[i2][j]
            flush_out((_dF, _df), slot, t)
            lam, mu = _mult_step(
                n, m,
                lambda a, b: bufs[_C][slot, a, b],
                lambda a: bufs[_c][slot, a],
                lambda a, b: bufs[_F][slot, a, b],
                lambda a: bufs[_r][slot, a],
                tau, p, lam_next, mu_next,
            )
            return tuple(lam) + tuple(mu)

        final = jax.lax.fori_loop(
            0, T, mult_body, tuple(zero for _ in range(2 * n))
        )
        for a in range(n):
            stage[_dx0][0, a] = -final[n + a]  # dx_init = -mu_0
        d = pltpu.make_async_copy(
            stage[_dx0].at[0], hbm_out[_dx0].at[g], sem_out.at[0, _dx0]
        )
        d.start()
        d.wait()

    return kernel


def kkt_backward_fused_stream(
    C: jnp.ndarray,
    c: jnp.ndarray,
    F: jnp.ndarray,
    r: jnp.ndarray,
    tau: jnp.ndarray,
    tight: jnp.ndarray,
    *,
    reg: float = 1e-7,
    interpret: bool = False,
):
    """Same contract as :func:`.kkt.kkt_backward_fused`, with O(1)-in-T
    VMEM via double-buffered HBM streaming. Returns
    ``(dx_init, dC, dc, dF, df)``."""
    T, B = C.shape[0], C.shape[1]
    nm = C.shape[-1]
    m = tight.shape[-1]
    n = nm - m
    dtype = C.dtype

    orig_B = B
    pad = (-B) % TILE_B
    if pad:
        eyepad = jnp.broadcast_to(jnp.eye(nm, dtype=dtype), (T, pad, nm, nm))
        C = jnp.concatenate([C, eyepad], axis=1)
        c = jnp.concatenate([c, jnp.zeros((T, pad, nm), dtype)], axis=1)
        F = jnp.concatenate([F, jnp.zeros((T, pad, n, nm), dtype)], axis=1)
        r = jnp.concatenate([r, jnp.zeros((T, pad, nm), dtype)], axis=1)
        tau = jnp.concatenate([tau, jnp.zeros((T, pad, nm), dtype)], axis=1)
        tight = jnp.concatenate([tight, jnp.zeros((T, pad, m), bool)], axis=1)
        B += pad
    G = B // TILE_B

    f32 = lambda x: x.astype(jnp.float32)
    ins = [
        _to_kernel_layout(f32(C), G),
        _to_kernel_layout(f32(c), G),
        _to_kernel_layout(f32(F), G),
        _to_kernel_layout(f32(r), G),
        _to_kernel_layout(f32(tau), G),
        _to_kernel_layout(tight.astype(jnp.float32), G),
    ]

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    tile = (SUBLANE, LANE)
    out_shapes = [
        out_struct((G, T, nm, nm) + tile, ins),  # dC
        out_struct((G, T, nm) + tile, ins),  # dc
        out_struct((G, T, n, nm) + tile, ins),  # dF
        out_struct((G, T, n) + tile, ins),  # df
        out_struct((G, n) + tile, ins),  # dx_init
        out_struct((G, T, m, n) + tile, ins),  # K staging
        out_struct((G, T, m) + tile, ins),  # k staging
        out_struct((G, T, nm) + tile, ins),  # p staging
    ]
    # double-buffered input slices, one per logical stream (C..p)
    slice_shapes = [
        (nm, nm), (nm,), (n, nm), (nm,), (nm,), (m,),  # C, c, F, r, tau, tight
        (m, n), (m,), (nm,),  # K, k, p (read back from staging)
    ]
    stage_shapes = [
        (nm, nm), (nm,), (n, nm), (n,), (n,),  # dC, dc, dF, df, dx0
        (m, n), (m,), (nm,),  # K, k, p
    ]
    scratch = (
        [pltpu.VMEM((2,) + s + tile, jnp.float32) for s in slice_shapes]
        + [pltpu.VMEM((2,) + s + tile, jnp.float32) for s in stage_shapes]
        + [pltpu.SemaphoreType.DMA((2, 9)), pltpu.SemaphoreType.DMA((2, 8))]
    )
    kernel = _make_kernel(T, n, m, reg)
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[any_spec] * len(ins),
        out_specs=[any_spec] * len(out_shapes),
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*ins)
    dC_l, dc_l, dF_l, df_l, dx0_l = outs[:5]  # staging outputs discarded

    dC = _from_kernel_layout(dC_l)[:, :orig_B].astype(dtype)
    dc = _from_kernel_layout(dc_l)[:, :orig_B].astype(dtype)
    dF = _from_kernel_layout(dF_l)[:, :orig_B].astype(dtype)
    df = _from_kernel_layout(df_l)[:, :orig_B].astype(dtype)
    dx_init = _from_kernel_layout(dx0_l[:, None])[0, :orig_B].astype(dtype)
    return dx_init, dC, dc, dF, df
