"""Streaming Pallas line-search rollout for long horizons.

Companion to :mod:`.riccati_stream` (SURVEY.md §5.7): inputs stay in HBM
and per-timestep slices are double-buffered through VMEM. Unlike the
VMEM-resident kernel (one rollout per ladder step), ALL alpha-ladder
rollouts advance simultaneously in a single forward pass — each streamed
slice is consumed by every ladder state — so the coefficients are read
exactly twice (ladder+baseline pass, then the replay pass that emits the
accepted mixed-alpha trajectory). HBM traffic is O(2 T), independent of
the ladder length.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..lqr import LineSearchResult
from .riccati import (
    out_struct,
    LANE,
    SUBLANE,
    TILE_B,
    _from_kernel_layout,
    _to_kernel_layout,
    read_kernel_params,
    stage_kernel_params,
)


def _make_kernel(
    T, n, m, n_alpha, decay, constrained, delta_u, entries_step, n_params, linear,
    batched_params=False,
):
    nm = n + m
    # streamed inputs per t: C, c, K, k, x_hat, u_hat [+ F, f][+ lo, hi]
    names = ["C", "c", "K", "k", "xh", "uh"]
    if linear:
        names += ["F", "f"]
    if constrained:
        names += ["lo", "hi"]
    n_stream = len(names)

    def kernel(*refs):
        i = 0
        params_ref = None
        if n_params:
            params_ref = refs[0]
            i = 1
        hbm_in = refs[i : i + n_stream]
        x0_ref = refs[i + n_stream]
        xs_hbm, us_hbm, obj_o, alpha_o, impr_o = refs[
            i + n_stream + 1 : i + n_stream + 6
        ]
        scr = refs[i + n_stream + 6 :]
        bufs = scr[:n_stream]
        xs_buf, us_buf = scr[n_stream : n_stream + 2]
        sem_in = scr[n_stream + 2]
        sem_out = scr[n_stream + 3]

        ix = {nm_: k for k, nm_ in enumerate(names)}
        params = read_kernel_params(params_ref, n_params, batched_params)
        g = pl.program_id(0)
        zero = jnp.zeros((SUBLANE, LANE), jnp.float32)

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

        def control(slot, x, alpha):
            K_b, k_b = bufs[ix["K"]], bufs[ix["k"]]
            xh_b, uh_b = bufs[ix["xh"]], bufs[ix["uh"]]
            u = []
            for a in range(m):
                acc = uh_b[slot, a] + alpha * k_b[slot, a]
                for j in range(n):
                    acc = acc + K_b[slot, a, j] * (x[j] - xh_b[slot, j])
                if delta_u is not None:
                    acc = jnp.clip(acc, uh_b[slot, a] - delta_u, uh_b[slot, a] + delta_u)
                if constrained:
                    acc = jnp.clip(
                        acc, bufs[ix["lo"]][slot, a], bufs[ix["hi"]][slot, a]
                    )
                u.append(acc)
            return u

        def stage_cost(slot, x, u):
            C_b, c_b = bufs[ix["C"]], bufs[ix["c"]]
            tau = x + u
            acc = None
            for a in range(nm):
                Ctau = sum(C_b[slot, a, b] * tau[b] for b in range(nm))
                term = (0.5 * Ctau + c_b[slot, a]) * tau[a]
                acc = term if acc is None else acc + term
            return acc

        def advance(slot, x, u):
            if not linear:
                return entries_step(params, x, u)
            F_b, f_b = bufs[ix["F"]], bufs[ix["f"]]
            tau = x + u
            return [
                sum(F_b[slot, a, b] * tau[b] for b in range(nm)) + f_b[slot, a]
                for a in range(n)
            ]

        x0 = [x0_ref[0, a] for a in range(n)]
        alphas = [decay**a for a in range(n_alpha)]

        # ---- pass 1: all ladder rollouts + the (x_hat, u_hat) baseline ----
        start_in(0, 0)

        def p1_body(t, carry):
            objs = list(carry[: n_alpha + 1])  # ladder objs + baseline obj
            xs_flat = list(carry[n_alpha + 1 :])
            slot = jax.lax.rem(t, 2)

            @pl.when(t + 1 < T)
            def _():
                start_in(jax.lax.rem(t + 1, 2), t + 1)

            wait_in(slot, t)
            new_flat = []
            for a_idx in range(n_alpha):
                x = xs_flat[a_idx * n : (a_idx + 1) * n]
                u = control(slot, x, alphas[a_idx])
                objs[a_idx] = objs[a_idx] + stage_cost(slot, x, u)
                new_flat += advance(slot, x, u)
            xh = [bufs[ix["xh"]][slot, a] for a in range(n)]
            uh = [bufs[ix["uh"]][slot, a] for a in range(m)]
            objs[n_alpha] = objs[n_alpha] + stage_cost(slot, xh, uh)
            return (*objs, *new_flat)

        init = tuple([zero] * (n_alpha + 1)) + tuple(x0 * n_alpha)
        out1 = jax.lax.fori_loop(0, T, p1_body, init)
        ladder_objs = out1[:n_alpha]
        obj0 = out1[n_alpha]

        chosen = jnp.full((SUBLANE, LANE), alphas[-1], jnp.float32)
        has = zero
        for a_idx in range(n_alpha):
            improving = (ladder_objs[a_idx] < obj0) & (has == 0.0)
            chosen = jnp.where(improving, alphas[a_idx], chosen)
            has = jnp.where(improving, 1.0, has)

        # ---- pass 2: replay the chosen mixed-alpha rollout, emit ----
        start_in(0, 0)

        def p2_body(t, carry):
            obj = carry[0]
            x = list(carry[1:])
            slot = jax.lax.rem(t, 2)

            @pl.when(t + 1 < T)
            def _():
                start_in(jax.lax.rem(t + 1, 2), t + 1)

            wait_in(slot, t)
            u = control(slot, x, chosen)
            for a in range(n):
                xs_buf[slot, a] = x[a]
            for a in range(m):
                us_buf[slot, a] = u[a]
            outs = [
                pltpu.make_async_copy(xs_buf.at[slot], xs_hbm.at[g, t], sem_out.at[slot, 0]),
                pltpu.make_async_copy(us_buf.at[slot], us_hbm.at[g, t], sem_out.at[slot, 1]),
            ]
            for d in outs:
                d.start()
            obj = obj + stage_cost(slot, x, u)
            x_next = advance(slot, x, u)
            for d in outs:
                d.wait()
            return (obj, *x_next)

        out2 = jax.lax.fori_loop(0, T, p2_body, (zero, *x0))
        obj_o[0, 0] = out2[0]
        alpha_o[0, 0] = chosen
        impr_o[0, 0] = has

    return kernel


def linesearch_rollout_pallas_stream(
    x_init: jnp.ndarray,
    C: jnp.ndarray,
    c: jnp.ndarray,
    F: Optional[jnp.ndarray],
    f: Optional[jnp.ndarray],
    K: jnp.ndarray,
    k: jnp.ndarray,
    x_hat: jnp.ndarray,
    u_hat: jnp.ndarray,
    *,
    u_lower: Optional[jnp.ndarray] = None,
    u_upper: Optional[jnp.ndarray] = None,
    delta_u: Optional[float] = None,
    dyn=None,
    decay: float = 0.2,
    max_iter: int = 10,
    interpret: bool = False,
) -> LineSearchResult:
    """Same contract as :func:`.rollout.linesearch_rollout_pallas`, VMEM
    O(per-step slice) via HBM streaming."""
    T, B, mm = K.shape[0], K.shape[1], K.shape[2]
    n = x_init.shape[-1]
    dtype = x_init.dtype
    constrained = u_lower is not None
    linear = dyn is None

    orig_B = B
    pad = (-B) % TILE_B
    if pad:
        z = lambda s: jnp.zeros((T, pad) + s, dtype)
        C = jnp.concatenate(
            [C, jnp.broadcast_to(jnp.eye(n + mm, dtype=dtype), (T, pad, n + mm, n + mm))],
            axis=1,
        )
        c = jnp.concatenate([c, z((n + mm,))], axis=1)
        if linear:
            F = jnp.concatenate([F, z((n, n + mm))], axis=1)
            f = jnp.concatenate(
                [f if f is not None else jnp.zeros((T, orig_B, n), dtype), z((n,))],
                axis=1,
            )
        K = jnp.concatenate([K, z((mm, n))], axis=1)
        k = jnp.concatenate([k, z((mm,))], axis=1)
        x_hat = jnp.concatenate([x_hat, z((n,))], axis=1)
        u_hat = jnp.concatenate([u_hat, z((mm,))], axis=1)
        x_init = jnp.concatenate([x_init, jnp.zeros((pad, n), dtype)], axis=0)
        if constrained:
            u_lower = jnp.concatenate(
                [jnp.broadcast_to(u_lower, (T, orig_B, mm)), jnp.full((T, pad, mm), -1.0, dtype)],
                axis=1,
            )
            u_upper = jnp.concatenate(
                [jnp.broadcast_to(u_upper, (T, orig_B, mm)), jnp.full((T, pad, mm), 1.0, dtype)],
                axis=1,
            )
        B += pad
    elif linear and f is None:
        f = jnp.zeros((T, B, n), dtype)
    G = B // TILE_B

    f32 = lambda x: x.astype(jnp.float32)
    stream_arrays = [C, c, K, k, x_hat, u_hat]
    if linear:
        stream_arrays += [F, f]
    if constrained:
        stream_arrays += [
            jnp.broadcast_to(u_lower, (T, B, mm)),
            jnp.broadcast_to(u_upper, (T, B, mm)),
        ]
    ins = []
    in_specs = []
    n_params = 0
    batched_params = False
    if dyn is not None:
        params_arr, n_params, batched_params, params_spec = stage_kernel_params(
            dyn, pad, G
        )
        if n_params:
            ins.append(params_arr)
            in_specs.append(params_spec)
    layouts = [_to_kernel_layout(f32(a), G) for a in stream_arrays]
    ins += layouts
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * len(layouts)
    x0_l = _to_kernel_layout(f32(x_init)[None], G)[:, 0]
    ins.append(x0_l)
    in_specs.append(
        pl.BlockSpec(
            (1,) + x0_l.shape[1:], lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
        )
    )

    out_shapes = [
        out_struct((G, T, n, SUBLANE, LANE), ins),
        out_struct((G, T, mm, SUBLANE, LANE), ins),
        out_struct((G, 1, SUBLANE, LANE), ins),
        out_struct((G, 1, SUBLANE, LANE), ins),
        out_struct((G, 1, SUBLANE, LANE), ins),
    ]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2 + [
        pl.BlockSpec(
            (1,) + s.shape[1:],
            lambda g, nd=len(s.shape): (g,) + (0,) * (nd - 1),
            memory_space=pltpu.VMEM,
        )
        for s in out_shapes[2:]
    ]
    scratch = [pltpu.VMEM((2,) + x.shape[2:], jnp.float32) for x in layouts] + [
        pltpu.VMEM((2, n, SUBLANE, LANE), jnp.float32),
        pltpu.VMEM((2, mm, SUBLANE, LANE), jnp.float32),
        pltpu.SemaphoreType.DMA((2, len(layouts))),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    kernel = _make_kernel(
        T, n, mm, max_iter, decay, constrained, delta_u,
        dyn.entries_step if dyn is not None else None, n_params, linear,
        batched_params=batched_params,
    )
    xs_l, us_l, obj_l, alpha_l, impr_l = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*ins)

    xs = _from_kernel_layout(xs_l)[:, :orig_B].astype(dtype)
    us = _from_kernel_layout(us_l)[:, :orig_B].astype(dtype)
    objs = _from_kernel_layout(obj_l)[0, :orig_B].astype(dtype)
    alpha = _from_kernel_layout(alpha_l)[0, :orig_B].astype(dtype)
    improved = _from_kernel_layout(impr_l)[0, :orig_B] > 0.5
    return LineSearchResult(xs, us, objs, alpha, improved)
