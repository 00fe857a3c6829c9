"""Pallas TPU kernel: fused line-searched rollout.

Companion to :mod:`diffmpc_tpu.ops.pallas.riccati` (SURVEY.md §3.2 hot loop
#2): evaluates the full backtracking alpha-ladder — A closed-loop rollouts
``u_t = u_hat + alpha k_t + K_t (x_t - x_hat)`` through the true dynamics
with box/trust-region clamps and quadratic trajectory costs — selects the
first strictly-improving step per scenario (fallback: smallest alpha,
identical to an exhausted backtracking loop), and replays the chosen
per-scenario mixed-alpha rollout to emit the accepted trajectory. One kernel
launch, batch-minor ``(S, 128)`` entry tiles, zero HBM traffic between the
A+2 rollouts.

Nonlinear dynamics are fused via the env's ``entries_step`` protocol
(``models/envs/*.py``): a JAX-traceable per-entry step function inlined into
the kernel body; model parameters ride in SMEM. Linear (``F, f``) rollouts
are built in. Arbitrary user models without ``entries_step`` fall back to
the XLA path in :func:`diffmpc_tpu.ops.lqr.lqr_linesearch_rollout`.
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
    experiment_compiler_params,
    read_kernel_params,
    riccati_vmem_bytes,
    rollout_scratch_bytes,
    stage_kernel_params,
)


def _make_kernel(
    T, n, m, n_alpha, decay, constrained, delta_u, entries_step, n_params,
    batched_params=False, unroll=False, sublane=None,
):
    nm = n + m
    SL = sublane or SUBLANE  # tile height (wide-tile upgrade, round 3)

    def kernel(*refs):
        i = 0
        params_ref = None
        if n_params:
            params_ref = refs[0]
            i = 1
        (C_ref, c_ref, F_ref, f_ref, K_ref, k_ref, xh_ref, uh_ref, x0_ref) = refs[
            i : i + 9
        ]
        i += 9
        if constrained:
            lo_ref, hi_ref = refs[i : i + 2]
            i += 2
        xs_ref, us_ref, obj_ref, alpha_ref, impr_ref = refs[i : i + 5]

        params = read_kernel_params(params_ref, n_params, batched_params)

        def control(t, x, alpha):
            """u = u_hat + alpha k + K (x - x_hat), clamped."""
            u = []
            for a in range(m):
                acc = uh_ref[0, t, a] + alpha * k_ref[0, t, a]
                for j in range(n):
                    acc = acc + K_ref[0, t, a, j] * (x[j] - xh_ref[0, t, j])
                if delta_u is not None:
                    acc = jnp.clip(
                        acc, uh_ref[0, t, a] - delta_u, uh_ref[0, t, a] + delta_u
                    )
                if constrained:
                    acc = jnp.clip(acc, lo_ref[0, t, a], hi_ref[0, t, a])
                u.append(acc)
            return u

        def stage_cost(t, x, u):
            tau = x + u
            acc = None
            for a in range(nm):
                Ctau_a = sum(C_ref[0, t, a, b] * tau[b] for b in range(nm))
                term = (0.5 * Ctau_a + c_ref[0, t, a]) * tau[a]
                acc = term if acc is None else acc + term
            return acc

        def advance(t, x, u):
            if entries_step is not None:
                return entries_step(params, x, u)
            tau = x + u
            return [
                sum(F_ref[0, t, a, b] * tau[b] for b in range(nm)) + f_ref[0, t, a]
                for a in range(n)
            ]

        def rollout_obj(alpha, emit):
            """One closed-loop rollout; returns total cost. ``alpha`` may be
            a scalar or an (S, 128) per-scenario tile. With ``emit``, writes
            the trajectory to the outputs."""

            def body(t, carry):
                obj = carry[0]
                x = list(carry[1:])
                u = control(t, x, alpha)
                if emit:
                    for a in range(n):
                        xs_ref[0, t, a] = x[a]
                    for a in range(m):
                        us_ref[0, t, a] = u[a]
                obj = obj + stage_cost(t, x, u)
                x_next = advance(t, x, u)
                return (obj, *x_next)

            x0 = [x0_ref[0, a] for a in range(n)]
            zero = jnp.zeros((SL, LANE), jnp.float32)
            out = jax.lax.fori_loop(0, T, body, (zero, *x0))
            return out[0]

        # cost of the current trajectory (x_hat, u_hat) — the accept baseline
        def hat_obj():
            def body(t, obj):
                x = [xh_ref[0, t, a] for a in range(n)]
                u = [uh_ref[0, t, a] for a in range(m)]
                return obj + stage_cost(t, x, u)

            return jax.lax.fori_loop(
                0, T, body, jnp.zeros((SL, LANE), jnp.float32)
            )

        obj0 = hat_obj()

        if unroll:
            # round-1 exact-power ladder (alpha = decay**k scalars)
            chosen = jnp.full((SL, LANE), decay ** (n_alpha - 1), jnp.float32)
            has = jnp.zeros((SL, LANE), jnp.float32)
            for a_idx in range(n_alpha):
                alpha = decay**a_idx
                obj_a = rollout_obj(alpha, emit=False)
                improving = (obj_a < obj0) & (has == 0.0)
                chosen = jnp.where(improving, alpha, chosen)
                has = jnp.where(improving, 1.0, has)
        else:
            # rolled ladder: alpha carried as a *= decay tile — one rollout
            # body instead of n_alpha copies (O(1)-in-n_alpha compile; the
            # cumulative f32 product drifts <= ~3e-7 relative from decay**k)
            def ladder_body(_a, carry):
                alpha, chosen, has = carry
                obj_a = rollout_obj(alpha, emit=False)
                improving = (obj_a < obj0) & (has == 0.0)
                chosen = jnp.where(improving, alpha, chosen)
                has = jnp.where(improving, 1.0, has)
                return (alpha * decay, chosen, has)

            _, chosen, has = jax.lax.fori_loop(
                0,
                n_alpha,
                ladder_body,
                (
                    jnp.ones((SL, LANE), jnp.float32),
                    jnp.full((SL, LANE), decay ** (n_alpha - 1), jnp.float32),
                    jnp.zeros((SL, LANE), jnp.float32),
                ),
            )

        obj_final = rollout_obj(chosen, emit=True)
        obj_ref[0, 0] = obj_final
        alpha_ref[0, 0] = chosen
        impr_ref[0, 0] = has

    return kernel


def linesearch_rollout_pallas(
    x_init: jnp.ndarray,
    C: jnp.ndarray,
    c: jnp.ndarray,
    F: jnp.ndarray,
    f: Optional[jnp.ndarray],
    K: jnp.ndarray,
    k: jnp.ndarray,
    x_hat: jnp.ndarray,
    u_hat: jnp.ndarray,
    *,
    u_lower: Optional[jnp.ndarray] = None,
    u_upper: Optional[jnp.ndarray] = None,
    delta_u: Optional[float] = None,
    dyn=None,  # object with kernel_params()/entries_step(), or None = linear
    decay: float = 0.2,
    max_iter: int = 10,
    interpret: bool = False,
    unroll: bool = False,
) -> LineSearchResult:
    """Drop-in Pallas replacement for
    :func:`diffmpc_tpu.ops.lqr.lqr_linesearch_rollout` (quadratic-cost path;
    same accept semantics)."""
    T, B, mm = K.shape[0], K.shape[1], K.shape[2]
    n = x_init.shape[-1]
    dtype = x_init.dtype
    constrained = u_lower is not None

    from .riccati import pick_tile_sublane

    sublane = pick_tile_sublane(
        B,
        lambda tb: riccati_vmem_bytes(T, n, mm, tb)
        + rollout_scratch_bytes(T, n, mm, tb),
    )
    tile_b = sublane * LANE

    orig_B = B
    pad = (-B) % tile_b
    if pad:
        z = lambda s: jnp.zeros((T, pad) + s, dtype)
        C = jnp.concatenate(
            [C, jnp.broadcast_to(jnp.eye(n + mm, dtype=dtype), (T, pad, n + mm, n + mm))],
            axis=1,
        )
        c = jnp.concatenate([c, z((n + mm,))], axis=1)
        F = jnp.concatenate([F, z((n, n + mm))], axis=1)
        f = jnp.concatenate([f if f is not None else jnp.zeros((T, orig_B, n), dtype), z((n,))], axis=1)
        K = jnp.concatenate([K, z((mm, n))], axis=1)
        k = jnp.concatenate([k, z((mm,))], axis=1)
        x_hat = jnp.concatenate([x_hat, z((n,))], axis=1)
        u_hat = jnp.concatenate([u_hat, z((mm,))], axis=1)
        x_init = jnp.concatenate([x_init, jnp.zeros((pad, n), dtype)], axis=0)
        if constrained:
            u_lower = jnp.concatenate(
                [jnp.broadcast_to(u_lower, (T, orig_B, mm)), jnp.full((T, pad, mm), -1.0, dtype)], axis=1
            )
            u_upper = jnp.concatenate(
                [jnp.broadcast_to(u_upper, (T, orig_B, mm)), jnp.full((T, pad, mm), 1.0, dtype)], axis=1
            )
        B = B + pad
    elif f is None:
        f = jnp.zeros((T, B, n), dtype)
    G = B // tile_b

    f32 = lambda x: x.astype(jnp.float32)
    # x_init: (B, n) -> (G, n, S, 128) via the (T, B, ...) helper with T=1
    x0_l = _to_kernel_layout(f32(x_init)[None], G, sublane)[:, 0]

    entries_step = None
    n_params = 0
    batched_params = False
    ins = []
    in_specs = []
    if dyn is not None:
        params_arr, n_params, batched_params, params_spec = stage_kernel_params(
            dyn, pad, G, sublane
        )
        entries_step = dyn.entries_step
        if n_params:
            ins.append(params_arr)
            in_specs.append(params_spec)

    def add(x):
        ins.append(x)
        in_specs.append(
            pl.BlockSpec(
                (1,) + x.shape[1:], lambda g: (g,) + (0,) * (x.ndim - 1),
                memory_space=pltpu.VMEM,
            )
        )

    for arr in [C, c, F, f, K, k, x_hat, u_hat]:
        add(_to_kernel_layout(f32(arr), G, sublane))
    add(x0_l)
    if constrained:
        add(_to_kernel_layout(
            f32(jnp.broadcast_to(u_lower, (T, B, mm))), G, sublane))
        add(_to_kernel_layout(
            f32(jnp.broadcast_to(u_upper, (T, B, mm))), G, sublane))

    out_shapes = [
        out_struct((G, T, n, sublane, LANE), ins),  # xs
        out_struct((G, T, mm, sublane, LANE), ins),  # us
        out_struct((G, 1, sublane, LANE), ins),  # obj
        out_struct((G, 1, sublane, LANE), ins),  # alpha
        out_struct((G, 1, sublane, LANE), ins),  # improved
    ]
    out_specs = [
        pl.BlockSpec(
            (1,) + s.shape[1:],
            lambda g, nd=len(s.shape): (g,) + (0,) * (nd - 1),
            memory_space=pltpu.VMEM,
        )
        for s in out_shapes
    ]

    kernel = _make_kernel(
        T, n, mm, max_iter, decay, constrained, delta_u, entries_step, n_params,
        batched_params=batched_params, unroll=unroll, sublane=sublane,
    )
    xs_l, us_l, obj_l, alpha_l, impr_l = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        # same footprint estimate as the resident gate in lqr_step.py —
        # one shared helper so gate and window lift cannot desynchronize
        **experiment_compiler_params(
            riccati_vmem_bytes(T, n, mm, tile_b)
            + rollout_scratch_bytes(T, n, mm, tile_b)
        ),
    )(*ins)

    xs = _from_kernel_layout(xs_l)[:, :orig_B].astype(dtype)
    us = _from_kernel_layout(us_l)[:, :orig_B].astype(dtype)
    objs = _from_kernel_layout(obj_l)[0, :orig_B].astype(dtype)
    alpha = _from_kernel_layout(alpha_l)[0, :orig_B].astype(dtype)
    improved = _from_kernel_layout(impr_l)[0, :orig_B] > 0.5
    return LineSearchResult(xs, us, objs, alpha, improved)
