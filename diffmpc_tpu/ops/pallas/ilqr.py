"""Pallas TPU mega-kernel: the COMPLETE box-constrained iLQR solve.

One launch runs everything the reference's ``MPC.forward`` hot path does
(SURVEY.md §3.1-§3.2) for a tile of 1024 scenarios, entirely on-chip in the
batch-minor entry layout:

- per-iteration linearization of the (entries-fusable) nonlinear dynamics —
  computed generically with in-kernel ``jax.jvp`` probes of the env's
  ``entries_step`` (no per-env Jacobian code needed; all elementwise ops,
  Mosaic-lowerable),
- the delta-form Riccati backward recursion with in-kernel pnqp for box
  limits (shared entry-tile helpers from :mod:`.riccati`),
- the alpha-ladder line-searched rollout through the true dynamics (shared
  logic shape with :mod:`.rollout`),
- per-scenario masked best-trajectory / convergence bookkeeping (the
  ``lax.while_loop`` semantics of :func:`diffmpc_tpu.mpc.mpc_solve`, as a
  fixed-trip-count loop with per-element freezing).

Between iLQR iterations NOTHING leaves VMEM: trajectories, gains and
bookkeeping tiles live in scratch. The XLA orchestration path remains the
general implementation (callable costs, opaque dynamics, huge horizons);
this kernel is the speed-of-light path for the production shape
(QuadCost + entries-fusable env + box bounds).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .riccati import (
    LANE,
    SUBLANE,
    TILE_B,
    _masked_chol_solve,
    _pnqp_entries,
    _use_exact_value_update,
    _value_update,
    _from_kernel_layout,
    _to_kernel_layout,
    out_struct,
    read_kernel_params,
    stage_kernel_params,
)


def hoist_lin_extra_bytes(T: int, n: int, m: int, tile_b: int) -> int:
    """Extra per-tile VMEM of the hoisted-linearization pre-pass (F and
    cd scratch). ONE copy of the estimate shared by the dispatch gate
    (mpc._would_use_fused), the tile-height auto-pick, and the Mosaic
    window lift — the gate/pick/lift trio must never desynchronize
    (the rollout_scratch_bytes invariant, round-5 review finding)."""
    return T * (n * (n + m) + (n + m)) * 4 * tile_b


def _pick_sublane(B: int, T: int, n: int, m: int, hoist_lin: bool = False) -> int:
    """Mega-kernel tile-height auto-upgrade (round 3). At the default
    height every entry-op is ONE (8,128) vreg over 1024 scenarios and the
    kernel is issue/overhead-bound (~30% of the solve-level VPU bound,
    DESIGN.md): taller tiles make each entry-op 2/4 independent vregs —
    same scalar-core loop work, 2x/4x vector work per op. Measured
    interleaved (scripts/ab_sublane.py, TPU v5e): 16 -> 1.15x at B=2048,
    1.35x at B=65536; 32 -> another ~8% at B=65536; B=4096 a wash,
    B=8192 1.15x for 32 over 16."""
    from .riccati import ilqr_vmem_bytes, pick_tile_sublane

    def est(tb):
        extra = hoist_lin_extra_bytes(T, n, m, tb) if hoist_lin else 0
        return ilqr_vmem_bytes(T, n, m, tb) + extra

    return pick_tile_sublane(B, est)


class FusedSolveResult(NamedTuple):
    xs: jnp.ndarray  # (T, B, n)
    us: jnp.ndarray  # (T, B, m)
    objs: jnp.ndarray  # (B,)
    converged: jnp.ndarray  # (B,) bool
    last_improvement: jnp.ndarray  # (B,)
    alpha: jnp.ndarray  # (B,)
    n_iters: jnp.ndarray  # (B,) int32 — iLQR iterations while active
    qp_iters: jnp.ndarray  # (B,) mean pnqp iterations (last active iteration)


def _make_kernel(
    T,
    n,
    m,
    lqr_iter,
    pnqp_iter,
    reg,
    decay,
    n_alpha,
    delta_u,
    eps,
    best_cost_eps,
    not_improved_lim,
    entries_step,
    n_params,
    has_u_init,
    batched_params=False,
    unroll=False,
    sublane=None,
    hoist_lin=False,
):
    nm = n + m
    SL = sublane or SUBLANE  # tile height (wide-tile upgrade, round 3)
    # the mega-kernel's Riccati sweep is always box mode (degenerate boxes
    # included — u_zero_I rides it too)
    exact_update = _use_exact_value_update("box", m, reg)

    def kernel(*refs):
        i = 0
        params_ref = None
        if n_params:
            params_ref = refs[i]
            i += 1
        C_ref, c_ref, x0_ref, lo_ref, hi_ref = refs[i : i + 5]
        i += 5
        if has_u_init:
            ui_ref = refs[i]
            i += 1
        (xs_o, us_o, obj_o, conv_o, impr_o, alpha_o, iters_o, qp_o) = refs[i : i + 8]
        (xh_s, uh_s, bx_s, bu_s, K_s, k_s, st_s) = refs[i + 8 : i + 15]
        if hoist_lin:
            F_s, cd_s = refs[i + 15 : i + 17]
        # st_s rows: 0 cur_obj, 1 best_obj, 2 done, 3 n_not_improved,
        #           4 last_improvement, 5 last_alpha, 6 n_iters,
        #           7 mean qp iters (last active iteration)

        params = read_kernel_params(params_ref, n_params, batched_params)
        zero = jnp.zeros((SL, LANE), jnp.float32)
        one = jnp.ones((SL, LANE), jnp.float32)

        def dyn(x, u):
            return entries_step(params, x, u)

        def dyn_lin(x, u):
            """Linearize the step once: returns the tangent map
            ``(tx, tu) -> A@tx + B@tu``. ``jax.linearize`` (vs per-column
            ``jax.jvp``) shares ONE primal trace across all nm Jacobian
            columns. Runtime is identical (measured bitwise-same and
            perf-neutral on TPU — XLA CSEs the duplicated primals that
            per-probe jvp emits; scripts/ab_linearize.py), but the kernel
            trace halves (9.8k -> 4.8k eqns for the NN-dynamics case),
            which matters for Mosaic compile times on the tunneled chip."""
            _, lin = jax.linearize(lambda xx, uu: dyn(xx, uu), x, u)
            return lin

        def stage_cost(t, x, u):
            tau = x + u
            acc = None
            for a in range(nm):
                Ctau = sum(C_ref[0, t, a, b] * tau[b] for b in range(nm))
                term = (0.5 * Ctau + c_ref[0, t, a]) * tau[a]
                acc = term if acc is None else acc + term
            return acc

        # ---- initial trajectory: warm-start controls when given (the
        # reference's u_init, clamped into the box), else zero controls ----
        def init_body(t, carry):
            obj = carry[0]
            x = list(carry[1:])
            u = [
                jnp.clip(
                    ui_ref[0, t, a] if has_u_init else zero,
                    lo_ref[0, t, a],
                    hi_ref[0, t, a],
                )
                for a in range(m)
            ]
            for a in range(n):
                xh_s[t, a] = x[a]
                bx_s[t, a] = x[a]
            for a in range(m):
                uh_s[t, a] = u[a]
                bu_s[t, a] = u[a]
            obj = obj + stage_cost(t, x, u)
            return (obj, *dyn(x, u))

        x0 = [x0_ref[0, a] for a in range(n)]
        init_out = jax.lax.fori_loop(0, T, init_body, (zero, *x0))
        st_s[0] = init_out[0]  # cur_obj
        st_s[1] = init_out[0]  # best_obj
        st_s[2] = zero  # done (1.0 = frozen)
        st_s[3] = zero  # n_not_improved
        st_s[4] = jnp.full((SL, LANE), jnp.inf, jnp.float32)
        st_s[5] = one  # last_alpha
        st_s[6] = zero  # per-scenario iLQR iteration count
        st_s[7] = zero  # mean pnqp iterations of the last active iteration

        def iteration():
            cur_obj = st_s[0]
            best_obj = st_s[1]
            done = st_s[2]
            n_not_improved = st_s[3]
            last_improvement = st_s[4]
            last_alpha = st_s[5]
            active = 1.0 - done

            # ---- Riccati backward sweep (delta form) ----
            def linearize_at(t):
                """Jacobian columns via tangent probes of ONE shared
                linearization (column j of [A B]) + the delta-form linear
                cost ``cd = c + C tau_hat`` — all V-independent."""
                xh = [xh_s[t, a] for a in range(n)]
                uh = [uh_s[t, a] for a in range(m)]
                lin = dyn_lin(xh, uh)
                Fcols = []
                for j in range(n):
                    seed = [one if a == j else zero for a in range(n)]
                    Fcols.append(lin(seed, [zero] * m))
                for j in range(m):
                    seed = [one if a == j else zero for a in range(m)]
                    Fcols.append(lin([zero] * n, seed))
                # Ft[k][j] = d x_next[k] / d tau[j]
                Ft = [[Fcols[j][k] for j in range(nm)] for k in range(n)]
                tau = xh + uh
                cd = [
                    c_ref[0, t, a]
                    + sum(C_ref[0, t, a, b] * tau[b] for b in range(nm))
                    for a in range(nm)
                ]
                # uh returned so the in-sweep caller reuses these reads —
                # keeps the hoist_lin=False program BYTE-IDENTICAL to the
                # pre-refactor kernel (ref reads are stateful and not
                # CSE'd; a duplicate read changes the Mosaic program)
                return Ft, cd, uh

            if hoist_lin:
                # V-independent pre-pass (experiment, round 5): the
                # linearization + cd are ~20-30% of the sweep body's ops
                # but do not depend on the value carry — computing them in
                # a loop whose iterations are INDEPENDENT removes them
                # from the serial dependency chain at zero extra flops.
                def pre_body(t, _):
                    Ft, cd, _uh = linearize_at(t)
                    for k in range(n):
                        for j in range(nm):
                            F_s[t, k, j] = Ft[k][j]
                    for a in range(nm):
                        cd_s[t, a] = cd[a]
                    return 0

                jax.lax.fori_loop(0, T, pre_body, 0)

            def ric_body(s, Vv):
                t = T - 1 - s
                V = [[Vv[a * n + b] for b in range(n)] for a in range(n)]
                v = [Vv[n * n + a] for a in range(n)]
                qp_sum = Vv[n * n + n]

                if hoist_lin:
                    uh = [uh_s[t, a] for a in range(m)]
                    Ft = [
                        [F_s[t, k, j] for j in range(nm)] for k in range(n)
                    ]
                    cd = [cd_s[t, a] for a in range(nm)]
                else:
                    Ft, cd, uh = linearize_at(t)

                # Q = C + F' V F ; q = cd + F' v
                W = [
                    [sum(V[k][l] * Ft[l][j] for l in range(n)) for j in range(nm)]
                    for k in range(n)
                ]
                Q = [[None] * nm for _ in range(nm)]
                for a in range(nm):
                    for b in range(a, nm):
                        val = C_ref[0, t, a, b] + sum(
                            Ft[k][a] * W[k][b] for k in range(n)
                        )
                        Q[a][b] = val
                        if b != a:
                            Q[b][a] = val
                q = [cd[a] + sum(Ft[k][a] * v[k] for k in range(n)) for a in range(nm)]

                Quu = [[Q[n + a][n + b] for b in range(m)] for a in range(m)]
                Qux = [[Q[n + a][b] for b in range(n)] for a in range(m)]
                qu = [q[n + a] for a in range(m)]
                lo_d = [lo_ref[0, t, a] - uh[a] for a in range(m)]
                hi_d = [hi_ref[0, t, a] - uh[a] for a in range(m)]
                kt, frozen, n_qp = _pnqp_entries(Quu, qu, lo_d, hi_d, m, pnqp_iter, reg)
                qp_sum = qp_sum + n_qp
                rhs_cols = [[Qux[a][b] for a in range(m)] for b in range(n)]
                K_cols = _masked_chol_solve(Quu, rhs_cols, frozen, m, reg)
                K = [[-K_cols[b][a] for b in range(n)] for a in range(m)]

                for a in range(m):
                    for b in range(n):
                        K_s[t, a, b] = K[a][b]
                    k_s[t, a] = kt[a]

                Vn, vn = _value_update(
                    Q, q, Quu, qu, K, kt, n, m, exact_update
                )
                return (
                    tuple(Vn[a][b] for a in range(n) for b in range(n))
                    + tuple(vn)
                    + (qp_sum,)
                )

            ric_out = jax.lax.fori_loop(
                0, T, ric_body, tuple(zero for _ in range(n * n + n + 1))
            )
            st_s[7] = jnp.where(active > 0, ric_out[n * n + n] / T, st_s[7])

            # ---- line-searched rollout through the true dynamics ----
            def control(t, x, alpha):
                u = []
                for a in range(m):
                    acc = uh_s[t, a] + alpha * k_s[t, a]
                    for j in range(n):
                        acc = acc + K_s[t, a, j] * (x[j] - xh_s[t, j])
                    if delta_u is not None:
                        acc = jnp.clip(acc, uh_s[t, a] - delta_u, uh_s[t, a] + delta_u)
                    acc = jnp.clip(acc, lo_ref[0, t, a], hi_ref[0, t, a])
                    u.append(acc)
                return u

            def rollout_obj(alpha):
                def body(t, carry):
                    obj = carry[0]
                    x = list(carry[1:])
                    u = control(t, x, alpha)
                    obj = obj + stage_cost(t, x, u)
                    return (obj, *dyn(x, u))

                out = jax.lax.fori_loop(0, T, body, (zero, *x0))
                return out[0]

            if unroll:
                # round-1 exact-power ladder (alpha = decay**k scalars) —
                # bitwise the production program the perf anchors measured
                chosen = jnp.full(
                    (SL, LANE), decay ** (n_alpha - 1), jnp.float32
                )
                has = zero
                for a_idx in range(n_alpha):
                    alpha = decay**a_idx
                    obj_a = rollout_obj(alpha)
                    improving = (obj_a < cur_obj) & (has == 0.0)
                    chosen = jnp.where(improving, alpha, chosen)
                    has = jnp.where(improving, 1.0, has)
            else:
                # rolled ladder: alpha carried as a *= decay tile — one
                # rollout body instead of n_alpha copies; the cumulative
                # f32 product drifts <= ~3e-7 relative from decay**k
                def ladder_body(_a, carry):
                    alpha, chosen, has = carry
                    obj_a = rollout_obj(alpha)
                    improving = (obj_a < cur_obj) & (has == 0.0)
                    chosen = jnp.where(improving, alpha, chosen)
                    has = jnp.where(improving, 1.0, has)
                    return (alpha * decay, chosen, has)

                _, chosen, has = jax.lax.fori_loop(
                    0,
                    n_alpha,
                    ladder_body,
                    (
                        one,
                        jnp.full(
                            (SL, LANE), decay ** (n_alpha - 1), jnp.float32
                        ),
                        zero,
                    ),
                )

            # replay chosen mixed-alpha rollout, writing the new trajectory
            # (frozen elements keep their old one)
            def replay_body(t, carry):
                obj = carry[0]
                x = list(carry[1:])
                u = control(t, x, chosen)
                for a in range(n):
                    xh_s[t, a] = jnp.where(active > 0, x[a], xh_s[t, a])
                for a in range(m):
                    uh_s[t, a] = jnp.where(active > 0, u[a], uh_s[t, a])
                obj = obj + stage_cost(t, x, u)
                return (obj, *dyn(x, u))

            new_out = jax.lax.fori_loop(0, T, replay_body, (zero, *x0))
            new_obj = new_out[0]
            st_s[0] = jnp.where(active > 0, new_obj, cur_obj)

            improved = (new_obj < best_obj) & (active > 0)
            improved_sig = (new_obj < best_obj - best_cost_eps) & (active > 0)
            improvement = best_obj - new_obj
            # copy improved trajectories into the best buffers
            def best_body(t, _):
                for a in range(n):
                    bx_s[t, a] = jnp.where(improved, xh_s[t, a], bx_s[t, a])
                for a in range(m):
                    bu_s[t, a] = jnp.where(improved, uh_s[t, a], bu_s[t, a])
                return 0

            jax.lax.fori_loop(0, T, best_body, 0)
            st_s[1] = jnp.where(improved, new_obj, best_obj)
            nni = jnp.where(improved_sig, zero, n_not_improved + active)
            st_s[3] = nni
            st_s[4] = jnp.where(active > 0, improvement, last_improvement)
            st_s[5] = jnp.where(active > 0, chosen, last_alpha)
            st_s[6] = st_s[6] + active
            newly_done = (improvement < eps) | (nni >= not_improved_lim)
            st_s[2] = jnp.maximum(done, jnp.where(newly_done, 1.0, 0.0))

        # fori_loop (the DEFAULT) rather than a Python unroll: the body is
        # iteration-independent (all state lives in scratch refs), so rolling
        # it keeps the Mosaic program size O(1) in lqr_iter x n_alpha —
        # hardware A/B (scripts/ab_rolled_loops.py, 2026-08-18): runtime
        # parity (amortized 1.21 vs 1.22 ms/solve, ratio 0.99; controls agree
        # to 3.7e-9), while the unrolled nm=8 quadrotor program exceeded a
        # 10-minute Mosaic compile that the rolled one avoids. unroll=True
        # keeps the round-1 exact-power unrolled variant reachable for A/Bs.
        # The pl.when guard skips remaining iterations once every scenario in
        # the tile is frozen (early exit, matching the XLA while_loop's
        # all-done condition).
        if unroll:
            for _it in range(lqr_iter):
                @pl.when(jnp.min(st_s[2]) < 0.5)
                def _():
                    iteration()

        else:
            def iter_body(_i, carry):
                @pl.when(jnp.min(st_s[2]) < 0.5)
                def _():
                    iteration()

                return carry

            jax.lax.fori_loop(0, lqr_iter, iter_body, 0)

        # ---- emit ----
        def emit_body(t, _):
            for a in range(n):
                xs_o[0, t, a] = bx_s[t, a]
            for a in range(m):
                us_o[0, t, a] = bu_s[t, a]
            return 0

        jax.lax.fori_loop(0, T, emit_body, 0)
        obj_o[0, 0] = st_s[1]
        conv_o[0, 0] = jnp.where(st_s[4] < eps, 1.0, 0.0)
        impr_o[0, 0] = st_s[4]
        alpha_o[0, 0] = st_s[5]
        iters_o[0, 0] = st_s[6]
        qp_o[0, 0] = st_s[7]

    return kernel


def ilqr_solve_fused(
    x_init: jnp.ndarray,
    C: jnp.ndarray,
    c: jnp.ndarray,
    dyn,
    u_lower: jnp.ndarray,
    u_upper: jnp.ndarray,
    *,
    u_init: Optional[jnp.ndarray] = None,
    lqr_iter: int = 10,
    pnqp_iter: int = 8,
    reg: float = 1e-9,
    decay: float = 0.2,
    max_linesearch_iter: int = 10,
    delta_u: Optional[float] = None,
    eps: float = 1e-7,
    best_cost_eps: float = 1e-4,
    not_improved_lim: int = 5,
    interpret: bool = False,
    unroll: bool = False,
    hoist_lin: bool = False,
) -> FusedSolveResult:
    """Full fused iLQR solve; contract mirrors the corresponding
    :func:`diffmpc_tpu.mpc.mpc_solve` configuration. ``u_init (T,B,m)``
    warm-starts the initial rollout (the reference's ``u_init``/receding-
    horizon ``prev_ctrl`` threading); None starts from zero controls.

    ``C (T,B,nm,nm)``, ``c (T,B,nm)``, bounds ``(T,B,m)``; ``dyn`` must
    provide ``kernel_params()`` and ``entries_step``.
    """
    T, B = C.shape[0], C.shape[1]
    nm = C.shape[-1]
    n = x_init.shape[-1]
    m = nm - n
    dtype = x_init.dtype

    sublane = _pick_sublane(B, T, n, m, hoist_lin=hoist_lin)
    tile_b = sublane * LANE

    orig_B = B
    pad = (-B) % tile_b
    if pad:
        C = jnp.concatenate(
            [C, jnp.broadcast_to(jnp.eye(nm, dtype=dtype), (T, pad, nm, nm))], axis=1
        )
        c = jnp.concatenate([c, jnp.zeros((T, pad, nm), dtype)], axis=1)
        x_init = jnp.concatenate([x_init, jnp.zeros((pad, n), dtype)], axis=0)
        u_lower = jnp.concatenate(
            [jnp.broadcast_to(u_lower, (T, orig_B, m)), jnp.full((T, pad, m), -1.0, dtype)],
            axis=1,
        )
        u_upper = jnp.concatenate(
            [jnp.broadcast_to(u_upper, (T, orig_B, m)), jnp.full((T, pad, m), 1.0, dtype)],
            axis=1,
        )
        if u_init is not None:
            u_init = jnp.concatenate(
                [u_init, jnp.zeros((T, pad, m), dtype)], axis=1
            )
        B += pad
    G = B // tile_b

    f32 = lambda x: x.astype(jnp.float32)
    params_arr, n_params, batched_params, params_spec = stage_kernel_params(
        dyn, pad, G, sublane
    )
    ins = [params_arr]
    in_specs = [params_spec]

    def add(x):
        ins.append(x)
        in_specs.append(
            pl.BlockSpec(
                (1,) + x.shape[1:],
                lambda g, nd=x.ndim: (g,) + (0,) * (nd - 1),
                memory_space=pltpu.VMEM,
            )
        )

    add(_to_kernel_layout(f32(C), G, sublane))
    add(_to_kernel_layout(f32(c), G, sublane))
    add(_to_kernel_layout(f32(x_init)[None], G, sublane)[:, 0])  # (G, n, S, 128)
    add(_to_kernel_layout(f32(jnp.broadcast_to(u_lower, (T, B, m))), G, sublane))
    add(_to_kernel_layout(f32(jnp.broadcast_to(u_upper, (T, B, m))), G, sublane))
    if u_init is not None:
        add(_to_kernel_layout(f32(u_init), G, sublane))

    out_shapes = [
        out_struct((G, T, n, sublane, LANE), ins),  # xs
        out_struct((G, T, m, sublane, LANE), ins),  # us
        out_struct((G, 1, sublane, LANE), ins),  # obj
        out_struct((G, 1, sublane, LANE), ins),  # conv
        out_struct((G, 1, sublane, LANE), ins),  # last impr
        out_struct((G, 1, sublane, LANE), ins),  # alpha
        out_struct((G, 1, sublane, LANE), ins),  # n_iters
        out_struct((G, 1, sublane, LANE), ins),  # qp_iters
    ]
    out_specs = [
        pl.BlockSpec(
            (1,) + s.shape[1:],
            lambda g, nd=len(s.shape): (g,) + (0,) * (nd - 1),
            memory_space=pltpu.VMEM,
        )
        for s in out_shapes
    ]
    scratch = [
        pltpu.VMEM((T, n, sublane, LANE), jnp.float32),  # x_hat
        pltpu.VMEM((T, m, sublane, LANE), jnp.float32),  # u_hat
        pltpu.VMEM((T, n, sublane, LANE), jnp.float32),  # best x
        pltpu.VMEM((T, m, sublane, LANE), jnp.float32),  # best u
        pltpu.VMEM((T, m, n, sublane, LANE), jnp.float32),  # K
        pltpu.VMEM((T, m, sublane, LANE), jnp.float32),  # k
        pltpu.VMEM((8, sublane, LANE), jnp.float32),  # iteration state
    ]
    hoist_extra = 0
    if hoist_lin:
        scratch += [
            pltpu.VMEM((T, n, nm, sublane, LANE), jnp.float32),  # F
            pltpu.VMEM((T, nm, sublane, LANE), jnp.float32),  # cd
        ]
        hoist_extra = hoist_lin_extra_bytes(T, n, m, tile_b)

    kernel = _make_kernel(
        T, n, m, lqr_iter, pnqp_iter, reg, decay, max_linesearch_iter,
        delta_u, eps, best_cost_eps, not_improved_lim,
        dyn.entries_step, n_params, u_init is not None,
        batched_params=batched_params, unroll=unroll, sublane=sublane,
        hoist_lin=hoist_lin,
    )
    from .riccati import experiment_compiler_params, ilqr_vmem_bytes

    kw = experiment_compiler_params(
        ilqr_vmem_bytes(T, n, m, tile_b) + hoist_extra
    )
    xs_l, us_l, obj_l, conv_l, impr_l, alpha_l, iters_l, qp_l = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
        **kw,
    )(*ins)

    xs = _from_kernel_layout(xs_l)[:, :orig_B].astype(dtype)
    us = _from_kernel_layout(us_l)[:, :orig_B].astype(dtype)
    objs = _from_kernel_layout(obj_l)[0, :orig_B].astype(dtype)
    conv = _from_kernel_layout(conv_l)[0, :orig_B] > 0.5
    impr = _from_kernel_layout(impr_l)[0, :orig_B].astype(dtype)
    alpha = _from_kernel_layout(alpha_l)[0, :orig_B].astype(dtype)
    n_iters = _from_kernel_layout(iters_l)[0, :orig_B].astype(jnp.int32)
    qp_iters = _from_kernel_layout(qp_l)[0, :orig_B].astype(dtype)
    return FusedSolveResult(xs, us, objs, conv, impr, alpha, n_iters, qp_iters)
