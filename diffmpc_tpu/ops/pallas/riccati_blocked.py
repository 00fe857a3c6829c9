"""Depth-D blocked Riccati sweep INSIDE a Pallas kernel (ILP experiment).

VERDICT r4 #1: the resident Riccati kernels run at ~0.35 of the VPU
roofline at the headline shape, diagnosed as "one vreg per entry-op on a
serial dependency chain" — every step's value update waits on the
previous step's. This kernel tests the one mechanism never measured
in-kernel: trade flops for instruction-level parallelism by composing
adjacent per-step value maps (depth-1/depth-2 blocking) so the serial
chain shortens to ``T/D`` applies while the extra composition work is
data-parallel across steps/pairs (independent entry-ops the VPU can
pipeline without stalls).

Math (exact for the UNCONSTRAINED sweep only — box active sets couple
steps non-associatively, see :mod:`diffmpc_tpu.ops.assoc_riccati` which
implements the same conditional-value-function algebra at the XLA level):

- each step contributes an element ``e_t = (A, b, C, eta, J)`` built from
  ``(C_t, c_t, F_t, f_t)`` alone — embarrassingly parallel;
- elements compose associatively (``_combine_entries``, the in-kernel
  counterpart of ``assoc_riccati._combine``) — pairs (and pairs of
  pairs) are independent across the horizon;
- the serial sweep applies ONE composed element per block to the value
  carry ``(V, v)`` — chain length ``T/D`` instead of ``T``;
- interior values and gains are then recovered data-parallel.

Phases 1/2/4 are fori_loops whose iterations are independent (no
loop-carried value), so the VPU issues their entry-ops back-to-back;
only phase 3 exposes dependency latency. This is the "2x flops for 2x
ILP" trade against the measured ~2.9x headroom.

RESULT (2026-08-20, TPU v5 lite, 6 interleaved rounds x 50 async
dispatches, per-variant minima — scripts/ab_blocked_ilp.py; recorded in
DESIGN.md §3 next to the wide-tile ladder): **rejected with data.**

    T=20  B=1024:  serial 0.591 ms | D2 0.562 (1.052x) | D4 0.610 (0.97x)
    T=20  B=65536: serial 1.267 ms | D2 1.302 (0.973x) | D4 1.333 (0.95x)
    T=128 B=8192:  serial 1.142 ms | D2 1.237 (0.923x) | D4 1.235 (0.92x)

+5% at the headline shape only (below the >=10% adoption bar), losses
everywhere wider. RE-VALIDATED same session under the fetch-drained
protocol (the async-dispatch trap discovered afterwards — CLAUDE.md —
makes block-on-last hot loops suspect; every loop closed with a host
fetch of a scalar-reduced result):

    T=20 B=1024:  serial 0.603 ms | D2 0.631 (0.954x) | D4 0.575 (1.048x)
    T=20 B=65536: serial 1.280 ms | D2 1.310 (0.977x) | D4 1.333 (0.960x)

The B=65,536 rows reproduce the original run to ~1%; at B=1024 the
"winner" flips between D2 and D4 across protocols — i.e. all variants
sit within the +-5% noise band and NO variant reaches the 10% bar under
either protocol. Diagnosis: the apply/compose algebra works on general
(non-symmetric) ``I + (PSD)(PSD)`` systems — Gaussian elimination with
``n`` SERIAL reciprocals per solve — so one blocked apply costs nearly
the serial latency of the two steps it replaces, and the data-parallel
composition phases add real issue time on top. Deeper blocking (D=4)
does not help: the saved chain is already amortized at D=2 and the
tree adds another T/4 compositions. The "structural" serial-chain
diagnosis of the roofline gap stands; the kernel is kept as the
measured negative + correctness-pinned reference of the in-kernel
composition algebra (tests/test_pallas_riccati.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..lqr import RiccatiResult
from .riccati import (
    LANE,
    _chol_entries,
    _cho_solve_entries,
    _from_kernel_layout,
    _to_kernel_layout,
    experiment_compiler_params,
    out_struct,
    pick_tile_sublane,
)


# ---------------------------------------------------------------------------
# Entry-tile linear algebra extensions (lists of (S, 128) tiles).
# ---------------------------------------------------------------------------


def _solve_general_entries(M, cols, n):
    """Solve ``M x = col`` for several columns with a GENERAL (possibly
    non-symmetric) n x n matrix in entry-tile form: Gaussian elimination
    without pivoting. Valid here because every system is ``I + (PSD)(PSD)``
    (eigenvalues >= 1 for the value-map compositions)."""
    a = [row[:] for row in M]
    b = [col[:] for col in cols]
    for k in range(n):
        inv = 1.0 / a[k][k]
        for j in range(k + 1, n):
            a[k][j] = a[k][j] * inv
        for ci in range(len(b)):
            b[ci][k] = b[ci][k] * inv
        for i in range(k + 1, n):
            fac = a[i][k]
            for j in range(k + 1, n):
                a[i][j] = a[i][j] - fac * a[k][j]
            for ci in range(len(b)):
                b[ci][i] = b[ci][i] - fac * b[ci][k]
    for ci in range(len(b)):
        x = b[ci]
        for i in reversed(range(n)):
            s = x[i]
            for j in range(i + 1, n):
                s = s - a[i][j] * x[j]
            x[i] = s
    return b


def _mm(A, B, n, p=None):
    """(n x n) @ (n x p) in entries."""
    p = p if p is not None else n
    return [
        [sum(A[i][k] * B[k][j] for k in range(n)) for j in range(p)]
        for i in range(n)
    ]


def _mv(A, x, n):
    return [sum(A[i][k] * x[k] for k in range(n)) for i in range(n)]


def _mt(A, n):
    return [[A[j][i] for j in range(n)] for i in range(n)]


def _sym(A, n):
    return [
        [0.5 * (A[i][j] + A[j][i]) for j in range(n)] for i in range(n)
    ]


def _build_element_entries(Ct, ct, Ft, ft, n, m, reg):
    """Per-step conditional-value element from the stage data — the
    in-kernel counterpart of ``assoc_riccati._build_elements`` (one step,
    entry tiles). No terminal-step zeroing: the sweep applies elements to
    a true terminal VALUE ``V_T = 0``, which makes the zeroing redundant
    (apply(e_{T-1}, 0) = (J, -eta) exactly)."""
    Quu = [[Ct[n + a][n + b] for b in range(m)] for a in range(m)]
    Qux = [[Ct[n + a][b] for b in range(n)] for a in range(m)]
    qu = [ct[n + a] for a in range(m)]
    qx = [ct[a] for a in range(n)]
    Fx = [[Ft[k][j] for j in range(n)] for k in range(n)]
    Fu = [[Ft[k][n + r] for r in range(m)] for k in range(n)]

    L = _chol_entries(Quu, m, reg)
    iQ_Qux = [
        _cho_solve_entries(L, [Qux[a][j] for a in range(m)], m)
        for j in range(n)
    ]  # column j: iQuu @ Qux[:, j]
    iQ_qu = _cho_solve_entries(L, qu, m)
    iQ_FuT = [
        _cho_solve_entries(L, [Fu[k][r] for r in range(m)], m)
        for k in range(n)
    ]  # column k: iQuu @ Fu'[:, k]

    A_el = [
        [Fx[k][j] - sum(Fu[k][r] * iQ_Qux[j][r] for r in range(m))
         for j in range(n)]
        for k in range(n)
    ]
    b_el = [
        ft[k] - sum(Fu[k][r] * iQ_qu[r] for r in range(m)) for k in range(n)
    ]
    C_el = [[None] * n for _ in range(n)]
    for k in range(n):
        for l in range(k, n):
            val = sum(Fu[k][r] * iQ_FuT[l][r] for r in range(m))
            C_el[k][l] = val
            if l != k:
                C_el[l][k] = val
    J_el = [[None] * n for _ in range(n)]
    for a in range(n):
        for b in range(a, n):
            val = Ct[a][b] - sum(
                Ct[a][n + r] * iQ_Qux[b][r] for r in range(m)
            )
            J_el[a][b] = val
            if b != a:
                J_el[b][a] = val
    eta_el = [
        -(qx[a] - sum(Ct[a][n + r] * iQ_qu[r] for r in range(m)))
        for a in range(n)
    ]
    return A_el, b_el, C_el, eta_el, J_el


def _combine_entries(e_i, e_j, n):
    """Associative composition (element i then element j in time), entry
    tiles; the in-kernel ``assoc_riccati._combine``."""
    A1, b1, C1, eta1, J1 = e_i
    A2, b2, C2, eta2, J2 = e_j
    eye = [[1.0 if i == j else 0.0 for j in range(n)] for i in range(n)]
    C1J2 = _mm(C1, J2, n)
    M = [
        [eye[i][j] + C1J2[i][j] for j in range(n)] for i in range(n)
    ]
    C1eta2 = _mv(C1, eta2, n)
    rhs = (
        [[A1[i][j] for i in range(n)] for j in range(n)]  # cols of A1
        + [[b1[i] + C1eta2[i] for i in range(n)]]
        + [[C1[i][j] for i in range(n)] for j in range(n)]  # cols of C1
    )
    sol = _solve_general_entries(M, rhs, n)
    PA1 = [[sol[j][i] for j in range(n)] for i in range(n)]
    Pb = sol[n]
    PC1 = [[sol[n + 1 + j][i] for j in range(n)] for i in range(n)]

    A = _mm(A2, PA1, n)
    b = [_mv(A2, Pb, n)[i] + b2[i] for i in range(n)]
    C = _sym(
        [
            [
                sum(
                    A2[i][k] * sum(PC1[k][l] * A2[j][l] for l in range(n))
                    for k in range(n)
                )
                + C2[i][j]
                for j in range(n)
            ]
            for i in range(n)
        ],
        n,
    )
    J2b1 = _mv(J2, b1, n)
    J2A1 = _mm(J2, A1, n)
    Mt = _mt(M, n)
    rhs2 = (
        [[eta2[i] - J2b1[i] for i in range(n)]]
        + [[J2A1[i][j] for i in range(n)] for j in range(n)]
    )
    sol2 = _solve_general_entries(Mt, rhs2, n)
    A1t = _mt(A1, n)
    eta = [_mv(A1t, sol2[0], n)[i] + eta1[i] for i in range(n)]
    Y1 = [[sol2[1 + j][i] for j in range(n)] for i in range(n)]
    J = _sym(
        [
            [_mm(A1t, Y1, n)[i][j] + J1[i][j] for j in range(n)]
            for i in range(n)
        ],
        n,
    )
    return A, b, C, eta, J


def _apply_element_entries(e, V, v, n):
    """Apply element ``e`` to the downstream value ``(V, v)`` — one step
    (or one composed block) of the backward value recursion:
    ``V' = A' (I + V C)^{-1} V A + J``, ``v' = -(A' (I + V C)^{-1}
    (-v - V b) + eta)``."""
    A, b, C, eta, J = e
    eye = [[1.0 if i == j else 0.0 for j in range(n)] for i in range(n)]
    VC = _mm(V, C, n)
    N = [[eye[i][j] + VC[i][j] for j in range(n)] for i in range(n)]
    VA = _mm(V, A, n)
    Vb = _mv(V, b, n)
    rhs = [[VA[i][j] for i in range(n)] for j in range(n)] + [
        [-v[i] - Vb[i] for i in range(n)]
    ]
    sol = _solve_general_entries(N, rhs, n)
    At = _mt(A, n)
    X = [[sol[j][i] for j in range(n)] for i in range(n)]
    Vn = _sym(
        [
            [_mm(At, X, n)[i][j] + J[i][j] for j in range(n)]
            for i in range(n)
        ],
        n,
    )
    y0 = sol[n]
    vn = [-(_mv(At, y0, n)[i] + eta[i]) for i in range(n)]
    return Vn, vn


# ---------------------------------------------------------------------------
# Element scratch I/O.
# ---------------------------------------------------------------------------


def _write_element(refs, idx, e, n):
    A, b, C, eta, J = e
    A_r, b_r, C_r, eta_r, J_r = refs
    for i in range(n):
        for j in range(n):
            A_r[idx, i, j] = A[i][j]
            C_r[idx, i, j] = C[i][j]
            J_r[idx, i, j] = J[i][j]
        b_r[idx, i] = b[i]
        eta_r[idx, i] = eta[i]


def _read_element(refs, idx, n):
    A_r, b_r, C_r, eta_r, J_r = refs
    A = [[A_r[idx, i, j] for j in range(n)] for i in range(n)]
    C = [[C_r[idx, i, j] for j in range(n)] for i in range(n)]
    J = [[J_r[idx, i, j] for j in range(n)] for i in range(n)]
    b = [b_r[idx, i] for i in range(n)]
    eta = [eta_r[idx, i] for i in range(n)]
    return A, b, C, eta, J


def _make_blocked_kernel(T, n, m, D, reg, sublane):
    nm = n + m
    SL = sublane
    n_levels = D.bit_length() - 1  # D = 2 -> 1 level of pairs; 4 -> 2

    def kernel(*refs):
        C_ref, c_ref, F_ref, f_ref, K_ref, k_ref, free_ref = refs[:7]
        scratch = refs[7:]
        # element levels: level 0 has T elements, level L has T >> L
        lvl_refs = [scratch[5 * l : 5 * l + 5] for l in range(n_levels + 1)]
        Vn_s, vn_s = scratch[5 * (n_levels + 1) : 5 * (n_levels + 1) + 2]

        zero = jnp.zeros((SL, LANE), jnp.float32)

        # ---- phase 1 (data-parallel): per-step elements ----
        def build_body(t, _):
            Ct = [[C_ref[0, t, a, b] for b in range(nm)] for a in range(nm)]
            ct = [c_ref[0, t, a] for a in range(nm)]
            Ft = [[F_ref[0, t, k, j] for j in range(nm)] for k in range(n)]
            ft = [f_ref[0, t, k] for k in range(n)]
            e = _build_element_entries(Ct, ct, Ft, ft, n, m, reg)
            _write_element(lvl_refs[0], t, e, n)
            return 0

        jax.lax.fori_loop(0, T, build_body, 0)

        # ---- phase 2 (data-parallel): within-block composition tree ----
        for lvl in range(1, n_levels + 1):
            n_el = T >> lvl

            def comp_body(p, _, lvl=lvl):
                e_lo = _read_element(lvl_refs[lvl - 1], 2 * p, n)
                e_hi = _read_element(lvl_refs[lvl - 1], 2 * p + 1, n)
                _write_element(
                    lvl_refs[lvl], p, _combine_entries(e_lo, e_hi, n), n
                )
                return 0

            jax.lax.fori_loop(0, n_el, comp_body, 0)

        # ---- phase 3 (SERIAL, T/D applies): sweep composed blocks,
        # recording the block-boundary value V_{(p+1)D} before each ----
        P = T // D

        def sweep_body(s, Vv):
            p = P - 1 - s
            V = [[Vv[i * n + j] for j in range(n)] for i in range(n)]
            v = [Vv[n * n + i] for i in range(n)]
            for i in range(n):
                for j in range(n):
                    Vn_s[p, i, j] = V[i][j]
                vn_s[p, i] = v[i]
            e = _read_element(lvl_refs[n_levels], p, n)
            Vn, vn = _apply_element_entries(e, V, v, n)
            return tuple(
                Vn[i][j] for i in range(n) for j in range(n)
            ) + tuple(vn)

        jax.lax.fori_loop(
            0, P, sweep_body, tuple(zero for _ in range(n * n + n))
        )

        # ---- phase 4 (data-parallel): interior values + gains ----
        def gains_body(p, _):
            # V at the block's right boundary (V_{(p+1)D}), stored by the
            # sweep; recover interior V_{t+1} and gains for the D steps.
            V = [[Vn_s[p, i, j] for j in range(n)] for i in range(n)]
            v = [vn_s[p, i] for i in range(n)]

            def gains_at(t, V_next, v_next):
                Ft = [
                    [F_ref[0, t, k, j] for j in range(nm)] for k in range(n)
                ]
                ft = [f_ref[0, t, k] for k in range(n)]
                W = [
                    [
                        sum(V_next[k][l] * Ft[l][j] for l in range(n))
                        for j in range(nm)
                    ]
                    for k in range(n)
                ]
                z = [
                    sum(V_next[k][l] * ft[l] for l in range(n)) + v_next[k]
                    for k in range(n)
                ]
                Quu = [[None] * m for _ in range(m)]
                for a in range(m):
                    for b in range(a, m):
                        val = C_ref[0, t, n + a, n + b] + sum(
                            Ft[k][n + a] * W[k][n + b] for k in range(n)
                        )
                        Quu[a][b] = val
                        if b != a:
                            Quu[b][a] = val
                Qux = [
                    [
                        C_ref[0, t, n + a, b]
                        + sum(Ft[k][n + a] * W[k][b] for k in range(n))
                        for b in range(n)
                    ]
                    for a in range(m)
                ]
                qu = [
                    c_ref[0, t, n + a]
                    + sum(Ft[k][n + a] * z[k] for k in range(n))
                    for a in range(m)
                ]
                L = _chol_entries(Quu, m, reg)
                cols = [
                    _cho_solve_entries(L, [Qux[a][b] for a in range(m)], m)
                    for b in range(n)
                ]
                kcol = _cho_solve_entries(L, qu, m)
                for a in range(m):
                    for b in range(n):
                        K_ref[0, t, a, b] = -cols[b][a]
                    k_ref[0, t, a] = -kcol[a]
                    free_ref[0, t, a] = 1.0 - zero

            # walk the block right-to-left: data-parallel ACROSS blocks,
            # serial depth D-1 within (D is 2 or 4)
            for off in reversed(range(D)):
                t = p * D + off
                gains_at(t, V, v)
                if off:
                    e = _read_element(lvl_refs[0], t, n)
                    V, v = _apply_element_entries(e, V, v, n)
            return 0

        jax.lax.fori_loop(0, P, gains_body, 0)

    return kernel


def riccati_backward_blocked_pallas(
    C: jnp.ndarray,
    c: jnp.ndarray,
    F: jnp.ndarray,
    f: Optional[jnp.ndarray],
    n_state: int,
    *,
    block: int = 2,
    reg: float = 1e-9,
    interpret: bool = False,
) -> RiccatiResult:
    """Unconstrained Riccati backward pass with a depth-``block`` blocked
    sweep inside one Pallas kernel (ILP experiment — module docstring).
    Contract matches the free mode of :func:`.riccati.
    riccati_backward_pallas`. ``T`` must divide by ``block`` (2 or 4)."""
    n = n_state
    T, B = C.shape[0], C.shape[1]
    nm = C.shape[-1]
    m = nm - n
    dtype = C.dtype
    if block not in (2, 4):
        raise ValueError(f"block must be 2 or 4, got {block}")
    if T % block:
        raise ValueError(f"block={block} must evenly divide T={T}")

    n_levels = block.bit_length() - 1
    el_tiles = 3 * n * n + 2 * n

    def vmem_bytes(tile_b):
        ins = T * (nm * nm + nm + n * nm + n)
        outs = T * (m * n + 2 * m)
        # element levels (T + T/2 [+ T/4]) + boundary values
        els = sum(T >> l for l in range(n_levels + 1)) * el_tiles
        vals = (T // block) * (n * n + n)
        return (ins + outs + els + vals) * 4 * tile_b

    sublane = pick_tile_sublane(B, vmem_bytes)
    tile_b = sublane * LANE

    orig_B = B
    pad = (-B) % tile_b
    if pad:
        eyepad = jnp.broadcast_to(jnp.eye(nm, dtype=dtype), (T, pad, nm, nm))
        C = jnp.concatenate([C, eyepad], axis=1)
        c = jnp.concatenate([c, jnp.zeros((T, pad, nm), dtype)], axis=1)
        F = jnp.concatenate([F, jnp.zeros((T, pad, n, nm), dtype)], axis=1)
        if f is not None:
            f = jnp.concatenate([f, jnp.zeros((T, pad, n), dtype)], axis=1)
        B += pad
    G = B // tile_b
    if f is None:
        f = jnp.zeros((T, B, n), dtype)

    f32 = lambda x: x.astype(jnp.float32)
    ins = [
        _to_kernel_layout(f32(C), G, sublane),
        _to_kernel_layout(f32(c), G, sublane),
        _to_kernel_layout(f32(F), G, sublane),
        _to_kernel_layout(f32(f), G, sublane),
    ]

    def spec(x):
        return pl.BlockSpec(
            (1,) + x.shape[1:],
            lambda g, nd=x.ndim: (g,) + (0,) * (nd - 1),
            memory_space=pltpu.VMEM,
        )

    out_shapes = [
        out_struct((G, T, m, n, sublane, LANE), ins),  # K
        out_struct((G, T, m, sublane, LANE), ins),  # k
        out_struct((G, T, m, sublane, LANE), ins),  # free
    ]
    scratch = []
    for lvl in range(n_levels + 1):
        n_el = T >> lvl
        scratch += [
            pltpu.VMEM((n_el, n, n, sublane, LANE), jnp.float32),  # A
            pltpu.VMEM((n_el, n, sublane, LANE), jnp.float32),  # b
            pltpu.VMEM((n_el, n, n, sublane, LANE), jnp.float32),  # C
            pltpu.VMEM((n_el, n, sublane, LANE), jnp.float32),  # eta
            pltpu.VMEM((n_el, n, n, sublane, LANE), jnp.float32),  # J
        ]
    scratch += [
        pltpu.VMEM((T // block, n, n, sublane, LANE), jnp.float32),  # V bnd
        pltpu.VMEM((T // block, n, sublane, LANE), jnp.float32),  # v bnd
    ]

    kernel = _make_blocked_kernel(T, n, m, block, reg, sublane)
    K_l, k_l, free_l = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[spec(x) for x in ins],
        out_specs=[
            spec(jax.ShapeDtypeStruct(s.shape, s.dtype)) for s in out_shapes
        ],
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
        **experiment_compiler_params(vmem_bytes(tile_b)),
    )(*ins)

    K = _from_kernel_layout(K_l)[:, :orig_B].astype(dtype)
    k = _from_kernel_layout(k_l)[:, :orig_B].astype(dtype)
    free = _from_kernel_layout(free_l)[:, :orig_B] > 0.5
    return RiccatiResult(K, k, free, jnp.zeros((T, orig_B), jnp.int32))
