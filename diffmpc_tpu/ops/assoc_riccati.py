"""Parallel-in-time Riccati backward pass via ``lax.associative_scan``.

The reference's horizon loop is sequential Python, linear in ``T``
(SURVEY.md §5.7 — "long context" in this domain is a long horizon). The
Riccati recursion is an associative composition of conditional value
functions (Sarkka & Garcia-Fernandez, temporal parallelization of LQT;
PAPERS.md arXiv:1809.06360 / 2405.09197), so on TPU the backward pass can
run in O(log T) depth:

Each step ``t`` contributes the conditional value function

    V_t(x, z) = 0.5 (z - A x - b)' pinv(C)-form (z - A x - b)
              + 0.5 x' J x - eta' x

(max-plus Gaussian-like parametrization; singular ``C`` is handled
implicitly because the combination rule never inverts ``C`` alone), with the
associative combination (element i followed by element j, ``P = (I + C_i
J_j)^-1``, and ``(I + J_j C_i)^-1 = P'`` since ``C, J`` are symmetric):

    A_ij   = A_j P A_i
    b_ij   = A_j P (b_i + C_i eta_j) + b_j
    C_ij   = A_j P C_i A_j' + C_j
    eta_ij = A_i' P' (eta_j - J_j b_i) + eta_i
    J_ij   = A_i' P' J_j A_i + J_i

The per-step element absorbs our general stage cost (cross terms ``Q_xu``,
linear terms) by completing the square in ``u``:

    u-tilde = u + Quu^-1 (Qux x + qu)
    A_t   = F_x - F_u Quu^-1 Qux          b_t = f_t - F_u Quu^-1 qu
    C_t   = F_u Quu^-1 F_u'               J_t = Qxx - Qxu Quu^-1 Qux
    eta_t = -(qx - Qxu Quu^-1 qu)

and the last time step (no outgoing transition) sets ``A, b, C = 0``.
Suffix-combining elements ``t..T-1`` yields ``V_t(x) = 0.5 x' J x - eta' x``
(so ``v_t = -eta_t``); gains then come from one parallel batched solve per
step. Unconstrained only — active box sets couple time steps
non-associatively, so box problems use the sequential scan / Pallas kernel.

Status note (measured on 1x TPU v5 lite, f32): at production shapes
(B >= 256) the sequential ``lax.scan`` path saturates the chip and wins
(e.g. T=256: 13ms vs 27ms); at tiny batch the two are comparable. The
associative path is therefore OFF by default — it is the horizon-scaling
mechanism for time-sharded meshes and many-core parts where log-depth
matters, and is kept correctness-pinned by tests/test_assoc_riccati.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.batch import bmm, bmv, btrans, symmetrize
from .lqr import RiccatiResult
from .smallchol import cholesky_small, cho_solve_small, solve_general_small


def _combine(e_i, e_j):
    """Associative combination; both elements batched (..., n, n)/(..., n)."""
    A1, b1, C1, eta1, J1 = e_i
    A2, b2, C2, eta2, J2 = e_j
    n = A1.shape[-1]
    eye = jnp.eye(n, dtype=A1.dtype)
    M = eye + bmm(C1, J2)  # (I + C_i J_j)
    # P X for the three right-hand sides we need
    rhs = jnp.concatenate([A1, (b1 + bmv(C1, eta2))[..., None], C1], axis=-1)
    sol = solve_general_small(M, rhs)
    PA1 = sol[..., :n]
    Pb = sol[..., n]
    PC1 = sol[..., n + 1 :]

    A = bmm(A2, PA1)
    b = bmv(A2, Pb) + b2
    C = symmetrize(bmm(A2, bmm(PC1, btrans(A2))) + C2)
    # (I + J2 C1)^-1 = P' ; apply via transposed solve
    rhs2 = jnp.concatenate([(eta2 - bmv(J2, b1))[..., None], bmm(J2, A1)], axis=-1)
    sol2 = solve_general_small(btrans(M), rhs2)
    eta = bmv(btrans(A1), sol2[..., 0]) + eta1
    J = symmetrize(bmm(btrans(A1), sol2[..., 1:]) + J1)
    return A, b, C, eta, J


def riccati_backward_assoc(
    C: jnp.ndarray,
    c: jnp.ndarray,
    F: jnp.ndarray,
    f: Optional[jnp.ndarray],
    n_state: int,
    *,
    reg: float = 1e-9,
) -> RiccatiResult:
    """Drop-in replacement for the unconstrained
    :func:`diffmpc_tpu.ops.lqr.riccati_backward` with O(log T) time depth.

    Same contract: C (T,B,nm,nm), c (T,B,nm), F (T,B,n,nm), f (T,B,n)|None
    -> gains (K, k)."""
    n = n_state
    T, B, nm = C.shape[0], C.shape[1], C.shape[-1]
    m = nm - n
    dtype = C.dtype
    if f is None:
        f = jnp.zeros((T, B, n), dtype)

    Qxx = C[..., :n, :n]
    Qxu = C[..., :n, n:]
    Qux = C[..., n:, :n]
    Quu = C[..., n:, n:]
    qx = c[..., :n]
    qu = c[..., n:]
    Fx = F[..., :, :n]
    Fu = F[..., :, n:]

    chol_uu = cholesky_small(Quu, reg)
    iQuu_Qux = cho_solve_small(chol_uu, Qux)  # (T,B,m,n)
    iQuu_qu = cho_solve_small(chol_uu, qu[..., None])[..., 0]  # (T,B,m)
    iQuu_FuT = cho_solve_small(chol_uu, btrans(Fu))  # (T,B,m,n)

    A_el = Fx - bmm(Fu, iQuu_Qux)
    b_el = f - bmv(Fu, iQuu_qu)
    C_el = symmetrize(bmm(Fu, iQuu_FuT))
    J_el = symmetrize(Qxx - bmm(Qxu, iQuu_Qux))
    eta_el = -(qx - bmv(Qxu, iQuu_qu))

    # last step: stage cost only, no outgoing transition
    zero_nn = jnp.zeros((B, n, n), dtype)
    A_el = A_el.at[T - 1].set(zero_nn)
    b_el = b_el.at[T - 1].set(jnp.zeros((B, n), dtype))
    C_el = C_el.at[T - 1].set(zero_nn)

    elems = (A_el, b_el, C_el, eta_el, J_el)
    # suffix combinations: comb[t] = e_t * e_{t+1} * ... * e_{T-1}.
    # associative_scan(reverse=True) applies operands as
    # f(elems[t+1], elems[t]) (time-reversed orientation), so flip the
    # combiner's arguments to keep causal composition order.
    comb = jax.lax.associative_scan(
        lambda a, b: _combine(b, a), elems, axis=0, reverse=True
    )
    _, _, _, eta_c, J_c = comb

    # V_{t+1}, v_{t+1} sequences (zero at t = T-1)
    V_next = jnp.concatenate([J_c[1:], jnp.zeros((1, B, n, n), dtype)], axis=0)
    v_next = jnp.concatenate([-eta_c[1:], jnp.zeros((1, B, n), dtype)], axis=0)

    # standard gain recovery, one parallel batched solve per step
    FtT = btrans(F)
    Q = symmetrize(C + bmm(FtT, bmm(V_next, F)))
    q = c + bmv(FtT, bmv(V_next, f) + v_next)
    chol = cholesky_small(Q[..., n:, n:], reg)
    rhs = jnp.concatenate([Q[..., n:, :n], q[..., n:, None]], axis=-1)
    Kk = -cho_solve_small(chol, rhs)
    K, k = Kk[..., :n], Kk[..., n]
    free = jnp.ones((T, B, m), dtype=bool)
    return RiccatiResult(K, k, free, jnp.zeros((T, B), jnp.int32))
