"""Batched projected-Newton QP for box constraints (box-DDP inner solver).

Capability parity: the reference's ``mpc/pnqp.py`` (SURVEY.md §2.1 C2) —
solve ``min_x 0.5 x' H x + q' x  s.t. lower <= x <= upper`` for a batch of
tiny (m <= ~8) QPs, returning the solution, the Cholesky factor of the
free-subspace system (reused by the LQR step for the feedback gains), the
free mask, and an iteration count.

TPU-first redesign: every data-dependent branch of the reference (active-set
changes, per-element convergence exits, Armijo backtracking) becomes
fixed-trip-count masked computation so the whole solver lives inside one
XLA/Pallas program:

- the active ("clamped") set is a boolean mask; the free-subspace Newton
  solve is a full-size batched Cholesky of ``H`` with clamped rows/columns
  overwritten by identity and clamped gradient entries zeroed (the
  reference's own masking trick — already TPU-shaped),
- converged batch elements are frozen with ``where`` instead of exiting,
- the Armijo backtracking loop is a geometric step-size ladder evaluated for
  all batch elements at once; the first strictly-improving step is taken.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils.batch import PRECISION, bmv, bquad, bdot, eclamp, match_vma
from .smallchol import cho_solve_small, cholesky_small


class PnqpResult(NamedTuple):
    x: jnp.ndarray  # (..., m) solution (clamped into the box)
    chol_free: jnp.ndarray  # (..., m, m) Cholesky factor of masked H
    free_mask: jnp.ndarray  # (..., m) bool, True where constraint inactive
    n_iter: jnp.ndarray  # (...,) int32, Newton iterations actually used


def masked_identity_system(
    H: jnp.ndarray, clamped: jnp.ndarray, reg: float = 0.0
) -> jnp.ndarray:
    """Overwrite clamped rows/cols of ``H`` with identity.

    With rhs entries zeroed on the clamped set, a dense solve of the masked
    system equals the free-subspace solve with zeros in clamped slots — no
    gather/scatter, fully batched (the reference's masking trick from
    ``mpc/pnqp.py``, which is exactly the right shape for the TPU VPU).
    """
    m = H.shape[-1]
    free = ~clamped
    keep = (free[..., :, None] & free[..., None, :]).astype(H.dtype)
    eye = jnp.eye(m, dtype=H.dtype)
    Hm = H * keep + eye * clamped[..., None, :].astype(H.dtype)
    if reg:
        Hm = Hm + reg * eye
    return Hm


def _obj(H, q, x):
    return 0.5 * bquad(x, H) + bdot(q, x)


def pnqp(
    H: jnp.ndarray,
    q: jnp.ndarray,
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    x_init: Optional[jnp.ndarray] = None,
    n_iter: int = 20,
    reg: float = 1e-9,
    eps: float = 1e-6,
    armijo_decay: float = 0.5,
    armijo_iter: int = 8,
) -> PnqpResult:
    """Solve a batch of box QPs by projected Newton.

    Args:
      H: ``(..., m, m)`` symmetric positive definite Hessians.
      q: ``(..., m)`` linear terms.
      lower/upper: bounds broadcastable to ``q`` (use ``+-inf`` for
        unconstrained dims).
      x_init: optional warm start; defaults to the clamped unconstrained
        Newton point ``clamp(-H^-1 q)`` like the reference.
      n_iter: fixed Newton trip count (converged elements are frozen).
      reg: Tikhonov jitter added to the masked system before Cholesky
        (f32-on-TPU stability; SURVEY.md §7 hard-part 3).
      eps: per-element convergence threshold on the Newton step.

    Returns:
      :class:`PnqpResult`; ``chol_free``/``free_mask`` correspond to the
      *final* active set so the caller (LQR backward recursion) can reuse the
      factorization for the feedback-gain solve.
    """
    dtype = H.dtype
    m = H.shape[-1]
    eye = jnp.eye(m, dtype=dtype)
    lower = jnp.broadcast_to(jnp.asarray(lower, dtype), q.shape)
    upper = jnp.broadcast_to(jnp.asarray(upper, dtype), q.shape)

    if m == 1:
        # 1-D box QP in closed form: x* = clamp(-q/H) — no Newton loop.
        # (The reference iterates here too; with one control dim the
        # projected-Newton fixed point is available directly.)
        h = H[..., 0, 0] + reg
        x = eclamp(-q[..., 0] / h, lower[..., 0], upper[..., 0])[..., None]
        g = bmv(H, x) + q
        Ic = ((x <= lower + eps) & (g > 0)) | ((x >= upper - eps) & (g < 0))
        Hm = jnp.where(Ic[..., None], 1.0, H + reg)
        return PnqpResult(
            x=x,
            chol_free=jnp.sqrt(Hm),
            free_mask=~Ic,
            n_iter=jnp.ones(q.shape[:-1], dtype=jnp.int32),
        )

    if x_init is None:
        chol0 = cholesky_small(H, reg)
        x_init = -cho_solve_small(chol0, q[..., None])[..., 0]
    x0 = eclamp(x_init, lower, upper)

    alphas = armijo_decay ** jnp.arange(armijo_iter, dtype=dtype)

    def clamped_set(x, g):
        at_lo = (x <= lower + eps) & (g > 0)
        at_hi = (x >= upper - eps) & (g < 0)
        return at_lo | at_hi

    def body(i, carry):
        x, done, iters = carry
        g = bmv(H, x) + q
        Ic = clamped_set(x, g)
        Hm = masked_identity_system(H, Ic, reg)
        gm = jnp.where(Ic, 0.0, g)
        chol = cholesky_small(Hm)
        dx = -cho_solve_small(chol, gm[..., None])[..., 0]

        step_small = jnp.max(jnp.abs(dx), axis=-1) < eps
        # Vectorized Armijo ladder: candidate points for every alpha at once.
        cand = eclamp(
            x[..., None, :] + alphas[:, None] * dx[..., None, :],
            lower[..., None, :],
            upper[..., None, :],
        )  # (..., A, m)
        obj0 = _obj(H, q, x)
        objs = 0.5 * jnp.einsum(
            "...ai,...ij,...aj->...a", cand, H, cand, precision=PRECISION
        ) + jnp.einsum("...j,...aj->...a", q, cand, precision=PRECISION)
        improved = objs < obj0[..., None]
        any_improved = jnp.any(improved, axis=-1)
        first = jnp.argmax(improved, axis=-1)  # first improving alpha
        x_new = jnp.take_along_axis(cand, first[..., None, None], axis=-2)[..., 0, :]
        x_new = jnp.where(any_improved[..., None], x_new, x)

        newly_done = step_small | ~any_improved
        x = jnp.where(done[..., None], x, x_new)
        iters = iters + jnp.where(done, 0, 1).astype(jnp.int32)
        done = done | newly_done
        return x, done, iters

    batch_shape = q.shape[:-1]
    done0 = match_vma(jnp.zeros(batch_shape, dtype=bool), (H, q, x0))
    iters0 = match_vma(jnp.zeros(batch_shape, dtype=jnp.int32), (H, q, x0))
    x, _, iters = jax.lax.fori_loop(0, n_iter, body, (x0, done0, iters0))

    # Final active set + factorization for reuse by the caller.
    g = bmv(H, x) + q
    Ic = clamped_set(x, g)
    Hm = masked_identity_system(H, Ic, reg)
    chol = cholesky_small(Hm)
    return PnqpResult(x=x, chol_free=chol, free_mask=~Ic, n_iter=iters)
