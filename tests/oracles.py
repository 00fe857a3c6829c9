"""Independent numerical oracles for solver tests.

The reference binary is absent in this environment (SURVEY.md §0), so parity
fixtures come from independent trusted implementations of the published
problem definitions (SURVEY.md §4 "Mapping to our build"):

- :func:`dense_lqr_kkt`: solve the time-stacked LQR KKT system directly with
  dense numpy f64 linear algebra — no Riccati recursion involved.
- :func:`boxqp_enumerate`: exact box-QP solve by enumerating all 3^m
  active-set configurations — no projected Newton involved.

Both are deliberately written in plain numpy, structurally unlike the
library code they check.
"""

import numpy as np


def dense_lqr_kkt(C, c, F, f, x_init):
    """Solve min sum_t 0.5 tau_t' C_t tau_t + c_t' tau_t
    s.t. x_0 = x_init, x_{t+1} = F_t tau_t + f_t, by one dense KKT solve.

    Shapes: C (T,B,nm,nm), c (T,B,nm), F (T,B,n,nm), f (T,B,n), x_init (B,n).
    Returns xs (T,B,n), us (T,B,m), lams (T,B,n) — the multipliers of the
    constraint blocks (lams[0] pairs with the x_0 = x_init constraint).
    """
    T, B, nm = c.shape
    n = x_init.shape[-1]
    m = nm - n
    xs = np.zeros((T, B, n))
    us = np.zeros((T, B, m))
    lams = np.zeros((T, B, n))
    nv = T * nm
    nc = T * n
    for b in range(B):
        H = np.zeros((nv, nv))
        cv = np.zeros(nv)
        A = np.zeros((nc, nv))
        bv = np.zeros(nc)
        for t in range(T):
            sl = slice(t * nm, (t + 1) * nm)
            H[sl, sl] = C[t, b]
            cv[sl] = c[t, b]
        # x_0 = x_init
        A[0:n, 0:n] = np.eye(n)
        bv[0:n] = x_init[b]
        # x_{t+1} - F_t tau_t = f_t
        for t in range(T - 1):
            r = slice((t + 1) * n, (t + 2) * n)
            A[r, (t + 1) * nm : (t + 1) * nm + n] = np.eye(n)
            A[r, t * nm : (t + 1) * nm] = -F[t, b]
            bv[r] = f[t, b]
        KKT = np.block([[H, A.T], [A, np.zeros((nc, nc))]])
        rhs = np.concatenate([-cv, bv])
        sol = np.linalg.solve(KKT, rhs)
        tau = sol[:nv].reshape(T, nm)
        lam = sol[nv:].reshape(T, n)
        xs[:, b] = tau[:, :n]
        us[:, b] = tau[:, n:]
        lams[:, b] = lam
    return xs, us, lams


def boxqp_enumerate(H, q, lower, upper):
    """Exact solve of min 0.5 x'Hx + q'x s.t. lower <= x <= upper by
    enumerating active sets. H (B,m,m) SPD; q/lower/upper (B,m).

    Returns x (B,m)."""
    B, m = q.shape
    out = np.zeros((B, m))
    for b in range(B):
        best_obj = np.inf
        best_x = None
        for code in range(3**m):
            state = [(code // 3**i) % 3 for i in range(m)]  # 0 free,1 lo,2 hi
            free = [i for i in range(m) if state[i] == 0]
            x = np.array(
                [
                    0.0 if state[i] == 0 else (lower[b, i] if state[i] == 1 else upper[b, i])
                    for i in range(m)
                ]
            )
            if free:
                Fi = np.ix_(free, free)
                rhs = -(q[b, free] + H[b][np.ix_(free, range(m))] @ x - H[b][Fi] @ x[free])
                try:
                    xf = np.linalg.solve(H[b][Fi], rhs)
                except np.linalg.LinAlgError:
                    continue
                x[free] = xf
            # primal feasibility
            if np.any(x < lower[b] - 1e-9) or np.any(x > upper[b] + 1e-9):
                continue
            # dual feasibility on active dims
            g = H[b] @ x + q[b]
            ok = True
            for i in range(m):
                if state[i] == 1 and g[i] < -1e-9:
                    ok = False
                if state[i] == 2 and g[i] > 1e-9:
                    ok = False
            if not ok:
                continue
            obj = 0.5 * x @ H[b] @ x + q[b] @ x
            if obj < best_obj - 1e-12:
                best_obj = obj
                best_x = x.copy()
        assert best_x is not None, "no KKT point found (oracle bug)"
        out[b] = best_x
    return out


def random_lqr_problem(rng, T, B, n, m, dtype=np.float64, psd_eps=0.5):
    """Random batched LQR problem with well-conditioned PSD costs
    (built as L L' + eps I, the reference test idiom — SURVEY.md §4)."""
    nm = n + m
    L = rng.standard_normal((T, B, nm, nm))
    C = np.einsum("tbij,tbkj->tbik", L, L) / nm + psd_eps * np.eye(nm)
    c = rng.standard_normal((T, B, nm))
    F = rng.standard_normal((T, B, n, nm)) * 0.5
    f = rng.standard_normal((T, B, n)) * 0.5
    x_init = rng.standard_normal((B, n))
    return (
        C.astype(dtype),
        c.astype(dtype),
        F.astype(dtype),
        f.astype(dtype),
        x_init.astype(dtype),
    )
