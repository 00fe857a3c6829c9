"""Streaming (HBM double-buffered) fused KKT backward vs the XLA composite
backward and the VMEM-resident fused kernel (interpret mode) — covers the
shapes kkt_fits_vmem rejects (cartpole T=20, long horizons)."""

import jax.numpy as jnp
import numpy as np
import pytest

import jax

from diffmpc_tpu.ops.lqr_step import LqrSpec, _kkt_backward_impl, lqr_fixed_point
from diffmpc_tpu.ops.pallas.kkt_stream import kkt_backward_fused_stream

from test_pallas_kkt import _random_residuals


@pytest.mark.parametrize(
    "T,n,m,n_tight",
    [
        (8, 3, 1, 40),  # pendulum-shaped
        (6, 5, 1, 30),  # cartpole-shaped (does not fit the resident kernel)
        (5, 3, 2, 50),  # multi-control
        (1, 3, 1, 0),  # degenerate horizon
    ],
)
def test_stream_kkt_matches_xla_backward(T, n, m, n_tight):
    rng = np.random.default_rng(900 + T * 100 + n * 10 + m)
    B = 24
    C, c, F, x_star, u_star, lo, hi, gx, gu = _random_residuals(
        rng, T, B, n, m, n_tight
    )
    spec = LqrSpec(n_state=n, constrained=True, use_pallas=False)
    x_init = x_star[0]
    res = (x_init, C, c, F, jnp.zeros((T, B, n)), x_star, u_star, lo, hi)
    ref = _kkt_backward_impl(spec, res, (gx, gu))
    dx_init_r, dC_r, dc_r, dF_r, df_r = ref[:5]

    tight = (u_star <= lo + spec.tight_eps) | (u_star >= hi - spec.tight_eps)
    if n_tight:
        assert bool(jnp.any(tight))
    r = jnp.concatenate([gx, jnp.where(tight, 0.0, gu)], axis=-1)
    tau = jnp.concatenate([x_star, u_star], axis=-1)
    dx_init, dC, dc, dF, df = kkt_backward_fused_stream(
        C, c, F, r, tau, tight, reg=spec.back_eps, interpret=True
    )

    tol = dict(rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dx_init), np.asarray(dx_init_r), **tol)
    np.testing.assert_allclose(np.asarray(dc), np.asarray(dc_r), **tol)
    np.testing.assert_allclose(np.asarray(dC), np.asarray(dC_r), **tol)
    np.testing.assert_allclose(np.asarray(df), np.asarray(df_r), **tol)
    np.testing.assert_allclose(np.asarray(dF), np.asarray(dF_r), **tol)


@pytest.mark.parametrize("seed", range(4))
def test_stream_kkt_shape_fuzz(seed):
    """Random (T, n, m, tight fraction) through the streaming KKT kernel vs
    the XLA composite backward — same sweep as the resident-kernel fuzz
    (test_pallas_kkt.py) so both implementations of the sign-critical
    recursions stay pinned across layouts."""
    rng = np.random.default_rng(1300 + seed)
    T = int(rng.integers(1, 12))
    n = int(rng.integers(1, 6))
    m = int(rng.integers(1, 4))
    B = 24
    n_tight = int(rng.integers(0, max(1, T * B * m // 4)))
    C, c, F, x_star, u_star, lo, hi, gx, gu = _random_residuals(
        rng, T, B, n, m, n_tight
    )
    spec = LqrSpec(n_state=n, constrained=True, use_pallas=False)
    res = (x_star[0], C, c, F, jnp.zeros((T, B, n)), x_star, u_star, lo, hi)
    ref = _kkt_backward_impl(spec, res, (gx, gu))
    dx_init_r, dC_r, dc_r, dF_r, df_r = ref[:5]

    tight = (u_star <= lo + spec.tight_eps) | (u_star >= hi - spec.tight_eps)
    r = jnp.concatenate([gx, jnp.where(tight, 0.0, gu)], axis=-1)
    tau = jnp.concatenate([x_star, u_star], axis=-1)
    dx_init, dC, dc, dF, df = kkt_backward_fused_stream(
        C, c, F, r, tau, tight, reg=spec.back_eps, interpret=True
    )
    tol = dict(rtol=3e-5, atol=3e-5)
    msg = f"seed={seed} T={T} n={n} m={m} n_tight={n_tight}"
    for got, want in ((dx_init, dx_init_r), (dc, dc_r), (dC, dC_r),
                      (df, df_r), (dF, dF_r)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), err_msg=msg, **tol
        )


def test_stream_kkt_dispatch_over_vmem_budget(monkeypatch):
    """lqr_fixed_point routes to the STREAMING fused backward for shapes over
    both VMEM budgets (long horizon) when the batch fills a tile
    (interpret on CPU)."""
    import diffmpc_tpu.ops.pallas.kkt_stream as ks_mod
    from diffmpc_tpu.ops.pallas.kkt import kkt_fits_vmem
    from diffmpc_tpu.ops.pallas.riccati import fits_vmem as riccati_fits_vmem

    calls = {"n": 0}
    orig = ks_mod.kkt_backward_fused_stream

    def counting(*args, **kwargs):
        calls["n"] += 1
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(ks_mod, "kkt_backward_fused_stream", counting)
    # pin the dispatch budget to the round-1 value so the "over both
    # budgets" regime below stays true regardless of the production
    # default (24 MB round 2) — the regime, not the constant, is under test
    from diffmpc_tpu.ops.pallas import riccati as riccati_mod

    monkeypatch.setattr(
        riccati_mod, "VMEM_BUDGET_BYTES", riccati_mod.NO_LIFT_VMEM_BYTES
    )

    rng = np.random.default_rng(910)
    # over BOTH budgets: the composite path would stream its Riccati here,
    # which is the regime where the fully-streamed fused backward wins
    T, B, n, m = 30, 520, 5, 1
    assert not kkt_fits_vmem(T, n, m)
    assert not riccati_fits_vmem(T, n, m)
    C, c, F, x_star, u_star, lo, hi, gx, gu = _random_residuals(rng, T, B, n, m)

    def loss(spec, Cv, cv):
        xs, us = lqr_fixed_point(
            spec, x_star[0], Cv, cv, F, jnp.zeros((T, B, n)),
            x_star, u_star, lo, hi,
        )
        return jnp.sum(xs * gx) + jnp.sum(us * gu)

    spec_xla = LqrSpec(n_state=n, constrained=True, use_pallas=False)
    spec_pl = LqrSpec(n_state=n, constrained=True, use_pallas=True)
    gC_ref, gc_ref = jax.grad(loss, argnums=(1, 2))(spec_xla, C, c)
    assert calls["n"] == 0
    gC_pl, gc_pl = jax.grad(loss, argnums=(1, 2))(spec_pl, C, c)
    assert calls["n"] == 1
    np.testing.assert_allclose(np.asarray(gC_pl), np.asarray(gC_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(gc_pl), np.asarray(gc_ref), atol=3e-5)
