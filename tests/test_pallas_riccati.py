"""Pallas Riccati kernel vs the XLA reference implementation (interpret
mode on CPU; the real TPU path is exercised by bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from diffmpc_tpu.ops.lqr import lqr_rollout, riccati_backward
from diffmpc_tpu.ops.pallas.riccati import riccati_backward_pallas
from oracles import random_lqr_problem


def _as32(*arrays):
    return [jnp.asarray(a, jnp.float32) for a in arrays]


@pytest.mark.parametrize("n,m", [(3, 1), (4, 2), (3, 3)])
def test_pallas_free_mode_matches_xla(n, m):
    rng = np.random.default_rng(60 + n * 10 + m)
    T, B = 6, 64
    C, c, F, f, x_init = random_lqr_problem(rng, T, B, n, m)
    Cj, cj, Fj, fj = _as32(C, c, F, f)
    ref = riccati_backward(Cj, cj, Fj, fj, n)
    out = riccati_backward_pallas(Cj, cj, Fj, fj, n, interpret=True)
    np.testing.assert_allclose(np.asarray(out.K), np.asarray(ref.K), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.k), np.asarray(ref.k), atol=2e-4)
    assert bool(jnp.all(out.free_mask))
    # the gains must also produce the same optimal trajectory
    xs_r, us_r = lqr_rollout(jnp.asarray(x_init, jnp.float32), Fj, fj, ref.K, ref.k)
    xs_p, us_p = lqr_rollout(jnp.asarray(x_init, jnp.float32), Fj, fj, out.K, out.k)
    np.testing.assert_allclose(np.asarray(us_p), np.asarray(us_r), atol=5e-4)


@pytest.mark.parametrize("n,m", [(3, 1), (4, 2)])
def test_pallas_box_mode_matches_xla(n, m):
    rng = np.random.default_rng(70 + n * 10 + m)
    T, B = 5, 64
    C, c, F, f, x_init = random_lqr_problem(rng, T, B, n, m)
    Cj, cj, Fj, fj = _as32(C, c, F, f)
    u_hat = jnp.zeros((T, B, m), jnp.float32)
    lo = jnp.full((T, B, m), -0.5, jnp.float32)
    hi = jnp.full((T, B, m), 0.5, jnp.float32)
    ref = riccati_backward(
        Cj, cj, Fj, fj, n, u_lower=lo, u_upper=hi, u_hat=u_hat, pnqp_iter=20
    )
    out = riccati_backward_pallas(
        Cj, cj, Fj, fj, n, u_lower=lo, u_upper=hi, u_hat=u_hat,
        pnqp_iter=12, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out.k), np.asarray(ref.k), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.K), np.asarray(ref.K), atol=5e-4)
    agree = np.mean(np.asarray(out.free_mask) == np.asarray(ref.free_mask))
    assert agree > 0.99, agree


def test_pallas_mask_mode_matches_xla():
    rng = np.random.default_rng(80)
    T, B, n, m = 5, 64, 3, 2
    C, c, F, f, _ = random_lqr_problem(rng, T, B, n, m)
    Cj, cj, Fj, fj = _as32(C, c, F, f)
    mask = jnp.asarray(rng.random((T, B, m)) < 0.3)
    ref = riccati_backward(Cj, cj, Fj, None, n, ctrl_mask=mask)
    out = riccati_backward_pallas(Cj, cj, Fj, None, n, ctrl_mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out.K), np.asarray(ref.K), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.k), np.asarray(ref.k), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out.free_mask), np.asarray(~mask)
    )


def test_pallas_nonmultiple_batch_padding():
    rng = np.random.default_rng(81)
    T, B, n, m = 4, 37, 3, 1  # deliberately not a multiple of 1024
    C, c, F, f, _ = random_lqr_problem(rng, T, B, n, m)
    Cj, cj, Fj, fj = _as32(C, c, F, f)
    ref = riccati_backward(Cj, cj, Fj, fj, n)
    out = riccati_backward_pallas(Cj, cj, Fj, fj, n, interpret=True)
    assert out.K.shape == (T, B, m, n)
    np.testing.assert_allclose(np.asarray(out.K), np.asarray(ref.K), atol=2e-4)


@pytest.mark.parametrize("n,m", [(3, 1), (4, 2)])
@pytest.mark.parametrize("block", [2, 4])
def test_blocked_sweep_matches_serial(n, m, block):
    """Depth-blocked in-kernel Riccati (the VERDICT r4 #1 ILP experiment,
    ops/pallas/riccati_blocked.py): the element-composition algebra must
    reproduce the serial unconstrained sweep exactly up to f32 roundoff —
    correctness holds regardless of the hardware verdict recorded in
    DESIGN.md §3."""
    from diffmpc_tpu.ops.pallas.riccati_blocked import (
        riccati_backward_blocked_pallas,
    )

    rng = np.random.default_rng(7 + n * 10 + m)
    T, B = 8, 64
    C, c, F, f, x_init = random_lqr_problem(rng, T, B, n, m)
    Cj, cj, Fj, fj = _as32(C, c, F, f)
    ref = riccati_backward(Cj, cj, Fj, fj, n)
    out = riccati_backward_blocked_pallas(
        Cj, cj, Fj, fj, n, block=block, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out.K), np.asarray(ref.K), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.k), np.asarray(ref.k), atol=5e-4)
    assert bool(jnp.all(out.free_mask))


def test_blocked_sweep_validates_shapes():
    from diffmpc_tpu.ops.pallas.riccati_blocked import (
        riccati_backward_blocked_pallas,
    )

    rng = np.random.default_rng(0)
    C, c, F, f, _ = random_lqr_problem(rng, 6, 8, 3, 1)
    Cj, cj, Fj, fj = _as32(C, c, F, f)
    with pytest.raises(ValueError, match="divide"):
        riccati_backward_blocked_pallas(
            Cj, cj, Fj, fj, 3, block=4, interpret=True
        )
    with pytest.raises(ValueError, match="block"):
        riccati_backward_blocked_pallas(
            Cj, cj, Fj, fj, 3, block=3, interpret=True
        )
