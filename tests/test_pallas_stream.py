"""Streaming (double-buffered DMA) Riccati kernel vs the XLA reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from diffmpc_tpu.ops.lqr import riccati_backward
from diffmpc_tpu.ops.pallas.riccati_stream import riccati_backward_pallas_stream
from oracles import random_lqr_problem


def _as32(*arrays):
    return [jnp.asarray(a, jnp.float32) for a in arrays]


@pytest.mark.parametrize("T,n,m", [(5, 3, 1), (40, 4, 2)])
def test_stream_free_mode_matches_xla(T, n, m):
    rng = np.random.default_rng(800 + T)
    B = 64
    C, c, F, f, _ = random_lqr_problem(rng, T, B, n, m, psd_eps=1.0)
    Cj, cj, Fj, fj = _as32(C, c, F, f)
    ref = riccati_backward(Cj, cj, Fj, fj, n)
    out = riccati_backward_pallas_stream(Cj, cj, Fj, fj, n, interpret=True)
    np.testing.assert_allclose(np.asarray(out.K), np.asarray(ref.K), atol=3e-3)
    np.testing.assert_allclose(np.asarray(out.k), np.asarray(ref.k), atol=3e-3)


def test_stream_box_mode_matches_xla():
    rng = np.random.default_rng(900)
    T, B, n, m = 12, 64, 3, 1
    C, c, F, f, _ = random_lqr_problem(rng, T, B, n, m)
    Cj, cj, Fj, fj = _as32(C, c, F, f)
    u_hat = jnp.zeros((T, B, m), jnp.float32)
    lo = jnp.full((T, B, m), -0.5, jnp.float32)
    hi = jnp.full((T, B, m), 0.5, jnp.float32)
    ref = riccati_backward(Cj, cj, Fj, fj, n, u_lower=lo, u_upper=hi, u_hat=u_hat)
    out = riccati_backward_pallas_stream(
        Cj, cj, Fj, fj, n, u_lower=lo, u_upper=hi, u_hat=u_hat, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out.k), np.asarray(ref.k), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.K), np.asarray(ref.K), atol=5e-4)


def test_stream_mask_mode_matches_xla():
    rng = np.random.default_rng(901)
    T, B, n, m = 9, 64, 3, 2
    C, c, F, f, _ = random_lqr_problem(rng, T, B, n, m)
    Cj, cj, Fj, fj = _as32(C, c, F, f)
    mask = jnp.asarray(rng.random((T, B, m)) < 0.3)
    ref = riccati_backward(Cj, cj, Fj, None, n, ctrl_mask=mask)
    out = riccati_backward_pallas_stream(
        Cj, cj, Fj, None, n, ctrl_mask=mask, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out.K), np.asarray(ref.K), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.k), np.asarray(ref.k), atol=5e-4)
