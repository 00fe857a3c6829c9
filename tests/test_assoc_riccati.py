"""Parallel-in-time (associative-scan) Riccati vs the sequential scan."""

import jax.numpy as jnp
import numpy as np
import pytest

from diffmpc_tpu.ops.assoc_riccati import riccati_backward_assoc
from diffmpc_tpu.ops.lqr import lqr_rollout, riccati_backward
from oracles import dense_lqr_kkt, random_lqr_problem


@pytest.mark.parametrize("T,n,m", [(2, 3, 2), (7, 3, 1), (32, 4, 2), (65, 2, 2)])
def test_assoc_matches_sequential(T, n, m):
    rng = np.random.default_rng(300 + T)
    B = 8
    C, c, F, f, x_init = random_lqr_problem(rng, T, B, n, m)
    Cj, cj, Fj, fj = map(jnp.asarray, (C, c, F, f))
    seq = riccati_backward(Cj, cj, Fj, fj, n)
    par = riccati_backward_assoc(Cj, cj, Fj, fj, n)
    np.testing.assert_allclose(np.asarray(par.K), np.asarray(seq.K), atol=1e-8)
    np.testing.assert_allclose(np.asarray(par.k), np.asarray(seq.k), atol=1e-8)


def test_assoc_solution_matches_dense_kkt():
    rng = np.random.default_rng(400)
    T, B, n, m = 12, 6, 3, 2
    C, c, F, f, x_init = random_lqr_problem(rng, T, B, n, m)
    Cj, cj, Fj, fj, x0 = map(jnp.asarray, (C, c, F, f, x_init))
    par = riccati_backward_assoc(Cj, cj, Fj, fj, n)
    xs, us = lqr_rollout(x0, Fj, fj, par.K, par.k)
    xs_o, us_o, _ = dense_lqr_kkt(C, c, F, f, x_init)
    np.testing.assert_allclose(np.asarray(us), us_o, atol=1e-7)
    np.testing.assert_allclose(np.asarray(xs), xs_o, atol=1e-7)
