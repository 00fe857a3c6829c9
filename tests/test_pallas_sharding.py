"""Pallas kernels composed with shard_map (VERDICT r1 #3): the production
multi-chip configuration — the fused solver kernels running inside a
device-mesh program — exercised on the virtual 8-device CPU mesh via Mosaic
interpret mode (``MPCConfig.pallas_interpret``). Real-hardware execution of
the same composition is covered by the TPU-only test at the bottom and by
``__graft_entry__.dryrun_multichip``."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from diffmpc_tpu import MPCConfig, QuadCost, mpc_solve
from diffmpc_tpu.models import PendulumDx
from diffmpc_tpu.parallel import (
    init_train_state,
    make_dp_train_step,
    make_mesh,
    shard_batch,
)
from diffmpc_tpu.parallel.mesh import BATCH_AXIS


def _problem(B, T, seed=900):
    dx = PendulumDx.default(jnp.float32)
    q, p = dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)
    rng = np.random.default_rng(seed)
    th = rng.uniform(-np.pi, np.pi, B)
    x_init = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), rng.uniform(-1, 1, B)], -1),
        jnp.float32,
    )
    return dx, cost, x_init


def test_wide_tile_pick_sees_local_batch_under_shard_map():
    """The tile-height auto-upgrade (round 3) happens at trace time INSIDE
    shard_map, so it keys on the per-device LOCAL batch: B_global=16384
    over 8 devices -> local 2048 -> sublane 16 (not the 32 that 16384
    would pick). Pinned by recording the height the kernel builder sees."""
    import diffmpc_tpu.ops.pallas.ilqr as ilqr_mod

    mesh = make_mesh(jax.devices("cpu")[:8])
    dx, cost, x_init = _problem(16384, 4)
    config = MPCConfig(
        n_state=3, n_ctrl=1, T=4, lqr_iter=1, eps=0.0,
        exit_unconverged=False, detach_unconverged=False,
        use_pallas=True, pallas_interpret=True,
    )
    seen = []
    orig = ilqr_mod._pick_sublane

    def recording(B, T, n, m, **kw):
        h = orig(B, T, n, m, **kw)
        seen.append((B, h))
        return h

    ilqr_mod._pick_sublane = recording
    try:
        assert orig(16384, 4, 3, 1) == 32  # global B would pick 32

        def local(x):
            sol = mpc_solve(config, x, cost, dx, u_lower=-2.0, u_upper=2.0)
            return sol.objs

        f = jax.jit(
            jax.shard_map(
                local, mesh=mesh, in_specs=(P(BATCH_AXIS),),
                out_specs=P(BATCH_AXIS), check_vma=False,
            )
        )
        objs = jax.block_until_ready(f(x_init))
        assert bool(jnp.all(jnp.isfinite(objs)))
    finally:
        ilqr_mod._pick_sublane = orig
    assert seen and all(b == 2048 and h == 16 for b, h in seen), seen


def test_fused_solve_inside_shard_map_matches_unsharded():
    """mpc_solve on the mega-kernel path, per-device inside shard_map,
    equals the same fused solve on the full batch (scenarios are
    independent, so sharding must be exact)."""
    B, T = 4096, 4  # 512 per device — above the fused dispatch threshold
    dx, cost, x_init = _problem(B, T)
    config = MPCConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=2, exit_unconverged=False,
        detach_unconverged=False, use_pallas=True, pallas_interpret=True,
        backprop=False,
    )

    def solve_local(x):
        sol = mpc_solve(config, x, cost, dx, u_lower=-2.0, u_upper=2.0)
        return sol.xs, sol.us, sol.objs

    ref = solve_local(x_init)

    mesh = make_mesh()
    sharded = jax.jit(
        jax.shard_map(
            solve_local,
            mesh=mesh,
            in_specs=(P(BATCH_AXIS),),
            out_specs=(P(None, BATCH_AXIS), P(None, BATCH_AXIS), P(BATCH_AXIS)),
            # interpret-mode kernels trace their bodies inside the manual
            # context where ref reads are VMA-typed inconsistently; compiled
            # Mosaic kernels run under check_vma=True (real-TPU test below)
            check_vma=False,
        )
    )(shard_batch(mesh, x_init, 0))

    np.testing.assert_allclose(np.asarray(sharded[1]), np.asarray(ref[1]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded[2]), np.asarray(ref[2]), rtol=1e-5)


def test_dp_train_step_on_pallas_path():
    """The full production multi-chip training configuration: shard_map +
    mega-kernel forward + fused KKT backward, vs the identical single-device
    Pallas step (interpret mode)."""
    B, T = 4096, 4
    dx, cost, x_init = _problem(B, T, seed=901)
    u_expert = jnp.zeros((T, B, 1), jnp.float32)
    config = MPCConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=2, exit_unconverged=False,
        detach_unconverged=False, use_pallas=True, pallas_interpret=True,
    )

    def make_problem(params):
        return cost, dx.replace(params=params)

    opt = optax.sgd(1e-2)
    mesh = make_mesh()
    step_1 = make_dp_train_step(config, make_problem, opt, None, -2.0, 2.0)
    step_n = make_dp_train_step(
        config, make_problem, opt, mesh, -2.0, 2.0, check_vma=False
    )
    s0 = init_train_state(dx.params, opt)
    s1, st1 = step_1(s0, x_init, u_expert)
    sn, stn = step_n(
        s0, shard_batch(mesh, x_init, 0), shard_batch(mesh, u_expert, 1)
    )
    assert np.isfinite(float(st1.loss)) and np.isfinite(float(stn.loss))
    np.testing.assert_allclose(float(stn.loss), float(st1.loss), rtol=1e-5)
    # f32: the sharded gradient is reduced in a different summation order
    # (per-device partial sums + pmean), so ~1e-4-level drift is expected
    np.testing.assert_allclose(
        np.asarray(sn.params), np.asarray(s1.params), rtol=1e-3, atol=5e-4
    )


@pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="real-TPU shard_map composition — run with "
    "DIFFMPC_REAL_TPU_TESTS=1 python -m pytest tests/test_pallas_sharding.py"
    " -k real_tpu (passed on hardware 2026-08-20, 1 passed in 156 s)",
)
def test_fused_solve_shard_map_real_tpu():
    """1-device-mesh shard_map around the real Mosaic kernels (the VERDICT's
    'single-TPU shard_map test closes most of this risk')."""
    B, T = 1024, 10
    dx, cost, x_init = _problem(B, T, seed=902)
    config = MPCConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=4, exit_unconverged=False,
        detach_unconverged=False, use_pallas=True, backprop=False,
    )

    def solve_local(x):
        sol = mpc_solve(config, x, cost, dx, u_lower=-2.0, u_upper=2.0)
        return sol.xs, sol.us, sol.objs

    ref = jax.jit(solve_local)(x_init)
    mesh = jax.make_mesh((1,), (BATCH_AXIS,))
    sharded = jax.jit(
        jax.shard_map(
            solve_local,
            mesh=mesh,
            in_specs=(P(BATCH_AXIS),),
            out_specs=(P(None, BATCH_AXIS), P(None, BATCH_AXIS), P(BATCH_AXIS)),
            check_vma=False,
        )
    )(x_init)
    np.testing.assert_allclose(np.asarray(sharded[1]), np.asarray(ref[1]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded[2]), np.asarray(ref[2]), rtol=1e-5)


def test_pallas_under_check_vma_true_jax_limitation():
    """VERDICT r2 #8 follow-through: pallas_call under
    ``shard_map(check_vma=True)`` — pinned as a JAX limitation, not a
    library bug, by a STRICT xfail: the day an installed JAX types this
    correctly, this test FAILS (xpass) and the ``check_vma=False``
    requirement in parallel/training.py + __graft_entry__ phase 2 must be
    revisited.

    Root cause (minimal form below): inside a kernel body, a
    dynamically-indexed ref read mixes the batch-VARYING ref data with the
    REPLICATED loop index, and jax<=0.9's ``dynamic_slice`` VMA rule
    requires them to match — JAX's own error message says "Please open an
    issue ... as a temporary workaround pass the check_vma=False argument".
    There is no pvary/pcast lowering in Mosaic either, so in-kernel
    promotion is not available. vma-typed out_shapes (ops/pallas/
    riccati.out_struct) solve the OUTPUT typing; the body typing is JAX's.
    """
    from jax.experimental import pallas as pl

    mesh = make_mesh(jax.devices("cpu")[:8])

    def kern(x_ref, o_ref):
        def body(i, c):
            return c + x_ref[i]  # dynamic-index read: varying ref, replicated i

        o_ref[...] = jnp.broadcast_to(
            jax.lax.fori_loop(0, 3, body, x_ref[0]), o_ref.shape
        )

    def f(x):
        out_shape = jax.ShapeDtypeStruct(
            x.shape, x.dtype, vma=frozenset({BATCH_AXIS})
        )
        return pl.pallas_call(kern, out_shape=out_shape, interpret=True)(x)

    g = jax.jit(
        jax.shard_map(
            f, mesh=mesh, in_specs=(P(BATCH_AXIS),), out_specs=P(BATCH_AXIS),
            check_vma=True,
        )
    )
    try:
        out = g(jnp.arange(16.0, dtype=jnp.float32))
        jax.block_until_ready(out)
    except Exception as e:
        assert "varying manual axes" in str(e) or "vma" in str(e).lower(), (
            f"pallas-under-check_vma failed with an UNEXPECTED error class "
            f"(not VMA typing): {e}"
        )
        return  # expected failure mode on jax <= 0.9
    pytest.fail(
        "pallas_call body with dynamic-index ref reads now TYPES under "
        "shard_map(check_vma=True) on this JAX "
        f"({jax.__version__}) — revisit the check_vma=False requirement in "
        "parallel/training.py (auto mode), __graft_entry__.dryrun_multichip "
        "phase 2, and ops/assoc_riccati.py."
    )
