"""use_pallas=None auto-resolution from the devices IN the computation.

VERDICT r2 weak item #2: the old auto mode consulted the process-global
``jax.default_backend()`` at trace time, so a CPU mesh built while a TPU
backend was registered (``JAX_PLATFORMS='cpu,axon'``) dispatched Mosaic TPU
kernels into a CPU program and failed to lower. The resolution now prefers
(1) an explicit platform hint (``make_dp_train_step`` passes its mesh's
device platform), (2) the abstract mesh in the trace context
(``shard_map``), and only then (3) the default backend. These tests emulate
the TPU-default environment by monkeypatching ``jax.default_backend`` —
equivalent for the resolution logic, and runnable offline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from diffmpc_tpu import MPCConfig, QuadCost, mpc_solve
from diffmpc_tpu.models import PendulumDx
from diffmpc_tpu.ops import lqr_step as lqr_step_mod
from diffmpc_tpu.ops.lqr_step import _auto_platform, _resolve_use_pallas
from diffmpc_tpu.parallel import (
    init_train_state,
    make_dp_train_step,
    make_mesh,
    shard_batch,
)


@pytest.fixture
def tpu_default_backend(monkeypatch):
    """Emulate JAX_PLATFORMS='cpu,axon': default backend reports tpu while
    the actual devices in use are the 8 virtual CPU devices."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # lqr_step resolves through its own module-level ``jax`` import; patch
    # both lookups in case of future refactors.
    monkeypatch.setattr(lqr_step_mod.jax, "default_backend", lambda: "tpu")
    yield


def _problem(T=5, B=16, dtype=jnp.float32):
    dx = PendulumDx.default(dtype)
    q, p = dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)
    config = MPCConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=2, eps=1e-5,
        exit_unconverged=False, detach_unconverged=False, dtype=dtype,
    )
    rng = np.random.default_rng(7)
    th = rng.uniform(-np.pi, np.pi, B)
    x_init = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), rng.uniform(-1, 1, B)], -1), dtype
    )
    return config, cost, dx, x_init


def test_auto_platform_prefers_mesh_context(tpu_default_backend):
    assert _auto_platform() == "tpu"  # no mesh in context -> default backend
    assert _resolve_use_pallas(None) is True

    seen = []

    def body(x):
        seen.append((_auto_platform(), _resolve_use_pallas(None)))
        return x

    mesh = make_mesh(jax.devices("cpu")[:8])
    jax.eval_shape(
        jax.shard_map(body, mesh=mesh, in_specs=(P("batch"),), out_specs=P("batch")),
        jnp.zeros((8,), jnp.float32),
    )
    assert seen == [("cpu", False)], (
        "inside a CPU-mesh shard_map the abstract mesh must override the "
        f"TPU default backend; got {seen}"
    )


def test_auto_platform_hint_wins(tpu_default_backend):
    assert _resolve_use_pallas(None, "cpu") is False
    assert _resolve_use_pallas(None, "tpu") is True
    # explicit use_pallas always wins over any resolution
    assert _resolve_use_pallas(False, "tpu") is False
    assert _resolve_use_pallas(True, "cpu") is True


def test_cpu_mesh_solve_under_tpu_default(tpu_default_backend):
    """The VERDICT repro: mpc_solve (use_pallas=None) compiled for a CPU
    mesh while the default backend reports TPU must take the XLA path —
    previously this dispatched Mosaic kernels into the CPU program and
    failed to lower."""
    config, cost, dx, x_init = _problem()
    mesh = make_mesh(jax.devices("cpu")[:8])

    def local(x):
        sol = mpc_solve(config, x, cost, dx, u_lower=-2.0, u_upper=2.0)
        return sol.us

    f = jax.jit(
        jax.shard_map(
            local, mesh=mesh, in_specs=(P("batch"),), out_specs=P("batch"),
            check_vma=True,
        )
    )
    us = f(x_init)
    assert bool(jnp.all(jnp.isfinite(us)))


def test_dp_train_step_under_tpu_default(tpu_default_backend):
    """make_dp_train_step resolves from ITS mesh's device platform: on the
    CPU mesh it must pick the XLA path + check_vma=True and run."""
    config, cost, dx, x_init = _problem()
    T, B = config.T, x_init.shape[0]
    mesh = make_mesh(jax.devices("cpu")[:8])

    def make_problem(params):
        return cost, dx.replace(params=params)

    opt = optax.adam(1e-3)
    step = make_dp_train_step(
        config, make_problem, opt, mesh, u_lower=-2.0, u_upper=2.0
    )
    state = init_train_state(dx.params, opt)
    x = shard_batch(mesh, x_init, batch_dim=0)
    u_expert = shard_batch(mesh, jnp.zeros((T, B, 1), jnp.float32), batch_dim=1)
    state, stats = step(state, x, u_expert)
    assert bool(jnp.isfinite(stats.loss))
