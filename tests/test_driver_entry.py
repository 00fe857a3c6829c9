"""Gate-parity tests: run the LITERAL driver entry points.

Round 2's multichip gate went red (MULTICHIP_r02.json) while the whole test
suite was green, because nothing in tests/ executed the exact
``__graft_entry__.dryrun_multichip(8)`` the driver runs — the one path the
suite never covered (VERDICT r2 missing item #2). These tests close that
gap: the subprocess tests run the literal entry point under the two env
styles the driver/users use, and the probe test pins the custom_vjp VMA
contract (every ``lqr_fixed_point`` primal promoted to the union varying
type) independent of how strict the installed JAX's checker happens to be —
the r2 failure reproduced only under a stricter JAX than this container's.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_sub(code: str, extra_env: dict) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env.update(extra_env)
    # The driver (and fresh shells) invoke from the repo root; keep the
    # axon sitecustomize on PYTHONPATH like the real environment does.
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        # Generous: the dryrun alone takes ~45 s on an idle box, but under
        # a fully loaded pytest-xdist run (4 workers each compiling JAX
        # programs) 900 s was observed to flake (r4 suite log). The gate
        # must fail on real breakage, not on box contention.
        timeout=1800,
    )


@pytest.mark.parametrize("style", ["env_var", "config_update"])
def test_dryrun_multichip_literal(style):
    """The exact driver gate: ``__graft_entry__.dryrun_multichip(8)`` in a
    fresh interpreter. ``env_var`` = platform forced before interpreter
    start (the driver's style); ``config_update`` = platform switched after
    ``import jax`` (the conftest/user style) — the two differ in when the
    backend registry is frozen, and both must pass."""
    if style == "env_var":
        code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
        extra = {
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        }
    else:
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu');\n"
            "import __graft_entry__ as g; g.dryrun_multichip(8)"
        )
        extra = {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
        extra["JAX_PLATFORMS"] = ""  # let sitecustomize/default registration run
        extra.pop("JAX_PLATFORMS")
    res = _run_sub(code, extra)
    assert res.returncode == 0, (
        f"dryrun_multichip(8) [{style}] failed rc={res.returncode}\n"
        f"--- stdout ---\n{res.stdout[-2000:]}\n"
        f"--- stderr ---\n{res.stderr[-4000:]}"
    )
    assert "dryrun_multichip(8)" in res.stdout


def test_entry_compiles():
    """The driver's single-chip compile check: ``entry()`` must trace/lower."""
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    # eval_shape = full trace without device execution (the driver compiles
    # on the real chip; on CPU we pin that the program is well-formed).
    out = jax.eval_shape(fn, *args)
    assert out.shape == (20, 1024, 1)


def test_fixed_point_primals_uniformly_varying(monkeypatch):
    """Environment-independent pin of the r2 multichip failure mode.

    Under ``shard_map(check_vma=True)`` with a CLOSED-OVER (replicated)
    cost and scalar bounds, every primal entering ``lqr_fixed_point`` must
    already be batch-varying — the KKT backward returns batch-varying
    cotangents for all of them, and a strict checker rejects any
    replicated-primal/varying-cotangent pair (MULTICHIP_r02.json: C typed
    ``float32[5,4,4,4]`` vs cotangent ``{V:batch}``). This container's JAX
    accepts the mismatch, so the subprocess tests alone cannot catch a
    regression — this probe asserts the promoted types directly.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    import diffmpc_tpu.mpc as mpc_mod
    from diffmpc_tpu import MPCConfig, QuadCost, mpc_solve
    from diffmpc_tpu.models import PendulumDx
    from diffmpc_tpu.parallel import make_mesh

    real_fp = mpc_mod.lqr_fixed_point
    seen = []

    def probe(spec, *args):
        seen.append([tuple(sorted(jax.typeof(a).vma)) for a in args])
        return real_fp(spec, *args)

    monkeypatch.setattr(mpc_mod, "lqr_fixed_point", probe)

    dx = PendulumDx.default(jnp.float32)
    q, p = dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)  # closed over -> replicated in shard_map
    config = MPCConfig(
        n_state=3, n_ctrl=1, T=5, lqr_iter=2, eps=1e-5,
        exit_unconverged=False, detach_unconverged=False, dtype=jnp.float32,
    )
    mesh = make_mesh(jax.devices("cpu")[:8])

    def local(x):
        sol = mpc_solve(config, x, cost, dx, u_lower=-2.0, u_upper=2.0)
        return sol.us

    f = jax.shard_map(
        local, mesh=mesh, in_specs=(P("batch"),), out_specs=P("batch"),
        check_vma=True,
    )
    jax.eval_shape(f, jnp.zeros((16, 3), jnp.float32))

    assert seen, "lqr_fixed_point was never reached (backprop path skipped?)"
    for types in seen:
        assert all(t == ("batch",) for t in types), (
            "lqr_fixed_point primal not batch-varying under "
            f"shard_map(check_vma=True): {types} — a strict VMA checker "
            "(driver JAX) rejects the KKT backward's varying cotangents "
            "for any replicated primal; see mpc.py fixed-point attach."
        )
