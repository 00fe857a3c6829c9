"""Ahead-of-time export of MPC solve programs (``jax.export``).

Serving deployment support (SURVEY.md §5.4 — the reference's deployment
story is per-process Python; a TPU fleet wants a build-once artifact): a
solve program — config, cost, dynamics, bounds, batch shape all fixed — is
serialized as a StableHLO artifact (Mosaic kernel custom-calls embedded)
that a serving process loads and calls WITHOUT the model/config Python or
retracing. Honest scope: deserialization skips tracing/lowering, and the
backend compile of the artifact is cached by the persistent compilation
cache (``JAX_COMPILATION_CACHE_DIR``) like any program; the artifact is a
versioned deployment unit, not a compile-time bypass.

Runtime inputs are opt-in and positional, in this order:
``f(x_init[, u_init][, params])`` —

- ``warm_start=True`` adds ``u_init`` (the receding-horizon pattern:
  ship one artifact, thread the shifted plan at runtime);
- ``params_input=True`` adds the dynamics-model parameter pytree (serve a
  sysid/learned model whose weights update without re-exporting; shapes
  are taken from ``dx.params``, per-scenario ``(B, P)`` rows included);
- ``vjp_order=1`` makes the artifact differentiable after load
  (``jax.grad`` through ``load_solve(blob)`` re-enters the serialized
  analytic KKT backward) — training against a frozen solver build.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import export as _jexport

from .mpc import MPCInfo, MPCSolution, mpc_solve
from .types import MPCConfig

# The artifact's output tree contains these NamedTuples; their treedefs
# must be serializable (and re-registered identically at load — importing
# this module does both sides).
for _nt in (MPCSolution, MPCInfo):
    try:
        _jexport.register_namedtuple_serialization(
            _nt, serialized_name=f"diffmpc_tpu.{_nt.__name__}"
        )
    except ValueError:  # already registered (re-import / reload)
        pass


def export_solve(
    config: MPCConfig,
    cost,
    dx,
    B: int,
    *,
    u_lower=None,
    u_upper=None,
    warm_start: bool = False,
    params_input: bool = False,
    vjp_order: int = 0,
    platforms: Optional[list] = None,
    mesh=None,
) -> bytes:
    """Serialize the solve program for batch size ``B`` to bytes.

    ``platforms`` passes through to ``jax.export.export`` (e.g.
    ``['tpu']`` to cross-lower from a CPU build host); default = the
    current backend. Cross-lowering for a pure-TPU target forces the
    fused Pallas dispatch: ``use_pallas=None`` resolves from the devices
    in the computation, which on a CPU build host would silently bake
    the (correct but far slower) XLA orchestration into the TPU artifact
    — verified on hardware that the CPU-built fused artifact is bitwise
    identical to the chip-built one (scripts/check_aot_tpu.py).

    ``mesh``: a 1-D ``jax.sharding.Mesh`` — exports the MULTI-DEVICE
    program with the scenario batch (and the parameter rows of a
    per-scenario model, per ``dx.param_batch_shape``) sharded over its
    axis; the artifact records the device count and runs on a same-shape
    mesh at load. Shared parameter leaves are replicated. Mesh artifacts
    bake the XLA orchestration (GSPMD-partitionable); the fused Mosaic
    kernel has no SPMD partitioning rule and is rejected under ``mesh=``.
    """
    import dataclasses

    if mesh is not None:
        # The fused Mosaic mega-kernel is a single custom call with no
        # SPMD partitioning rule: under a GSPMD-sharded exported program
        # it would replicate the full batch per device (or fail to
        # partition). Multi-device artifacts therefore bake the XLA
        # orchestration, which GSPMD partitions cleanly; Pallas-speed
        # multi-chip serving goes through the shard_map training-step
        # path (parallel/), not through an exported artifact.
        if config.use_pallas:
            raise NotImplementedError(
                "mesh= export with use_pallas=True is not supported: the "
                "Mosaic custom call cannot be GSPMD-partitioned. Export "
                "per-host single-device artifacts, or serve sharded via "
                "parallel.make_dp_train_step-style shard_map."
            )
        if config.use_pallas is None:
            config = dataclasses.replace(config, use_pallas=False)
    elif (
        platforms is not None
        and config.use_pallas is None
        and all(str(p).lower() == "tpu" for p in platforms)
    ):
        config = dataclasses.replace(config, use_pallas=True)
    T, n, m = config.T, config.n_state, config.n_ctrl
    dtype = config.dtype

    def solve(x, u_init=None, params=None):
        d = dx if params is None else dx.replace(params=params)
        return mpc_solve(
            config, x, cost, d, u_init=u_init,
            u_lower=u_lower, u_upper=u_upper,
        )

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        axis = mesh.axis_names[0]
        # Per-scenario-ness of params comes from the model's own
        # declaration (Dynamics.param_batch_shape), NOT a raw shape
        # heuristic: a custom model may carry a legitimately-shared 2-D
        # params array whose first dim coincides with B
        # (mpc._check_param_batch's documented override case) — those
        # must stay replicated.
        params_per_scenario = getattr(dx, "param_batch_shape", ()) == (B,)

        def _param_sds(a):
            shape = jnp.shape(a)
            spec = (
                PartitionSpec(axis)
                if params_per_scenario and len(shape) >= 2 and shape[0] == B
                else PartitionSpec()
            )
            return jax.ShapeDtypeStruct(
                shape, jnp.asarray(a).dtype,
                sharding=NamedSharding(mesh, spec),
            )

        x_s = jax.ShapeDtypeStruct(
            (B, n), dtype, sharding=NamedSharding(mesh, PartitionSpec(axis))
        )
    else:

        def _param_sds(a):
            return jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype)

        x_s = jax.ShapeDtypeStruct((B, n), dtype)

    u_s = None
    if warm_start:
        if mesh is not None:
            # u_init is (T, B, m): batch on dim 1
            u_s = jax.ShapeDtypeStruct(
                (T, B, m), dtype,
                sharding=NamedSharding(mesh, PartitionSpec(None, axis)),
            )
        else:
            u_s = jax.ShapeDtypeStruct((T, B, m), dtype)
    p_s = jax.tree.map(_param_sds, getattr(dx, "params", None))
    if params_input and p_s is None:
        raise ValueError(
            "params_input=True requires a dynamics model with a .params "
            f"pytree; {type(dx).__name__} has none"
        )

    # Fixed positional signatures: the artifact's calling convention must
    # not depend on keyword plumbing that the loading process can't see.
    if warm_start and params_input:
        fn, args = (lambda x, u, p: solve(x, u, p)), (x_s, u_s, p_s)
    elif warm_start:
        fn, args = (lambda x, u: solve(x, u)), (x_s, u_s)
    elif params_input:
        fn, args = (lambda x, p: solve(x, params=p)), (x_s, p_s)
    else:
        fn, args = (lambda x: solve(x)), (x_s,)

    kw = {} if platforms is None else {"platforms": platforms}
    exp = _jexport.export(jax.jit(fn), **kw)(*args)
    return exp.serialize(vjp_order=vjp_order)


def load_solve(blob: bytes):
    """Deserialize an :func:`export_solve` artifact into a callable.

    The callable takes the positional runtime inputs chosen at export time
    and returns the full :class:`~diffmpc_tpu.mpc.MPCSolution` pytree. It
    is jit-compatible and, if exported with ``vjp_order>=1``,
    differentiable.
    """
    exp = _jexport.deserialize(blob)

    def call(*args):
        return exp.call(*args)

    call.exported = exp  # introspection: .in_avals, .platforms, ...
    return call
