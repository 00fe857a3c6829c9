"""Numerical-sanitizer hooks (SURVEY.md §5.2).

The reference has no sanitizers (single-threaded Python); in the XLA model
there is no thread-race surface either, so the debugging story is numerical:
NaN/Inf detection inside jitted solves, either globally (``jax_debug_nans``)
or as a checked solve via ``jax.experimental.checkify``.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Context manager flipping JAX's global NaN debugging (errors pinpoint
    the primitive that produced the first NaN)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def checked_solve(solve_fn):
    """Wrap a jittable solve so it returns ``(error, solution)`` with
    NaN/Inf (and index/div) checks recorded by ``checkify`` — usable inside
    ``jit`` where Python assertions cannot run.

    Example::

        checked = checked_solve(lambda x: mpc_solve(config, x, cost, dx))
        err, sol = jax.jit(checked)(x_init)
        err.throw()  # host-side: raises if any check tripped
    """
    from jax.experimental import checkify

    def wrapped(*args, **kwargs):
        out = solve_fn(*args, **kwargs)
        flat = jax.tree_util.tree_leaves(out)
        for leaf in flat:
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                checkify.check(
                    jnp.all(jnp.isfinite(leaf)), "non-finite value in solve output"
                )
        return out

    return checkify.checkify(wrapped, errors=checkify.float_checks)
