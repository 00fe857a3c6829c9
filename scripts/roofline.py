"""Roofline for the fused iLQR mega-kernel at the bench shape (VERDICT r2 #3).

Question answered: is the measured ~1.0 ms fixed-work solve (T=20, B=1024
pendulum, 10 iterations) the hardware floor, or 10x off it?

Method
------
1. **Algorithmic FLOPs per iteration** — taken from XLA's own
   ``cost_analysis()`` of the *XLA path* (``use_pallas=False``) compiled on
   CPU, as the marginal count ``flops(lqr_iter=k+1) - flops(lqr_iter=k)``.
   The XLA path runs the same algorithm as the mega-kernel (linearize ->
   Riccati backward with in-loop pnqp -> alpha-ladder line-search rollouts
   -> select/replay), with the same unrolled small-Cholesky linalg, so its
   HLO flop count is a faithful count of the kernel's per-iteration math.
   (We cannot count inside the Mosaic kernel; XLA cost analysis does not
   see into pallas_call.)
2. **VMEM traffic per iteration** — analytic: the kernel is VMEM-resident;
   per Riccati/rollout step it reads and writes the per-timestep entry
   tiles.  A conservative lower bound on traffic is
   ``3 sweeps x T x S_entries x TILE_B x 4 B`` (backward sweep reads, ladder
   rollout reads, replay writes), where S_entries counts the f32 scalars
   per (t, scenario): C (10, sym 4x4) + c (4) + F (12) + f (3) + u, x, du
   etc. ~= 40.
3. **Hardware peaks (TPU v5e, 1 core)** — stated assumptions, public
   figures: clock ~0.94 GHz; VPU = 8x128 lanes x 4 ALUs = 4096 f32
   ops/cycle => 3.85e12 op/s (7.7e12 FLOP/s if every op were an FMA
   counted as 2 FLOPs, XLA's convention); VMEM bandwidth O(10-20) TB/s
   (scaling-book rule of thumb ~20x HBM; HBM = 819 GB/s).

Floors: ``t_vpu = F_iter / VPU_peak``; ``t_vmem = bytes_iter / VMEM_bw``.
``roofline_frac = max(t_vpu, t_vmem) / t_measured`` — the fraction of the
hardware bound the kernel achieves (1.0 = speed of light).

Run CPU-only (flop count + floors, no TPU needed):
    python scripts/roofline.py
Add the measured iteration slope from the chip (one TPU process at a time):
    python scripts/roofline.py --tpu

The derived constants are copied into bench.py (ROOFLINE_*) so every
bench run reports ``roofline_frac`` in BENCH_DETAILS.json; re-run this
script after solver-math changes and update them if the flop count moves.
"""

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# --- hardware model (TPU v5e, single core) --------------------------------
CLOCK_HZ = 0.94e9
VPU_LANES = 8 * 128
VPU_ALUS_PER_LANE = 4
VPU_OPS_PER_S = VPU_LANES * VPU_ALUS_PER_LANE * CLOCK_HZ  # 3.85e12 op/s
VPU_FLOPS_FMA = 2 * VPU_OPS_PER_S  # XLA counts an FMA as 2 FLOPs
VMEM_BW_B_PER_S = 16e12  # ~20x HBM(819 GB/s) rule of thumb, order-of-magnitude
TILE_B = 1024


def flops_of(jitted, *args):
    c = jitted.lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return float(ca["flops"])


class _unrolled_scan:
    """Monkeypatch ``jax.lax.scan`` with a pure-Python unrolled loop while
    tracing for cost analysis. XLA's HloCostAnalysis counts a while-loop
    body ONCE regardless of trip count (verified: riccati_backward reports
    identical flops at T=20 and T=40), so the library's scans must be
    unrolled at trace time for the count to mean anything. This counts the
    library's REAL per-iteration math — no re-implementation to drift."""

    def __enter__(self):
        import jax

        self._orig = jax.lax.scan

        def scan(f, init, xs=None, length=None, reverse=False, **_kw):
            import jax as _jax

            n = length
            if xs is not None:
                leaves = _jax.tree_util.tree_leaves(xs)
                if leaves:
                    n = leaves[0].shape[0]
            idx = range(n - 1, -1, -1) if reverse else range(n)
            carry, ys = init, []
            for i in idx:
                x_i = (
                    None
                    if xs is None
                    else _jax.tree_util.tree_map(lambda a: a[i], xs)
                )
                carry, y = f(carry, x_i)
                ys.append(y)
            if reverse:
                ys = ys[::-1]
            import jax.numpy as _jnp

            ys = _jax.tree_util.tree_map(
                lambda *zs: _jnp.stack(zs), *ys
            )
            return carry, ys

        import jax as _j

        _j.lax.scan = scan
        return self

    def __exit__(self, *exc):
        import jax

        jax.lax.scan = self._orig
        return False


def per_iteration_flops(B=1024, T=20):
    """HLO flops of ONE iLQR iteration on the XLA path (CPU), scans
    unrolled so every timestep / line-search alpha is actually counted.
    One iteration = linearize about the trajectory + lqr_step (Riccati
    backward with per-step closed-form m=1 pnqp + alpha-ladder rollouts +
    select/replay) — exactly the mega-kernel's per-iteration body."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _pendulum_setup, _x_init
    from diffmpc_tpu.mpc import _expand_cost
    from diffmpc_tpu.ops.linearize import linearize_dynamics
    from diffmpc_tpu.ops.lqr_step import LqrSpec, lqr_step

    config, cost, dx = _pendulum_setup(T=T)
    x = _x_init(B, seed=0)
    qc = _expand_cost(cost, T, B, jnp.float32)
    lo = jnp.full((T, B, 1), -2.0, jnp.float32)
    hi = jnp.full((T, B, 1), 2.0, jnp.float32)
    spec = LqrSpec(
        n_state=3,
        constrained=True,
        reg=config.reg if hasattr(config, "reg") else 1e-9,
        pnqp_iter=config.pnqp_iter if hasattr(config, "pnqp_iter") else 20,
        linesearch_decay=config.linesearch_decay,
        max_linesearch_iter=config.max_linesearch_iter,
        use_pallas=False,
    )

    def one_iteration(x_init, us):
        xs = [x_init]
        for t in range(T - 1):
            xs.append(dx.forward(xs[-1], us[t]))
        xs = jnp.stack(xs)
        lin = linearize_dynamics(dx, xs, us)
        res = lqr_step(
            spec, x_init, qc.C, qc.c, lin.F, lin.f, xs, us,
            u_lower=lo, u_upper=hi,
            dynamics_fn=lambda xx, uu, tt: dx.forward(xx, uu),
        )
        return res.xs, res.us, res.objs

    us0 = jnp.zeros((T, B, 1), jnp.float32)
    with _unrolled_scan():
        jitted = jax.jit(one_iteration)
        total = flops_of(jitted, x, us0)
    # subtract the unrolled warm-up rollout (not part of the iteration body:
    # the mega-kernel rolls out once at entry, then each iteration reuses
    # the line-search result)
    with _unrolled_scan():

        def rollout_only(x_init, us):
            xs = [x_init]
            for t in range(T - 1):
                xs.append(dx.forward(xs[-1], us[t]))
            return jnp.stack(xs)

        f_roll = flops_of(jax.jit(rollout_only), x, us0)
    return total - f_roll, total


def vmem_bytes_per_iteration(B=1024, T=20, n=3, m=1):
    """Conservative analytic VMEM traffic of one mega-kernel iteration."""
    nm = n + m
    s_entries = (
        nm * (nm + 1) // 2  # C (symmetric)
        + nm                # c
        + n * nm            # F
        + n                 # f
        + n + m             # trajectory x, u
        + m                 # du / gains reuse
    )
    sweeps = 3  # backward read, ladder rollout read, replay write
    return sweeps * T * s_entries * 4 * B


def measured_iteration_slope_tpu(B=1024, T=20, iters=(4, 12), rounds=8):
    """Interleaved lqr_iter sweep on the real chip -> ms/iteration.

    A bare single dispatch costs ~2-3 ms through the tunnel — far above
    the slope signal — so each timed call lax.maps over several problem
    sets: the per-call overhead becomes a constant that CANCELS in the
    t_hi - t_lo difference (same protocol as scripts/ab_ladder_slope.py)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _pendulum_setup, _x_init
    from diffmpc_tpu.mpc import _expand_cost
    from diffmpc_tpu.ops.pallas.ilqr import ilqr_solve_fused

    config, cost, dx = _pendulum_setup(T=T)
    qc = _expand_cost(cost, T, B, jnp.float32)
    lo = jnp.full((T, B, 1), -2.0, jnp.float32)
    hi = jnp.full((T, B, 1), 2.0, jnp.float32)
    n_sets = 4
    xs = jnp.stack([_x_init(B, seed=s) for s in range(n_sets)])

    def make(k):
        def one(xi):
            fr = ilqr_solve_fused(
                xi, qc.C, qc.c, dx, lo, hi,
                lqr_iter=k, pnqp_iter=8, reg=1e-7,
                decay=config.linesearch_decay,
                max_linesearch_iter=config.max_linesearch_iter,
                eps=0.0,  # no early exit: every iteration must run
                not_improved_lim=10**6,
            )
            return fr.us
        return jax.jit(lambda s: jax.lax.map(one, s))

    fns = {k: make(k) for k in iters}
    for f in fns.values():
        jax.block_until_ready(f(xs))
    best = {k: float("inf") for k in iters}
    for _ in range(rounds):
        for k, f in fns.items():  # strict alternation (CLAUDE.md discipline)
            t0 = time.perf_counter()
            for _ in range(10):
                r = f(xs)
            jax.block_until_ready(r)
            best[k] = min(best[k], (time.perf_counter() - t0) / 10)
    k_lo, k_hi = min(iters), max(iters)
    return (best[k_hi] - best[k_lo]) / ((k_hi - k_lo) * n_sets) * 1e3, {
        k: v * 1e3 for k, v in best.items()
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true", help="also measure on chip")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--horizon", type=int, default=20)
    args = ap.parse_args()

    out = {}
    if args.tpu:
        slope_ms, raw = measured_iteration_slope_tpu(args.batch, args.horizon)
        out["measured_ms_per_iteration"] = round(slope_ms, 4)
        out["raw_ms_per_solve"] = {k: round(v, 4) for k, v in raw.items()}
    else:
        import jax

        jax.config.update("jax_platforms", "cpu")
        f_iter, f_base = per_iteration_flops(args.batch, args.horizon)
        by = vmem_bytes_per_iteration(args.batch, args.horizon)
        t_vpu_ms = f_iter / VPU_FLOPS_FMA * 1e3
        t_vpu_noFMA_ms = f_iter / VPU_OPS_PER_S * 1e3
        t_vmem_ms = by / VMEM_BW_B_PER_S * 1e3
        out.update(
            flops_per_iteration=f_iter,
            flops_per_scenario_iteration=f_iter / args.batch,
            flops_setup_plus_first_iter=f_base,
            vmem_bytes_per_iteration=by,
            floor_ms_vpu_fma=round(t_vpu_ms, 4),
            floor_ms_vpu_no_fma=round(t_vpu_noFMA_ms, 4),
            floor_ms_vmem=round(t_vmem_ms, 4),
            floor_ms=round(max(t_vpu_noFMA_ms, t_vmem_ms), 4),
        )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
