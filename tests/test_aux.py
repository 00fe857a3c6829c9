"""Auxiliary-subsystem tests: sanitizers, logging, checkpointing,
distributed helpers (SURVEY.md §5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmpc_tpu.utils.debug import checked_solve, debug_nans
from diffmpc_tpu.utils.logging import CSVLogger, JSONLLogger, table_log


def test_checked_solve_catches_nan():
    def bad(x):
        return x / jnp.sum(x * 0.0)  # 0/0

    err, _ = jax.jit(checked_solve(bad))(jnp.ones(4))
    with pytest.raises(Exception):
        err.throw()

    def good(x):
        return x * 2.0

    err, out = jax.jit(checked_solve(good))(jnp.ones(4))
    err.throw()  # must not raise
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_debug_nans_context_restores_flag():
    before = jax.config.jax_debug_nans
    with debug_nans(True):
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


def test_loggers(tmp_path):
    csv_path = os.path.join(tmp_path, "m.csv")
    log = CSVLogger(csv_path, ["step", "loss"])
    log.log(step=0, loss=1.5)
    log.log(step=1, loss=1.2)
    log.close()
    lines = open(csv_path).read().strip().split("\n")
    assert lines[0] == "step,loss" and len(lines) == 3

    jl = JSONLLogger(os.path.join(tmp_path, "m.jsonl"))
    jl.log(step=0, loss=1.5)
    jl.close()
    import json

    row = json.loads(open(os.path.join(tmp_path, "m.jsonl")).read())
    assert row["loss"] == 1.5 and "time" in row

    line = table_log("t", (("a", 1), ("b", 1.23456, "{:.2f}")))
    assert line == "[t] a=1 b=1.23"


def test_checkpoint_roundtrip(tmp_path):
    from diffmpc_tpu.checkpoint import latest_step, restore_checkpoint, save_checkpoint

    state = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3), "n": jnp.asarray(3)}
    save_checkpoint(str(tmp_path), state, 10)
    save_checkpoint(str(tmp_path), state, 20)
    assert latest_step(str(tmp_path)) == 20
    got = restore_checkpoint(str(tmp_path), state)
    np.testing.assert_allclose(np.asarray(got["w"]), np.asarray(state["w"]))


def test_distributed_initialize_single_process():
    from diffmpc_tpu.parallel import distributed

    assert distributed.initialize() == jax.process_index()


def test_host_local_to_global_single_host():
    from diffmpc_tpu.parallel import distributed
    from diffmpc_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    local = np.arange(32, dtype=np.float32).reshape(16, 2)
    arr = distributed.host_local_to_global(mesh, local, batch_dim=0)
    assert arr.shape == (16, 2)
    np.testing.assert_allclose(np.asarray(arr), local)


def test_bench_bands_warn_and_regression_rule(tmp_path):
    """Bench regression tracking (VERDICT r4 #10): a synthetic low reading
    trips a WARN against the checked-in bands; the same row low in two
    consecutive recorded runs is promoted to REGRESSION by the history
    rule; in-band readings stay silent."""
    from diffmpc_tpu.utils.bench_bands import (
        check_bands, evaluate_with_history, format_warnings, load_bands,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bands_path = os.path.join(repo, "bench_bands.json")
    bands = load_bands(bands_path)
    assert "solves_per_s" in bands and "riccati_pass_ms" in bands

    # in-band: silent (values inside every recorded r2-r4 band)
    good = {"solves_per_s": 1_000_000.0, "riccati_pass_ms": 0.7,
            "roofline_frac": 0.35}
    assert check_bands(good, bands) == []

    # synthetic 20%-regression reading: the r4 gap this rule exists for
    bad = {"solves_per_s": 790_000.0, "riccati_pass_ms": 1.4}
    v = check_bands(bad, bands)
    assert {x["row"] for x in v} == {"solves_per_s", "riccati_pass_ms"}
    assert {x["kind"] for x in v} == {"below_min", "above_max"}

    # history rule: first low run -> WARN only; second consecutive -> REGRESSION
    hist = str(tmp_path / "hist.jsonl")
    v1, r1 = evaluate_with_history(bad, bands_path, hist)
    assert r1 == [] and len(v1) == 2
    lines1 = format_warnings(v1, r1)
    assert all(l.startswith("WARN") for l in lines1)
    assert any("solves_per_s" in l and "790000" in l for l in lines1)

    v2, r2 = evaluate_with_history(bad, bands_path, hist)
    assert r2 == ["riccati_pass_ms", "solves_per_s"]
    lines2 = format_warnings(v2, r2)
    assert all(l.startswith("REGRESSION") for l in lines2)

    # recovery resets the rule: in-band run, then one low run is WARN again
    v3, r3 = evaluate_with_history(good, bands_path, hist)
    assert v3 == [] and r3 == []
    v4, r4 = evaluate_with_history(bad, bands_path, hist)
    assert r4 == []

    # budget-dropped rows (absent) are not violations
    assert check_bands({}, bands) == []
