"""Test configuration: virtual 8-device CPU mesh + float64 for oracles.

Multi-chip sharding is validated on a virtual CPU mesh (no multi-chip TPU
hardware in this environment — SURVEY.md §7 env facts); numerical oracles
(dense KKT solves, finite differences) want f64, which the TPU lacks, so all
tests run on CPU with x64 enabled and the library is exercised in both f32
and f64.
"""

import os

# Must land before the CPU client is instantiated. Note: this environment's
# sitecustomize imports jax and registers the remote "axon" TPU backend at
# interpreter start, so JAX_PLATFORMS env is already consumed — the platform
# must be forced via jax.config below, after import.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# DIFFMPC_REAL_TPU_TESTS=1 leaves the session backend (the real TPU) in
# place so the TPU-gated tests actually execute on hardware:
#   DIFFMPC_REAL_TPU_TESTS=1 python -m pytest tests/test_pallas_sharding.py -k real_tpu
# Select those tests explicitly — the rest of the suite assumes CPU + x64
# (f64 oracles; the TPU backend has no f64) and is NOT expected to pass
# wholesale under this flag.
if not os.environ.get("DIFFMPC_REAL_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
