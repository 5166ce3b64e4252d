"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual devices so data-parallel sharding and
collectives are exercised without TPU hardware (SURVEY.md §4 test strategy).
"""

import os

os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not enough where a site customization (e.g. the axon
# TPU-tunnel plugin) forces jax_platforms via jax.config.update at interpreter
# startup — re-force CPU at the config level before any backend initializes,
# or the whole suite silently runs over the device tunnel (1 real device, so
# the 8-device mesh tests break; 150-300 ms per dispatch).
# UDIFFTEXT_TEST_TPU=1 opts out, for running the TPU-gated Pallas kernel
# tests (tests/test_ops.py) on real hardware.
if not os.environ.get("UDIFFTEXT_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
