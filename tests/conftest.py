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

jax.config.update("jax_enable_x64", False)
