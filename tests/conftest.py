"""Test configuration: 8 virtual CPU devices + 64-bit mode.

Multi-device logic is tested on a fake 8-device CPU backend, mirroring the
strategy in SURVEY.md §4 ("runnable on CPU via
--xla_force_host_platform_device_count").
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
