"""Test configuration: 8 virtual CPU devices + 64-bit mode.

Multi-device logic is tested on a fake 8-device CPU backend, mirroring the
strategy in SURVEY.md §4 ("runnable on CPU via
--xla_force_host_platform_device_count").  The shell may preset
``JAX_PLATFORMS`` to the TPU plugin; tests always force CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# the axon TPU plugin overrides the JAX_PLATFORMS env var; force CPU here
jax.config.update("jax_platforms", "cpu")
