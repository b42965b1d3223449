"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU runs happen via bench.py / the driver; tests validate semantics
and sharded logic on CPU (SURVEY §4).

Note: this machine's sitecustomize force-registers the 'axon' TPU backend
via jax.config (overriding JAX_PLATFORMS env), so we must reset the
config value, not just the env var.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
