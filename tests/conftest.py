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


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bounded_live_executables():
    """Drop all framework + jax compile caches between test modules.

    This jaxlib's XLA:CPU client segfaults loading roughly the ~1000th
    live executable of a process (deterministically reproduced at the
    ~110-test mark of the full suite, in executable deserialization —
    with a fresh disk cache it moves to backend_compile_and_load; every
    module passes in isolation).  Bounding live executables per module
    keeps the plain `python -m pytest tests/ -q` run under the limit;
    clear_compile_caches is the framework's production API for the same
    long-lived-process concern.
    """
    yield
    from yak_tpu.utils import clear_compile_caches
    clear_compile_caches()
