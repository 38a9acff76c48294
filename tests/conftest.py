"""Test configuration.

Tests run on a *virtual 8-device CPU mesh* (the "fake cluster" of SURVEY.md
§4): sharding/collective code paths compile and execute without TPU hardware.

Note: this image's sitecustomize pre-imports jax and pins
``jax_platforms=axon,cpu`` (the TPU tunnel), so plain env vars are too late —
the platform must be forced via ``jax.config.update`` after import, and
XLA_FLAGS must be set before the CPU backend first initializes (which is
later, at first device use — so setting it here still works).
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs a reachable TPU (runs compiled Mosaic kernels "
        "in a subprocess; skipped automatically when absent)")
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running integration tests")
