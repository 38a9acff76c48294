"""Test configuration.

Tests run on a *virtual 8-device CPU mesh* (the "fake cluster" of SURVEY.md
§4): sharding/collective code paths compile and execute without TPU hardware.
These env vars must be set before the first ``import jax`` anywhere, which is
why they live at conftest import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")
