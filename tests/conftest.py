"""Test configuration.

Platform selection (virtual 8-device CPU, axon tunnel disabled) happens in
`testenv_replatform.py`, loaded as an early `-p` plugin from pytest.ini —
it must run before interpreter-level state is set up, which a conftest is
too late for.  Here we only assert/fallback the env for direct runs.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
