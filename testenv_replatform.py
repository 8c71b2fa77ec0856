"""pytest `-p` plugin: re-exec the test run on a fast virtual-CPU platform.

The container routes every jax process through the axon TPU tunnel
(sitecustomize registers the plugin whenever PALLAS_AXON_POOL_IPS is set),
which adds minutes of blocking to CPU-only test runs.  The hook can only be
neutralized before interpreter start, so this plugin — imported by pytest
during early plugin registration, before fd capture begins — re-execs the
identical pytest command with the axon hook disabled and an 8-device
virtual CPU platform (multi-chip sharding tests run on that mesh).

Loaded via `addopts = -p testenv_replatform` in pytest.ini.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    # after exec the var is empty, so this cannot loop
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)
