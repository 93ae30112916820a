"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding tests (SURVEY.md section 4.4) run on fake CPU devices via
XLA's host-platform device-count override — the standard JAX pattern for
testing `shard_map`/`ppermute` code without a TPU pod. Must be set before JAX
initializes, hence here in conftest at import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
