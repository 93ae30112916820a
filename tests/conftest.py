"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding tests (SURVEY.md section 4.4) run on fake CPU devices via
XLA's host-platform device-count override — the standard JAX pattern for
testing `shard_map`/`ppermute` code without a TPU pod. Must be set before JAX
initializes, hence here in conftest at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: the host env pins the TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The container's sitecustomize registers the axon TPU plugin and forces
# jax_platforms="axon,cpu" through jax.config (env vars are too late).
# Push it back to CPU before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

import pytest  # noqa: E402

# Module-level tier markers (registered in pyproject.toml). Per-test `slow`
# marks live in the test files; these module-wide ones are centralized here so
# the batch recipe in CLAUDE.md has a single source of truth:
#   fast tier:  python -m pytest tests/ -m "not slow"        (<5 min, CI per-push)
#   full suite: sequential batches per CLAUDE.md             (~20 min, CI nightly)
_MODULE_MARKS = {
    "test_barneshut": [pytest.mark.barneshut],
    "test_sharded_bh": [pytest.mark.sharded, pytest.mark.barneshut],
    "test_ring": [pytest.mark.sharded],
    "test_multihost": [pytest.mark.sharded],
    "test_split_step": [pytest.mark.sharded],
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        stem = os.path.splitext(os.path.basename(str(item.fspath)))[0]
        for mark in _MODULE_MARKS.get(stem, ()):
            item.add_marker(mark)
