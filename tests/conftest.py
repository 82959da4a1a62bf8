"""Test config: run everything on CPU with 8 virtual devices so sharding
tests work without a TPU pod (SURVEY.md §4). Must run before jax imports."""

import os

# NOTE: the environment may pre-set JAX_PLATFORMS (e.g. to the TPU tunnel);
# tests must run on local CPU with virtual devices, so force-override it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force the CPU client explicitly
# (otherwise tests run over the single-chip TPU tunnel — slow, and concurrent
# processes deadlock on the tunnel lock).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run tests marked slow (>30 s end-to-end runs)")


def pytest_collection_modifyitems(config, items):
    """Default selection excludes @pytest.mark.slow so `pytest -q` stays a
    fast gate; `pytest -q --slow` runs the full suite (still green)."""
    if config.getoption("--slow"):
        return
    import pytest
    skip = pytest.mark.skip(reason="slow e2e test; rerun with --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
