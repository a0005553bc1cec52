"""Test configuration.

Tests run on CPU with 8 virtual devices so `jax.sharding` / `shard_map`
multi-chip paths can be exercised without TPU hardware.  Must be set before
JAX initialises its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's TPU plugin (sitecustomize) force-sets
# jax.config.jax_platforms at interpreter start, overriding the env var —
# pin it back to cpu before any backend initialises.
import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (the full suite; default skips "
             "them so a single-core box finishes in <10 min — r3 "
             "verdict #6 measured 28 min for the flat suite)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: expensive interpret-mode/multiprocess test — skipped "
        "unless --runslow (CI tier: run BOTH `pytest tests/` and "
        "`pytest tests/ --runslow` before shipping)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _bounded_xla_compile_state():
    """XLA CPU segfaults in backend_compile_and_load after a few hundred
    tests' worth of accumulated compile state (upstream; first hit r3 in
    test_peeling's ml-leg, and the tipping point MOVES whenever the suite
    grows — it relocated to test_compacted_and_packed_match_dense when
    two multichip tests were added ahead of it). Start every module from
    a clean compilation cache so the accumulation stays bounded:
    cross-module cache reuse is negligible (test programs differ by
    shape), so this costs seconds, not minutes."""
    jax.clear_caches()
    yield
