"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (SURVEY.md §4 note on simulated
meshes).

NOTE the axon TPU plugin (sitecustomize) force-registers itself and stomps
JAX_PLATFORMS, so the env var alone is NOT enough — we must also override
via jax.config after import. XLA_FLAGS must still be set before the first
backend initialization to get 8 virtual CPU devices.
"""

import os

# Hermetic tests: the fused driver's learned-plan disk persistence
# (acero/fuse._PLAN_STORE_PATH) would otherwise leak observations
# between pytest runs and break bootstrap-chronology assertions.
os.environ["ARROW_TPU_PLAN_CACHE"] = ""

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()


# ---- fast default lane (VERDICT r2 #9) -----------------------------------
# Heavy oracle/e2e modules (TPC-H pipelines, real multi-process multihost,
# spill, overflow recovery, scaling) are marked `slow` and SKIPPED by
# default so `pytest tests -q` stays under ~5 minutes. Run the full lane
# with `pytest tests --runslow` (CI nightly / pre-snapshot) or
# ARROW_TPU_FULL_TESTS=1.
_SLOW_MODULES = {
    "test_tpch", "test_multihost", "test_parallel", "test_dataset",
}
_SLOW_KEYWORDS = ("spill", "overflow", "grace", "external_sort",
                  "scaling",
                  # top of `--durations` on the 1-CPU CI box (compile-
                  # bound multi-batch/param-sweep oracle tests)
                  "topk_fused", "asofjoin_streaming", "raw_string_key",
                  "bloom_selective", "multibatch", "segment_keys",
                  "substrait_join", "substrait_cross", "full_pipeline",
                  "count_distinct_merge", "variance_stddev",
                  "pivot_wider",
                  # 40s each on the 1-CPU box (multi-impl sweeps)
                  "dense_group_by_matches", "dense_group_by_mixed",
                  "agg_sort_fetch",
                  # one param of each stays in the default lane
                  "string_by_keys_streamed[-40")


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run slow-marked oracle/e2e tests")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy oracle/e2e test (skipped by default; "
        "--runslow or ARROW_TPU_FULL_TESTS=1 enables)")


def pytest_collection_modifyitems(config, items):
    run_slow = (config.getoption("--runslow")
                or os.environ.get("ARROW_TPU_FULL_TESTS") == "1")
    skip = pytest.mark.skip(reason="slow lane: pass --runslow")
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        name = item.name.lower()
        if mod in _SLOW_MODULES or \
                any(k in name for k in _SLOW_KEYWORDS):
            item.add_marker(pytest.mark.slow)
            if not run_slow:
                item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _bounded_jit_code_space():
    """Clear the engine stage cache + jax executable caches between test
    modules: a single process that never drops compiled executables
    eventually segfaults inside XLA:CPU's JIT (code-space ceiling) —
    observed deterministically once the suite grew past ~780 compiles."""
    yield
    from arrow_tpu.acero.nodes import clear_stage_cache
    clear_stage_cache()
