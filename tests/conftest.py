"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (SURVEY.md §4 note on simulated
meshes).

NOTE the axon TPU plugin (sitecustomize) force-registers itself and stomps
JAX_PLATFORMS, so the env var alone is NOT enough — we must also override
via jax.config after import. XLA_FLAGS must still be set before the first
backend initialization to get 8 virtual CPU devices.
"""

import os

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
