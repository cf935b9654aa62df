"""Config/flag system.

Reference: Arrow's three tiers (``docs/source/cpp/env_vars.rst``) —
build-time cmake options -> ``GetBuildInfo``; env vars; per-call options
structs. This engine mirrors them:

  1. build info: ``build_info()`` / ``runtime_info()`` report versions,
     backend, native-runtime availability;
  2. env vars (all prefixed ARROW_TPU_):
       ARROW_TPU_NO_X64            downcast 64-bit types (not bit-exact)
       ARROW_TPU_DEBUG_MEMORY_POOL poison native pool allocations
       ARROW_TPU_TRACE_DIR         jax profiler trace output dir
       ARROW_TPU_FILTER_IMPL       'sort' | 'scatter' compaction path
       ARROW_TPU_BENCH_SCALE       bench.py size multiplier
  3. per-call options classes next to each kernel (FunctionOptions
     analogs) and per-node ExecNodeOptions.
"""

from __future__ import annotations

import os
from typing import Dict

__all__ = ["build_info", "runtime_info", "env_settings"]

_ENV_VARS = ["ARROW_TPU_NO_X64", "ARROW_TPU_DEBUG_MEMORY_POOL",
             "ARROW_TPU_TRACE_DIR", "ARROW_TPU_FILTER_IMPL",
             "ARROW_TPU_BENCH_SCALE"]


def build_info() -> Dict[str, str]:
    import jax
    import jaxlib
    from .. import __version__
    info = {
        "version": __version__,
        "jax_version": jax.__version__,
        "jaxlib_version": jaxlib.__version__,
    }
    try:
        from .. import native
        info["native_runtime"] = str(native.available())
    except Exception:
        info["native_runtime"] = "False"
    return info


def runtime_info() -> Dict[str, str]:
    import jax
    devs = jax.devices()
    return {
        "backend": jax.default_backend(),
        "num_devices": str(len(devs)),
        "device0": str(devs[0]) if devs else "none",
        "x64_enabled": str(jax.config.jax_enable_x64),
    }


def env_settings() -> Dict[str, str]:
    return {k: os.environ[k] for k in _ENV_VARS if k in os.environ}
