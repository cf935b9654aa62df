"""host_boundary phase probe: times the dictionary-pushdown pieces of
the regex-filter pipeline separately on chip.

Run:  python tools/hb_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import pyarrow as pa
    import pyarrow.compute as pc
    import arrow_tpu as at
    from arrow_tpu.compute import call_function
    from arrow_tpu.ops.selection import filter_batch
    from arrow_tpu.ops.strings import MatchSubstringOptions
    from arrow_tpu.ops.strings_regex import _pushdown_encode

    dev = jax.devices()[0]
    n = 2_000_000
    rng = np.random.default_rng(7)
    words = np.array([f"id{i % 977:03d}x{i % 31}" for i in range(4096)])
    vals = words[rng.integers(0, len(words), n)]
    ints = rng.integers(0, 1 << 30, n)
    rb = pa.record_batch({"s": pa.array(vals), "v": pa.array(ints)})
    pattern = r"7x[12]?[0-9]$"
    batch = at.Batch.from_pyarrow(rb).device_put(dev)
    col = batch.column(0)

    def t(label, fn, reps=3):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(f"{label:>28}: {np.median(ts)*1e3:7.1f}ms", flush=True)
        return np.median(ts)

    # 1. the jitted distinct-encode pass
    t("pushdown_encode (jit)", lambda: jax.block_until_ready(
        _pushdown_encode(col)))
    # 2. fetching the slots to host
    outs = _pushdown_encode(col)
    t("device_get slots", lambda: jax.device_get(
        (outs[1], outs[2], outs[3], outs[4])))
    # 3. whole regex kernel (encode + host RE2 + codes take)
    t("match_substring_regex", lambda: jax.block_until_ready(
        call_function("match_substring_regex", [col],
                      MatchSubstringOptions(pattern)).values))
    # 4. jitted filter
    m = call_function("match_substring_regex", [col],
                      MatchSubstringOptions(pattern))
    fb = jax.jit(filter_batch)
    t("filter_batch (jit)", lambda: jax.block_until_ready(
        fb(batch, m).column(1).values))
    # 5. UNjitted filter (what the old bench measured)
    t("filter_batch (eager)", lambda: jax.block_until_ready(
        filter_batch(batch, m).column(1).values))
    # 6. pyarrow oracle
    def pa_run():
        mm = pc.match_substring_regex(rb["s"], pattern)
        return rb.filter(mm)
    t("pyarrow oracle", pa_run)


if __name__ == "__main__":
    main()
