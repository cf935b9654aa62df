"""Per-node wall-time breakdown of the TPC-H Q3 bench plan (VERDICT r2
#4): wraps every ExecNode class's ``batches`` generator with timers, runs
the exact bench_q3 plan once on the default backend, and prints
inclusive/self seconds per node instance.

Run on chip:  python tools/q3_trace.py [--sf 0.5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_REC = {}       # id(node) -> [factory, inclusive_sec, rows, children ids]


def _install():
    import arrow_tpu.acero.nodes as N

    seen = set()
    for name in dir(N):
        cls = getattr(N, name)
        if not (isinstance(cls, type) and issubclass(cls, N.ExecNode)
                and cls is not N.ExecNode):
            continue
        if "batches" not in cls.__dict__ or cls in seen:
            continue
        seen.add(cls)
        orig = cls.__dict__["batches"]

        def make(orig):
            def batches(self):
                rec = _REC.setdefault(id(self), [
                    self.factory_name, 0.0, 0,
                    [id(i) for i in getattr(self, "inputs", [])]])
                gen = orig(self)
                while True:
                    t0 = time.perf_counter()
                    try:
                        b = next(gen)
                    except StopIteration:
                        rec[1] += time.perf_counter() - t0
                        return
                    rec[1] += time.perf_counter() - t0
                    try:
                        rec[2] += int(b.length) if isinstance(
                            b.length, int) else 0
                    except Exception:
                        pass
                    yield b
            return batches
        cls.batches = make(orig)


def _count_syncs():
    """Wrap jax.device_get with a counter+timer: through the axon relay
    every blocking fetch pays an RTT, so sync COUNT is a first-class
    cost axis for the eager plan driver."""
    import jax
    stats = {"n": 0, "sec": 0.0}
    orig = jax.device_get

    def wrapped(x):
        t0 = time.perf_counter()
        out = orig(x)
        stats["n"] += 1
        stats["sec"] += time.perf_counter() - t0
        return out
    jax.device_get = wrapped
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.5)
    args = ap.parse_args()

    os.environ.setdefault("ARROW_TPU_BENCH_SCALE", str(args.sf / 0.5))
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    _install()
    import bench

    dev = jax.devices()[0]
    # run the bench's q3 once compiled/warm, then trace the second run
    t0 = time.time()
    ours, ref = bench.bench_q3(dev)
    print(f"bench_q3 warm+timed total {time.time()-t0:.1f}s  "
          f"ours={ours/1e6:.2f}M rows/s ref={ref/1e6:.2f}M rows/s",
          flush=True)

    # inclusive times were accumulated across ALL runs (incl. warmup);
    # reset and run once more for a clean profile
    for v in _REC.values():
        v[1] = 0.0
        v[2] = 0
    t0 = time.time()
    # rebuild the declaration fresh so node instances are new
    _REC.clear()
    sync = _count_syncs()
    ours2, _ = bench.bench_q3(dev)
    total = time.time() - t0
    print(f"device_get syncs: {sync['n']} calls, {sync['sec']:.2f}s "
          "blocked", flush=True)

    incl = {k: v for k, v in _REC.items()}
    print(f"\ntraced run: {total:.2f}s total (incl. pyarrow oracle + "
          "build)", flush=True)
    for k, (fac, sec, rows, children) in sorted(
            incl.items(), key=lambda kv: -kv[1][1]):
        child_sec = sum(incl[c][1] for c in children if c in incl)
        print(f"{fac:>16}  incl {sec:7.3f}s  self {sec - child_sec:7.3f}s"
              f"  rows {rows}", flush=True)


if __name__ == "__main__":
    main()
