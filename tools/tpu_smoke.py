"""On-hardware compile-smoke + measurement gate (VERDICT r2 #5).

Round-3 lesson: hand-written AOT smoke programs DRIFT from the bench
programs (a float32-vs-float64 mismatch made the driver's filter config
recompile from scratch and burn its budget), so this gate now drives
``bench.py --one <config>`` itself — the smoked program IS the bench
program by construction, and a green run leaves the persistent compile
cache (``.jax_cache``) warm with exactly the executables the driver's
end-of-round sweep will load.

Run whenever the axon tunnel is live, before snapshotting:
    python tools/tpu_smoke.py [--scale 1.0] [--only filter,sort]
                              [--timeout 900]
Prints one PASS/FAIL line per config (with the measured speedup) and
exits non-zero on any FAIL. BASELINE.md records the last green run.
Logs stream to .bench_logs/smoke_<name>.log so a timeout still leaves
diagnostics.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    from bench import CONFIG_NAMES

    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0,
                    help="ARROW_TPU_BENCH_SCALE for every config")
    ap.add_argument("--only", default=None)
    ap.add_argument("--timeout", type=float, default=900.0,
                    help="per-config wall budget (cold tunnel compiles "
                         "run minutes)")
    args = ap.parse_args()

    names = args.only.split(",") if args.only else list(CONFIG_NAMES)
    log_dir = os.path.join(_REPO, ".bench_logs")
    os.makedirs(log_dir, exist_ok=True)
    env = dict(os.environ, ARROW_TPU_BENCH_SCALE=str(args.scale))

    failed = []
    for name in names:
        log_path = os.path.join(log_dir, f"smoke_{name}.log")
        t0 = time.time()
        try:
            with open(log_path, "w") as logf:
                r = subprocess.run(
                    [sys.executable, os.path.join(_REPO, "bench.py"),
                     "--one", name],
                    stdout=logf, stderr=subprocess.STDOUT,
                    timeout=args.timeout, env=env)
            with open(log_path) as f:
                lines = [l for l in f.read().strip().splitlines()
                         if l.startswith("{")]
            if r.returncode == 0 and lines:
                res = json.loads(lines[-1])
                print(f"PASS {name}  ({time.time() - t0:.1f}s)  "
                      f"speedup={res.get('speedup')} "
                      f"tpu_rows_s={res.get('tpu_rows_s')}", flush=True)
            else:
                with open(log_path) as f:
                    tail = " | ".join(f.read().strip().splitlines()[-3:])
                print(f"FAIL {name}  ({time.time() - t0:.1f}s): "
                      f"rc={r.returncode} {tail[:300]}", flush=True)
                failed.append(name)
        except subprocess.TimeoutExpired:
            print(f"FAIL {name}  timeout>{args.timeout:.0f}s "
                  f"(see {log_path})", flush=True)
            failed.append(name)
    if failed:
        print(f"SMOKE FAILED: {failed}", flush=True)
        sys.exit(1)
    print("SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
