"""Ray-side robustness sweep: run EVERY queries() entry at a given sf
dir in one session, record wall time + row count, fail loudly on any
exception. The round-artifact form of BASELINE.md's "full sf0.1 sweep"
rows (the ORACLE compare runs at sf0.01 via check_correctness.py —
DuckDB oracles are intractable at sf0.1 for the pair/jaccard family).

Usage: python scripts/sweep_queries.py [sf_dir] [--cpus N]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False)
    import __ray_entry__ as e

    qs = e.queries()
    results: dict[str, dict] = {}
    failures = 0
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            r = fn(args.sf_dir)
            if hasattr(r, "to_pandas"):
                r = r.to_pandas()
            n = len(r)
            results[name] = {"s": round(time.perf_counter() - t0, 2),
                             "rows": int(n)}
            print(f"ok   {name}: {n} rows  {results[name]['s']}s",
                  flush=True)
        except Exception as ex:  # noqa: BLE001
            failures += 1
            results[name] = {"s": round(time.perf_counter() - t0, 2),
                             "error": f"{type(ex).__name__}: {ex}"[:300]}
            print(f"FAIL {name}: {results[name]['error']}", flush=True)
    total = sum(v["s"] for v in results.values())
    print(json.dumps({
        "sf_dir": args.sf_dir, "entries": len(results),
        "failures": failures, "total_s": round(total, 1),
        "slowest": sorted(((v["s"], k) for k, v in results.items()),
                          reverse=True)[:8],
    }), flush=True)
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
