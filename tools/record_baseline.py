#!/usr/bin/env python
"""Record the self-measured performance baseline (BASELINE.md §3).

Times EVERY key in the registry at $SPARK_GRAFT_SF_DIR (default sf0.1):
MINIMUM of WARM_RUNS warm runs after one cold run (min because the
host carries constant external load — see bench.py), plus the result
row count, written to bench/BASELINE_results.json as
{key: {sec, rows, sf, spark_conf_hash}}. Round N+1 bench runs compare
against this file (acceptance: within 2x, driver contract).

  python tools/record_baseline.py [--out FILE] [key ...]  # default: all keys

--out redirects the record (merge semantics unchanged) — used for the
sf1 scale measurements so they never clobber the sf0.1 gate baseline:

  SPARK_GRAFT_SF_DIR=$PWD/.scaledata/sf1 \\
    python tools/record_baseline.py --out bench/SF1_acid.json tf_merge_cow ...
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_RUNS = 5
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench", "BASELINE_results.json")


def main() -> int:
    from lakehouse_automation_spark.engine import get_spark
    from lakehouse_automation_spark.operators.cache import release_persisted
    from lakehouse_automation_spark.queries import REGISTRY

    global OUT
    args = sys.argv[1:]
    if "--out" in args:
        i = args.index("--out")
        if i + 1 >= len(args):
            print("usage: record_baseline.py [--out FILE] [key ...]",
                  file=sys.stderr)
            return 2
        OUT = os.path.abspath(args[i + 1])
        args = args[:i] + args[i + 2:]
    sys.argv = [sys.argv[0]] + args

    spark = get_spark("baseline")
    conf_hash = hashlib.md5(json.dumps(
        sorted((k, v) for k, v in spark.sparkContext.getConf().getAll()
               if k.startswith("spark.sql") or k in (
                   "spark.master", "spark.driver.memory")),
    ).encode()).hexdigest()[:12]
    sf_s = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf = float(sf_s) if sf_s.replace(".", "").isdigit() else sf_s

    keys = sys.argv[1:] or list(REGISTRY)
    results: dict[str, dict] = {}
    for key in keys:
        fn = REGISTRY[key].fn
        try:
            rows = fn(spark, SF_DIR).count()  # cold: plan + JIT + caches
            release_persisted()
            times = []
            for _ in range(WARM_RUNS):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                times.append(time.perf_counter() - t0)
                # cold-equivalent minima, matching bench.py since r17
                # (judge ask #2): every timed run pays the full build
                release_persisted()
            results[key] = {
                "sec": round(min(times), 4),
                "rows": rows,
                "sf": sf,
                "spark_conf_hash": conf_hash,
            }
            print(f"{key:28s} {results[key]['sec']:8.3f}s rows={rows}",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            results[key] = {"sec": None, "rows": None, "sf": sf,
                            "spark_conf_hash": conf_hash,
                            "err": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"{key:28s} ERROR {e}", file=sys.stderr)
        release_persisted()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    if sys.argv[1:] and os.path.exists(OUT):
        # explicit-key run: merge into the existing baseline
        with open(OUT) as f:
            merged = json.load(f)
        merged.update(results)
        results = merged
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    total = sum(r["sec"] for r in results.values() if r.get("sec"))
    print(json.dumps({"keys": len(results), "total_sec": round(total, 2),
                      "sf": sf, "out": OUT}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
