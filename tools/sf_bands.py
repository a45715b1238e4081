#!/usr/bin/env python
"""Per-key scaling bands over the headline set (VERDICT r12 ask #5):
each bench.py HEADLINE key timed at sf0.1 → sf1 → sf10 in ONE
process, min of N warm runs per (key, sf), with the sf1→sf10 ratio
judged against the ~12x linear-plus-overhead waterline. A key whose
cost curve bends super-linear between 10x and 100x is exactly the
key that dies first on a 1000-executor 100 TB run — this record
exists so every such bend carries a named cause or a fix.

  python tools/sf_bands.py [--runs N] [--runs10 N] [--json FILE] [key ...]

Layout: per key, all sf tiers back-to-back (same JIT/page-cache
state), tiers ascending so the big corpus never evicts the small
one's measurement. Ratios are min-vs-min.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TIERS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(REPO, ".scaledata", "sf1")),
    ("sf10", os.path.join(REPO, ".scaledata", "sf10")),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3,
                    help="warm runs at sf0.1/sf1")
    ap.add_argument("--runs10", type=int, default=2,
                    help="warm runs at sf10")
    ap.add_argument("--json")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    from bench import HEADLINE

    from lakehouse_automation_spark.engine import get_spark
    from lakehouse_automation_spark.operators.cache import release_persisted
    from lakehouse_automation_spark.queries import REGISTRY

    for name, d in TIERS:
        if not os.path.isdir(d):
            sys.stderr.write(f"missing corpus {name} at {d} — run "
                             f"tools/regen_scaledata.sh\n")
            return 2

    spark = get_spark("sf-bands")
    keys = args.keys or HEADLINE

    def once(key: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[key].fn(spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        dt = time.perf_counter() - t0
        release_persisted(spark)
        return dt

    out: dict[str, dict] = {}
    for key in keys:
        row: dict[str, float] = {}
        for name, d in TIERS:
            n = args.runs10 if name == "sf10" else args.runs
            once(key, d)  # cold: plan build + JIT
            row[name] = round(min(once(key, d) for _ in range(n)), 3)
        row["r_01_to_1"] = round(row["sf1"] / row["sf0.1"], 2)
        row["r_1_to_10"] = round(row["sf10"] / row["sf1"], 2)
        out[key] = row
        flag = "  <-- >12x" if row["r_1_to_10"] > 12 else ""
        print(f"{key:28s} {row['sf0.1']:8.3f} {row['sf1']:8.3f} "
              f"{row['sf10']:9.3f}  x{row['r_01_to_1']:5.2f} "
              f"x{row['r_1_to_10']:5.2f}{flag}", flush=True)
    try:
        out["_loadavg"] = os.getloadavg()
    except OSError:
        pass
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
