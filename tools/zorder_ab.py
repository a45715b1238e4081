#!/usr/bin/env python
"""Interleaved A/B of CowTable.compact's two z-order layouts
(VERDICT r12 ask #6): "persist" (r12 — approxQuantile pass + persist +
range-partition sampling pass + cached sort) vs "sampled" (r13 — one
driver-side sample supplies rank cuts AND file boundaries; one
full-width scan, no persist). Same table build as the tf_zorder key
(sf orders, 16 files, z on (o_custkey, o_orderdate)); each round runs
both arms back-to-back in ONE process, and the verdict is min-vs-min
(the §4 discipline — never judge from single passes on this host).

  python tools/zorder_ab.py [--rounds N] [--sf-dir DIR] [--json FILE]

Also asserts the layouts are interchangeable: both must prune BOTH
z dimensions on every round.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--json")
    args = ap.parse_args()

    from lakehouse_automation_spark.engine import get_spark
    from lakehouse_automation_spark.queries.base import t
    from lakehouse_automation_spark.tableformat import CowTable

    spark = get_spark("zorder-ab")
    orders = t(spark, args.sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")

    def once(layout: str) -> float:
        root = tempfile.mkdtemp(prefix="zab_")
        try:
            tbl = CowTable.create(spark, orders, f"{root}/orders",
                                  stats_cols=["o_custkey", "o_orderdate"])
            t0 = time.perf_counter()
            tbl.compact(n_files=16,
                        zorder_by=["o_custkey", "o_orderdate"],
                        zorder_layout=layout)
            sec = time.perf_counter() - t0
            man = tbl.manifest()
            total = sum(len(v) for v in man["file_stats"].values())
            f_cust = len(tbl.pruned_files("o_custkey", 100, 199))
            f_date = len(tbl.pruned_files(
                "o_orderdate", dt.datetime(1997, 1, 1),
                dt.datetime(1997, 12, 31, 23, 59, 59, 999999)))
            assert f_cust < total and f_date < total, (
                f"{layout}: pruning broken cust={f_cust} date={f_date} "
                f"total={total}")
            return sec, f_cust, f_date, total
        finally:
            shutil.rmtree(root, ignore_errors=True)

    arms = ["persist", "sampled"]
    out = {a: {"runs": [], "pruned": []} for a in arms}
    for a in arms:  # cold pass
        once(a)
    for _ in range(args.rounds):
        for a in arms:
            sec, f_cust, f_date, total = once(a)
            out[a]["runs"].append(round(sec, 3))
            out[a]["pruned"].append([f_cust, f_date, total])
    for a in arms:
        out[a]["min"] = min(out[a]["runs"])
    out["_sf_dir"] = args.sf_dir
    out["_speedup_min"] = round(out["persist"]["min"]
                                / out["sampled"]["min"], 3)
    try:
        out["_loadavg"] = os.getloadavg()
    except OSError:
        pass
    sys.stdout.write(json.dumps(out, indent=1) + "\n")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
