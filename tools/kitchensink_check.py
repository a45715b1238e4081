#!/usr/bin/env python
"""Kitchen-sink robustness sweep: ALL THREE standing adversarial
replicas COMPOSED into one corpus, then the full Spark-vs-DuckDB
oracle gate over it.

The standing sweeps each prove one failure class in isolation —
~3% NULL injection (tools/null_check.py), IEEE edge values in double
columns (tools/extremes_check.py), adversarial text shapes
(tools/dirtytext_check.py), extreme datetimes
(tools/timeedge_check.py). Real ingest feeds carry all of them AT
ONCE, and interaction bugs are invisible to the single-axis gates: a
domain guard that NULL-folds an Inf sitting next to an injected NULL,
a tokenizer meeting a NUL byte in a row whose money column is -0.0, a
window whose tie-break column went NULL while its value column went
NaN, a year-0001 o_orderdate on a row whose o_totalprice is +Inf.
This sweep builds null -> extremes -> dirty-text -> time-edge in
sequence (each stage rewrites the previous stage's output; every
injector is deterministic by (table, column), so the composition is
one fixed corpus) and reruns the complete gate with both engines
reading it. The time-edge layer (VERDICT r11 ask #5) covers BOTH
standing surfaces at once: events.ts and the relational
l_shipdate/o_orderdate pair.

Scope: the extremes gate's scope (whole registry minus
``GATED_EXCLUDE`` — tf_constraints correctly REJECTS a corpus whose
money columns carry -Inf and whose status column carries NULLs; both
single-axis sweeps exclude it for the same reason).

  python tools/kitchensink_check.py [--json FILE] [key ...]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.dirtytext_check import build_dirty_replica  # noqa: E402
from tools.extremes_check import (  # noqa: E402
    build_extremes_replica,
    gated_keys,
)
from tools.null_check import build_null_replica  # noqa: E402
from tools.timeedge_check import (  # noqa: E402
    SURFACES,
    build_timeedge_replica,
)

SRC_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def build_kitchensink_replica(src: str, dst: str) -> dict[str, int]:
    """null -> extremes -> dirty text -> time-edge, composed; returns
    the per-stage injected-cell counts merged (stage-prefixed keys)."""
    merged: dict[str, int] = {}
    edge_targets = tuple(t for s in SURFACES.values() for t in s)
    with tempfile.TemporaryDirectory(prefix="ks_stage_") as mid1, \
            tempfile.TemporaryDirectory(prefix="ks_stage_") as mid2, \
            tempfile.TemporaryDirectory(prefix="ks_stage_") as mid3:
        for k, v in build_null_replica(src, mid1).items():
            merged[f"null/{k}"] = v
        for k, v in build_extremes_replica(mid1, mid2).items():
            merged[f"extreme/{k}"] = v
        for k, v in build_dirty_replica(mid2, mid3).items():
            merged[f"dirty/{k}"] = v
        merged["timeedge/" + ",".join(
            f"{t}.{c}" for t, c in edge_targets)] = \
            build_timeedge_replica(mid3, dst, edge_targets)
    return merged


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", dest="json_out")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()
    keys = args.keys or gated_keys()

    with tempfile.TemporaryDirectory(prefix="kitchensink-") as dst:
        injected = build_kitchensink_replica(SRC_SF_DIR, dst)
        print(f"kitchen-sink replica: {sum(injected.values())} mutated "
              f"cells across {len(injected)} (stage, column) pairs")
        cmd = [sys.executable, os.path.join(REPO, "tools", "oracle_check.py")]
        if args.json_out:
            cmd += ["--json", args.json_out]
        cmd += keys
        return subprocess.call(
            cmd, env=dict(os.environ, SPARK_GRAFT_SF_DIR=dst), cwd=REPO)


if __name__ == "__main__":
    sys.exit(main())
