#!/usr/bin/env python
"""Oracle gate for the LSH banding tiers the sf-dir corpora never
reach (VERDICT r12 ask #2 + ADVICE r12).

Two gaps this closes:

1. **The 16x16 scale tier had no cross-engine gate.** adaptive_banding
   steps to 256 planes (16 bands x 16 bits) above ~32k indexable
   vectors — the configuration the 100 TB path actually runs — but
   until r13 the SQL oracle error()'d there instead of replaying.
   r12 proved that class of gap hides real bugs (the fixed-tier sf1
   divergence sat untriaged for 4 rounds). The oracle now embeds the
   full LSH_PLANES_EXT matrix and re-derives both banding knobs from
   count(*), so this tool builds a >32k-vector corpus and runs the
   standard compare() gate on vec_neardup_lsh + vec_knn_join at the
   scale tier.

2. **Tier boundaries on dirty (NULL-bearing) corpora.** The engine
   tiers on the null-filtered count (operators/vector.py
   lsh_bucket_table), matching the oracle's tier CTE which counts the
   null-filtered `n` CTE. A raw-count tier would diverge exactly when
   raw > boundary >= filtered — this tool builds that corpus (raw
   2100 / filtered 2000, the floor-tier boundary) and gates it.
   (tests/test_vector.py runs the same case in the suite; this tool
   keeps it in the recorded sweep family.)

Corpus construction is deterministic: replicas of the source sf dir's
embeddings table under gen_scale_data's per-replica orthogonal
transform (within-replica cosine structure — and with it the planted
near-dup pairs — is preserved bit-for-bit; cross-replica sims are
noise), plus optional appended NULL-embedding rows (vec_ids above the
replicated domain, so they collide with nothing).

  python tools/lsh_tier_check.py [--json FILE] [--src DIR] [--keep DIR]

Exit status 0 iff every gate is OK.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.gen_scale_data import _replicate  # noqa: E402 — one replication scheme, two tools

DEFAULT_SRC = "/root/testdata/sf0.1"

# (name, replicas, appended NULL rows, keys to gate, verify_shape, why)
# verify_shape None = the key's size-adaptive choice; "blocklocal"
# forces the beyond-broadcast-threshold pipeline onto a corpus small
# enough for DuckDB to replay (the shapes are output-identical by
# contract — this gate PROVES it instead of trusting it).
CASES = [
    ("floor_boundary_null", 1, 100, ["vec_neardup_lsh"], None,
     "raw 2100 / filtered 2000: raw-count tiering would band 8x4 "
     "while the oracle (and the ingest contract) band 4x8"),
    ("scale_16x16", 17, 0, ["vec_neardup_lsh", "vec_knn_join"], None,
     "34000 vectors > the 32000-vector occupancy bound: the 256-plane "
     "16x16 tier, previously unreplayable by the SQL oracle"),
    ("scale_16x16_blocklocal", 17, 0,
     ["vec_neardup_lsh", "vec_knn_join"], "blocklocal",
     "same corpus, verify forced to the block-local (100 TB) shape "
     "the >120k-vector regime runs — oracle proves shape equivalence"),
]

# operator entry points for forced-shape runs (the registry fns use
# the automatic choice)
_SHAPED = {
    "vec_neardup_lsh": lambda emb, shape: __import__(
        "lakehouse_automation_spark.operators.vector",
        fromlist=["lsh_neardup_pairs"]).lsh_neardup_pairs(
            emb, threshold=0.4, verify_shape=shape),
    "vec_knn_join": lambda emb, shape: __import__(
        "lakehouse_automation_spark.operators.vector",
        fromlist=["knn_join_lsh"]).knn_join_lsh(
            emb, k=5, verify_shape=shape),
}


def build_tier_corpus(src: str, dst: str, reps: int,
                      n_nulls: int = 0) -> int:
    """embeddings-only replica: ``reps`` orthogonal copies of
    ``src``/embeddings.parquet plus ``n_nulls`` NULL-embedding rows.
    Returns the raw row count written."""
    tbl = pq.read_table(os.path.join(src, "embeddings.parquet"))
    domains = {"vec_id": int(pa.compute.max(tbl["vec_id"]).as_py()) + 1}
    parts = [_replicate("embeddings", tbl, r, domains)
             for r in range(reps)]
    if n_nulls:
        base = reps * domains["vec_id"]
        parts.append(pa.table({
            "vec_id": pa.array(range(base, base + n_nulls), pa.int64()),
            "embedding": pa.array([None] * n_nulls,
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * n_nulls, pa.int32()),
        }).cast(tbl.schema))
    out = pa.concat_tables(parts)
    os.makedirs(dst, exist_ok=True)
    pq.write_table(out, os.path.join(dst, "embeddings.parquet"),
                   row_group_size=262_144)
    return out.num_rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json")
    ap.add_argument("--src", default=DEFAULT_SRC)
    ap.add_argument("--keep", help="build corpora here and keep them")
    args = ap.parse_args()

    from lakehouse_automation_spark.engine import get_spark
    from lakehouse_automation_spark.operators.cache import release_persisted
    from lakehouse_automation_spark.operators.vector import adaptive_banding
    from lakehouse_automation_spark.queries import REGISTRY
    from tools.oracle_check import compare

    spark = get_spark("lsh_tier_check")
    root = args.keep or tempfile.mkdtemp(prefix="lshtier_")
    record: dict[str, dict] = {}
    failures = 0
    for name, reps, n_nulls, keys, shape, why in CASES:
        d = os.path.join(root, name)
        raw = build_tier_corpus(args.src, d, reps, n_nulls)
        indexable = raw - n_nulls
        bpb, nbands = adaptive_banding(indexable)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"'{d}/embeddings.parquet'")
        entry = {"why": why, "raw_rows": raw, "indexable": indexable,
                 "engine_tier": f"{bpb}x{nbands}",
                 "verify_shape": shape or "auto", "keys": {}}
        for key in keys:
            reg = REGISTRY[key]
            try:
                if shape is None:
                    df = reg.fn(spark, d)
                else:
                    emb = spark.read.parquet(f"{d}/embeddings.parquet")
                    df = _SHAPED[key](emb, shape)
                verdict = compare(key, df, reg.oracle, con)
            except Exception as e:  # noqa: BLE001 — record, keep sweeping
                verdict = f"ERROR {type(e).__name__}: {e}"
            finally:
                release_persisted(spark)
            entry["keys"][key] = verdict
            ok = verdict.startswith("OK")
            failures += 0 if ok else 1
            print(f"{name:24s} {key:20s} tier={bpb}x{nbands} "
                  f"shape={shape or 'auto'} {verdict}", flush=True)
        con.close()
        record[name] = entry

    if args.json:
        with open(args.json, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
    print(f"{sum(len(c[3]) for c in CASES)} gates, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
