#!/usr/bin/env python
"""Generate a scaled-up copy of a testdata directory for scale-proof
benchmarking (the driver ships sf0.001/0.01/0.1 only; SCALE.md's 10x
measurements need an sf1).

    python tools/gen_scale_data.py /root/testdata/sf0.1 .scaledata/sf1 10
    python tools/gen_scale_data.py /root/testdata/sf0.1 .scaledata/sf1skew 10 --skew

Replication strategy — the goal is data whose OPERATOR OUTPUTS scale
linearly with the replica count, so a per-key sf1/sf0.1 time ratio is
interpretable:

- Fact + scaled dims (lineitem/orders/customer/supplier/part,
  events, documents, embeddings): R copies with per-replica key
  offsets, preserving referential integrity (TPC-H dims scale with
  sf). Value distributions are identical per replica, so group-by
  cardinalities on value columns stay constant — exactly TPC-H's
  behavior as sf grows.
- nation/region: fixed 25/5 rows at every sf (TPC-H invariant).
- events: ts shifted +31 days per replica — the time domain grows
  with sf, so windowed-agg group counts scale linearly.
- documents: every word of >=4 chars gets a per-replica suffix.
  Within a replica the shingle/MinHash/SimHash relationships are
  EXACTLY those of the source corpus (same dup structure per
  replica); across replicas content shingles can never match. A
  naive byte-copy instead makes every doc a 10-way exact+near dup
  and near-dup outputs explode ~quadratically — measuring that would
  benchmark the data bug, not the operator. Stopwords (<4 chars:
  'a', 'the') keep their surface form so quality/stopword-ratio
  distributions survive.
- embeddings: per-replica ORTHOGONAL transform (coordinate
  permutation + sign flips, seeded by replica). Orthogonality
  preserves every within-replica pairwise cosine bit-for-bit — the
  near-dup/kNN structure of each replica is the source corpus's —
  while cross-replica similarities become noise.

Deterministic: replica r derives everything from (r, row). Output is
one single-file parquet per table with ~256k-row row groups so Spark
can split scans without a multi-file layout.

--skew: after replication, remap ~20% of rows onto ONE hot key —
lineitem.l_suppkey and events.user_id both collapse to the smallest
key of the referenced dimension wherever the row's primary key is
=0 mod 5. The uniform replication above cannot produce a genuinely
hot key (each replica repeats the source distribution), so the
salted-join / AQE-skew / window-skew claims need this variant: one
reducer owns 20% of the fact table unless the operator spreads it.
Referential integrity is preserved (the hot key exists in replica 0's
dimension); do NOT point oracle correctness runs at a skew dir — it
exists for timing and reducer-spread measurement only.
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROW_GROUP = 256_000
_WORD = re.compile(r"[A-Za-z]{4,}")

# key columns to offset, per table: {col: source_key_domain_size}
# (domain = max+1 of the source; offsets are r * domain)
OFFSETS = {
    "customer": {"c_custkey": None},
    "supplier": {"s_suppkey": None},
    "part": {"p_partkey": None},
    "orders": {"o_orderkey": None, "o_custkey": ("customer", "c_custkey")},
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    # user_id offsets by the CUSTOMER key domain, not its own: events
    # reference customers (stream_static_join / enrichment keys join
    # user_id = c_custkey), and offsetting by the smaller events
    # domain would point replica-r events at replica-0 customers —
    # or, past 10 replicas, at no customer at all
    "events": {"event_id": None, "user_id": ("customer", "c_custkey")},
    "documents": {"doc_id": None},
    "embeddings": {"vec_id": None},
}
FIXED = ["region", "nation"]
DAY_US = 86_400_000_000


def _domain(tbl: pa.Table, col: str) -> int:
    return int(pa.compute.max(tbl[col]).as_py()) + 1


def _suffix_words(text: str, r: int) -> str:
    return _WORD.sub(lambda m: f"{m.group(0)}q{r}", text)


def _replicate(name: str, tbl: pa.Table, r: int,
               domains: dict[str, int]) -> pa.Table:
    """One replica with keys offset into replica-r's id space."""
    if r == 0:
        out = tbl
    else:
        cols = {}
        for c in tbl.column_names:
            arr = tbl[c]
            spec = OFFSETS.get(name, {})
            if c in spec:
                dom = domains[c if spec[c] is None else spec[c][1]]
                arr = pa.compute.add(arr, r * dom)
            cols[c] = arr
        out = pa.table(cols)

    if name == "events" and r:
        unit = out.schema.field("ts").type.unit
        per_day = {"s": 86_400, "ms": 86_400_000, "us": DAY_US,
                   "ns": DAY_US * 1_000}[unit]
        shift = pa.scalar(r * 31 * per_day, pa.duration(unit))
        out = out.set_column(
            out.column_names.index("ts"), "ts",
            pa.compute.add(out["ts"], shift))
    if name == "documents" and r:
        texts = [_suffix_words(t, r) for t in out["text"].to_pylist()]
        out = out.set_column(out.column_names.index("text"), "text",
                             pa.array(texts, pa.string()))
        out = out.set_column(
            out.column_names.index("n_chars"), "n_chars",
            pa.array([len(t) for t in texts], pa.int64()))
    if name == "embeddings" and r:
        mat = np.asarray(out["embedding"].to_pylist(), dtype=np.float32)
        rng = np.random.default_rng(1_000 + r)
        perm = rng.permutation(mat.shape[1])
        signs = rng.choice([-1.0, 1.0], size=mat.shape[1]).astype(np.float32)
        mat = mat[:, perm] * signs[None, :]  # orthogonal: cosines preserved
        emb = pa.array(list(mat), pa.list_(pa.float32()))
        out = out.set_column(out.column_names.index("embedding"),
                             "embedding", emb)
    return out


# --skew: (table, primary key col, remapped col, hot value source)
_SKEW = {
    "lineitem": ("l_orderkey", "l_suppkey", ("supplier", "s_suppkey")),
    "events": ("event_id", "user_id", ("customer", "c_custkey")),
}
_SKEW_MOD = 5  # pk % 5 == 0 -> ~20% of rows on the hot key


def _apply_skew(name: str, tbl: pa.Table, hot: dict[str, int]) -> pa.Table:
    if name not in _SKEW:
        return tbl
    pk, col, (_, dim_col) = _SKEW[name]
    # pyarrow.compute has no mod kernel; numpy round-trip is fine here
    mask = pa.array(
        tbl[pk].to_numpy(zero_copy_only=False) % _SKEW_MOD == 0)
    remapped = pa.compute.if_else(
        mask, pa.scalar(hot[dim_col], tbl.schema.field(col).type), tbl[col])
    return tbl.set_column(tbl.column_names.index(col), col, remapped)


def main() -> None:
    src, dst, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    skew = "--skew" in sys.argv[4:]
    os.makedirs(dst, exist_ok=True)

    hot: dict[str, int] = {}
    if skew:
        for _, (_, _, (dim, dim_col)) in _SKEW.items():
            dt = pq.read_table(os.path.join(src, f"{dim}.parquet"),
                               columns=[dim_col])
            hot[dim_col] = int(pa.compute.min(dt[dim_col]).as_py())

    # key domains come from the SOURCE tables (shared across tables
    # for referential columns, e.g. o_custkey offsets by |customer|)
    domains: dict[str, int] = {}
    for name in ["customer", "supplier", "part", "orders", "events",
                 "documents", "embeddings"]:
        tbl = pq.read_table(os.path.join(src, f"{name}.parquet"))
        for col, spec in OFFSETS.get(name, {}).items():
            if spec is None:
                domains[col] = _domain(tbl, col)

    for name in FIXED + list(OFFSETS):
        tbl = pq.read_table(os.path.join(src, f"{name}.parquet"))
        if name in FIXED:
            parts = [tbl]
        else:
            parts = [_replicate(name, tbl, r, domains) for r in range(reps)]
        out = pa.concat_tables(parts)
        if skew:
            out = _apply_skew(name, out, hot)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"),
                       row_group_size=ROW_GROUP)
        print(f"{name}: {out.num_rows} rows "
              f"({tbl.num_rows} x {len(parts)})", flush=True)


if __name__ == "__main__":
    main()
