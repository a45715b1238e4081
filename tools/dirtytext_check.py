#!/usr/bin/env python
"""Dirty-documents sweep: the full oracle gate on adversarial TEXT.

The synthetic ``documents.text`` is uniformly mid-sized, space-
tokenized ASCII — nothing like a web crawl, which is where a
training-data pipeline actually runs. This sweep rebuilds the
documents table with ~5% of rows mutated through the text shapes a
real corpus is guaranteed to contain, then reruns the complete
Spark-vs-DuckDB gate (every registry key) with BOTH engines reading
the same dirty replica — so every mismatch is a genuine engine
divergence (Java regex vs RE2, ICU casing, NUL handling) or a text
assumption in our code, never an oracle bookkeeping artifact.

Mutation classes (deterministic by doc_id, no RNG):

  0 empty string            5 RTL scripts (Arabic/Hebrew)
  1 whitespace-only         6 ~100 KB document
  2 combining diacritics    7 regex metacharacters as content
  3 CJK with no spaces      8 one token repeated thousands of times
  4 emoji + ZWJ sequences   9 NUL byte + C0 control characters
                           10 Unicode casing zoo (İ/ı, ς/Σ, ß, Ǆ, fullwidth)

Class 10 exists because the round-8 sweep proved Java and utf8proc
lower() disagree (Turkish dotted İ, Greek final sigma): any operator
that case-folds must do it over an explicit ASCII charset or it is
not oracle-replayable.

  python tools/dirtytext_check.py [--json-out FILE] [key ...]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.oracle_check import TABLES  # noqa: E402 — one table list, four tools

SRC_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

MUTATION_EVERY = 20  # 5% of rows, cycling through the classes

DIRTY: tuple[str, ...] = (
    "",
    " \t\n\r      ",
    "café naïve façade résumé " * 4,
    "春眠不覚晓处处闻啼鸟"
    "夜来风雨声花落知多少" * 6,
    "\U0001f469‍\U0001f469‍\U0001f467‍\U0001f466 "
    "rocket \U0001f680 fire \U0001f525 flag \U0001f1f0\U0001f1f7 " * 8,
    "مرحبا بالعا"
    "لم שלום עולם " * 8,
    ("the quick brown fox jumps over the lazy dog while the engine "
     "keeps reading rows from a page that never seems to end ") * 900,
    "a+b* (c|d) [e-f] {2,3} \\d \\\\ $end ^start dot. any? " * 20,
    "spam " * 5000,
    "before\x00after \x01\x02\x03 control \x7f chars",
    "İstanbul ıssız ΣΟΦΟΣ ΟΔΟΣ STRASSE ß Ǆungle ǅungle "
    "ＦＵＬＬＷＩＤＴＨ ﬃ CAFÉ Résumé MIXED Case " * 6,
)


def _mutate_column(src: str, dst: str, table: str, column: str,
                   shapes: tuple[str, ...],
                   counts: dict[str, int]) -> None:
    tbl = pq.read_table(os.path.join(src, f"{table}.parquet"))
    vals = tbl.column(column).to_pylist()
    for i in range(0, len(vals), MUTATION_EVERY):
        cls = (i // MUTATION_EVERY) % len(shapes)
        vals[i] = shapes[cls]
        label = f"{table}_class_{cls}"
        counts[label] = counts.get(label, 0) + 1
    new = tbl.set_column(tbl.schema.get_field_index(column), column,
                         pa.array(vals, type=pa.string()))
    pq.write_table(new, os.path.join(dst, f"{table}.parquet"))


def build_dirty_replica(src: str, dst: str) -> dict[str, int]:
    """Copy every table; rebuild ``documents.text`` AND
    ``customer.c_name`` (round 9 — short-string functions like
    substring/strpos/levenshtein run over names, and the byte-vs-
    codepoint levenshtein divergence lived exactly there) with every
    MUTATION_EVERY-th row's value replaced by the next dirty class in
    row order. Returns {table_class: count} for the log."""
    for t in TABLES:
        if t not in ("documents", "customer"):
            shutil.copyfile(os.path.join(src, f"{t}.parquet"),
                            os.path.join(dst, f"{t}.parquet"))
    counts: dict[str, int] = {}
    _mutate_column(src, dst, "documents", "text", DIRTY, counts)
    # names are short fields: same shapes, capped at 48 code points
    # (the 100 KB / mass-repetition classes are document phenomena)
    _mutate_column(src, dst, "customer", "c_name",
                   tuple(s[:48] for s in DIRTY), counts)
    return counts


PASS = ("OK", "ROWS_ONLY")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json-out")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory(prefix="dirtysf-") as dst:
        counts = build_dirty_replica(SRC_SF_DIR, dst)
        print(f"dirty replica: {sum(counts.values())} mutated rows "
              f"across {len(counts)} classes")
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            rec_path = tf.name
        cmd = [sys.executable, os.path.join(REPO, "tools", "oracle_check.py"),
               "--json", rec_path] + args.keys
        rc = subprocess.call(cmd, env=dict(os.environ, SPARK_GRAFT_SF_DIR=dst),
                             cwd=REPO)
        if not os.path.exists(rec_path):
            print(f"oracle_check wrote no record (exit {rc}); "
                  "see its output above", file=sys.stderr)
            return rc or 1
        with open(rec_path) as fh:
            record = json.load(fh)
        os.unlink(rec_path)

    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(record, fh, indent=1, sort_keys=True)
    fails = [k for k, v in record.items() if v["status"] not in PASS]
    print(f"dirty-text sweep: {len(record)} keys, {len(fails)} failures"
          + (f": {fails}" if fails else ""))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
