"""Operator-level tests for operators/dedup.py: constructed near-dups,
short-doc edge cases, and cross-engine hash parity (SURVEY §5.4)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lakehouse_automation_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    portable_hash,
    portable_hash_sql,
    shingles_col,
    simhash_df,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat naps "
    "under a warm sun near the old stone wall by the river bend today"
)
NEAR = BASE.replace("lazy", "sleepy")          # 1-token edit: near-dup
FAR = (
    "completely different content about spark query engines and columnar "
    "execution with vectorized operators plus adaptive shuffle planning "
    "for large scale distributed analytical workloads in the lakehouse"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(0, BASE), (1, NEAR), (2, FAR), (3, BASE)]  # 3 = exact dup of 0
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_portable_hash_matches_duckdb(spark):
    vals = ["", "a", "hello world", "ünïcode ok"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r.s: r.h for r in df.select("s", portable_hash(F.col("s")).alias("h")).collect()}
    con = duckdb.connect()
    for v in vals:
        want = con.execute(
            f"SELECT {portable_hash_sql('?')}", [v]).fetchone()[0]
        assert got[v] == want, v


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "one two"), (2, "one")], "doc_id long, text string")
    toked = df.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    out = {
        r.doc_id: r.sh
        for r in toked.select(
            "doc_id", shingles_col(F.col("toks"), 3).alias("sh")).collect()
    }
    assert out[1] == [] and out[2] == []


def test_exact_dedup_groups(spark, docs):
    groups = {r.content_md5: r for r in exact_dedup_groups(docs).collect()}
    assert len(groups) == 3  # 0 & 3 collapse
    dup = [g for g in groups.values() if g.n_docs == 2]
    assert len(dup) == 1 and dup[0].keeper_id == 0


def test_ngram_jaccard_finds_planted_pair(spark, docs):
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in ngram_jaccard_pairs(docs, k=3, threshold=0.2).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.5   # near-dup found
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0  # exact dup
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_minhash_pairs_near_vs_far(spark, docs):
    pairs = {(r.id_a, r.id_b)
             for r in minhash_candidate_pairs(docs, k=3).collect()}
    assert (0, 3) in pairs                  # identical docs always collide
    assert (0, 1) in pairs                  # J~0.9 near-dup collides
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_simhash_near_dup_distance(spark, docs):
    sh = {r.doc_id: r.simhash for r in simhash_df(docs).collect()}
    assert sh[0] == sh[3]
    ham_near = bin(sh[0] ^ sh[1]).count("1")
    ham_far = bin(sh[0] ^ sh[2]).count("1")
    assert ham_near < ham_far
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in simhash_pairs(docs, max_hamming=3).collect()}
    assert pairs[(0, 3)] == 0
    assert (0, 1) in pairs  # 1-token edit stays within hamming 3


def test_minhash_no_false_positives_on_corpus(spark, sf_dir):
    """On the real sf0.001 corpus, LSH candidates must all be genuinely
    similar (verified against exact 3-shingle Jaccard >= 0.2)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cand = set(map(tuple, minhash_candidate_pairs(docs, k=3)
                   .select("id_a", "id_b").collect()))
    truth = set(map(tuple, ngram_jaccard_pairs(docs, k=3, threshold=0.2)
                    .select("id_a", "id_b").collect()))
    assert cand, "corpus should contain planted near-dups"
    assert cand <= truth, f"false positives: {cand - truth}"


def test_chunk_split_covers_all_tokens_with_overlap(spark):
    from lakehouse_automation_spark.queries import REGISTRY
    from lakehouse_automation_spark.queries.text_pipeline import (
        _CHUNK_LEN, _CHUNK_OVERLAP, _CHUNK_STRIDE)

    rows = (REGISTRY["text_chunk_split"].fn(spark, "/root/testdata/sf0.001")
            .collect())
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .collect()}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        n = len(docs[doc_id].split(" "))
        chunks.sort(key=lambda r: r["chunk_idx"])
        # contiguous indices from 0
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        # full coverage: last chunk reaches the final token
        last = chunks[-1]
        assert last["chunk_idx"] * _CHUNK_STRIDE + last["n_tokens"] == n
        # every chunk except a short-doc first one is longer than the
        # overlap (no chunk is pure repetition of its predecessor)
        for c in chunks[1:]:
            assert c["n_tokens"] > _CHUNK_OVERLAP
        for c in chunks[:-1]:
            assert c["n_tokens"] == _CHUNK_LEN


def test_substring_dedup_flags_planted_shared_span(spark, tmp_path):
    """Plant one 60-char span shared verbatim by two docs inside
    otherwise-unrelated text; a third doc shares nothing. The shared
    docs must report n_dup_windows > 0, the loner exactly 0, and
    dup_frac must be the exact ratio of its integer parts."""
    import pandas as pd

    from lakehouse_automation_spark.queries import REGISTRY

    span = "the quick brown fox jumps over the lazy dog again and again"
    assert len(span) == 59  # prefixes are 180 chars, so the span
    # starts at 1-based offset 181 in BOTH docs — exactly on the
    # stride-10 grid, guaranteeing one identical shared window
    docs = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3], dtype="int64"),
        "text": [
            ("alpha " * 30) + span + (" omega" * 30),
            ("beta " * 36) + span + (" gamma" * 24),
            "completely unrelated filler content " * 12,
        ],
        "lang": ["en"] * 3,
        "source": ["src1"] * 3,
    })
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    docs.to_parquet(str(tmp_path / "documents.parquet"), index=False)

    out = {r.doc_id: r for r in REGISTRY["text_substring_dedup"].fn(
        spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_dup_windows > 0 and out[2].n_dup_windows > 0
    assert out[3].n_dup_windows == 0 and out[3].dup_frac == 0.0
    for r in out.values():
        assert 0 <= r.n_dup_windows <= r.n_windows
        assert r.dup_frac == r.n_dup_windows / r.n_windows


def test_graph_components_match_union_find(spark):
    """The registry's relational connected-components key must agree
    with a reference union-find over the same edge set, and roots
    must be component minima."""
    from lakehouse_automation_spark.queries import REGISTRY

    # sf0.01, not sf0.001: with only 10 suppliers over 25 nations the
    # smoke corpus has no same-nation co-supplier pair at all
    sf = "/root/testdata/sf0.01"
    out = {r.node: r for r in
           REGISTRY["graph_components"].fn(spark, sf).collect()}
    assert out, "empty graph"
    # rebuild the edge set the key defines
    li = (spark.read.parquet(f"{sf}/lineitem.parquet")
          .filter(F.col("l_orderkey") % 10 == 0)
          .select("l_orderkey", "l_suppkey"))
    sup = (spark.read.parquet(f"{sf}/supplier.parquet")
           .select("s_suppkey", "s_nationkey"))
    rows = (li.join(sup, li.l_suppkey == sup.s_suppkey)
            .select("l_orderkey", "l_suppkey", "s_nationkey").collect())
    by_order = {}
    for r in rows:
        by_order.setdefault((r.l_orderkey, r.s_nationkey), set()) \
            .add(r.l_suppkey)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for members in by_order.values():
        members = sorted(members)
        if len(members) < 2:
            continue
        nodes.update(members)
        for b in members[1:]:
            ra, rb = find(members[0]), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    assert set(out) == nodes
    want = {}
    for n in nodes:
        want.setdefault(find(n), set()).add(n)
    for root, members in want.items():
        mn = min(members)
        for m in members:
            assert out[m].component_id == mn, (m, root)
            assert out[m].is_root == (1 if m == mn else 0)


def test_graph_pagerank_replays_in_python(spark):
    """The fixed-point PageRank must match an exact pure-python
    integer replay of the same 8 iterations over the same edge set —
    every unit value identical, no tolerance."""
    from lakehouse_automation_spark.queries import REGISTRY
    from lakehouse_automation_spark.queries.graph import (
        _PR_ITERS, _PR_SCALE, _PR_TELEPORT)

    sf = "/root/testdata/sf0.01"
    out = {r.node: r for r in
           REGISTRY["graph_pagerank"].fn(spark, sf).collect()}
    assert out, "empty graph"
    li = (spark.read.parquet(f"{sf}/lineitem.parquet")
          .filter(F.col("l_orderkey") % 10 == 0)
          .select("l_orderkey", "l_suppkey"))
    sup = (spark.read.parquet(f"{sf}/supplier.parquet")
           .select("s_suppkey", "s_nationkey"))
    rows = (li.join(sup, li.l_suppkey == sup.s_suppkey)
            .select("l_orderkey", "l_suppkey", "s_nationkey").collect())
    by_order = {}
    for r in rows:
        by_order.setdefault((r.l_orderkey, r.s_nationkey), set()) \
            .add(r.l_suppkey)
    nbrs = {}
    for members in by_order.values():
        members = sorted(members)
        for i, u in enumerate(members):
            for v in members[i + 1:]:
                nbrs.setdefault(u, set()).add(v)
                nbrs.setdefault(v, set()).add(u)
    assert set(out) == set(nbrs)
    pr = {n: _PR_SCALE for n in nbrs}
    for _ in range(_PR_ITERS):
        recv = {n: 0 for n in nbrs}
        for u, vs in nbrs.items():
            share = pr[u] // len(vs)
            for v in vs:
                recv[v] += share
        pr = {n: _PR_TELEPORT + (85 * recv[n]) // 100 for n in nbrs}
    for n, units in pr.items():
        assert out[n].rank_units == units, n
        assert out[n].rank == units / float(_PR_SCALE)


def test_graph_triangles_replay_in_python(spark):
    """Per-node triangle counts replay exactly from the ordered edge
    set; total = sum/3 and matches the constant column."""
    from lakehouse_automation_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.01"
    out = {r.node: r for r in
           REGISTRY["graph_triangles"].fn(spark, sf).collect()}
    assert out
    li = (spark.read.parquet(f"{sf}/lineitem.parquet")
          .filter(F.col("l_orderkey") % 10 == 0)
          .select("l_orderkey", "l_suppkey"))
    sup = (spark.read.parquet(f"{sf}/supplier.parquet")
           .select("s_suppkey", "s_nationkey"))
    rows = (li.join(sup, li.l_suppkey == sup.s_suppkey)
            .select("l_orderkey", "l_suppkey", "s_nationkey").collect())
    by_order = {}
    for r in rows:
        by_order.setdefault((r.l_orderkey, r.s_nationkey), set()) \
            .add(r.l_suppkey)
    nbrs = {}
    for members in by_order.values():
        members = sorted(members)
        for i, u in enumerate(members):
            for v in members[i + 1:]:
                nbrs.setdefault(u, set()).add(v)
                nbrs.setdefault(v, set()).add(u)
    want = {n: 0 for n in nbrs}
    total = 0
    for a in nbrs:
        for b in nbrs[a]:
            if b <= a:
                continue
            for c in nbrs[a] & nbrs[b]:
                if c > b:
                    total += 1
                    want[a] += 1
                    want[b] += 1
                    want[c] += 1
    assert set(out) == set(want)
    for n, cnt in want.items():
        assert out[n].n_triangles == cnt, n
        assert out[n].total_triangles == total
