"""Curation operators: decontamination, mixture sampling, packing
(operators/curation.py) — semantics beyond the registry oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_automation_spark.operators.curation import (
    decontaminate_hits,
    mixture_sample_counts,
    pack_sequences,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # eval doc 0 and training doc 10 share a verbatim 6-word run
        (0, "the quick brown fox jumps over the lazy dog today", "src0"),
        (10, "prefix words the quick brown fox jumps over suffix", "src0"),
        # training doc 11 shares nothing 5 words long with doc 0
        (11, "completely different text with no overlap at all here", "src1"),
        (20, "another eval document entirely its own words", "src1"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_decontaminate_flags_only_real_overlap(docs):
    hits = {r.doc_id: r.n_shared for r in decontaminate_hits(
        docs, eval_pred=F.col("doc_id").isin(0, 20), k=5).collect()}
    # doc 10 shares the 5-gram windows inside the verbatim run; doc 11
    # shares none; eval docs themselves are never flagged
    assert set(hits) == {10}
    assert hits[10] >= 2  # "the quick brown fox jumps", "quick brown fox jumps over"


def test_decontaminate_empty_eval_set(docs):
    assert decontaminate_hits(
        docs, eval_pred=F.lit(False), k=5).count() == 0


def test_mixture_sample_deterministic_and_bounded(spark):
    docs = spark.createDataFrame(
        [(i, "w " * 5, f"src{i % 4}") for i in range(400)],
        "doc_id long, text string, source string")
    rate = (F.regexp_extract("source", r"src(\d+)", 1).cast("int") + 1) * 25
    a = {r.source: (r.n_total, r.n_kept)
         for r in mixture_sample_counts(docs, rate).collect()}
    b = {r.source: (r.n_total, r.n_kept)
         for r in mixture_sample_counts(docs, rate).collect()}
    assert a == b, "hash sampling must be run-deterministic"
    for src, (total, kept) in a.items():
        assert total == 100
        assert 0 <= kept <= total
    # rates order the expected keeps: src3 (100%) keeps everything
    assert a["src3"][1] == 100
    assert a["src0"][1] < a["src3"][1]


def test_pack_sequences_spans_and_budget(spark):
    # one bucket, budget 10: docs of 4/4/4 tokens -> the third doc
    # straddles the 10-token boundary (tokens 8..11)
    docs = spark.createDataFrame(
        [(i, "t " * 4, "s") for i in range(3)],
        "doc_id long, text string, source string")
    out = {r.doc_id: r for r in
           pack_sequences(docs, budget=10, n_buckets=1).collect()}
    # "t t t t " splits to 5 tokens (trailing empty) — recompute from
    # the operator's own n_tokens to keep the test about SPANS
    n = out[0].n_tokens
    cum = {i: n * (i + 1) for i in range(3)}
    for i in range(3):
        assert out[i].seq_start == (cum[i] - n) // 10
        assert out[i].seq_end == (cum[i] - 1) // 10
    # monotone, gapless coverage of the token stream
    assert out[0].seq_start == 0
    assert all(out[i].seq_end <= out[i + 1].seq_start
               or out[i].seq_end == out[i + 1].seq_start
               for i in range(2))


from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(
    lens=st.lists(st.integers(min_value=1, max_value=40),
                  min_size=1, max_size=25),
    budget=st.integers(min_value=2, max_value=64),
)
def test_pack_sequences_span_invariants(spark, lens, budget):
    """For ANY token-count sequence: spans are contiguous (next doc
    starts in the same or next sequence as this doc ends), monotone,
    start at 0, and the last doc ends in sequence ceil(total/budget)-1
    — i.e. the chunking covers the concatenated token stream exactly,
    no gaps, no overlap beyond boundary straddles."""
    docs = spark.createDataFrame(
        [(i, "w " * n, "s") for i, n in enumerate(lens)],
        "doc_id long, text string, source string")
    rows = sorted(pack_sequences(docs, budget=budget, n_buckets=1).collect(),
                  key=lambda r: r.doc_id)
    # the operator derives n_tokens from split(); recompute total from
    # its own output so the property is about spans, not tokenization
    total = sum(r.n_tokens for r in rows)
    assert rows[0].seq_start == 0
    assert rows[-1].seq_end == (total - 1) // budget
    for prev, cur in zip(rows, rows[1:]):
        assert prev.seq_start <= prev.seq_end
        assert prev.seq_end <= cur.seq_start <= prev.seq_end + 1


def test_pack_sequences_buckets_partition_independently(spark):
    docs = spark.createDataFrame(
        [(i, "w " * 7, "s") for i in range(40)],
        "doc_id long, text string, source string")
    out = pack_sequences(docs, budget=16, n_buckets=4)
    # bucket = doc_id % 4; each bucket's cumsum starts at zero
    firsts = (out.filter(F.col("doc_id") < 4)
              .select("doc_id", "seq_start").collect())
    assert all(r.seq_start == 0 for r in firsts)
    assert out.count() == 40
