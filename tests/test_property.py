"""Property tests (SURVEY §5.4): the two compositions with real edge
cases — as-of join (ties, empties, all-late) and near-dup clustering
(random graphs vs a reference union-find). Few examples, tiny data:
each example runs real Spark jobs."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from lakehouse_automation_spark.operators.asof import asof_join
from lakehouse_automation_spark.operators.dedup import neardup_clusters

_SPARK = None


def _spark():
    global _SPARK
    if _SPARK is None:
        from lakehouse_automation_spark.engine import get_spark

        _SPARK = get_spark("pytest-prop", cpus=4)
    return _SPARK


@settings(max_examples=12, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1]),
        min_size=1, max_size=20,
    )
)
def test_neardup_clusters_equal_union_find(edges):
    norm = sorted({(min(a, b), max(a, b)) for a, b in edges})
    # reference: plain union-find over the same edges
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in norm:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    spark = _spark()
    pairs = spark.createDataFrame(norm, "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id for r in neardup_clusters(pairs).collect()}
    assert got == want
    keepers = {r.doc_id for r in neardup_clusters(pairs).collect() if r.is_keeper}
    assert keepers == set(want.values())


@settings(max_examples=12, deadline=None)
@given(
    left=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
                  min_size=0, max_size=12),
    right=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
                   min_size=0, max_size=12),
)
def test_asof_join_matches_reference(left, right):
    """For every left row, the joined value is the MAX right ts <= left
    ts within the same key (None when no candidate) — including
    duplicate timestamps, empty sides, and all-late rights."""
    spark = _spark()
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)],
        "event_id long, user_id long, ts long",
    )
    rdf = spark.createDataFrame(right, "user_id long, ts long")
    out = asof_join(left=ldf, right=rdf, on="user_id",
                    left_ts="ts", right_ts="ts",
                    right_value_as="matched_ts")
    got = {r.event_id: r.matched_ts for r in out.collect()}
    for i, (k, ts) in enumerate(left):
        cands = [rts for rk, rts in right if rk == k and rts <= ts]
        assert got.get(i) == (max(cands) if cands else None), (i, k, ts)


def test_neardup_clusters_deep_chain_converges():
    """A 40-hop path graph — the >max_iters-diameter case plain
    one-hop propagation can NEVER finish in 10 rounds (the round-2
    advisor finding): deferred pointer jumping must converge it to a
    single cluster labeled by the minimum node, not raise and not
    return partial labels."""
    spark = _spark()
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long")
    rows = neardup_clusters(pairs).collect()
    assert len(rows) == 41
    assert all(r.cluster_id == 0 for r in rows)
    assert sum(r.is_keeper for r in rows) == 1
