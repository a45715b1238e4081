"""Property tests (SURVEY §5.4): the two compositions with real edge
cases — as-of join (ties, empties, all-late) and near-dup clustering
(random graphs vs a reference union-find). Few examples, tiny data:
each example runs real Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

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


@settings(max_examples=8, deadline=None)
@given(
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("append"),
                      st.lists(st.integers(0, 30), min_size=1, max_size=4)),
            st.tuples(st.just("merge"),
                      st.lists(st.integers(0, 30), min_size=1, max_size=4)),
            st.tuples(st.just("delete_le"), st.integers(0, 30)),
            st.tuples(st.just("compact"), st.just(None)),
        ),
        min_size=1, max_size=5,
    )
)
def test_cowtable_matches_dict_model(ops, tmp_path_factory):
    """Model-based check of the ACID table: a random op sequence
    (append / keyed merge / predicate delete / compact) must leave the
    table equal to a plain dict model applying the same semantics —
    append keeps duplicate keys, merge collapses every copy of a key
    to the update, delete drops by predicate, compact changes layout
    only. Every intermediate version must also replay exactly (time
    travel over the whole history)."""
    from pyspark.sql import functions as F

    from lakehouse_automation_spark.tableformat import CowTable

    spark = _spark()
    root = tmp_path_factory.mktemp("cow")
    t = CowTable.create(
        spark,
        spark.createDataFrame([(k, 0) for k in range(5)], "k long, gen long"),
        str(root / "t"), stats_cols=["k"])
    # model: list of (k, gen) rows — append allows duplicate keys
    model = [(k, 0) for k in range(5)]
    snapshots = [sorted(model)]

    gen = 0
    for op, arg in ops:
        gen += 1
        if op == "append":
            rows = [(k, gen) for k in arg]
            t.append(spark.createDataFrame(rows, "k long, gen long"))
            model = model + rows
        elif op == "merge":
            rows = [(k, gen) for k in sorted(set(arg))]
            t.merge(spark.createDataFrame(rows, "k long, gen long"), "k")
            keys = {k for k, _ in rows}
            model = [r for r in model if r[0] not in keys] + rows
        elif op == "delete_le":
            t.delete_where(F.col("k") <= arg)
            model = [r for r in model if not r[0] <= arg]
        else:
            t.compact(n_files=2)  # layout-only: model unchanged
        snapshots.append(sorted(model))

    from collections import Counter

    for v, want in enumerate(snapshots):
        got = sorted((r["k"], r["gen"])
                     for r in t.read(version=v).collect())
        assert got == want, f"version {v}: {got} != {want}"
        # two-level stats pruning must NEVER lose rows: scan == model
        # filter, at every version, for a range in the data and a
        # range straddling its edge
        for lo, hi in ((5, 20), (25, 40)):
            sgot = sorted((r["k"], r["gen"])
                          for r in t.scan("k", lo, hi, version=v).collect())
            assert sgot == sorted(r for r in want if lo <= r[0] <= hi), \
                f"scan v{v} [{lo},{hi}]"
        # the CDC feed between consecutive versions must replay the
        # model delta: prev - deletes + inserts == current (multisets)
        if v > 0:
            ch = t.changes(v - 1, v).collect()
            ins = Counter((r["k"], r["gen"]) for r in ch
                          if r["_change_type"] == "insert")
            dels = Counter((r["k"], r["gen"]) for r in ch
                           if r["_change_type"] == "delete")
            replay = Counter(snapshots[v - 1]) - dels + ins
            assert replay == Counter(want), f"changes v{v - 1}->v{v}"


# ----------------------------------------------------------- z-order curve

@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(-500, 500)),
        min_size=4, max_size=60),
    n_files=st.integers(2, 6),
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_zorder_compact_preserves_multiset_and_never_loses_rows(
        spark, tmp_path_factory, rows, n_files):
    """compact(zorder_by=...) is a pure re-layout: the row multiset is
    identical before/after, and stats-pruned scans on either z-ordered
    column return exactly the filter's rows."""
    from lakehouse_automation_spark.tableformat import CowTable

    root = tmp_path_factory.mktemp("zprop")
    df = spark.createDataFrame(rows, "a long, b long")
    tbl = CowTable.create(spark, df, str(root / "t"),
                          stats_cols=["a", "b"])
    tbl.compact(n_files=n_files, zorder_by=["a", "b"])
    got = sorted(map(tuple, tbl.read().collect()))
    assert got == sorted(rows)
    # pruning must never lose rows, for any probe range on either dim
    a_vals = sorted({a for a, _ in rows})
    lo, hi = a_vals[0], a_vals[len(a_vals) // 2]
    want = sorted((a, b) for a, b in rows if lo <= a <= hi)
    assert sorted(map(tuple, tbl.scan("a", lo, hi).collect())) == want
    b_vals = sorted({b for _, b in rows})
    blo, bhi = b_vals[len(b_vals) // 3], b_vals[-1]
    wantb = sorted((a, b) for a, b in rows if blo <= b <= bhi)
    assert sorted(map(tuple, tbl.scan("b", blo, bhi).collect())) == wantb


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2),        # user
                  st.integers(0, 2880),     # minute offset over 2 days
                  st.integers(0, 99)),      # value
        min_size=1, max_size=25,
    )
)
def test_sessionize_incremental_equals_full_random(events):
    """Random event sets: the incremental refresh (persisted state +
    final-day batch) must equal the full recompute byte-for-byte —
    including empty pre-state, multi-session batches, ties on ts, and
    chains of boundary merges the hand fixture can't enumerate."""
    import datetime as dt
    import shutil
    import tempfile

    import pandas as pd

    from lakehouse_automation_spark.queries import REGISTRY

    base = dt.datetime(2024, 3, 1)
    rows = [dict(event_id=i, ts=base + dt.timedelta(minutes=m),
                 user_id=u, event_type="view", value=float(v),
                 props="{}")
            for i, (u, m, v) in enumerate(events)]
    d = tempfile.mkdtemp(prefix="las_prop_sess_")
    try:
        pd.DataFrame(rows).to_parquet(f"{d}/events.parquet", index=False)
        spark = _spark()
        full = {tuple(r) for r in
                REGISTRY["sessionize_events"].fn(spark, d).collect()}
        inc = {tuple(r) for r in
               REGISTRY["sessionize_incremental"].fn(spark, d).collect()}
        assert inc == full
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(keys=st.lists(st.integers(-50, 50), min_size=1, max_size=30))
def test_bloom_point_scan_never_false_negative(keys):
    """For ANY key set split across two chunks, the Bloom-pruned point
    scan must return exactly the plain filter's rows for present keys
    (no false negative, ever) and zero rows for absent keys (FPs may
    keep files; the residual filter settles them)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from lakehouse_automation_spark.tableformat import CowTable

    spark = _spark()
    half = len(keys) // 2
    d = tempfile.mkdtemp(prefix="las_prop_bloom_")
    try:
        df1 = spark.createDataFrame([(k,) for k in keys[:half]] or [(None,)],
                                    "k long").filter(F.col("k").isNotNull())
        df2 = spark.createDataFrame([(k,) for k in keys[half:]], "k long")
        tbl = CowTable.create(spark, df1, f"{d}/t", bloom_cols=["k"])
        tbl.append(df2)
        for probe in set(keys[:3]) | {777}:   # present + absent probes
            want = keys.count(probe)
            assert tbl.point_scan("k", probe).count() == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    events=st.lists(
        st.tuples(st.sampled_from([0, 5, 10]),   # users the key selects
                  st.integers(0, 500),           # minute offset
                  st.integers(0, 9999)),         # integer cents
        min_size=1, max_size=30,
    )
)
def test_ewma_equals_python_fir_random(events):
    """Random cent streams incl. ts ties: the truncated-FIR EWMA must
    equal the Python replay BIT-FOR-BIT (the arithmetic is exact by
    construction — any deviation means an op-order or warm-up bug)."""
    import datetime as dt
    import shutil
    import tempfile

    import pandas as pd

    from lakehouse_automation_spark.queries import REGISTRY

    base = dt.datetime(2024, 3, 1)
    rows = [dict(event_id=i, ts=base + dt.timedelta(minutes=m),
                 user_id=u, event_type="view", value=c / 100.0,
                 props="{}")
            for i, (u, m, c) in enumerate(events)]
    d = tempfile.mkdtemp(prefix="las_prop_ewma_")
    try:
        pd.DataFrame(rows).to_parquet(f"{d}/events.parquet", index=False)
        spark = _spark()
        got = {(r.user_id, r.event_id): r.ewma
               for r in REGISTRY["ts_ewma"].fn(spark, d).collect()}
        hist: dict = {}
        for r in sorted(rows, key=lambda r: (r["ts"], r["event_id"])):
            import math
            cents = int(math.floor(abs(r["value"] * 100) + 0.5))
            hist.setdefault(r["user_id"], []).append((r["event_id"], cents))
        assert len(got) == len(rows)
        for u, seq in hist.items():
            for i, (eid, _) in enumerate(seq):
                taps = [c for _, c in reversed(seq[max(0, i - 15):i + 1])]
                wsum = sum(float(c) * 0.5 ** k for k, c in enumerate(taps))
                nsum = sum(0.5 ** k for k in range(len(taps)))
                assert got[(u, eid)] == (wsum / nsum) / 100.0, (u, eid)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["O", "F", "P"]),
                  st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM"])),
        min_size=1, max_size=40,
    )
)
def test_agg_mode_tiebreak_random(rows):
    """Random status/priority tables with FORCED ties (3x3 domain):
    the mode must be the highest-count priority per status with ties
    broken by smallest value — exactly the Python argmin over
    (-count, value)."""
    import datetime as dt
    import shutil
    import tempfile

    import pandas as pd

    from lakehouse_automation_spark.queries import REGISTRY

    pdf = pd.DataFrame({
        "o_orderkey": pd.array(range(len(rows)), dtype="int64"),
        "o_custkey": pd.array([1] * len(rows), dtype="int64"),
        "o_orderstatus": [s for s, _ in rows],
        "o_totalprice": [10.0] * len(rows),
        "o_orderdate": [dt.datetime(2024, 1, 1)] * len(rows),
        "o_orderpriority": [p for _, p in rows],
    })
    d = tempfile.mkdtemp(prefix="las_prop_mode_")
    try:
        pdf.to_parquet(f"{d}/orders.parquet", index=False)
        spark = _spark()
        got = {(r.o_orderstatus): (r.mode_priority, r.mode_n)
               for r in REGISTRY["agg_mode"].fn(spark, d).collect()}
        counts: dict = {}
        for s, p in rows:
            counts.setdefault(s, {}).setdefault(p, 0)
            counts[s][p] += 1
        want = {s: min(((-(n), p) for p, n in ps.items()))
                for s, ps in counts.items()}
        want = {s: (p, -negn) for s, (negn, p) in want.items()}
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bloom_fp_rate_within_2x_theoretical():
    """FP-rate law for the per-file Bloom index (review r7), across
    the three sizing regimes — the 8192-bit floor, a mid pow2ceil,
    and a large chunk: the measured false-positive rate of the
    WRITTEN filters must stay within 2x the textbook
    (1 - e^(-kn/m))^k bound (double hashing costs a constant factor
    < 2 per Kirsch-Mitzenmacher), alongside the existing
    no-false-negative law above. Deterministic: keys, probes, and
    xxhash64 are all fixed, so the measured count never flakes."""
    import base64
    import math
    import shutil
    import struct
    import tempfile

    from pyspark.sql import functions as F

    from lakehouse_automation_spark.tableformat import BLOOM_KEY, CowTable

    spark = _spark()
    d = tempfile.mkdtemp(prefix="las_prop_bloomfp_")
    try:
        # even keys only; one file per chunk; sizes straddle the m
        # floor (400 rows -> 8192 bits) and two pow2ceil points
        sizes = [(0, 400), (1, 3000), (2, 8000)]
        chunks = []
        for tag, n_rows in sizes:
            base = tag * 1_000_000
            chunks.append(
                spark.range(n_rows)
                .select((F.lit(base) + F.col("id") * 2).alias("k"))
                .coalesce(1))
        tbl = CowTable.create(spark, chunks[0], f"{d}/t", bloom_cols=["k"])
        for c in chunks[1:]:
            tbl.append(c)

        # batch-compute probe positions with ONE job per m (the read
        # path's exact formula: mod-before-combine double hashing)
        man = tbl.manifest()
        specs = []   # (m, k, words, n_rows)
        for chunk, fstats in man["file_stats"].items():
            for fname, entry in fstats.items():
                m, k, dtype, packed = entry[BLOOM_KEY]["k"]
                assert dtype == "bigint"
                words = struct.unpack(
                    f"<{m // 64}q", base64.b64decode(packed))
                specs.append((m, k, words, entry["__rows__"]))
        assert len(specs) == 3
        assert sorted(s[0] for s in specs) == [8192, 32768, 131072]

        n_probes = 4000
        probes = (spark.range(n_probes)
                  .select((F.col("id") * 2 + 1).alias("k")))  # absent
        for m, k, words, n_rows in specs:
            hs = probes.select(
                F.pmod(F.xxhash64(F.col("k").cast("long")),
                       F.lit(m)).alias("h1"),
                F.pmod(F.xxhash64(F.col("k").cast("long"), F.lit(1)),
                       F.lit(m)).alias("h2")).collect()
            fp = 0
            for r in hs:
                if all(words[p // 64] & (1 << (p % 64))
                       for p in ((r.h1 + i * r.h2) % m
                                 for i in range(k))):
                    fp += 1
            theo = (1.0 - math.exp(-k * n_rows / m)) ** k
            bound = max(2.0 * theo * n_probes, 3.0)  # Poisson floor
            assert fp <= bound, (m, n_rows, fp, theo * n_probes)

        # tie the batch math to the real probe path: an absent odd key
        # admitted by NO filter must prune every file
        assert tbl.bloom_pruned_files("k", 10**9 + 1) == []
        # and a present key keeps exactly its own file
        assert len(tbl.bloom_pruned_files("k", 1_000_000 + 2)) >= 1
        assert tbl.point_scan("k", 1_000_000 + 2).count() == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["A", "B"]),
                  st.integers(1, 5000)),        # cents
        min_size=1, max_size=60,
    )
)
def test_exact_deciles_equal_sorted_rank_random(rows):
    """Random cent multisets incl. heavy ties: the histogram-rank
    predicate 10*cum >= d*total must pick EXACTLY the sorted-rank
    ceil(d*n/10) element for every decile and group."""
    import shutil
    import tempfile

    import pandas as pd

    from lakehouse_automation_spark.queries import REGISTRY

    d = tempfile.mkdtemp(prefix="las_prop_dec_")
    try:
        pd.DataFrame(
            [dict(l_returnflag=f, l_extendedprice=c / 100.0)
             for f, c in rows]
        ).to_parquet(f"{d}/lineitem.parquet", index=False)
        got = {r.l_returnflag: r for r in
               REGISTRY["agg_exact_deciles"].fn(_spark(), d).collect()}
        by_flag: dict = {}
        for f, c in rows:
            by_flag.setdefault(f, []).append(c)
        assert set(got) == set(by_flag)
        for f, xs in by_flag.items():
            xs.sort()
            n = len(xs)
            assert got[f].n_rows == n
            for dd in range(1, 10):
                k = -(-dd * n // 10)
                assert getattr(got[f], f"p{dd}0") == xs[k - 1] / 100, \
                    (f, dd, xs)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    orders=st.lists(
        st.tuples(st.integers(0, 40),      # start day offset
                  st.integers(0, 15),      # duration (ship - order)
                  st.sampled_from(["1-URGENT", "3-MEDIUM"])),
        min_size=1, max_size=25,
    )
)
def test_intervals_overlap_equals_bruteforce_random(orders):
    """Random interval sets incl. single-day and fully-nested spans:
    the sweep-line peak must equal the brute-force per-day maximum,
    with the first-peak-day tie-break."""
    import datetime as dt
    import shutil
    import tempfile

    import pandas as pd

    from lakehouse_automation_spark.queries import REGISTRY

    base = dt.date(2024, 1, 1)
    o_rows, l_rows = [], []
    for i, (s, dur, pri) in enumerate(orders):
        o_rows.append(dict(o_orderkey=i, o_custkey=1, o_orderstatus="O",
                           o_totalprice=1.0,
                           o_orderdate=base + dt.timedelta(days=s),
                           o_orderpriority=pri))
        l_rows.append(dict(l_orderkey=i, l_partkey=1, l_suppkey=1,
                           l_linenumber=1, l_quantity=1.0,
                           l_extendedprice=1.0, l_discount=0.0,
                           l_tax=0.0, l_returnflag="N",
                           l_linestatus="O",
                           l_shipdate=base + dt.timedelta(days=s + dur)))
    d = tempfile.mkdtemp(prefix="las_prop_iv_")
    try:
        pd.DataFrame(o_rows).to_parquet(f"{d}/orders.parquet",
                                        index=False)
        pd.DataFrame(l_rows).to_parquet(f"{d}/lineitem.parquet",
                                        index=False)
        got = {r.priority: (r.peak_open, r.peak_day, r.n_orders)
               for r in REGISTRY["win_intervals_overlap"]
               .fn(_spark(), d).collect()}
        day0 = (base - dt.date(1970, 1, 1)).days
        by_pri: dict = {}
        for s, dur, pri in orders:
            by_pri.setdefault(pri, []).append((day0 + s,
                                               day0 + s + dur))
        assert set(got) == set(by_pri)
        for pri, ivs in by_pri.items():
            lo = min(s for s, _ in ivs)
            hi = max(e for _, e in ivs)
            best, best_day = None, None
            for day in range(lo, hi + 1):
                open_now = sum(1 for s, e in ivs if s <= day <= e)
                if best is None or open_now > best:
                    best, best_day = open_now, day
            assert got[pri] == (best, best_day, len(ivs)), pri
    finally:
        shutil.rmtree(d, ignore_errors=True)
