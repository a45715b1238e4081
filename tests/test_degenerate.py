"""Empty-input regression gate: one representative key per failure
class found by the round-8 degenerate sweep (tools/degenerate_check.py,
record bench/DEGENERATE_r08.json — 8/243 keys crashed on 0-row
tables). The full 243-key sweep stays a tool-tier check (~10 min);
this pytest file pins the three FIX CLASSES fast so a regression to
any of them fails the suite, not the next sweep:

  1. empty partitioned write read back under the writer's explicit
     schema (no UNABLE_TO_INFER_SCHEMA on a data-file-less dir tree),
     plus the driver-side min(partition_col)-is-None guard
     -> sink_partitioned, vec_ivf_index_refresh
  2. driver-side asserts check the hand-off CONTRACT, not row counts
     -> sql_to_pandas
  3. NULL aggregate over zero rows preserved, not int(None)-crashed
     -> tf_bloom_index
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    from tools.degenerate_check import build_empty_replica

    from tests.conftest import SF_SMOKE

    d = tmp_path_factory.mktemp("emptysf")
    # source pinned explicitly: the schema-equality test below compares
    # against SF_SMOKE, so the replica must not ride ambient env vars
    build_empty_replica(SF_SMOKE, str(d))
    return str(d)


@pytest.mark.parametrize("key,want_rows", [
    # class 1: empty partitioned write read-back + None-min guard
    ("sink_partitioned", 0),
    ("vec_ivf_index_refresh", 0),
    # class 2: contract asserts (columns/timing), not len(pdf) > 0
    ("sql_to_pandas", 0),
    # class 3: SUM over zero rows is NULL — carried, not int()-crashed
    ("tf_bloom_index", 1),
])
def test_key_runs_on_empty_tables(spark, empty_sf_dir, key, want_rows):
    from lakehouse_automation_spark import queries as Q
    from lakehouse_automation_spark.operators.cache import release_persisted

    try:
        df = Q.REGISTRY[key].fn(spark, empty_sf_dir)
        assert df.count() == want_rows
    finally:
        release_persisted()


def test_empty_replica_preserves_schema(spark, empty_sf_dir):
    """The replica builder's contract: 0 rows, byte-identical logical
    types (ns timestamps included) — otherwise the sweep exercises a
    different schema than production would hand an empty partition."""
    import pyarrow.parquet as pq

    from tests.conftest import SF_SMOKE

    for t in ("events", "lineitem", "embeddings"):
        src = pq.read_schema(f"{SF_SMOKE}/{t}.parquet")
        dst = pq.read_schema(f"{empty_sf_dir}/{t}.parquet")
        assert src.equals(dst), t
        assert pq.read_table(f"{empty_sf_dir}/{t}.parquet").num_rows == 0
