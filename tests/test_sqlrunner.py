"""SQLRunner (reference lib/commondb.py parity) unit tests."""

from __future__ import annotations

import pytest

from lakehouse_automation_spark.engine.sqlrunner import SQLRunner, split_statements


def test_split_statements_quote_aware():
    script = "SELECT 'a;b' AS x; CREATE VIEW v AS SELECT 1;\n SELECT \";\" "
    assert split_statements(script) == [
        "SELECT 'a;b' AS x", "CREATE VIEW v AS SELECT 1", 'SELECT ";"',
    ]


def test_sql_to_pandas_timed(spark):
    pdf, secs = SQLRunner(spark).sql_to_pandas("SELECT 1 AS one")
    assert pdf["one"].tolist() == [1]
    assert secs >= 0.0  # rounded-to-0.1 convention (commondb.py:89)


def test_multi_returns_last(spark):
    df = SQLRunner(spark).multi(
        "CREATE OR REPLACE TEMPORARY VIEW t_m AS SELECT 2 AS v; SELECT v * 3 AS out FROM t_m;"
    )
    assert df.collect()[0]["out"] == 6


def test_call_proc_concat_output(spark):
    out, df, secs = SQLRunner(spark).call_proc("event_type_summary", "/root/testdata/sf0.001")
    lines = out.split("\n")
    assert len(lines) == df.count() and secs >= 0
    assert all("," in line for line in lines)  # "type,count" rows


def test_call_proc_limit_guard(spark):
    """call_proc concatenates proc output into one driver-side string,
    so it carries the same materialization cap as sql_to_pandas — a
    misuse on an unbounded proc cannot OOM the driver."""
    out, df, secs = SQLRunner(spark).call_proc(
        "event_type_summary", "/root/testdata/sf0.001", limit=2
    )
    assert len(out.split("\n")) == 2      # capped
    assert df.count() > 2                 # ...but the DataFrame is not


def test_retry_exec_gives_up(spark):
    with pytest.raises(RuntimeError, match="after 2 attempts"):
        SQLRunner(spark).execute_with_retry(
            "SELECT * FROM table_that_does_not_exist_xyz", retries=2, backoff_s=0.0
        )
