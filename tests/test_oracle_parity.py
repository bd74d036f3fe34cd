"""Every oracle-bearing registry query must match DuckDB at sf0.01 —
this mirrors the driver's CORRECTNESS gate exactly, so a green run here
predicts a green CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from bqfetch_spark.registry import all_queries
from tests.conftest import SF_CORRECT, compare_to_oracle

QUERIES = all_queries()
ORACLE_NAMES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_CORRECT)
    compare_to_oracle(df, duck, q.oracle)


def test_q25_scalable_spelling_parity(spark, duck, monkeypatch):
    """The large-input ntile spelling (range exchange + offsets) must
    stay value-identical to the oracle even though the sf0.01 default
    now picks the single-window path: force the crossover to 0 and
    re-check full parity."""
    import bqfetch_spark.plans.ranks as ranks

    monkeypatch.setattr(ranks, "SINGLE_SORT_BYTES", -1)
    q = QUERIES["q25_ntile_quartiles"]
    compare_to_oracle(q.fn(spark, SF_CORRECT), duck, q.oracle)


def test_uncast_hugeint_oracle_fails(spark, duck):
    """The comparator must be as dtype-strict as the driver's hash: a
    DuckDB windowed sum(BIGINT) comes back HUGEINT → pandas float64,
    which must NOT compare equal to Spark's int64 even when every value
    is numerically identical (the round-4 q100 failure class). An
    intentionally un-CAST oracle therefore has to FAIL this gate."""
    sdf = spark.createDataFrame([(1, 1), (2, 3), (3, 6)], "id bigint, cum bigint")
    uncast_sql = (
        "SELECT CAST(id AS BIGINT) AS id, sum(id) OVER (ORDER BY id) AS cum "
        "FROM (VALUES (1), (2), (3)) t(id)"
    )
    with pytest.raises(AssertionError, match="value mismatch"):
        compare_to_oracle(sdf, duck, uncast_sql)
    cast_sql = (
        "SELECT CAST(id AS BIGINT) AS id, "
        "CAST(sum(id) OVER (ORDER BY id) AS BIGINT) AS cum "
        "FROM (VALUES (1), (2), (3)) t(id)"
    )
    compare_to_oracle(sdf, duck, cast_sql)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_CORRECT)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
