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


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_CORRECT)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
