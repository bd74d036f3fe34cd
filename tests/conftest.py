from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bqfetch_spark.catalog import TABLES
from bqfetch_spark.session import get_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_session("bqfetch-spark-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_CORRECT}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(v):
    """Canonicalize a cell for order-insensitive comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # collapse -0.0 and representation noise already rounded upstream
        return f"{v:.6f}"
    return str(v)


def rows_canon(cols, rows):
    """Sort columns by name, then rows by canonical form (mirrors the
    driver's order-insensitive value-hash compare)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_canon(r[i]) for i in order))
    return sorted(out), [cols[i] for i in order]


def compare_to_oracle(spark_df, duck_con, sql, check_schema=True):
    """Assert Spark result == DuckDB oracle result (count, column names,
    canonicalized multiset of rows)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = [tuple(r) for r in rel.fetchall()]
    assert sorted(s_cols) == sorted(d_cols), f"columns differ: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"row counts differ: {len(s_rows)} vs {len(d_rows)}"
    s_canon, _ = rows_canon(s_cols, s_rows)
    d_canon, _ = rows_canon(d_cols, d_rows)
    if s_canon != d_canon:
        diffs = [(a, b) for a, b in zip(s_canon, d_canon) if a != b][:5]
        raise AssertionError(f"value mismatch; first diffs: {diffs}")
