"""Fetch-parity facade: chunk-partition invariants inherited from the
reference's implicit contract (divide_in_chunks, bqfetch/utils.py:18-28
+ pd.concat merge, bqfetch/bqfetch.py:358): chunks are disjoint, cover
the domain, and union(chunks) == whole table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bqfetch_spark.fetcher import Fetcher, TableRef
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def fetcher(spark):
    return Fetcher(spark)


@pytest.mark.parametrize("n_chunks", [1, 3, 4, 7])
def test_chunks_partition_customer(spark, fetcher, n_chunks):
    ref = TableRef(SF_SMOKE, "customer")
    chunks = fetcher.chunks(ref, "c_custkey", by_nb_chunks=n_chunks)
    assert len(chunks) == n_chunks
    total = 0
    seen = set()
    for c in chunks:
        keys = {r.c_custkey for r in fetcher.fetch(ref, c).select("c_custkey").collect()}
        assert not (keys & seen), "chunks overlap"
        seen |= keys
        total += len(keys)
    assert total == fetcher.table(ref).count()
    # contiguous, ordered ranges
    for a, b in zip(chunks, chunks[1:]):
        assert a.upper < b.lower


def test_chunks_on_low_cardinality_column(spark, fetcher):
    """Reference 'bad chunk key' shape (FIXTURES.md): low-cardinality
    string column must still partition correctly, not crash."""
    ref = TableRef(SF_SMOKE, "customer")
    chunks = fetcher.chunks(ref, "c_mktsegment", by_nb_chunks=3)
    counts = [fetcher.fetch(ref, c).count() for c in chunks]
    assert sum(counts) == fetcher.table(ref).count()


def test_chunks_more_than_values_degrades(spark, fetcher):
    ref = TableRef(SF_SMOKE, "customer")
    chunks = fetcher.chunks(ref, "c_mktsegment", by_nb_chunks=99)
    assert len(chunks) == 5  # 5 distinct segments
    assert sum(fetcher.fetch(ref, c).count() for c in chunks) == 150


@pytest.mark.parametrize("by_values", [False, True])
def test_chunks_cover_null_domain_values(spark, fetcher, tmp_path, by_values):
    """A nullable chunk column must still satisfy union(chunks) ==
    table: BETWEEN and IN both reject NULL and collect_list drops it,
    so the planner flags whichever bucket the NULL value sorted into
    and that chunk's predicate gains an IS NULL disjunct (round-4
    advice: NULL rows were silently lost from every chunk)."""
    import os

    from bqfetch_spark.catalog import TABLES

    # the catalog loads every fixture table for a directory: symlink the
    # untouched ones, rewrite only customer with NULLs injected
    for t in TABLES:
        if t != "customer":
            os.symlink(f"{SF_SMOKE}/{t}.parquet", str(tmp_path / f"{t}.parquet"))
    base = fetcher.table(TableRef(SF_SMOKE, "customer"))
    nulled = base.withColumn(
        "c_nationkey",
        F.when(F.col("c_custkey") % 10 == 0, F.lit(None)).otherwise(F.col("c_nationkey")),
    )
    nulled.write.parquet(str(tmp_path / "customer.parquet"))
    ref = TableRef(str(tmp_path), "customer")
    tbl = fetcher.table(ref)
    n_rows = tbl.count()
    n_null_rows = tbl.filter(F.col("c_nationkey").isNull()).count()
    assert n_null_rows > 0  # fixture sanity

    chunks = fetcher.chunks(ref, "c_nationkey", by_nb_chunks=4, by_values=by_values)
    assert sum(c.includes_null for c in chunks) == 1
    counts = [fetcher.fetch(ref, c).count() for c in chunks]
    assert sum(counts) == n_rows  # NULL rows fetched exactly once
    null_chunk = next(c for c in chunks if c.includes_null)
    got_nulls = (
        fetcher.fetch(ref, null_chunk).filter(F.col("c_nationkey").isNull()).count()
    )
    assert got_nulls == n_null_rows


def test_full_table_fetch_none_chunk(spark, fetcher):
    ref = TableRef(SF_SMOKE, "nation")
    assert fetcher.fetch(ref, None).count() == 25


def test_fetch_to_pandas_and_arrow(spark, fetcher):
    ref = TableRef(SF_SMOKE, "region")
    pdf = fetcher.fetch_to_pandas(ref, None)
    assert pdf.shape[0] == 5
    batches = list(fetcher.iter_batches(ref, None))
    assert sum(b.num_rows for b in batches) == 5


def test_iter_batches_arrow_native(spark, fetcher):
    """The spout is Arrow end-to-end (round-3 fix): batches arrive
    Arrow-typed, sliced to batch_rows, and value-identical (incl.
    timestamp instants) to a single toArrow materialization — no
    per-row Python dict hop that shifted naive datetimes on non-UTC
    drivers."""
    import pyarrow as pa

    ref = TableRef(SF_SMOKE, "events")
    batches = list(fetcher.iter_batches(ref, None, batch_rows=100))
    expected = fetcher.fetch(ref, None).toArrow()
    assert all(isinstance(b, pa.RecordBatch) for b in batches)
    assert all(b.num_rows <= 100 for b in batches)
    assert sum(b.num_rows for b in batches) == expected.num_rows
    got = pa.Table.from_batches(batches).sort_by("event_id")
    assert got.equals(expected.sort_by("event_id").cast(got.schema))


def test_invalid_args(spark, fetcher):
    ref = TableRef(SF_SMOKE, "customer")
    with pytest.raises(ValueError):
        fetcher.chunks(ref, "c_custkey", by_nb_chunks=0)


def test_chunks_by_size_mode(spark, fetcher, duck):
    """by_chunk_size_in_GB parity (reference get_nb_chunks_approximation,
    bqfetch/bqfetch.py:374-454): chunk count = ceil(estimated
    materialized GB / budget) with the 10KB target binding, and the
    planned boundaries equal the exact ntile bucketing of the distinct
    domain (dynamic oracle). Size source is the num_bytes analog
    (fixed widths + string byte lengths) since round 11."""
    from bqfetch_spark.plans.advisor import (
        estimated_materialized_bytes,
        suggest_chunks_by_size,
    )
    from tests.conftest import SF_CORRECT

    ref = TableRef(SF_CORRECT, "customer")
    chunks = fetcher.chunks(ref, "c_custkey", by_chunk_size_in_GB=1e-5)
    expected_n = suggest_chunks_by_size(
        estimated_materialized_bytes(fetcher.table(ref)), 1e-5, 1
    )
    assert len(chunks) == expected_n
    oracle = duck.sql(
        f"""
        SELECT b, min(k) AS lo, max(k) AS hi, count(*) AS n
        FROM (SELECT k, ntile({expected_n}) OVER (ORDER BY k) AS b
              FROM (SELECT DISTINCT c_custkey AS k FROM customer))
        GROUP BY b ORDER BY b
        """
    ).fetchall()
    got = [(c.index + 1, c.lower, c.upper, c.n_values) for c in chunks]
    assert got == [tuple(r) for r in oracle]


def test_chunks_by_size_memory_budget_binds():
    """When chunk_GB x cores exceeds available RAM, the RAM budget
    (minus reserve) caps the wave size — the reference's formula."""
    from bqfetch_spark.plans.advisor import GB, suggest_chunks_by_size

    # 100 GB table, 8 GB chunks x 4 cores = 32 GB wave, but only 9 GB
    # free (8 after reserve) -> ceil(100/8) = 13
    assert suggest_chunks_by_size(100 * GB, 8.0, 4, available_bytes=9 * GB) == 13
    # plentiful RAM: the chunk-size term binds -> ceil(100/32) = 4
    assert suggest_chunks_by_size(100 * GB, 8.0, 4, available_bytes=512 * GB) == 4


def test_chunks_sizing_args_are_exclusive(spark, fetcher):
    ref = TableRef(SF_SMOKE, "customer")
    with pytest.raises(ValueError):
        fetcher.chunks(ref, "c_custkey")
    with pytest.raises(ValueError):
        fetcher.chunks(ref, "c_custkey", by_nb_chunks=2, by_chunk_size_in_GB=1.0)
    with pytest.raises(ValueError):
        fetcher.chunks(ref, "c_custkey", by_chunk_size_in_GB=-1.0)


def test_value_list_chunks_partition(spark, fetcher):
    """Reference-parity categorical chunks (FetchingChunk(elements,
    column), bqfetch/bqfetch.py:43-50): explicit value lists, disjoint,
    covering the domain, and consistent with the range-mode bucketing."""
    ref = TableRef(SF_SMOKE, "customer")
    chunks = fetcher.chunks(ref, "c_mktsegment", by_nb_chunks=3, by_values=True)
    assert len(chunks) == 3
    all_vals: list = []
    for c in chunks:
        assert c.elements is not None
        assert sorted(c.elements) == list(c.elements)
        assert c.lower == c.elements[0] and c.upper == c.elements[-1]
        assert c.n_values == len(c.elements)
        all_vals.extend(c.elements)
    domain = {r[0] for r in fetcher.table(ref).select("c_mktsegment").distinct().collect()}
    assert sorted(all_vals) == sorted(domain)  # disjoint cover
    assert sum(fetcher.fetch(ref, c).count() for c in chunks) == 150
    # same bucket membership as range mode on the same domain
    ranged = fetcher.chunks(ref, "c_mktsegment", by_nb_chunks=3)
    for rv, rc in zip(chunks, ranged):
        assert (rv.lower, rv.upper, rv.n_values) == (rc.lower, rc.upper, rc.n_values)


def test_value_list_chunks_typed_predicates(spark, fetcher):
    """The reference stringifies chunk values into SQL (bqfetch/
    bqfetch.py:171 — breaking non-string columns); our isin predicate
    keeps literal types: int, string, and date chunk columns all fetch
    the exact member rows."""
    import datetime

    for table, column, pytype in [
        ("customer", "c_custkey", int),
        ("customer", "c_mktsegment", str),
        ("orders", "o_orderdate", datetime.date),
    ]:
        ref = TableRef(SF_SMOKE, table)
        chunk = fetcher.chunks(ref, column, by_nb_chunks=4, by_values=True)[0]
        assert all(isinstance(e, pytype) for e in chunk.elements)
        got = fetcher.fetch(ref, chunk)
        member = {r[0] for r in got.select(column).distinct().collect()}
        assert member == set(chunk.elements)
        expected = (
            fetcher.table(ref).filter(F.col(column).isin(*chunk.elements)).count()
        )
        assert got.count() == expected


def test_value_list_chunks_domain_cap(spark, fetcher):
    """Value-list planning holds the whole domain on the driver, so it
    refuses high-cardinality columns (bounded probe, no full count)."""
    ref = TableRef(SF_SMOKE, "customer")
    with pytest.raises(ValueError, match="distinct"):
        fetcher.chunks(ref, "c_custkey", by_nb_chunks=4, by_values=True, max_values=10)


def test_skew_warning_at_plan_time(spark, fetcher):
    """Reference parity (bqfetch/bqfetch.py:410-419): planning warns
    when >25% of chunk-key values are >25% off the mean count."""
    # documents.lang is genuinely dispersed in the fixture (en ~2.4x
    # the other languages: 3 of 5 values are >25% off the mean)
    skewed = TableRef(SF_SMOKE, "documents")
    with pytest.warns(UserWarning, match="off the mean"):
        frac = fetcher.check_skew(skewed, "lang")
    assert frac > 0.25
    # a unique key is perfectly even: no warning
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert fetcher.check_skew(TableRef(SF_SMOKE, "customer"), "c_custkey") == 0.0
