"""Fetch-parity facade: chunk-partition invariants inherited from the
reference's implicit contract (divide_in_chunks, bqfetch/utils.py:18-28
+ pd.concat merge, bqfetch/bqfetch.py:358): chunks are disjoint, cover
the domain, and union(chunks) == whole table."""

from __future__ import annotations

import pytest

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


def test_full_table_fetch_none_chunk(spark, fetcher):
    ref = TableRef(SF_SMOKE, "nation")
    assert fetcher.fetch(ref, None).count() == 25


def test_fetch_to_pandas_and_arrow(spark, fetcher):
    ref = TableRef(SF_SMOKE, "region")
    pdf = fetcher.fetch_to_pandas(ref, None)
    assert pdf.shape[0] == 5
    batches = list(fetcher.iter_batches(ref, None))
    assert sum(b.num_rows for b in batches) == 5


def test_invalid_args(spark, fetcher):
    ref = TableRef(SF_SMOKE, "customer")
    with pytest.raises(ValueError):
        fetcher.chunks(ref, "c_custkey", by_nb_chunks=0)
