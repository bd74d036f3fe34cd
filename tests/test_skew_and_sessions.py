"""Salted-join equivalence and stateful streaming sessionization."""

from __future__ import annotations

from pyspark.sql import functions as F

from bqfetch_spark.catalog import load_catalog
from bqfetch_spark.plans.skew import salted_join
from tests.conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    cat = load_catalog(spark, SF_SMOKE)
    orders = cat.table("orders").select(F.col("o_custkey").alias("c_custkey"), "o_totalprice")
    cust = cat.table("customer").select("c_custkey", "c_name")
    plain = orders.join(cust, "c_custkey").groupBy("c_custkey").count()
    salted = salted_join(orders, cust, "c_custkey", salt_buckets=8).groupBy("c_custkey").count()
    p = {(r.c_custkey, r["count"]) for r in plain.collect()}
    s = {(r.c_custkey, r["count"]) for r in salted.collect()}
    assert p == s


def test_salted_join_rejects_bad_buckets(spark):
    import pytest

    cat = load_catalog(spark, SF_SMOKE)
    with pytest.raises(ValueError):
        salted_join(cat.table("orders"), cat.table("customer"), "c_custkey", salt_buckets=0)


def test_streaming_sessionization_matches_batch(spark):
    """Bounded stream through applyInPandasWithState must close the
    same sessions batch sessionization finds (modulo the final open
    session per user, which only a timeout would flush)."""
    from bqfetch_spark.streaming.sessions import sessionize_stream
    from bqfetch_spark.streaming.windows import run_to_memory, streaming_events

    ev = streaming_events(spark, SF_SMOKE)
    result = (
        sessionize_stream(ev)
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    result.awaitTermination()
    streamed = spark.table("sessions_test").collect()

    # batch truth: q31 semantics
    from bqfetch_spark.registry import all_queries

    batch_rows = all_queries()["q31_sessionization"].fn(spark, SF_SMOKE).collect()
    batch_sessions = {
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in batch_rows
    }
    # every streamed (closed) session must be a batch session
    for r in streamed:
        assert (
            r.user_id,
            r.session_start,
            r.session_end,
            r.n_events,
        ) in batch_sessions, r
    # with the whole table in one bounded run, all but the last session
    # per user close → most sessions stream out
    n_users = len({r.user_id for r in batch_rows})
    assert len(streamed) >= len(batch_sessions) - n_users - 5
    assert len(streamed) > 0
