"""Degenerate-group regression tests for the round-5 extension
operators: under the session's default ANSI mode, singleton /
zero-variance groups must yield NULL-and-filtered results (the
oracle's NaN behavior), never a DIVIDE_BY_ZERO crash."""

from __future__ import annotations

import datetime
import os

from bqfetch_spark.catalog import TABLES
from bqfetch_spark.registry import all_queries

REG = all_queries()
SRC = "/root/testdata/sf0.001"


def _fixture_dir(tmp_path, overrides):
    d = tmp_path / "sf"
    d.mkdir()
    for t in TABLES:
        if t not in overrides:
            os.symlink(f"{SRC}/{t}.parquet", d / f"{t}.parquet")
    return str(d)


def test_qx106_singleton_and_flat_groups_do_not_crash(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"events"})
    ts = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, ts, 1, "solo", 5.0, "{}"),  # n=1 -> var divisor is 0
            (2, ts, 1, "flat", 7.0, "{}"),  # zero variance -> sqrt(var)=0
            (3, ts, 2, "flat", 7.0, "{}"),
        ],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    ev.coalesce(1).write.parquet(f"{sf}/events.parquet")
    out = REG["qx106_zscore_outliers"].fn(spark, sf).collect()
    assert out == []  # no outliers, and — critically — no ANSI crash


def test_qx110_degenerate_year_yields_null_corr(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"orders", "lineitem"})
    od = datetime.datetime(1992, 1, 1)
    orders = spark.createDataFrame(
        [(1, 10, "O", 100.0, od, "1-URGENT")],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    orders.coalesce(1).write.parquet(f"{sf}/orders.parquet")
    li = spark.createDataFrame(
        [(1, 1, 1.0, 50.0, 0.0, 0.0, od, "N", "O", "AIR")],
        "l_orderkey bigint, l_linenumber bigint, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_shipdate timestamp, l_returnflag string, l_linestatus string, "
        "l_shipmode string",
    )
    li.coalesce(1).write.parquet(f"{sf}/lineitem.parquet")
    rows = REG["qx110_correlation"].fn(spark, sf).collect()
    assert len(rows) == 1
    assert rows[0]["n_orders"] == 1
    assert rows[0]["price_items_corr"] is None  # NULL, not a crash


def test_q43_empty_text_yields_null_quality_not_crash(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"documents"})
    docs = spark.createDataFrame(
        [(1, "", "en", "web", 0), (2, "a fine text", "en", "web", 11)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    docs.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    rows = {r["doc_id"]: r for r in REG["q43_quality_score"].fn(spark, sf).collect()}
    assert len(rows) == 2  # empty doc present, not crashed away
    assert rows[1]["quality_score"] is None  # NULL like the oracle's NaN
    assert rows[2]["quality_score"] is not None
