"""BigQuery source binding (reference parity: the Storage-API scan,
bqfetch/bqfetch.py:457-502).

In production the spark-bigquery-connector replaces the Parquet scan
one-for-one: `spark.read.format("bigquery")` uses the same Storage
Read API (Arrow wire format), pushes filters via row restrictions the
same way the reference's `row_restriction` did (:483-484), and maps
read streams to Spark tasks (the reference pinned
max_stream_count=1 per process, :496-500 — the connector instead opens
one stream per task).

This container has no connector jar and no GCP credentials
(SURVEY.md §7 non-goals), so the binding is gated: constructing the
reader raises a clear error unless the connector is on the classpath.
Everything downstream (Fetcher, operators) is source-agnostic — they
take DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CONNECTOR_CLASS = "com.google.cloud.spark.bigquery.BigQueryRelationProvider"


def connector_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(CONNECTOR_CLASS)
        return True
    except Exception:
        return False


def read_bigquery_table(
    spark: SparkSession,
    project: str,
    dataset: str,
    table: str,
    columns: list[str] | None = None,
    row_restriction: str | None = None,
) -> DataFrame:
    """BigQueryTable(project, dataset, table) → DataFrame (reference:
    bqfetch/bqfetch.py:20-41 name triple; :267-372 fetch). Filters and
    projections applied to the returned DataFrame are pushed into the
    Storage API read session by the connector.

    ``row_restriction`` is the reference's explicit chunk predicate
    (bqfetch/bqfetch.py:483-484: ``row_restriction`` on the Storage
    read session). The connector's documented spelling is the
    ``filter`` reader option — a SQL boolean over the table's columns —
    which it forwards to the read session verbatim, so chunked fetches
    read only their slice server-side exactly as the reference did."""
    if not connector_available(spark):
        raise RuntimeError(
            "spark-bigquery-connector not on the classpath; add "
            "--packages com.google.cloud.spark:spark-bigquery-with-dependencies. "
            "In this environment use the Parquet fixtures instead (Catalog)."
        )
    reader = spark.read.format("bigquery").option("table", f"{project}.{dataset}.{table}")
    if row_restriction:
        reader = reader.option("filter", row_restriction)
    df = reader.load()
    return df.select(*columns) if columns else df
