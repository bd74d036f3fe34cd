"""Catalog: named Parquet tables registered as temp views.

Reference parity: `BigQueryTable` (bqfetch/bqfetch.py:20-41) is a pure
name triple; here a table name resolves to `{sf_dir}/{name}.parquet` and
is registered as a temp view so both the DataFrame API and `spark.sql`
reach it (SURVEY.md §1.1). Schema is self-describing Parquet — same
"source-of-truth is the catalog" stance as the reference (SURVEY.md §1.4).

Normalization at load (SURVEY.md §7 risk register):
- `events.ts` is stored as timestamp[ns]; Spark reads it fine but we cast
  to TimestampType (µs) explicitly so engine and oracle agree.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class Catalog:
    """Loads the fixture tables for one scale-factor directory and
    registers them as temp views named exactly like the files."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._dfs: dict[str, DataFrame] = {}
        # defensive: the harness may hand us a session built without
        # bqfetch_spark.session defaults; events.ts (timestamp[ns])
        # is unreadable without this (it is a runtime-settable conf)
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            # oracle comparisons assume UTC wall-clock timestamps
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        except Exception:
            pass  # locked down by the host — reads of ns columns will raise

    def path(self, name: str) -> str:
        return os.path.join(self.sf_dir, f"{name}.parquet")

    def table(self, name: str) -> DataFrame:
        if name not in self._dfs:
            if name not in TABLES:
                raise KeyError(f"unknown table {name!r}; known: {TABLES}")
            df = self.spark.read.parquet(self.path(name))
            df = normalize_table(name, df)
            df.createOrReplaceTempView(name)
            self._dfs[name] = df
        return self._dfs[name]

    def load_all(self) -> "Catalog":
        for name in TABLES:
            self.table(name)
        return self

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)


# columns stored as timestamp[ns]; surfaced as int64 nanos under
# spark.sql.legacy.parquet.nanosAsLong (session.py) and converted here
NANO_TS_COLUMNS = {"events": ("ts",)}


def normalize_table(name: str, df: DataFrame) -> DataFrame:
    """Cast any non-standard timestamp precision to Spark TimestampType.

    Nanosecond columns floor-truncate to microseconds — the same thing
    DuckDB's µs TIMESTAMP does on read, so engine and oracle agree.
    """
    out = df
    for col in NANO_TS_COLUMNS.get(name, ()):
        if col in out.columns and out.schema[col].dataType.simpleString() == "bigint":
            # integer division — a double division would lose precision
            # on int64 epoch-nanos (~1.7e18 > 2^53)
            out = out.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    for field in out.schema.fields:
        simple = field.dataType.simpleString()
        if simple.startswith("timestamp") and not isinstance(field.dataType, TimestampType):
            out = out.withColumn(field.name, F.col(field.name).cast(TimestampType()))
    return out


# Catalog memo: every registry query calls load_catalog, and the
# parquet footer/schema re-read per table per query is pure overhead.
# Keyed by (applicationId, sessionUUID, sf_dir): applicationId is
# stable for a context's lifetime and unique across restarts, so a
# recycled SparkSession can never resurrect a catalog whose DataFrames
# point at a stopped JVM (a CPython id() key could be reused after GC);
# the per-session UUID distinguishes spark.newSession() siblings that
# SHARE an applicationId but not temp views — without it the second
# session would reuse a catalog whose views exist only in the first.
_CATALOGS: dict[tuple[str, str, str], Catalog] = {}


def _session_uuid(spark: SparkSession) -> str:
    try:
        return str(spark._jsparkSession.sessionUUID())
    except Exception:
        # Connect / future API drift: stamp a uuid4 onto the session
        # proxy on first touch. A plain id(spark) fallback would
        # reintroduce the exact hazard the memo key is documented to
        # prevent — CPython can reuse the address after GC and
        # resurrect a catalog whose DataFrames point at a dead session.
        # A NEW session object can never carry the old attribute, so
        # address reuse is harmless here.
        u = getattr(spark, "_bqfs_session_uuid", None)
        if u is None:
            import uuid

            u = str(uuid.uuid4())
            try:
                spark._bqfs_session_uuid = u
            except Exception:
                pass  # unsettable proxy: key degrades to per-call (no reuse, just no memo)
        return u


def load_catalog(spark: SparkSession, sf_dir: str) -> Catalog:
    from bqfetch_spark.compat import app_id

    key = (app_id(spark), _session_uuid(spark), sf_dir)
    cat = _CATALOGS.get(key)
    if cat is None:
        cat = Catalog(spark, sf_dir).load_all()
        _CATALOGS[key] = cat
    else:
        # re-assert temp views in case another sf_dir overwrote them
        for name, df in cat._dfs.items():
            df.createOrReplaceTempView(name)
    return cat
