"""Source readers (SURVEY.md §2.A A7 / §2.B B1).

The reference reads exactly one source: BigQuery via the Storage API
with Arrow wire format and a `row_restriction` pushdown filter
(bqfetch/bqfetch.py:478-502). The Spark-native equivalents:

- Parquet scan with predicate pushdown + column pruning (the stand-in
  for the Storage API; spark-bigquery-connector slots in identically
  in production).
- CSV / JSON / ORC for interchange.

``pushed_filters`` exposes what actually reached the scan so tests can
assert pushdown instead of hoping for it.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str | None = None, header: bool = True
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def pushed_filters(df: DataFrame) -> list[str]:
    """Parse PushedFilters out of the formatted physical plan — the
    scan-level proof that a predicate reached the source."""
    plan = df._jdf.queryExecution().explainString(
        spark_explain_mode("formatted")
    )
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema(df: DataFrame) -> str | None:
    """The ReadSchema of the scan — proof of column pruning."""
    plan = df._jdf.queryExecution().explainString(spark_explain_mode("formatted"))
    m = re.search(r"ReadSchema: (\S+)", plan)
    return m.group(1) if m else None


def spark_explain_mode(mode: str):
    from pyspark.sql import SparkSession as _S

    jvm = _S.getActiveSession()._jvm
    return jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)


# ---------------------------------------------------------------------------
# binaryFile ingestion — the file-per-document crawl/multimodal path
# ---------------------------------------------------------------------------


def text_file_staging_dir(sf_dir: str) -> str:
    """Content-keyed, uid-scoped staging dir for the file-per-doc
    corpus (same path policy as lakehouse.layout_dir_for)."""
    import hashlib
    import tempfile

    norm = os.path.normpath(os.path.abspath(sf_dir))
    key = hashlib.sha1(norm.encode()).hexdigest()[:16]
    parent = os.path.join(tempfile.gettempdir(), f"bqfs_docfiles_u{os.getuid()}")
    os.makedirs(parent, mode=0o700, exist_ok=True)
    return os.path.join(parent, key)


def stage_document_files(spark, sf_dir: str, out_dir: str) -> str:
    """Materialize `documents` as one UTF-8 ``<doc_id>.txt`` file each —
    the on-disk shape a crawl/scan ingest actually starts from. The
    write is mapInPandas (EXECUTOR-side file IO, one Arrow batch per
    task — never a driver loop over rows); a marker makes re-stages
    no-ops. This is scaffolding for the binaryFile scan (qx211): in
    production the files pre-exist and only the scan runs."""
    import pandas as pd

    from bqfetch_spark.catalog import load_catalog

    marker = os.path.join(out_dir, "_staged_from")
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == sf_dir:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)

    def write_files(batches):
        for pdf in batches:
            n = 0
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                with open(
                    os.path.join(out_dir, f"{int(doc_id)}.txt"), "w", encoding="utf-8"
                ) as fh:
                    fh.write(text)
                n += 1
            yield pd.DataFrame({"n": [n]})

    docs = load_catalog(spark, sf_dir).table("documents").select("doc_id", "text")
    total = (
        docs.mapInPandas(write_files, "n bigint").agg(F.sum("n")).first()[0]
    )
    with open(marker, "w") as fh:
        fh.write(sf_dir)
    return out_dir
