"""Query registry: every engine operator is exposed as a named query.

Each entry pairs a PySpark implementation ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL oracle string (DuckDB-runnable) or ``None``
for genuinely non-SQL-expressible operators (driver then records a
rows-only check). ``__spark_entry__.py`` is a thin view over this
registry.

Determinism conventions (FIXTURES.md "Oracle conventions"):
- Float aggregates: accumulate in DECIMAL (exact in both engines), cast
  to DOUBLE, ``round(x, 6)`` — bit-identical across engines, no drift.
- Averages: exact decimal sum cast to double, divided by count.
- Timestamps: UTC session, microsecond precision.
- Top-k queries: total order with a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering an operator query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    from bqfetch_spark.operators import advanced  # noqa: F401
    from bqfetch_spark.operators import arrow_edge  # noqa: F401
    from bqfetch_spark.operators import relational  # noqa: F401
    from bqfetch_spark.operators import windows  # noqa: F401
    from bqfetch_spark.operators import events  # noqa: F401
    from bqfetch_spark.operators import extensions  # noqa: F401
    from bqfetch_spark.operators import llm_pipeline  # noqa: F401
    from bqfetch_spark.operators import corpus  # noqa: F401
    from bqfetch_spark.operators import quality  # noqa: F401
    from bqfetch_spark.operators import lakehouse  # noqa: F401
    from bqfetch_spark.operators import pq  # noqa: F401
    from bqfetch_spark.operators import similarity  # noqa: F401
    from bqfetch_spark.operators import graph  # noqa: F401
    from bqfetch_spark.operators import statistics  # noqa: F401
    from bqfetch_spark.operators import temporal  # noqa: F401
    from bqfetch_spark import fetcher  # noqa: F401
    from bqfetch_spark import multimodal  # noqa: F401
    from bqfetch_spark import pipelines  # noqa: F401
    from bqfetch_spark.plans import advisor  # noqa: F401
    from bqfetch_spark.streaming import maintenance  # noqa: F401


def all_queries() -> dict[str, Query]:
    load_all_modules()
    return dict(REGISTRY)
