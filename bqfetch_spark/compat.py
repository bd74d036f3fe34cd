"""Classic-PySpark / Spark-Connect capability layer (VERDICT r8 #3).

Classic PySpark exposes the JVM through ``df._jdf`` / ``spark._jvm`` /
``spark.sparkContext``; Spark Connect proxies the session over gRPC and
has NONE of those. Every internals touch point in this engine routes
through this module so a Connect deployment degrades to a semantic
fallback instead of an AttributeError:

- plan introspection (``formatted_plan`` / ``optimized_plan_string``)
  falls back to the public ``df.explain(...)`` capture, or ``None`` —
  callers must treat ``None`` as "unknown plan" and take the
  scale-safe route (plans/ranks.py materialize-and-count).
- session identity (``app_id``) falls back to a per-process constant —
  uniqueness is then carried by the per-session component of the key.
- raw JVM access (``jvm_or_none``) returns ``None`` so callers can gate
  JVM-only features (count-min-sketch deserialization, connector class
  probes) behind an explicit capability error.

Connect itself cannot run in the build sandbox (no grpcio/protobuf —
see tests/test_connect_compat.py for the env-gated smoke marker), so
these paths are exercised by monkeypatching the classic internals away
in tests, which is exactly the failure shape Connect produces.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame, SparkSession


def is_classic(spark_or_df) -> bool:
    """True when classic-JVM internals are reachable on this object."""
    obj = spark_or_df
    try:
        if isinstance(obj, DataFrame):
            return obj._jdf is not None
        return obj._jvm is not None
    except Exception:
        return False


def jvm_or_none(spark: SparkSession):
    """The py4j JVM view, or None under Connect / API drift."""
    try:
        return spark._jvm
    except Exception:
        return None


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string. Classic path uses
    ``queryExecution().explainString`` (no stdout games); the fallback
    captures the public ``df.explain(mode=...)`` print, which Connect
    serves over its protocol."""
    try:
        jvm = df.sparkSession._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        return df._jdf.queryExecution().explainString(mode)
    except Exception:
        pass
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def optimized_plan_string(df: DataFrame) -> str | None:
    """``optimizedPlan().toString()`` or None when plan introspection is
    unavailable (Connect). ``None`` — not ``""`` — so callers can
    distinguish "no plan access" from "plan matched nothing" and pick
    the scale-safe route."""
    try:
        return df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return None


def plan_size_bytes_or_none(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan size estimate in bytes, or None when
    internals are unreachable. Zero Spark jobs on the classic path."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


def app_id(spark: SparkSession) -> str:
    """A catalog-memo-stable application identity. Classic: the real
    applicationId (unique per JVM lifetime). Connect: there is no
    sparkContext — fall back to the server-side app id config when the
    server exposes it, else a process-constant marker (per-SESSION
    uniqueness then comes from the memo key's session component)."""
    try:
        return spark.sparkContext.applicationId
    except Exception:
        pass
    try:
        return str(spark.conf.get("spark.app.id"))
    except Exception:
        return "connect-app"
