"""Shared oracle-parity checker used by self_correctness.py (full
registry sweep) and rotate_correctness.py (arbitrary named subsets, so
the driver/judge can spot-verify slices the builder didn't choose).

The check is the driver's comparator: Spark result vs DuckDB oracle at
sf0.01 — row count + sorted-column schema + dtype-sensitive value hash
(frame_canon from tests/conftest.py).
"""

from __future__ import annotations

import os
import sys
from typing import Iterable, Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def run_checks(
    names: Optional[Iterable[str]] = None,
    sf: str = DEFAULT_SF,
    progress: bool = True,
) -> dict:
    """Run the rows/schema/value-hash check for the given registry
    query names (all of them when names is None). Returns the driver
    CORRECTNESS per-query record dict."""
    import duckdb

    from bqfetch_spark.catalog import TABLES
    from bqfetch_spark.registry import all_queries
    from bqfetch_spark.session import get_session
    from tests.conftest import frame_canon

    registry = all_queries()
    if names is None:
        picked = sorted(registry)
    else:
        unknown = [n for n in names if n not in registry]
        if unknown:
            raise SystemExit(f"unknown query names: {unknown}")
        picked = list(names)

    spark = get_session("correctness-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    out: dict[str, dict] = {}
    for name in picked:
        q = registry[name]
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            s_pdf = q.fn(spark, sf).toPandas()
            rec["spark_rows"] = len(s_pdf)
            if q.oracle is None:
                rec["err"] = "no_oracle"
            else:
                d_pdf = con.sql(q.oracle).df()
                rec["oracle_rows"] = len(d_pdf)
                rec["rows_match"] = len(s_pdf) == len(d_pdf)
                rec["schema_match"] = sorted(s_pdf.columns) == sorted(d_pdf.columns)
                s_canon, _ = frame_canon(s_pdf)
                d_canon, _ = frame_canon(d_pdf)
                rec["hash_match"] = s_canon == d_canon
        except Exception as exc:  # a broken query must not kill the sweep
            rec["err"] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:160]}"
        out[name] = rec
        if progress:
            status = (
                "no_oracle"
                if rec["err"] == "no_oracle"
                else ("ERR " + rec["err"] if rec["err"] else
                      ("pass" if rec["rows_match"] and rec["schema_match"]
                       and rec["hash_match"] else "FAIL"))
            )
            print(f"{name}: {status}", file=sys.stderr)
    return out


def summarize(out: dict) -> dict:
    n_oracle = sum(1 for r in out.values() if r["err"] != "no_oracle")
    n_pass = sum(
        1
        for r in out.values()
        if r["rows_match"] and r["schema_match"] and r["hash_match"]
    )
    return {
        "n_queries": len(out),
        "n_oracle": n_oracle,
        "n_pass": n_pass,
        "n_rows_only": sum(1 for r in out.values() if r["err"] == "no_oracle"),
        "n_err": sum(
            1 for r in out.values() if r["err"] and r["err"] != "no_oracle"
        ),
    }
