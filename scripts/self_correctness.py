#!/usr/bin/env python
"""Self-reported CORRECTNESS artifact for EVERY registry query.

The external correctness file caps at 50 sorted query names, so ~half
the registry has no driver-side row (COVERAGE.md documents the gap).
This script runs the IDENTICAL check — Spark result vs DuckDB oracle at
sf0.01, rows + sorted-column schema + dtype-sensitive value hash (the
strict comparator from tests/conftest.py) — for all registry names and
writes CORRECTNESS_SELF_r{N}.json in the driver file's per-query
schema, so driver vs self coverage can be diffed directly.

Usage: python scripts/self_correctness.py [round_number]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    import duckdb

    from bqfetch_spark.catalog import TABLES
    from bqfetch_spark.registry import all_queries
    from bqfetch_spark.session import get_session
    from tests.conftest import frame_canon

    spark = get_session("self-correctness")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    out: dict[str, dict] = {}
    for name, q in sorted(all_queries().items()):
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            s_pdf = q.fn(spark, SF).toPandas()
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
        status = (
            "no_oracle"
            if rec["err"] == "no_oracle"
            else ("ERR " + rec["err"] if rec["err"] else
                  ("pass" if rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
                   else "FAIL"))
        )
        print(f"{name}: {status}", file=sys.stderr)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, f"CORRECTNESS_SELF_r{rnd:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    n_oracle = sum(1 for r in out.values() if r["err"] != "no_oracle")
    n_pass = sum(
        1
        for r in out.values()
        if r["rows_match"] and r["schema_match"] and r["hash_match"]
    )
    print(
        json.dumps(
            {
                "artifact": os.path.basename(path),
                "sf": SF,
                "n_queries": len(out),
                "n_oracle": n_oracle,
                "n_pass": n_pass,
                "n_rows_only": len(out) - n_oracle,
            }
        )
    )


if __name__ == "__main__":
    main()
