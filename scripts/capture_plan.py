#!/usr/bin/env python
"""Capture .explain("formatted") for named registry queries into
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence
format (plans/r13/<query>_before.txt / _after.txt).

Usage: python scripts/capture_plan.py <tag> <suffix> <query> [query ...]
e.g.:  python scripts/capture_plan.py r13 before qx275_neardup_ivf_exact
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bqfetch_spark.registry import all_queries
    from bqfetch_spark.session import get_session

    spark = get_session("bqfetch-spark-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        df = registry[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain(formatted) at {sf_dir}\n")
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
