#!/usr/bin/env python
"""Registry-wide physical-plan hygiene audit.

For EVERY registry query, build the DataFrame at a small SF and scan
its executed plan for scale-killers:

- ``BatchEvalPython``  — row-at-a-time Python UDF in the plan (the
  slow path the repo bans; Arrow paths show ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas instead and are fine);
- ``CartesianProduct`` — a cross join Spark could NOT broadcast (a
  broadcast-small-side cross join plans as BroadcastNestedLoopJoin,
  which is the intended shape for 1-row/domain-sized frames);
- ``Exchange SinglePartition`` — reported (not failed): a global
  single-partition exchange is legitimate for scalar/top-k finals
  over already-reduced frames, and each occurrence is listed so the
  count is auditable instead of invisible.

Writes PLAN_AUDIT.json: per-query flags + summary. The pytest gate
(tests/test_plan_shapes.py::test_registry_has_no_plan_scale_killers)
re-runs the same scan and hard-fails on the first two categories.

Streaming-wrapper queries (foreachBatch runners) return a lazy read
over their sink, so their OUTER plan is a parquet scan; their inner
per-wave plans are covered by the dedicated plan tests instead — the
audit records them as ``outer_plan_only``.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_AUDIT_SF", "/root/testdata/sf0.001")

HARD_FLAGS = ("BatchEvalPython", "CartesianProduct")
SOFT_FLAGS = ("Exchange SinglePartition",)


def audit_plan(plan: str) -> dict:
    return {
        "hard": sorted({f for f in HARD_FLAGS if f in plan}),
        "single_partition_exchanges": plan.count("Exchange SinglePartition"),
    }


def main() -> None:
    from bqfetch_spark.registry import all_queries
    from bqfetch_spark.session import get_session

    spark = get_session("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    out, n_hard = {}, 0
    for name in sorted(queries):
        q = queries[name]
        try:
            df = q.fn(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — record, don't abort the sweep
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            continue
        rec = audit_plan(plan)
        rec["outer_plan_only"] = "streaming" in q.tags
        n_hard += len(rec["hard"])
        out[name] = rec
    summary = {
        "sf": SF,
        "n_queries": len(out),
        "n_hard_flags": n_hard,
        "hard_flagged": sorted(n for n, r in out.items() if r.get("hard")),
        "n_with_single_partition": sum(
            1 for r in out.values() if r.get("single_partition_exchanges", 0) > 0
        ),
        "errors": sorted(n for n, r in out.items() if "error" in r),
    }
    with open("PLAN_AUDIT.json", "w") as fh:
        json.dump({"summary": summary, "queries": out}, fh, indent=1, sort_keys=True)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
