"""Build-laziness gate (mirrors scripts/action_audit.py): a registry
operator's builder must trigger ZERO Spark jobs — a job fired during
the build is a driver-side action inside the operator, and when that
action consumes an uncached frame the returned plan consumes again,
shared lineage (often a full corpus scan) runs twice. qx263 shipped
exactly that for two rounds; this gate makes the class mechanically
un-reintroducible. Deliberate build actions (store builders, eager
chunk planners, model fits, bounded iterative loops, tiny-frame
decision collects) live in scripts/action_audit.py:BUILD_ACTIONS with
a per-op job budget and rationale; exceeding the budget means the op
got MORE eager since the rationale was recorded."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.action_audit import BUILD_ACTIONS, sweep  # noqa: E402
from tests.conftest import SF_SMOKE  # noqa: E402


def test_registry_builds_are_lazy(spark):
    out = sweep(spark, SF_SMOKE)
    offenders = {
        name: {k: rec[k] for k in ("build_jobs", "allowed", "why") if k in rec}
        for name, rec in out.items()
        if rec.get("over_budget") or "error" in rec
    }
    assert not offenders, offenders


def test_allowlist_names_are_registry_names():
    """A renamed/deleted op must not leave a stale allowlist entry
    silently budgeting nothing."""
    from bqfetch_spark.registry import all_queries

    reg = set(all_queries())
    stale = sorted(set(BUILD_ACTIONS) - reg)
    assert not stale, stale


def test_allowlist_entries_carry_family_rationale():
    """Every budget travels with a tagged rationale so an auditor can
    see WHY the build is allowed to act without reading the operator."""
    families = ("[store]", "[planner]", "[train]", "[iter]", "[decide]")
    bad = {
        n: why
        for n, (budget, why) in BUILD_ACTIONS.items()
        if budget <= 0 or not any(f in why for f in families)
    }
    assert not bad, bad
