"""Every bqfetch_spark module must import WITHOUT an active
SparkSession: library users import first and build sessions later, so
an import-time Column/DataFrame construction (which asserts an active
SparkContext) is a latent crash. Run in a subprocess because the test
session itself holds a live session."""

from __future__ import annotations

import subprocess
import sys


def test_all_modules_import_without_spark_session():
    code = (
        "import pkgutil, importlib\n"
        "import bqfetch_spark\n"
        "mods = [m.name for m in pkgutil.walk_packages("
        "bqfetch_spark.__path__, 'bqfetch_spark.')]\n"
        "assert len(mods) > 30, mods\n"
        "for m in mods:\n"
        "    importlib.import_module(m)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert proc.returncode == 0, proc.stderr[-2000:]


def test_bench_headline_plus_exclusions_cover_registry_exactly():
    """VERDICT r8 #7: every registry query is either benched (HEADLINE)
    or carries an explicit covered-by exclusion — disjointly, with no
    stale names. The same check gates bench.py at runtime; this pytest
    catches it at development time."""
    import bench
    from bqfetch_spark.registry import all_queries

    bench._check_headline_coverage(all_queries())
