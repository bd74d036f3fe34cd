"""Skew mitigation: salted joins (SURVEY.md §4 — the reference only
*warns* about skew, bqfetch/bqfetch.py:410-419; AQE's skew-join split
handles most cases at runtime, but a hot key that exceeds what one
split can hold needs salting).

Salting replicates the small side R times and scatters the big side's
hot keys across R sub-keys, so one pathological key spreads over R
tasks instead of stalling one."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small` on `key` with the big side salted.

    big rows get a random-ish (hash-derived, deterministic) salt in
    [0, salt_buckets); small rows are replicated once per salt value.
    Result equals the plain join (verified in tests) but hot keys fan
    out over `salt_buckets` shuffle partitions.

    Only join types whose output is driven by the big (salted) side
    are allowed: replicating the small side would emit unmatched
    small-side rows once per salt bucket under right/full outer joins.
    """
    if salt_buckets < 1:
        raise ValueError("salt_buckets must be >= 1")
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports big-side-driven join types only, got {how!r}: "
            "the replicated small side would duplicate unmatched rows in "
            "right/full outer joins"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    big_salted = big.withColumn("__salt", salt.cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    small_replicated = small.select("*", salts)
    joined = big_salted.join(
        small_replicated,
        [key, "__salt"],
        how,
    )
    return joined.drop("__salt")
