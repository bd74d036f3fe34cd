#!/usr/bin/env python
"""Scale sanity check: replicate lineitem 10× (≈6M rows, ≈TPC-H sf1
row count) into /tmp with shifted keys, then verify the flagship
aggregation scales ≈linearly vs the sf0.1 base — interleaved
measurement so ambient load cancels out of the ratio.

Not part of the pytest suite (generates ~100 MB and takes minutes);
run manually: python scripts/scale_check.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bqfetch_spark.operators.relational import DEC_PRICE
from bqfetch_spark.session import get_session


def q1_shape(df):
    qty = F.col("l_quantity").cast(DEC_PRICE)
    return (
        df.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(qty).alias("s"), F.count(F.lit(1)).alias("n"))
    )


def main() -> None:
    spark = get_session("scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tmp = "/tmp/bqfs_scale_check"
    shutil.rmtree(tmp, ignore_errors=True)

    reps = spark.range(10).select(F.col("id").alias("rep"))
    li0 = spark.read.parquet(f"{base}/lineitem.parquet")
    li10 = (
        li0.crossJoin(reps)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * 10_000_000)
        .drop("rep")
    )
    li10.repartition(32).write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")

    small = li0.repartition(32)
    big = spark.read.parquet(f"{tmp}/lineitem.parquet")
    n_small, n_big = small.count(), big.count()
    print(f"rows: small={n_small} big={n_big}")

    worst = 0.0
    for i in range(3):
        t0 = time.time()
        q1_shape(small).collect()
        ts = time.time() - t0
        t0 = time.time()
        q1_shape(big).collect()
        tb = time.time() - t0
        ratio = tb / ts
        worst = max(worst, ratio)
        print(f"round{i}: small={ts:.2f}s big={tb:.2f}s ratio={ratio:.1f}")
    shutil.rmtree(tmp, ignore_errors=True)
    # 10× the data should cost ≤ ~10× the time (linear); far above that
    # would mean a super-linear plan (quadratic operator, spill storm)
    assert worst <= 15, f"super-linear scaling: worst ratio {worst:.1f}"
    print("scaling OK")


if __name__ == "__main__":
    main()
