"""Stream-stream joins with watermark-bounded state (engine-added:
the reference is batch-only; SURVEY.md §2.C notes streams as the one
operator family it lacks entirely).

A stream-stream inner join keeps both sides' unmatched rows in the
state store until the other side can no longer produce a match. That
is only bounded if (a) both inputs carry watermarks and (b) the join
condition constrains EVENT TIME on both sides — here
``click_ts <= purchase_ts <= click_ts + horizon``, which lets Spark
evict any click older than ``watermark + horizon`` and any purchase
older than ``watermark``. Without the time-range condition the state
grows with the stream; with it, state is O(events inside the horizon
window), independent of stream length — the 100 TB posture.

On a bounded replay (Trigger.AvailableNow) the append-mode output is
exactly the batch interval self-join, which is what the q97 oracle
checks value-for-value against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_join_stream(
    events: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Every (click, purchase) pair by the same user with the purchase
    inside ``[click_ts, click_ts + horizon]`` — the stream-stream
    self-join form of attribution (batch as-of analogue: q37/q92).

    Both legs are the SAME watermarked stream filtered by event type;
    Spark plans one stateful join whose state is evicted by the
    watermark + the event-time range in the join condition."""
    wm = events.withWatermark("ts", watermark)
    clicks = wm.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = wm.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
    )
    return joined.select(
        "click_id",
        "purchase_id",
        F.col("c_user_id").alias("user_id"),
        "click_ts",
        "purchase_ts",
        (F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("click_ts")))
        .cast("bigint")
        .alias("us_from_click"),
    )
