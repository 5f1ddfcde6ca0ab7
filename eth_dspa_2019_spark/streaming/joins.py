"""Watermarked stream-stream joins (J6 in streaming form).

The reference validates likes against their post inside one operator's
keyed state (`SN/cleaning/StreamsCleaner.java:23-204` batch; the streaming
analog would hold every post forever in a Flink MapState). Spark-native
design: a STREAM-STREAM inner join with watermarks on both sides plus a
time-range predicate — Structured Streaming then derives exactly how long
each side's state must be retained and evicts it as the watermark
advances. That bound is the 100-TB story: post-side state is
O(posts within max_lag + watermark), not O(all posts ever), and like-side
buffering is bounded by the watermark alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def valid_likes_join_stream(
    likes: DataFrame,
    posts: DataFrame,
    *,
    watermark: str = "30 minutes",
    max_lag_hours: int = 24,
) -> DataFrame:
    """Pair each like with its post, keeping likes STRICTLY after the post
    and at most ``max_lag_hours`` later (the state-retention bound).

    Both inputs are streaming frames carrying ``ts_ms`` (epoch millis);
    likes carry ``post_id``, posts carry ``id``. Output: one row per valid
    like (person_id, post_id, ts_ms, post_ts_ms).

    The join condition must include the time range on BOTH event-time
    columns — that is what lets the engine compute a state eviction
    horizon for each side instead of buffering unboundedly.
    """
    l = (
        likes.select("person_id", "post_id", "ts_ms")
        .withColumn("lts", F.timestamp_millis(F.col("ts_ms")))
        .withWatermark("lts", watermark)
    )
    p = (
        posts.select(F.col("id").alias("pid"), F.col("ts_ms").alias("post_ts_ms"))
        .withColumn("pts", F.timestamp_millis(F.col("post_ts_ms")))
        .withWatermark("pts", watermark)
    )
    joined = l.join(
        p,
        (F.col("post_id") == F.col("pid"))
        & (F.col("lts") > F.col("pts"))
        & (
            F.col("lts")
            <= F.col("pts") + F.expr(f"INTERVAL {max_lag_hours} HOURS")
        ),
        "inner",
    )
    return joined.select("person_id", "post_id", "ts_ms", "post_ts_ms")
