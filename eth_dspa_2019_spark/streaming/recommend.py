"""Streaming Task 2 friend recommendation
(`SN/task/recommendation/FriendRecommender.java` topology, Spark-first):

batch-precomputed static similarities (the reference computes them once at
job start from the person_* CSVs, `:158-210`) + a STREAMING dynamic path —
watermarked 4h/1h per-(window, post, person) activity counts in append mode
(each window emitted exactly once when the watermark closes it), folded per
micro-batch into co-occurrence similarities, blended and top-5-ranked per
closed window.

The foreachBatch fold receives only CLOSED windows (append-mode windowed
aggregation), so each (window, eigen) is scored exactly once — no
re-firing bookkeeping needed; Flink's allowedLateness refinements map to
the watermark slack upstream (SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.recommend import (
    dynamic_similarity,
    recommendations,
)


class StreamingRecommender:
    """Accumulates per-closed-window top-5 recommendations."""

    def __init__(self, spark: SparkSession, static: DataFrame, friends: DataFrame):
        self.spark = spark
        self.static = static.localCheckpoint(eager=True)
        self.friends = friends.localCheckpoint(eager=True)
        self.recs: DataFrame = spark.createDataFrame(
            [],
            "window_end long, eigen_id long, rank int, rec_user_id long, "
            "score double",
        )

    def process_batch(self, counts: DataFrame) -> DataFrame:
        """counts: (window_end, post_id, person_id, c) rows of windows the
        watermark just closed. Returns this batch's recommendations."""
        counts = counts.localCheckpoint(eager=True)
        if not counts.head(1):
            return self.recs.limit(0)
        dyn = dynamic_similarity(counts, self.friends)
        windows = counts.select("window_end").distinct()
        newly = recommendations(self.static, dyn, windows).localCheckpoint(
            eager=True
        )
        self.recs = self.recs.unionByName(newly)
        return newly


def windowed_counts_stream(resolved_stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming W4/A6: per-(4h/1h window, post, person) activity counts in
    append mode over the resolved activity stream."""
    acts = resolved_stream.withColumn("ets", F.timestamp_millis(F.col("ts_ms")))
    return (
        acts.withWatermark("ets", watermark)
        .groupBy(
            F.window("ets", "4 hours", "1 hour").alias("w"),
            "post_id",
            "person_id",
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.col("w.end").cast("long").alias("window_end"),
            "post_id",
            "person_id",
            "c",
        )
    )


def recommend_stream(
    spark: SparkSession,
    resolved_dir: str,
    schema,
    static: DataFrame,
    friends: DataFrame,
    checkpoint_dir: str,
    watermark: str = "30 minutes",
) -> "StreamingRecommender":
    """Wire the full streaming Task 2: resolved-activity parquet stream →
    watermarked windowed counts (append) → foreachBatch similarity fold.
    Bounded run via Trigger.AvailableNow; returns the recommender with the
    accumulated per-window top-5."""
    rec = StreamingRecommender(spark, static, friends)
    stream = spark.readStream.schema(schema).parquet(resolved_dir)
    counts = windowed_counts_stream(stream, watermark)

    def _fold(batch_df: DataFrame, _bid: int) -> None:
        rec.process_batch(batch_df)

    q = (
        counts.writeStream.foreachBatch(_fold)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rec
