"""Streaming reply→post resolution (J1/O2/O3): the reference resolves
reply chains with memcached edges + per-key event-time timers that re-chase
when the watermark passes (`SN/task/postidresolution/PostIdResolver.java:
63-225`). The Spark-native design replaces BOTH the external K/V store and
the timers with two engine-managed state tables advanced per micro-batch:

- ``resolved``: child_id → root_post_id (grows monotonically),
- ``pending``:  child_id → parent_id (replies whose chain hasn't reached a
  resolved node yet — exactly the records the reference parks in keyed
  state and retries from ``onTimer``; here the retry is simply the next
  batch's fixpoint pass).

Each batch runs a bounded pointer-chase fixpoint over (new rows ∪ pending)
against the accumulated state, so arrival order never matters: a reply that
arrives before its parent waits in ``pending`` until some later batch
delivers the parent (or its transitively-resolved ancestor). Exactly-once
comes from Spark's checkpointed foreachBatch + the monotone state updates —
no external mutable store to drift (SURVEY §4.1 anti-pattern note).

At cluster scale the state tables would live as Delta/parquet tables keyed
by child_id; here they are localCheckpointed DataFrames, same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import KIND_COMMENT, KIND_REPLY

_MAX_CHASE = 64


class IncrementalResolver:
    """Accumulates child→root mappings across micro-batches."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        empty_r = spark.createDataFrame([], "id long, root_post_id long")
        empty_p = spark.createDataFrame([], "id long, parent_id long")
        self.resolved: DataFrame = empty_r
        self.pending: DataFrame = empty_p

    def process_batch(self, acts: DataFrame) -> DataFrame:
        """Fold one micro-batch of parsed activities into the state; returns
        the mappings newly resolved by this batch."""
        new_resolved = acts.filter(F.col("kind") == KIND_COMMENT).select(
            "id", F.col("post_id").alias("root_post_id")
        )
        work = (
            acts.filter(F.col("kind") == KIND_REPLY)
            .select("id", "parent_id")
            .unionByName(self.pending)
        )
        resolved_all = self.resolved.unionByName(new_resolved)
        newly = new_resolved
        # bounded chase: each pass either resolves a pending reply (its
        # parent is resolved) or leaves it pending; chains resolve across
        # passes within the batch, or across batches when parents are late
        for _ in range(_MAX_CHASE):
            if work.limit(1).count() == 0:
                break
            hit = (
                work.alias("w")
                .join(
                    resolved_all.alias("r"),
                    F.col("w.parent_id") == F.col("r.id"),
                )
                .select(
                    F.col("w.id").alias("id"),
                    F.col("r.root_post_id").alias("root_post_id"),
                )
            )
            if hit.limit(1).count() == 0:
                break  # nothing else resolvable this batch → stays pending
            work = work.join(hit.select("id"), "id", "left_anti")
            resolved_all = resolved_all.unionByName(hit)
            newly = newly.unionByName(hit)
        self.resolved = resolved_all.localCheckpoint(eager=True)
        self.pending = work.localCheckpoint(eager=True)
        return newly

    def mappings(self) -> DataFrame:
        """(child_id, root_post_id) resolved so far."""
        return self.resolved.select(
            F.col("id").alias("child_id"), "root_post_id"
        )


def resolve_activities_stream(
    spark: SparkSession,
    lines_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> "IncrementalResolver":
    """The reference's full resolver topology in streaming form
    (`PostIdResolver.buildPipeline`, `SN/SocialNetwork.java:37`): parse the
    line stream, resolve incrementally, and EMIT each activity to the
    resolved-stream sink as soon as its root post is known — posts/likes/
    comments immediately, replies when their chain resolves (possibly in a
    later batch, exactly like the reference's timer re-emission). The sink
    is a parquet directory, i.e. the bronze→silver file hop that downstream
    windowed tasks consume as their own stream."""
    from ..schemas import KIND_LIKE, KIND_POST, KIND_REPLY
    from ..sources.activity import parse_activities

    resolver = IncrementalResolver(spark)
    out_cols = ["kind", "id", "person_id", "ts_ms", "post_id"]
    # reply rows seen but not yet resolvable, carried across batches
    parked = spark.createDataFrame(
        [], "kind string, id long, person_id long, ts_ms long, parent_id long"
    )

    def _fold(batch_df: DataFrame, _batch_id: int) -> None:
        nonlocal parked
        batch_df = batch_df.localCheckpoint(eager=True)
        newly = resolver.process_batch(batch_df).localCheckpoint(eager=True)
        direct = batch_df.filter(
            F.col("kind").isin(KIND_POST, KIND_LIKE, KIND_COMMENT)
        ).select(*out_cols)
        reply_rows = batch_df.filter(F.col("kind") == KIND_REPLY).select(
            "kind", "id", "person_id", "ts_ms", "parent_id"
        ).unionByName(parked)
        hit = (
            reply_rows.join(
                newly.withColumnRenamed("id", "rid"),
                F.col("id") == F.col("rid"),
            )
            .select(
                "kind",
                "id",
                "person_id",
                "ts_ms",
                F.col("root_post_id").alias("post_id"),
            )
        )
        parked = reply_rows.join(
            hit.select("id"), "id", "left_anti"
        ).localCheckpoint(eager=True)
        direct.unionByName(hit).write.mode("append").parquet(out_dir)

    lines = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(lines_dir)
    )
    q = (
        parse_activities(lines)
        .writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return resolver


def resolve_lines_stream(
    spark: SparkSession, lines_dir: str, checkpoint_dir: str
) -> "IncrementalResolver":
    """Wire the incremental resolver to a text-file micro-batch stream
    (one file per trigger — the bounded replay harness): readStream →
    parse → foreachBatch(resolver). Returns the resolver with its final
    state after the bounded run."""
    from ..sources.activity import parse_activities

    resolver = IncrementalResolver(spark)
    lines = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(lines_dir)
    )
    acts = parse_activities(lines)

    def _fold(batch_df: DataFrame, _batch_id: int) -> None:
        resolver.process_batch(batch_df)

    q = (
        acts.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return resolver
