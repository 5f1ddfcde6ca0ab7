"""Exactly-once file output for streaming pipelines: ``foreachBatch`` +
epoch-partitioned dynamic overwrite.

Structured Streaming guarantees at-least-once invocation of the batch
writer — after a crash the last uncommitted epoch REPLAYS. The classic
fix (reference analog: the single-writer overwrite sinks of
`SN/task/activepost/ActivePostStatistician.java:62-101`, which are
replay-safe because they overwrite) is to make the writer idempotent per
epoch: every batch writes under ``epoch=<id>`` with dynamic partition
overwrite, so a replayed epoch deletes and rewrites exactly its own
partitions — duplicates are structurally impossible, and no other
epoch's output is touched.

At scale this is the standard lakehouse ingest contract: readers see
append-only epoch directories, compaction folds old epochs, and the
streaming checkpoint + the partition layout together give end-to-end
exactly-once without a transactional table format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io.writers import write_partitioned


def epoch_partitioned_writer(path: str, partition_cols: list[str]):
    """A ``foreachBatch`` function writing each micro-batch under its
    epoch id with dynamic partition overwrite — idempotent under epoch
    replay."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        write_partitioned(
            batch_df.withColumn("epoch", F.lit(int(epoch_id))),
            path,
            ["epoch", *partition_cols],
        )

    return write_batch


def run_exactly_once_sink(
    df: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_cols: list[str],
) -> None:
    """Execute a bounded stream through the idempotent epoch sink
    (Trigger.AvailableNow, checkpointed)."""
    q = (
        df.writeStream.foreachBatch(
            epoch_partitioned_writer(path, partition_cols)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
