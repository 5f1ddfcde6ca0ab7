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


def compact_epochs(
    spark,
    path: str,
    partition_cols: list[str],
    keep_epochs_from: int | None = None,
) -> None:
    """Fold the accumulated ``epoch=N`` directories into plain
    ``partition_cols`` layout — the periodic compaction every
    epoch-partitioned ingest needs: readers stop paying a file-listing
    and small-file penalty proportional to stream lifetime, and the
    exactly-once property is preserved because compaction only touches
    epochs the stream has already committed.

    ``keep_epochs_from``: epochs >= this id are left in place (the
    streaming head that may still be replayed); pass None to compact
    everything (stream stopped). Compacted rows land under
    ``<path>_compacted`` partitioned by ``partition_cols`` only, and the
    folded epoch directories are dropped."""
    import shutil

    df = spark.read.parquet(path)
    to_fold = (
        df
        if keep_epochs_from is None
        else df.filter(F.col("epoch") < keep_epochs_from)
    )
    write_partitioned(
        to_fold.drop("epoch"), path + "_compacted", partition_cols
    )
    import os

    for d in os.listdir(path):
        if not d.startswith("epoch="):
            continue
        eid = int(d.split("=", 1)[1])
        if keep_epochs_from is None or eid < keep_epochs_from:
            shutil.rmtree(os.path.join(path, d))
