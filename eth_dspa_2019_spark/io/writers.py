"""Sinks (S6/S7): single-writer overwrite text/CSV files and console.

The reference writes every task output through
``writeAsText(path, OVERWRITE).setParallelism(1)`` (e.g.
`SN/task/activepost/ActivePostStatistician.java:62-101`) — a deliberate
single-writer funnel for deterministic file artifacts. The Spark equivalent
is ``coalesce(1)`` before the write: the upstream computation keeps its
parallelism; only the final write funnels through one task. For large
outputs drop the coalesce and write partitioned — that is the default
everywhere else in this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_single_text(df: DataFrame, path: str, sep: str = "|") -> None:
    """S6: one pipe-joined text file per dataset, overwrite semantics."""
    cols = [F.col(c).cast("string") for c in df.columns]
    (
        df.select(F.concat_ws(sep, *cols).alias("value"))
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def write_single_csv(df: DataFrame, path: str, sep: str = "|") -> None:
    """S6 CSV form: single pipe-delimited file with header — the cleaning
    jobs' output shape (`SN/cleaning/StreamsCleaner.java:48,65,177`)."""
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("sep", sep)
        .csv(path)
    )


def console_sink(df: DataFrame, n: int = 20) -> None:
    """S7: console sink (`.print().setParallelism(1)`)."""
    df.show(n=n, truncate=False)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int | None = None,
    dynamic_overwrite: bool = True,
) -> None:
    """The at-scale output shape: hive-layout parquet partitioned by the
    given columns (lang/source/date in a curation pipeline), so downstream
    reads partition-prune for free and a re-run of one slice replaces ONLY
    the partitions it produced.

    ``dynamic_overwrite`` sets ``partitionOverwriteMode=dynamic`` for this
    write: overwrite deletes just the partitions present in ``df`` (the
    incremental backfill contract), not the whole table — with the static
    default, re-writing one day would wipe every other day.
    ``max_records_per_file`` caps file size so a skewed partition still
    yields scan-parallel files."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        if dynamic_overwrite:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
        w = df.write.mode("overwrite")
        if max_records_per_file:
            w = w.option("maxRecordsPerFile", str(max_records_per_file))
        w.partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
