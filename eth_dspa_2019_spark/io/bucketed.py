"""Bucketed-table writes for shuffle-free co-located joins.

The 100-TB story: a fact⋈fact equi-join (orders⋈lineitem, events⋈events)
shuffles BOTH sides on the key every time it runs. Writing the tables
bucketed by the join key — ``df.write.bucketBy(N, key).sortBy(key)
.saveAsTable(...)`` — pays that shuffle ONCE at ingest; every later join
on the key reads matching buckets directly and the exchange disappears
from the plan (asserted in ``tests/test_bucketed_join.py``). This is
Spark's native analog of the reference's pre-partitioned operator state
(`SN/SocialNetwork.java` keys every stream by post before its stateful
ops — bucketing is the at-rest version of that discipline).

Sizing at scale: pick ``num_buckets`` so one bucket of the LARGER table
fits an executor core's working memory (~128-256 MB of parquet per
bucket); both sides of a co-located join must use the SAME bucket count
and key. Bucket-pruning on point predicates is a free extra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    num_buckets: int,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as an external parquet table bucketed (and per-file
    sorted) by ``key``. The one-time shuffle happens here; subsequent
    equi-joins between tables bucketed with the same (key-count) spec read
    co-located buckets with no exchange."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Equi-join two same-spec bucketed tables. With bucketing metadata in
    the catalog, the optimizer emits a SortMergeJoin whose children are the
    bucketed scans directly — no Exchange on either side (plan-asserted in
    tests; broadcast is disabled there to make the shuffle question
    non-trivial)."""
    lt, rt = spark.table(left_table), spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key])
