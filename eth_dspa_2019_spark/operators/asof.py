"""As-of (point-in-time) join — a custom operator Spark's join zoo lacks
(SURVEY §2.3 notes the reference has none either; this is a first-class
engine extension for feature lookups over temporal tables).

``asof_join(left, right, ...)`` attaches to every left row the latest right
row with the same key and ``right.ts <= left.ts``.

Spark-first plan — the union–window trick, NOT a range join:
tag both inputs, union them, and run one ``last_value(ignoreNulls)`` window
per key ordered by (ts, tag). Cost is a single hash-partition-by-key +
sort — linear in |L|+|R| — where a naive ``L ⋈ R ON key AND r.ts <= l.ts``
+ max-filter materializes O(|L|·|R|/keys) intermediate rows and a range
join explodes at 100 TB. The same shape works streaming inside
``foreachBatch`` over a temporal state table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row + the most recent ``right``
    values (``value_cols``) at or before its timestamp; NULL when no prior
    right row exists. Ties on timestamp: the right row wins (tag order
    right-before-left, matching ASOF's <= semantics deterministically)."""
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.struct(*left.columns).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(
            l_tag.schema["_lrow"].dataType
        ).alias("_lrow"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "_lrow",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_filled_{c}")
            for c in value_cols
        ],
    ).filter(F.col("_lrow").isNotNull())
    return filled.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_filled_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
