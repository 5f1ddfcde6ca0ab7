"""Streaming Task 3 anomaly flagging (O1/O2/A12/F7 end-to-end): the batch
spec (`operators/anomaly.py`, = `SN/validation/Task3Evaluator.java:45-98`)
advanced one micro-batch at a time.

State carried across batches (the reference's keyed ValueState + the
broadcast Signatures, `AnomalousUserDetector.java:209-274`):

- per-user last-two activity timestamps (ring buffer) — a small DataFrame
  keyed by person_id, joined into each batch so `lag(ts, 2)` works across
  batch boundaries;
- global per-feature running (sum, count) offsets — five exact BIGINT
  pairs (features are 1e-6 fixed-point), held driver-side and folded into
  each batch's cumulative window sums as literals.

Batches must arrive in event-time order (the evaluator's semantics is an
ordered scan); within a batch the fold orders by (ts_ms, id, person_id,
kind) exactly like the batch plan, so the flagged set is identical to the
batch query whatever the batch boundaries are. Use from ``foreachBatch``
over the parsed activity stream, or drive manually for tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.anomaly import FEATURES, HOUR_MS, Q
from ..schemas import KIND_COMMENT, KIND_POST, KIND_REPLY


class StreamingAnomalyDetector:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.user_state: DataFrame = spark.createDataFrame(
            [], "person_id long, s0 long, s1 long"
        )
        # feature -> [running_sum, running_count] (exact ints)
        self.sums = {f: [0, 0] for f in FEATURES}
        self.flagged: DataFrame = spark.createDataFrame(
            [], "ts_ms long, user_id long"
        )

    def process_batch(self, acts: DataFrame) -> DataFrame:
        """Fold one event-time-ordered batch; returns its flagged rows."""
        wu = Window.partitionBy("person_id").orderBy("ts_ms", "id", "kind")
        joined = acts.select(
            "ts_ms", "id", "kind", "person_id", "content"
        ).join(self.user_state, "person_id", "left")
        rn = F.row_number().over(wu)
        # two-back timestamp: in-batch lag, else the carried ring buffer
        t2 = F.coalesce(
            F.lag("ts_ms", 2).over(wu),
            F.when(rn == 1, F.col("s1")).when(rn == 2, F.col("s0")),
        )
        is_comment = F.col("kind").isin(KIND_COMMENT, KIND_REPLY)
        is_post = F.col("kind") == KIND_POST
        toks = F.split(F.col("content"), r"\s+")
        ratio = F.size(F.array_distinct(toks)) / F.size(toks)
        neg = F.lit(-1).cast("bigint")
        feats = joined.select(
            "ts_ms",
            "id",
            "kind",
            "person_id",
            F.when(
                t2.isNotNull(),
                F.floor(
                    F.lit(float(3 * HOUR_MS * Q))
                    / F.greatest(F.col("ts_ms") - t2, F.lit(1))
                ),
            )
            .otherwise(neg)
            .alias("freq"),
            F.when(is_comment, F.length("content").cast("bigint"))
            .otherwise(neg)
            .alias("clen"),
            F.when(is_post, F.length("content").cast("bigint"))
            .otherwise(neg)
            .alias("plen"),
            F.when(is_comment, F.floor(ratio * Q)).otherwise(neg).alias("cratio"),
            F.when(is_post, F.floor(ratio * Q)).otherwise(neg).alias("pratio"),
        ).localCheckpoint(eager=True)

        w_run = Window.orderBy("ts_ms", "id", "person_id", "kind").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        avg_cols = {}
        for f in FEATURES:
            c = F.col(f)
            off_s, off_c = self.sums[f]
            run_sum = F.coalesce(
                F.sum(F.when(c != -1, c)).over(w_run), F.lit(0)
            ) + F.lit(off_s)
            run_cnt = F.coalesce(
                F.sum(F.when(c != -1, 1)).over(w_run), F.lit(0)
            ) + F.lit(off_c)
            avg_cols[f"{f}_avg"] = run_sum.cast("double") / run_cnt
        scored = feats.select(
            "ts_ms", "person_id", *FEATURES,
            *[v.alias(k) for k, v in avg_cols.items()],
        )

        def hi_lo(f: str):
            c = F.col(f).cast("double")
            return (F.col(f) != -1) & (
                (c < 0.5 * F.col(f"{f}_avg")) | (c > 2.0 * F.col(f"{f}_avg"))
            )

        abnormal = (
            ((F.col("freq") != -1)
             & (F.col("freq").cast("double") > 2.0 * F.col("freq_avg")))
            | hi_lo("clen") | hi_lo("plen") | hi_lo("cratio") | hi_lo("pratio")
        )
        newly = scored.filter(abnormal).select(
            "ts_ms", F.col("person_id").alias("user_id")
        ).localCheckpoint(eager=True)
        self.flagged = self.flagged.unionByName(newly)

        # advance global sums (exact integer arithmetic)
        totals = feats.agg(
            *[F.sum(F.when(F.col(f) != -1, F.col(f))).alias(f"s_{f}") for f in FEATURES],
            *[F.sum(F.when(F.col(f) != -1, 1)).alias(f"c_{f}") for f in FEATURES],
        ).collect()[0]
        for f in FEATURES:
            self.sums[f][0] += int(totals[f"s_{f}"] or 0)
            self.sums[f][1] += int(totals[f"c_{f}"] or 0)

        # advance per-user ring buffers: last two timestamps overall
        w_last = Window.partitionBy("person_id").orderBy(
            F.desc("ts_ms"), F.desc("id"), F.desc("kind")
        )
        batch_last = (
            feats.select("person_id", "ts_ms", "id", "kind")
            .withColumn("r", F.row_number().over(w_last))
            .filter(F.col("r") <= 2)
            .groupBy("person_id")
            .agg(
                F.max(F.when(F.col("r") == 1, F.col("ts_ms"))).alias("b0"),
                F.max(F.when(F.col("r") == 2, F.col("ts_ms"))).alias("b1"),
            )
        )
        merged = self.user_state.join(batch_last, "person_id", "full").select(
            "person_id",
            F.coalesce("b0", "s0").alias("s0"),
            F.coalesce("b1", F.when(F.col("b0").isNotNull(), F.col("s0")), F.col("s1")).alias("s1"),
        )
        self.user_state = merged.localCheckpoint(eager=True)
        return newly

    def anomalies(self) -> DataFrame:
        return self.flagged
