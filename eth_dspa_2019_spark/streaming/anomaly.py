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
  each batch's cumulative sums as literals.

The per-batch cumulative fold uses the RANGE-PREFIX scaffold
(`operators/prefix.py` — per-range-partition running sums plus broadcast
partition offsets), the same plan the batch query runs: no unkeyed
`Window.orderBy` anywhere, so the widest window any reducer sees is one
range partition even when a micro-batch is 100× larger (VERDICT r5 #2).
Integer fixed-point sums are associative, so the fold is bit-identical to
a single global ordered scan.

Durability (O6, VERDICT r5 #1): with ``state_dir`` set, the state
persists through the shared versioned-snapshot harness
(`streaming/durable.py`, the resolver's discipline): the bounded working
sets (``users`` ring buffers, the five ``sums`` registers) are written
full each batch, the append-only ``flagged`` output as O(batch) DELTAS
with periodic compaction, all committed atomically per batch with
rollback-on-replay — a restarted process resumes exactly where the last
committed batch left off, and a replayed batch (crash between state
commit and engine offset commit) is reprocessed idempotently. The
reference's equivalent survives restarts only via Flink's RocksDB
checkpoints (`session-9/.../FlinkKafkaConsumer.java:66-73`).

Batches must arrive in event-time order (the evaluator's semantics is an
ordered scan); within a batch the fold orders by (ts_ms, id, person_id,
kind) exactly like the batch plan, so the flagged set is identical to the
batch query whatever the batch boundaries are. Use from ``foreachBatch``
over the parsed activity stream (:func:`anomaly_stream`), or drive
manually for tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.anomaly import FEATURES, HOUR_MS, Q
from ..operators.prefix import global_running_sums
from ..schemas import KIND_COMMENT, KIND_POST, KIND_REPLY
from .durable import COMPACT_EVERY, DurableTables, flat_checkpoint

_USERS_SCHEMA = "person_id long, s0 long, s1 long"
_SUMS_SCHEMA = "feature string, s long, c long"
_FLAGGED_SCHEMA = "ts_ms long, user_id long"


class StreamingAnomalyDetector:
    def __init__(self, spark: SparkSession, state_dir: str | None = None):
        self.spark = spark
        self.state = DurableTables(
            spark,
            state_dir,
            fulls={"users": _USERS_SCHEMA, "sums": _SUMS_SCHEMA},
            deltas={"flagged": _FLAGGED_SCHEMA},
        )
        self._adopt(self.state.load_latest())
        self._since_compact = 0

    def _adopt(self, tables: dict[str, DataFrame]) -> None:
        self.user_state = tables["users"]
        # feature -> [running_sum, running_count] (exact ints); 5 rows —
        # driver-side metadata, folded into each batch as literals
        self.sums = {f: [0, 0] for f in FEATURES}
        for r in tables["sums"].collect():
            self.sums[r["feature"]] = [r["s"], r["c"]]
        self.flagged = tables["flagged"]
        self._delta = self.flagged.limit(0)

    # -- durability hooks -------------------------------------------------
    def begin_batch(self, batch_id: int) -> None:
        """Top of every foreachBatch: rolls state back one version when the
        engine replays an already-committed batch (see `streaming/durable.py`)."""
        tables = self.state.begin_batch(batch_id)
        if tables is not None:
            self._adopt(tables)
            self._since_compact = 0

    def commit(self, batch_id: int) -> None:
        """Persist the post-batch state snapshot (no-op without state_dir)."""
        sums_rows = [(f, int(s), int(c)) for f, (s, c) in self.sums.items()]
        self.state.commit(
            batch_id,
            fulls={
                "users": self.user_state,
                "sums": self.spark.createDataFrame(sums_rows, _SUMS_SCHEMA),
            },
            deltas={"flagged": self._delta},
            compacted={"flagged": self.flagged},
        )

    # -- the fold ---------------------------------------------------------
    def _scored(self, acts: DataFrame, cache_registry: list | None = None) -> DataFrame:
        """Per-activity features + running-mean columns for one batch —
        factored out so the plan is unit-assertable (no single-partition
        window: the cumulative fold is the range-prefix two-stage plan)."""
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
        )
        # cumulative per-feature (sum, count) via the range-prefix plan —
        # same shape as the batch query; the driver-held offsets from all
        # PRIOR batches fold in as literals
        order = ["ts_ms", "id", "person_id", "kind"]
        exprs = {}
        for f in FEATURES:
            c = F.col(f)
            exprs[f"{f}_s"] = F.when(c != -1, c)
            exprs[f"{f}_c"] = F.when(c != -1, F.lit(1))
        run = global_running_sums(
            feats, order, exprs, cache_registry=cache_registry
        )
        avg_cols = {}
        for f in FEATURES:
            off_s, off_c = self.sums[f]
            tot_s = F.coalesce(F.col(f"{f}_s"), F.lit(0)) + F.lit(int(off_s))
            tot_c = F.coalesce(F.col(f"{f}_c"), F.lit(0)) + F.lit(int(off_c))
            # try_divide, not `/`: the count is 0 until a feature's first
            # non-sentinel value, and the checkpoint below materializes
            # EVERY row's avg (no codegen short-circuit to hide behind) —
            # under ANSI a plain divide raises; null is the intended
            # "no mean yet" value (threshold comparisons stay false).
            avg_cols[f"{f}_avg"] = F.try_divide(tot_s.cast("double"), tot_c)
        return run.select(
            "ts_ms", "id", "kind", "person_id", *FEATURES,
            *[v.alias(k) for k, v in avg_cols.items()],
        )

    def process_batch(self, acts: DataFrame) -> DataFrame:
        """Fold one event-time-ordered batch; returns its flagged rows."""
        caches: list[DataFrame] = []
        scored = self._scored(acts, cache_registry=caches).localCheckpoint(
            eager=True
        )
        for c in caches:  # range-partitioned intermediate — batch-scoped
            c.unpersist()

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
        ).transform(flat_checkpoint)
        # O(batch) eager work: the delta checkpoints, the full set stays a
        # lazy union compacted every COMPACT_EVERY batches (the in-memory
        # mirror of the store's delta+compaction layout)
        self.flagged = self.flagged.unionByName(newly)
        self._delta = newly
        self._since_compact += 1
        if self._since_compact >= COMPACT_EVERY:
            self.flagged = self.flagged.transform(flat_checkpoint)
            self._since_compact = 0

        # advance global sums (exact integer arithmetic) — one scalar agg
        # over the checkpointed scored frame
        totals = scored.agg(
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
            scored.select("person_id", "ts_ms", "id", "kind")
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
        self.user_state = merged.transform(flat_checkpoint)
        return newly

    def anomalies(self) -> DataFrame:
        return self.flagged


def anomaly_stream(
    spark: SparkSession,
    resolved_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    state_dir: str | None = None,
    _fail_at_batch: int | None = None,
    timings: list | None = None,
) -> "StreamingAnomalyDetector":
    """Wire the detector to a parquet micro-batch stream of parsed
    activities (one file per trigger — event-time-ordered files, the
    bounded replay harness) with per-batch exactly-once output: each
    batch's flagged rows land in ``{out_dir}/batch-{id}`` with overwrite
    semantics, so a replayed batch rewrites the same files instead of
    appending duplicates. With ``state_dir`` set the whole pipeline is
    exactly-once across process restarts (same discipline as
    `streaming/resolution.py::resolve_activities_stream`).

    ``_fail_at_batch`` injects a crash AFTER that batch's state commit —
    the worst-case replay window for the restart test."""
    det = StreamingAnomalyDetector(spark, state_dir)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        import time as _time

        _t0 = _time.monotonic()
        det.begin_batch(batch_id)
        newly = det.process_batch(batch_df.transform(flat_checkpoint))
        newly.write.mode("overwrite").parquet(
            f"{out_dir}/batch-{batch_id:05d}"
        )
        det.commit(batch_id)
        if timings is not None:  # soak/latency instrumentation
            timings.append((batch_id, _time.monotonic() - _t0))
        if _fail_at_batch is not None and batch_id == _fail_at_batch:
            raise RuntimeError(
                f"injected crash after committing batch {batch_id}"
            )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(resolved_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return det
