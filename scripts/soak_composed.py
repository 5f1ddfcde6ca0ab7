"""Composed-topology long soak + latency profile (VERDICT r8 #3, #7):
the reference's FULL social pipeline — wire lines → parse → incremental
reply→post resolution → exactly-once file hops → task 1 sliding counts,
task 2 recommender and task 3 anomaly detector — driven for K=56 event-time-ordered
micro-batches of the ~10× dataset (1M activities) with durable state at
every stage and a crash injected in the resolver mid-soak (batch 25).

Records, per stage and per batch: wall seconds, standing version-dir
count, and total state bytes (sampled at each commit via the timing
hook), then end-to-end per-batch latency (event ingest → task output
commit = resolver batch time + that task's batch time, the steady-state
chain latency of the file-hop topology) with p50/p95 — the latency
surface the reference (a latency-oriented streaming job) is graded on.

End-state checks: resolver pending empty, resolved hop == the batch
resolution (exact multiset), task 3 output == the oracle-checked batch
query, task 2 output ⊆ batch with closed windows complete, version
retention bounded.

Writes /tmp/soak_composed_results.json; summarized in SCALE.md.
Needs /tmp/sf1synth (scripts/gen_scale.py 10 /tmp/sf1synth).

Env knobs (VERDICT r9 #3 — the data-dominated variant):
  SOAK_SRC (dataset dir), SOAK_ROOT (scratch), SOAK_K (batches),
  SOAK_CRASH_AT (injected-crash batch), SOAK_OUT (results json).
E.g. the ~180k-events/batch data-dominated profile:
  SOAK_SRC=/tmp/sf1synth SOAK_K=6 SOAK_CRASH_AT=3 \
  SOAK_ROOT=/tmp/soak_dd SOAK_OUT=/tmp/soak_dd.json \
  python scripts/soak_composed.py
"""
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from eth_dspa_2019_spark.session import get_spark

SRC = os.environ.get("SOAK_SRC", "/tmp/sf1synth")
ROOT = os.environ.get("SOAK_ROOT", "/tmp/soak_composed")
K = int(os.environ.get("SOAK_K", "56"))
CRASH_AT = int(os.environ.get("SOAK_CRASH_AT", "25"))
OUT = os.environ.get("SOAK_OUT", "/tmp/soak_composed_results.json")

spark = get_spark(app_name="soak_composed")
spark.sparkContext.setLogLevel("ERROR")

from eth_dspa_2019_spark.operators.recommend import (  # noqa: E402
    candidate_grid,
    static_similarity,
    synth_friend_edges,
    synth_person_attrs,
)
from eth_dspa_2019_spark.plans.registry import all_queries  # noqa: E402
from eth_dspa_2019_spark.plans.social import _resolved  # noqa: E402
from eth_dspa_2019_spark.sources.activity import (  # noqa: E402
    load_activities,
    parse_creation_date,
    synth_activity_lines,
)
from eth_dspa_2019_spark.streaming.anomaly import anomaly_stream  # noqa: E402
from eth_dspa_2019_spark.streaming.recommend import recommend_stream  # noqa: E402
from eth_dspa_2019_spark.streaming.resolution import (  # noqa: E402
    resolve_activities_stream,
)


def du(path):
    out = subprocess.run(["du", "-sb", path], capture_output=True, text=True)
    return int(out.stdout.split()[0]) if out.returncode == 0 else 0


def vdirs(sd):
    return sorted(d for d in os.listdir(sd) if d.startswith("v")) \
        if os.path.exists(sd) else []


class StateSampler(list):
    """Timing-hook list that also snapshots the stage's durable-state
    footprint at every batch commit."""

    def __init__(self, state_dir):
        super().__init__()
        self.state_dir = state_dir
        self.samples = []

    def append(self, item):
        super().append(item)
        batch_id, sec = item
        self.samples.append(
            dict(
                batch=batch_id,
                sec=round(sec, 2),
                versions=len(vdirs(self.state_dir)),
                state_bytes=du(self.state_dir),
            )
        )


def pct(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(round(p / 100 * (len(xs) - 1))))]


def rows(df):
    return sorted(tuple(r) for r in df.collect())


t_all = time.time()
ldir = f"{ROOT}/lines"
tape_marker = f"{ROOT}/_TAPE_DONE"
marker = open(tape_marker).read().split() if os.path.exists(tape_marker) else None
if marker and len(marker) == 2 and int(marker[1]) == K:
    # reuse the (expensive) tape from a prior run; wipe all state/hops
    for d in os.listdir(ROOT):
        if d not in ("lines", "_TAPE_DONE"):
            shutil.rmtree(f"{ROOT}/{d}", ignore_errors=True)
    n_lines = int(marker[0])
    print(f"tape: reused ({n_lines} lines in {K} chunks)", flush=True)
else:
    # ---- stage 0: the wire tape as K event-time-ordered chunks
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT)
    lines = synth_activity_lines(spark, SRC).withColumn(
        "ts_ms",
        F.unix_millis(
            parse_creation_date(F.element_at(F.split("value", r"\|", -1), 4))
        ),
    )
    # materialize once: each chunk filter below otherwise re-runs the
    # whole synth lineage (K full scans of the activity build)
    lines = lines.localCheckpoint(eager=True)
    lo, hi = lines.agg(F.min("ts_ms"), F.max("ts_ms")).collect()[0]
    cuts = [lo + (hi - lo) * i // K for i in range(K)] + [hi + 1]
    for i, (clo, chi) in enumerate(zip(cuts[:-1], cuts[1:])):
        lines.filter(
            (F.col("ts_ms") >= clo) & (F.col("ts_ms") < chi)
        ).select("value").coalesce(1).write.mode("overwrite").text(
            f"{ldir}/chunk{i:03d}"
        )
    n_lines = lines.count()
    with open(tape_marker, "w") as fh:
        fh.write(f"{n_lines} {K}")
    print(f"tape: {n_lines} lines in {K} chunks ({time.time()-t_all:.0f}s)",
          flush=True)

# ---- stage A: parse + resolve, crash at batch CRASH_AT, resume
rdir, adir = f"{ROOT}/resolved", f"{ROOT}/acts"
ck1, sd1 = f"{ROOT}/ck1", f"{ROOT}/sd1"
tA = StateSampler(sd1)
t0 = time.time()
try:
    resolve_activities_stream(
        spark, f"{ldir}/chunk*", rdir, ck1, state_dir=sd1,
        acts_out_dir=adir, sink_parts=1, _fail_at_batch=CRASH_AT,
        timings=tA,
    )
    raise AssertionError("fault injection never fired")
except AssertionError:
    raise
except Exception as ex:  # Spark wraps foreachBatch errors (StreamingQueryException)
    assert "injected crash" in str(ex), ex
print(f"stage A crashed (as injected) after batch {CRASH_AT} "
      f"({time.time()-t0:.0f}s)", flush=True)
resolver = resolve_activities_stream(
    spark, f"{ldir}/chunk*", rdir, ck1, state_dir=sd1,
    acts_out_dir=adir, sink_parts=1, timings=tA,
)
wall_A = time.time() - t0
pending = resolver.pending.count()
print(f"stage A done: wall {wall_A:.0f}s pending={pending}", flush=True)

# ---- stage B1: task 1 sliding comment counts over the resolved hop —
# the two-stage chained windowed agg (30-min tumbling partials → 12h/30m
# sliding sum per post, `ActivePostStatistician.java:56-78` decomposition;
# state holds partials, 24× smaller), timed per micro-batch via a
# foreachBatch parquet sink.
emitted_schema = spark.read.parquet(f"{rdir}/batch-*").schema
ck_t1, t1dir = f"{ROOT}/ck_t1", f"{ROOT}/t1"
tB1 = []
_res_stream = (
    spark.readStream.schema(emitted_schema)
    .option("maxFilesPerTrigger", 1)
    .parquet(f"{rdir}/batch-*")
    .withColumn("ets", F.timestamp_millis(F.col("ts_ms")))
    .withWatermark("ets", "30 minutes")
)
_t1_partial = _res_stream.groupBy(
    F.window("ets", "30 minutes").alias("w30"), "post_id"
).agg(F.sum(F.when(F.col("kind") == "comment", 1).otherwise(0)).alias("pn"))
_t1_counts = (
    _t1_partial.groupBy(
        F.window(F.window_time("w30"), "12 hours", "30 minutes").alias("w"),
        "post_id",
    )
    .agg(F.sum("pn").alias("n_comments"))
    .select(
        F.col("w.end").cast("long").alias("window_end"),
        "post_id",
        "n_comments",
    )
)


def _t1_fold(bdf, bid):
    _t0 = time.monotonic()
    bdf.write.mode("overwrite").parquet(f"{t1dir}/batch-{bid:05d}")
    tB1.append((bid, time.monotonic() - _t0))


t0 = time.time()
_q1 = (
    _t1_counts.writeStream.foreachBatch(_t1_fold)
    .outputMode("append")
    .option("checkpointLocation", ck_t1)
    .trigger(availableNow=True)
    .start()
)
_q1.awaitTermination()
wall_B1 = time.time() - t0
print(f"stage B1 done: wall {wall_B1:.0f}s", flush=True)

# ---- stage B2: task 2 recommender over the resolved hop
ev = spark.read.parquet(f"{SRC}/events.parquet")
users = ev.select("user_id").distinct()
num_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
friends = synth_friend_edges(users, num_users)
static = static_similarity(
    candidate_grid(users, friends), synth_person_attrs(users)
)
ck2, sd2 = f"{ROOT}/ck2", f"{ROOT}/sd2"
tB2 = StateSampler(sd2)
t0 = time.time()
rec = recommend_stream(
    spark, f"{rdir}/batch-*", emitted_schema, static, friends, ck2,
    state_dir=sd2, out_dir=f"{ROOT}/recs", max_files_per_trigger=1,
    timings=tB2,
)
wall_B2 = time.time() - t0
print(f"stage B2 done: wall {wall_B2:.0f}s", flush=True)

# ---- stage B3: task 3 anomaly detector over the bronze hop
acts_schema = spark.read.parquet(f"{adir}/batch-*").schema
ck3, sd3 = f"{ROOT}/ck3", f"{ROOT}/sd3"
tB3 = StateSampler(sd3)
t0 = time.time()
det = anomaly_stream(
    spark, f"{adir}/batch-*", acts_schema, f"{ROOT}/flagged", ck3,
    state_dir=sd3, timings=tB3,
)
wall_B3 = time.time() - t0
print(f"stage B3 done: wall {wall_B3:.0f}s", flush=True)

# ---- end-state equalities (exactly-once across the crash)
checks = {}
emitted = spark.read.parquet(f"{rdir}/batch-*")
checks["resolved_equals_batch"] = rows(emitted) == rows(
    _resolved(spark, SRC).select("kind", "id", "person_id", "ts_ms", "post_id")
)
checks["pending_empty"] = pending == 0
t3_batch = all_queries()["task3_anomalies"].spark(spark, SRC)
checks["task3_equals_batch"] = rows(det.anomalies()) == rows(t3_batch)
checks["task3_sink_equals_state"] = rows(
    spark.read.parquet(f"{ROOT}/flagged/batch-*")
) == rows(det.anomalies())
t1_batch = all_queries()["task1_comment_counts"].spark(spark, SRC)
t1_cols = ["window_end", "post_id", "n_comments"]
got1 = set(map(tuple, spark.read.parquet(f"{t1dir}/batch-*").collect()))
want1 = set(map(tuple, t1_batch.select(*t1_cols).collect()))
t1_closed = max(r[0] for r in got1) if got1 else 0
checks["task1_subset"] = bool(got1) and got1 <= want1
checks["task1_closed_complete"] = not {
    r for r in want1 - got1 if r[0] <= t1_closed
}
t2_batch = all_queries()["task2_recommendations"].spark(spark, SRC)
t2_cols = ["window_end", "eigen_id", "rank", "rec_user_id", "score"]
got2 = set(map(tuple, rec.recs.select(*t2_cols).collect()))
want2 = set(map(tuple, t2_batch.select(*t2_cols).collect()))
t2_closed = max(r[0] for r in got2) if got2 else 0
checks["task2_subset"] = bool(got2) and got2 <= want2
checks["task2_closed_complete"] = not {
    r for r in want2 - got2 if r[0] <= t2_closed
}

# ---- latency: steady-state chain latency per batch (skip batch 0 warmup)
tAd = {b: s for b, s in tA}
tB1d = {b: s for b, s in tB1}
tB2d = {b: s for b, s in tB2}
tB3d = {b: s for b, s in tB3}
common = sorted(set(tAd) & set(tB1d) & set(tB2d) & set(tB3d) - {0})
lat1 = [tAd[b] + tB1d[b] for b in common]
lat2 = [tAd[b] + tB2d[b] for b in common]
lat3 = [tAd[b] + tB3d[b] for b in common]
latency = {
    "batches": len(common),
    "task1_e2e_p50": round(pct(lat1, 50), 2),
    "task1_e2e_p95": round(pct(lat1, 95), 2),
    "task2_e2e_p50": round(pct(lat2, 50), 2),
    "task2_e2e_p95": round(pct(lat2, 95), 2),
    "task3_e2e_p50": round(pct(lat3, 50), 2),
    "task3_e2e_p95": round(pct(lat3, 95), 2),
    "resolver_p50": round(pct(list(tAd.values()), 50), 2),
    "resolver_p95": round(pct(list(tAd.values()), 95), 2),
}

out = {
    "k_batches": K,
    "crash_at": CRASH_AT,
    "n_lines": n_lines,
    "walls": {"resolve": round(wall_A, 1), "task1": round(wall_B1, 1),
              "task2": round(wall_B2, 1), "task3": round(wall_B3, 1)},
    # per-stage throughput over the whole tape (the data-dominated
    # companion to the latency percentiles, VERDICT r9 #3)
    "rows_per_sec": {
        "resolve": round(n_lines / wall_A, 1),
        "task1": round(n_lines / wall_B1, 1),
        "task2": round(n_lines / wall_B2, 1),
        "task3": round(n_lines / wall_B3, 1),
    },
    "lines_per_batch": n_lines // K,
    "checks": checks,
    "latency": latency,
    "stages": {
        "resolve": tA.samples,
        "task1": [{"batch": b, "sec": round(s, 2)} for b, s in tB1],
        "task2": tB2.samples,
        "task3": tB3.samples,
    },
    "total_sec": round(time.time() - t_all, 1),
}
with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
print("CHECKS:", checks, flush=True)
print("LATENCY:", latency, flush=True)
print("ok" if all(checks.values()) else "SOME CHECKS FAILED")
