"""Long-run durable-state soak (VERDICT r7 #6): 56 micro-batches (7 full
COMPACT_EVERY=8 compaction cycles) at the ~10x dataset for two durable
components with opposite state profiles:

- postings index (state ∝ corpus): per-batch delta bytes must track the
  BATCH, total on-disk state must track the INGESTED CORPUS (not the
  version count), retention must keep the version-dir count bounded, and
  the two right-to-be-forgotten delete batches (at 20 and 40) must
  SHRINK the next compaction.
- anomaly detector (state ∝ key space): per-version state bytes must go
  FLAT once the user key space is covered, for the whole run.

Writes /tmp/soak_stream_results.json; summarized in SCALE.md.
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

SRC = "/tmp/sf1synth"
K = 56
DELETE_AT = {20, 40}

spark = get_spark(app_name="soak")
spark.sparkContext.setLogLevel("ERROR")

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]:
    dst = f"{SRC}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"/root/testdata/sf0.1/{t}.parquet", dst)


def du(path):
    out = subprocess.run(["du", "-sb", path], capture_output=True, text=True)
    return int(out.stdout.split()[0]) if out.returncode == 0 else 0


def vdirs(sd):
    return sorted(d for d in os.listdir(sd) if d.startswith("v")) \
        if os.path.exists(sd) else []


results = {}


def run(name, state_dir, steps, make):
    shutil.rmtree(state_dir, ignore_errors=True)
    comp = make(state_dir)
    rows = []
    for i, step in enumerate(steps):
        t0 = time.time()
        comp.begin_batch(i)
        step(comp)
        comp.commit(i)
        dt = time.time() - t0
        rows.append(dict(
            batch=i, sec=round(dt, 2),
            total_state_bytes=du(state_dir),
            n_versions=len(vdirs(state_dir)),
        ))
        if i % 8 == 0 or i == len(steps) - 1:
            print(name, rows[-1], flush=True)
    results[name] = rows


# ---- postings index: 56 doc slices + 2 delete batches
from eth_dspa_2019_spark.streaming.postings import StreamingPostingsIndex

docs = spark.read.parquet(f"{SRC}/documents.parquet").select(
    "doc_id", "text"
).localCheckpoint(eager=True)
lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
n_add = K - len(DELETE_AT)
cuts = [lo + (hi - lo) * i // n_add for i in range(n_add)] + [hi + 1]
chunks = iter(
    docs.filter((F.col("doc_id") >= a) & (F.col("doc_id") < b))
    for a, b in zip(cuts[:-1], cuts[1:])
)
deletes = docs.filter(F.col("doc_id") % 17 == 3).select("doc_id") \
    .localCheckpoint(eager=True)

steps = []
for i in range(K):
    if i in DELETE_AT:
        steps.append(lambda c: c.delete_docs(deletes))
    else:
        ch = next(chunks)
        steps.append(lambda c, ch=ch: c.process_batch(ch))
run("postings", "/tmp/soak_postings", steps,
    lambda sd: StreamingPostingsIndex(spark, sd))

# ---- anomaly detector: 56 time slices (key-space-bounded state)
from eth_dspa_2019_spark.sources.activity import load_activities
from eth_dspa_2019_spark.streaming.anomaly import StreamingAnomalyDetector

acts = load_activities(spark, SRC).select(
    "ts_ms", "id", "kind", "person_id", "content"
).localCheckpoint(eager=True)
lo, hi = acts.agg(F.min("ts_ms"), F.max("ts_ms")).collect()[0]
cuts2 = [lo + (hi - lo) * i // K for i in range(K)] + [hi + 1]
steps2 = [
    (lambda c, a=a, b=b: c.process_batch(
        acts.filter((F.col("ts_ms") >= a) & (F.col("ts_ms") < b))
        .localCheckpoint(eager=True)))
    for a, b in zip(cuts2[:-1], cuts2[1:])
]
run("anomaly", "/tmp/soak_anom", steps2,
    lambda sd: StreamingAnomalyDetector(spark, sd))

with open("/tmp/soak_stream_results.json", "w") as f:
    json.dump(results, f, indent=1)
print("DONE")
