"""10x-scale run of the durable streaming components (VERDICT r6 #5):
corpus dedup, anomaly detector, CDC merge, driven over K batches of the
~10x dataset with state_dir set; records per-batch wall time and
state-write bytes + compaction behavior."""
import sys, os, time, json, shutil, subprocess
sys.path.insert(0, '/root/repo')
from eth_dspa_2019_spark.session import get_spark
from pyspark.sql import functions as F

SRC = "/tmp/sf1synth"
K = 6
spark = get_spark(app_name="scalestream")
spark.sparkContext.setLogLevel("ERROR")

# symlink tables the activity synth needs but the 10x dir lacks
for t in ["region","nation","customer","supplier","part","orders","lineitem"]:
    dst = f"{SRC}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"/root/testdata/sf0.1/{t}.parquet", dst)

def du(path):
    out = subprocess.run(["du","-sb",path], capture_output=True, text=True)
    return int(out.stdout.split()[0]) if out.returncode==0 else 0

def vdirs(sd):
    return sorted(d for d in os.listdir(sd) if d.startswith("v")) if os.path.exists(sd) else []

results = {}

def run_component(name, state_dir, batches_fn, make, fold):
    shutil.rmtree(state_dir, ignore_errors=True)
    comp = make(state_dir)
    rows = []
    seen = set()
    for i, batch in enumerate(batches_fn()):
        t0 = time.time()
        comp.begin_batch(i)
        fold(comp, batch)
        comp.commit(i)
        dt = time.time() - t0
        new = [d for d in vdirs(state_dir) if d not in seen]
        seen.update(new)
        nb = sum(du(os.path.join(state_dir, d)) for d in new)
        comps = []
        for d in new:
            for f in os.listdir(os.path.join(state_dir, d)):
                if "__compact" in f or "__full" in f:
                    comps.append(f)
        rows.append(dict(batch=i, sec=round(dt,2), state_bytes=nb,
                         files=sorted(set(f.split("__")[0]+"__"+f.split("__")[1].split(".")[0] for f in comps))[:6]))
        print(name, rows[-1], flush=True)
    results[name] = rows

# ---- 1. corpus dedup: seed = even doc_ids, stream odd in K batches
from eth_dspa_2019_spark.streaming.corpus_dedup import StreamingCorpusDedup
from eth_dspa_2019_spark.plans.llm import BANDS, DEDUP_PREFIX, JACCARD_THRESHOLD, NUM_PERM, SHINGLE_N
docs = spark.read.parquet(f"{SRC}/documents.parquet").select("doc_id","text")
corpus = docs.filter(F.col("doc_id") % 2 == 0).localCheckpoint(eager=True)
new = docs.filter(F.col("doc_id") % 2 == 1).localCheckpoint(eager=True)
lo, hi = new.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
cuts = [lo + (hi-lo)*i//K for i in range(K)] + [hi+1]
def dedup_batches():
    for clo, chi in zip(cuts[:-1], cuts[1:]):
        yield new.filter((F.col("doc_id")>=clo)&(F.col("doc_id")<chi))
run_component(
    "corpus_dedup", "/tmp/ss_dedup",
    dedup_batches,
    lambda sd: StreamingCorpusDedup(spark, corpus, sd, n=SHINGLE_N,
        num_perm=NUM_PERM, bands=BANDS, threshold=JACCARD_THRESHOLD,
        prefix=DEDUP_PREFIX, grow=True),
    lambda c, b: c.process_batch(b),
)

# ---- 2. anomaly detector over 10x activities, K ts-ordered chunks
from eth_dspa_2019_spark.streaming.anomaly import StreamingAnomalyDetector
from eth_dspa_2019_spark.sources.activity import load_activities
acts = load_activities(spark, SRC).select("ts_ms","id","kind","person_id","content")
lo, hi = acts.agg(F.min("ts_ms"), F.max("ts_ms")).collect()[0]
cuts2 = [lo + (hi-lo)*i//K for i in range(K)] + [hi+1]
def anom_batches():
    for clo, chi in zip(cuts2[:-1], cuts2[1:]):
        yield acts.filter((F.col("ts_ms")>=clo)&(F.col("ts_ms")<chi))
run_component(
    "anomaly", "/tmp/ss_anom",
    anom_batches,
    lambda sd: StreamingAnomalyDetector(spark, sd),
    lambda c, b: c.process_batch(b.localCheckpoint(eager=True)),
)

# ---- 3. CDC merge: 1M changes from 10x events, K seq-ordered batches
from eth_dspa_2019_spark.streaming.cdc_merge import StreamingSnapshotMerge
ev = spark.read.parquet(f"{SRC}/events.parquet")
changes = ev.select(
    F.when(F.col("event_id") % 11 == 3, "D")
     .when(F.col("event_id") % 7 == 2, "I")
     .otherwise("U").alias("op"),
    F.col("user_id").alias("key"),
    (F.col("value")*100).cast("long").alias("cents"),
    F.col("event_id").alias("seq"),
).localCheckpoint(eager=True)
lo, hi = changes.agg(F.min("seq"), F.max("seq")).collect()[0]
cuts3 = [lo + (hi-lo)*i//K for i in range(K)] + [hi+1]
seed = changes.select("key").distinct().select("key", (F.col("key")*100).alias("cents"))
def cdc_batches():
    for clo, chi in zip(cuts3[:-1], cuts3[1:]):
        yield changes.filter((F.col("seq")>=clo)&(F.col("seq")<chi))
run_component(
    "cdc_merge", "/tmp/ss_cdc",
    cdc_batches,
    lambda sd: StreamingSnapshotMerge(spark, seed, sd),
    lambda c, b: c.process_batch(b),
)

print(json.dumps(results))
with open("/tmp/scale_stream_results.json","w") as f:
    json.dump(results, f, indent=1)
