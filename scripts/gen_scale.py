"""Synthetic scale-up generator for the sf0.1 testdata (disjoint-shard
growth axis): K copies of events / documents / embeddings with per-copy
id+time offsets, per-copy disjoint vocabulary (token suffix `_k`), and
deterministic per-dim embedding jitter — similarity structure is
REPLICATED, not densified, so dedup/ANN candidate counts scale the way a
real bigger corpus would.

    python scripts/gen_scale.py K DST     # e.g. 10 /tmp/sf1synth
    python scripts/gen_scale.py 100 /tmp/sf100synth

TPC-H tables the activity synth needs are symlinked from sf0.1 (the
social/dedup scale probes grow on the events/documents axis only).
Writes `{DST}/_DONE` when complete; reruns are no-ops.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from eth_dspa_2019_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
# id offsets: one full copy's key space per shard, matching the r6 run
EV_OFF, USER_OFF, DOC_OFF, VEC_OFF = 100_000, 1_500, 5_000, 2_000


def main() -> int:
    k_copies = int(sys.argv[1])
    dst = sys.argv[2]
    if os.path.exists(f"{dst}/_DONE"):
        print(f"{dst} already built")
        return 0
    spark = get_spark(app_name="genscale")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    parts = []
    for k in range(k_copies):
        parts.append(
            ev.select(
                (F.col("event_id") + F.lit(k * EV_OFF)).alias("event_id"),
                (F.col("user_id") + F.lit(k * USER_OFF)).alias("user_id"),
                (F.col("ts") + F.expr(f"INTERVAL {k * 31} DAYS")).alias("ts"),
                "event_type", "value", "props",
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(32).write.mode("overwrite").parquet(f"{dst}/events.parquet")

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = []
    for k in range(k_copies):
        t = (
            F.col("text")
            if k == 0
            else F.regexp_replace("text", r"(\S+)", f"$1_{k}")
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * DOC_OFF)).alias("doc_id"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
                t.alias("text"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.select(docs.columns).repartition(32).write.mode("overwrite").parquet(
        f"{dst}/documents.parquet"
    )

    em = spark.read.parquet(f"{SRC}/embeddings.parquet")
    parts = []
    for k in range(k_copies):
        e = (
            F.col("embedding")
            if k == 0
            else F.expr(
                f"transform(embedding, (x, i) -> cast(x + "
                f"((hash(vec_id * {k + 7} + i) % 200) / 2000.0) as float))"
            )
        )
        parts.append(
            em.select(
                (F.col("vec_id") + F.lit(k * VEC_OFF)).alias("vec_id"),
                e.alias("embedding"),
                "label",
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(32).write.mode("overwrite").parquet(
        f"{dst}/embeddings.parquet"
    )

    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"]:
        link = f"{dst}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{t}.parquet", link)
    open(f"{dst}/_DONE", "w").close()
    print(f"built {dst} at {k_copies}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
