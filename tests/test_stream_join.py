"""Stream-stream watermarked interval join (J6 streaming form) equals the
batch join over the same data — with join state bounded by the watermark +
time-range condition, not by stream history."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_dspa_2019_spark.schemas import KIND_LIKE, KIND_POST
from eth_dspa_2019_spark.sources.activity import load_activities
from eth_dspa_2019_spark.streaming import run_to_memory
from eth_dspa_2019_spark.streaming.joins import valid_likes_join_stream


def test_stream_stream_like_post_join_equals_batch(spark, sf_dir, tmp_path):
    acts = load_activities(spark, sf_dir)
    likes_b = acts.filter(F.col("kind") == KIND_LIKE).select(
        "person_id", "post_id", "ts_ms"
    )
    posts_b = acts.filter(F.col("kind") == KIND_POST).select("id", "ts_ms")
    ldir, pdir = str(tmp_path / "likes"), str(tmp_path / "posts")
    # one file per side = one trigger per side: the tape must present
    # BOUNDED disorder to the 30-min watermark. load_activities now
    # parses session-parallel (32 hash-distributed partitions), so a bare
    # write would produce 32 files each spanning the full time range —
    # every trigger after the first would replay the whole range and the
    # watermark would (correctly) drop it. Late-drop semantics have their
    # own test (test_late_data); this one checks join == batch on an
    # in-contract feed.
    likes_b.coalesce(1).write.mode("overwrite").parquet(ldir)
    posts_b.coalesce(1).write.mode("overwrite").parquet(pdir)

    likes_s = spark.readStream.schema(likes_b.schema).option(
        "maxFilesPerTrigger", 2
    ).parquet(ldir)
    posts_s = spark.readStream.schema(posts_b.schema).option(
        "maxFilesPerTrigger", 2
    ).parquet(pdir)
    got = run_to_memory(
        valid_likes_join_stream(likes_s, posts_s),
        str(tmp_path / "ck"),
        "append",
    )

    expected = (
        likes_b.alias("l")
        .join(
            posts_b.alias("p"),
            (F.col("l.post_id") == F.col("p.id"))
            & (F.col("l.ts_ms") > F.col("p.ts_ms"))
            & (F.col("l.ts_ms") <= F.col("p.ts_ms") + 24 * 3_600_000),
        )
        .select(
            "l.person_id",
            "l.post_id",
            F.col("l.ts_ms").alias("ts_ms"),
            F.col("p.ts_ms").alias("post_ts_ms"),
        )
    )
    assert expected.count() > 0
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )
