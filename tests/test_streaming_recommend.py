"""Streaming Task 2 == batch: the resolved stream's closed 4h/1h windows,
folded into similarities + top-5 per window, must equal the oracle-checked
batch `task2_recommendations` for every window the watermark closed."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_dspa_2019_spark.io.readers import load_table
from eth_dspa_2019_spark.operators.recommend import (
    candidate_grid,
    static_similarity,
    synth_friend_edges,
    synth_person_attrs,
)
from eth_dspa_2019_spark.plans.registry import all_queries
from eth_dspa_2019_spark.plans.social import _resolved
from eth_dspa_2019_spark.streaming.recommend import recommend_stream


def test_streaming_task2_equals_batch_prefix(spark, sf_dir, tmp_path):
    # stage the resolved activity stream as a parquet landing dir
    resolved = _resolved(spark, sf_dir).select(
        "kind", "id", "person_id", "ts_ms", "post_id"
    )
    rdir = str(tmp_path / "resolved")
    resolved.repartition(3).write.mode("overwrite").parquet(rdir)

    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    num_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    friends = synth_friend_edges(users, num_users)
    static = static_similarity(
        candidate_grid(users, friends), synth_person_attrs(users)
    )

    rec = recommend_stream(
        spark,
        rdir,
        resolved.schema,
        static,
        friends,
        str(tmp_path / "ck"),
    )
    got = rec.recs
    batch = all_queries()["task2_recommendations"].spark(spark, sf_dir)
    cols = ["window_end", "eigen_id", "rank", "rec_user_id", "score"]
    got_rows = set(map(tuple, got.select(*cols).collect()))
    batch_rows = set(map(tuple, batch.select(*cols).collect()))
    assert got_rows and got_rows <= batch_rows
    # complete for every window at or before the last closed one
    max_closed = max(r[0] for r in got_rows)
    missing = {r for r in batch_rows - got_rows if r[0] <= max_closed}
    assert not missing
