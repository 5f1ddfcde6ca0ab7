"""Streaming CMS parity: the micro-batch-incremented counter table must
equal the batch sketch over the same rows (counter updates are associative
— the dual-implementation golden methodology)."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from eth_dspa_2019_spark.plans.sketch import cms_pairs, with_cms_buckets
from eth_dspa_2019_spark.streaming.sketch import cms_sketch_stream
from eth_dspa_2019_spark.streaming.windows import run_to_memory

_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
    ]
)


def _write(watch: str, name: str, rows: list[tuple[str, int]], mtime: float):
    path = os.path.join(watch, name)
    with open(path, "w") as f:
        for ts, uid in rows:
            f.write(json.dumps({"ts": ts, "user_id": uid}) + "\n")
    os.utime(path, (mtime, mtime))


def test_streaming_cms_equals_batch_sketch(spark, tmp_path):
    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    now = time.time()
    rows0 = [(f"2019-05-01T10:{m:02d}:00", uid) for m, uid in
             [(0, 1), (1, 2), (2, 1), (3, 3), (4, 1)]]
    rows1 = [(f"2019-05-01T11:{m:02d}:00", uid) for m, uid in
             [(0, 2), (1, 4), (2, 1), (3, 2)]]
    _write(watch, "b0.json", rows0, now - 300)
    _write(watch, "b1.json", rows1, now - 240)
    # two files → two micro-batches under AvailableNow (maxFilesPerTrigger)
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(watch)
    )
    got = run_to_memory(
        cms_sketch_stream(stream),
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_mode="complete",
    )
    batch = spark.createDataFrame(
        [(uid,) for _, uid in rows0 + rows1], "user_id long"
    )
    want = (
        cms_pairs(with_cms_buckets(batch))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    got_rows = {(r.r, r.bucket): r.cnt for r in got.collect()}
    want_rows = {(r.r, r.bucket): r.cnt for r in want.collect()}
    assert got_rows == want_rows
    # bounded state: the sketch never exceeds D x W rows
    from eth_dspa_2019_spark.plans.sketch import CMS_D, CMS_W

    assert len(got_rows) <= CMS_D * CMS_W


def test_streaming_hll_registers_equal_batch(spark, tmp_path):
    """Micro-batch-folded HLL registers must equal the batch partials —
    max is associative across any batch split."""
    from eth_dspa_2019_spark.streaming.sketch import hll_register_stream

    watch = str(tmp_path / "hwatch")
    os.makedirs(watch)
    now = time.time()
    rows0 = [("2019-05-01T10:05:00", uid) for uid in [1, 2, 3, 1]]
    rows1 = [("2019-05-01T10:40:00", 2), ("2019-05-01T11:10:00", 9)]
    _write(watch, "b0.json", rows0, now - 300)
    _write(watch, "b1.json", rows1, now - 240)
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(watch)
    )
    got = run_to_memory(
        hll_register_stream(stream),
        checkpoint_dir=str(tmp_path / "hckpt"),
        output_mode="complete",
    )
    from datetime import datetime

    batch = spark.createDataFrame(
        [
            (datetime.fromisoformat(ts), uid)
            for ts, uid in rows0 + rows1
        ],
        _SCHEMA,
    )
    # the same function body runs in batch mode on a batch frame
    want = hll_register_stream(batch)
    got_rows = {(r.hour, r.reg): r.max_rho for r in got.collect()}
    want_rows = {(r.hour, r.reg): r.max_rho for r in want.collect()}
    assert got_rows == want_rows and got_rows


def test_streaming_bloom_bits_equal_batch(spark, tmp_path):
    """Streaming Bloom accumulation == the batch build on the same
    members, regardless of micro-batch boundaries (set union is
    associative/monotone), with state bounded at BLOOM_M rows."""
    import json
    import os
    import time

    from pyspark.sql import types as T

    from eth_dspa_2019_spark.plans.sketch import BLOOM_M, bloom_build
    from eth_dspa_2019_spark.streaming import run_to_memory
    from eth_dspa_2019_spark.streaming.sketch import bloom_bits_stream

    schema = T.StructType([T.StructField("user_id", T.LongType())])
    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    now = time.time()
    ids = [3, 17, 42, 99, 256, 1024, 4097, 65536]
    for b, chunk in enumerate([ids[:3], ids[3:6], ids[6:]]):
        p = os.path.join(watch, f"b{b}.json")
        with open(p, "w") as f:
            for u in chunk:
                f.write(json.dumps({"user_id": u}) + "\n")
        os.utime(p, (now - 300 + b, now - 300 + b))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(watch)
    )
    got = run_to_memory(
        bloom_bits_stream(stream), str(tmp_path / "ck"), "complete"
    )
    batch = bloom_build(
        spark.createDataFrame([(u,) for u in ids], schema), "user_id"
    )
    s_rows = sorted(r["pos"] for r in got.collect())
    b_rows = sorted(r["pos"] for r in batch.collect())
    assert s_rows == b_rows
    assert len(s_rows) <= BLOOM_M


def test_streaming_quantile_histogram_equals_batch(spark, tmp_path):
    """The micro-batch-folded histogram must equal the batch sketch over
    the same rows (fixed domain), and the quantiles extracted from it
    must equal the batch extraction — merge-by-addition is the whole
    point of the fixed-bin design."""
    import os as _os
    import time as _time

    from eth_dspa_2019_spark.plans.sketch import (
        quantile_sketch_histogram,
        quantiles_from_histogram,
    )
    from eth_dspa_2019_spark.streaming.sketch import quantile_histogram_stream

    watch = str(tmp_path / "watch")
    _os.makedirs(watch)
    now = _time.time()
    vals0 = [(i * 37) % 500 for i in range(40)]
    vals1 = [(i * 91 + 13) % 500 for i in range(35)]
    schema = T.StructType([T.StructField("v", T.LongType())])
    for name, vals, age in (("b0.json", vals0, 300), ("b1.json", vals1, 240)):
        p = _os.path.join(watch, name)
        with open(p, "w") as f:
            for v in vals:
                f.write(json.dumps({"v": v}) + "\n")
        _os.utime(p, (now - age, now - age))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(watch)
    )
    got = run_to_memory(
        quantile_histogram_stream(stream, vmin=0, vrange=500),
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_mode="complete",
    )
    batch = spark.createDataFrame([(v,) for v in vals0 + vals1], "v long")
    want = quantile_sketch_histogram(batch, vmin=0, vrange=500)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # quantiles extracted from the streamed state == batch extraction
    n = len(vals0) + len(vals1)
    qs = sorted(
        map(tuple, quantiles_from_histogram(got, n, 0, 500).collect())
    )
    qb = sorted(
        map(tuple, quantiles_from_histogram(want, n, 0, 500).collect())
    )
    assert qs == qb and len(qs) == 3


def test_streaming_grouped_quantile_histogram_equals_batch(spark, tmp_path):
    """The grouped sketch's per-(g, bin) counters are associative, so the
    streamed fold over any file split equals the batch histogram over
    fixed per-group domains."""
    import os

    from pyspark.sql import functions as F

    from eth_dspa_2019_spark.plans.sketch import grouped_quantile_histogram
    from eth_dspa_2019_spark.streaming.sketch import (
        grouped_quantile_histogram_stream,
    )
    from eth_dspa_2019_spark.streaming.windows import run_to_memory

    rows = [
        (("a" if i % 3 else "b"), (i * 37) % 400) for i in range(600)
    ]
    batch = spark.createDataFrame(rows, "g string, v long")
    domains = spark.createDataFrame(
        [("a", 0, 500), ("b", 0, 500)], "g string, vmin long, r long"
    )
    src = tmp_path / "vals"
    for j in range(3):
        batch.filter(F.col("v") % 3 == j).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"part{j}"))
    stream = (
        spark.readStream.schema("g string, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part*")
    )
    got = run_to_memory(
        grouped_quantile_histogram_stream(stream, domains),
        str(tmp_path / "ck"),
        "complete",
    )
    want = grouped_quantile_histogram(batch, domains)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
