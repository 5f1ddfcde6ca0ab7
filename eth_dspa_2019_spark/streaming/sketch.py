"""Streaming count-min sketch: the D×W counter table maintained as
Structured Streaming state.

The batch query (`plans/sketch.py::event_heavy_hitters_cms`) is the
oracle-checked spec; the streaming form aggregates the same (row, bucket)
update stream under ``groupBy(r, bucket).count()`` — counter updates are
associative, so micro-batch increments and batch totals converge to the
identical sketch (equality-tested in ``tests/test_streaming_sketch.py``).
This is the canonical bounded-state streaming aggregation: state is
EXACTLY D·W rows forever, independent of stream length and key
cardinality — where the reference's per-post counter state
(`SN/task/activepost/ActivePostStatistician.java:71-96`) grows with the
key domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_sketch_stream(events: DataFrame) -> DataFrame:
    """(r, bucket, cnt) running counter table over a streaming events
    frame with a ``user_id`` column. Complete-output mode emits the whole
    (tiny, bounded) sketch each trigger; the estimate join for a candidate
    set is a batch-side broadcast against this table."""
    from ..plans.sketch import cms_pairs, with_cms_buckets

    return (
        cms_pairs(with_cms_buckets(events))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hll_register_stream(events: DataFrame) -> DataFrame:
    """Streaming HyperLogLog state: per-(hour, register) running max-rho —
    the first stage of the batch sketch (`plans/misc.py::
    unique_users_approx`) as streaming state. max is associative, so the
    micro-batch-folded registers equal the batch partials exactly; the
    12× sliding-window merge and the estimate are cheap batch-side
    post-processing over this (bounded: hours × m rows) table."""
    from ..functions.hashing import h64
    from ..plans.misc import HLL_M, _hll_rho_spark

    h = h64(F.col("user_id").cast("string"))
    split = events.select(
        (F.floor(F.col("ts").cast("long") / 3600) * 3600).alias("hour"),
        (h % HLL_M).alias("reg"),
        h.alias("h"),
    ).select(
        "hour", "reg", _hll_rho_spark(F.expr(f"h div {HLL_M}")).alias("rho")
    )
    return split.groupBy("hour", "reg").agg(F.max("rho").alias("max_rho"))


def bloom_bits_stream(members: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Streaming Bloom filter state: the set-bits relation accumulated
    over a member stream — set-union is associative and monotone, so the
    distinct aggregation over exploded bit positions IS the filter, with
    state bounded at BLOOM_M rows forever (`plans/sketch.py` defines the
    md5-derived positions; the batch build is the golden oracle). In
    complete-output mode every trigger emits the whole (tiny) filter —
    the broadcastable standing screen a downstream probe join consumes."""
    from pyspark.sql.functions import array, col, explode

    from ..plans.sketch import bloom_positions

    pos = bloom_positions(col(key_col))
    return (
        members.select(explode(array(*pos)).alias("pos"))
        .groupBy("pos")
        .count()
        .select("pos")
    )


def quantile_histogram_stream(
    vals: DataFrame, vmin: int, vrange: int
) -> DataFrame:
    """Streaming histogram-quantile sketch state: the (bin, cnt) table of
    `plans/sketch.py::quantile_sketch_histogram` over a FIXED
    [vmin, vmin+vrange) domain (streaming bins must be spec'd up front —
    the batch query derives the domain from the data, a luxury a stream
    doesn't have). Counter increments are associative, so micro-batch
    folds equal the batch histogram exactly; state is bounded at QS_BINS
    rows forever. Quantile extraction
    (`plans/sketch.py::quantiles_from_histogram`) is batch-side
    post-processing over this table at read time."""
    from ..plans.sketch import quantile_sketch_histogram

    return quantile_sketch_histogram(vals, vmin, vrange)


def grouped_quantile_histogram_stream(vals: DataFrame, domains: DataFrame) -> DataFrame:
    """Streaming GROUPED histogram-quantile state: the (g, bin, cnt)
    table of `plans/sketch.py::grouped_quantile_histogram` over FIXED
    per-group domains ``domains`` = (g, vmin, r) — the per-key form of
    `quantile_histogram_stream` (per-tenant latency percentiles online).
    Counter increments are associative per (g, bin), so micro-batch
    folds equal the batch histogram exactly; state is bounded at
    |groups| x QS_BINS rows forever. Quantile extraction stays
    batch-side post-processing at read time."""
    from ..plans.sketch import grouped_quantile_histogram

    return grouped_quantile_histogram(vals, domains)
