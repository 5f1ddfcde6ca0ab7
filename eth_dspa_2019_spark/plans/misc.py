"""Registered queries covering the remaining scalar/set/top-k operator
surface: regex + bit-flag decode (F11/S9), min–max normalization (F8),
modulo sharding (F9), running averages (A11), set intersection (U3),
sorted thread assembly (T3), and the scalable distinct-user variants
(two-stage exact + HLL approx) promised next to ``unique_users_12h_1h``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import o_h64
from ..io.readers import load_table
from ..operators.resolve import resolved_activities
from ..sources.activity import load_activities
from .registry import register
from .social import _O_BASE, _O_RESOLVE, _O_RESOLVED


@register(
    "event_flag_decode",
    oracle="""
    SELECT event_id,
           cast(regexp_extract(props, '(\\d+)', 1) AS bigint) AS k,
           cast(regexp_extract(props, '(\\d+)', 1) AS bigint) & 1 AS is_minor,
           (cast(regexp_extract(props, '(\\d+)', 1) AS bigint) >> 1) & 1 AS is_new,
           (cast(regexp_extract(props, '(\\d+)', 1) AS bigint) >> 2) & 1 AS is_bot,
           (cast(regexp_extract(props, '(\\d+)', 1) AS bigint) >> 3) & 7 AS priority
    FROM events
    """,
)
def event_flag_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11/S9: regexp field extraction + bit-flag decode — the wiki-edit
    Kafka deserializer's flag parsing
    (`session-4-kafka/.../FlinkKafkaConsumer.java:108-128`)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.regexp_extract("props", r"(\d+)", 1).cast("bigint")
    return ev.select(
        "event_id",
        k.alias("k"),
        k.bitwiseAND(1).alias("is_minor"),
        F.shiftright(k, 1).bitwiseAND(1).alias("is_new"),
        F.shiftright(k, 2).bitwiseAND(1).alias("is_bot"),
        F.shiftright(k, 3).bitwiseAND(7).alias("priority"),
    )


@register(
    "minmax_normalized_values",
    oracle="""
    WITH r AS (
      SELECT event_type, min(value) AS vmin, max(value) AS vmax
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type,
           CASE WHEN r.vmax > r.vmin
                THEN (e.value - r.vmin) / (r.vmax - r.vmin)
                ELSE 1.0 END AS norm_value
    FROM events e JOIN r USING (event_type)
    """,
)
def minmax_normalized_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: min–max normalization with the degenerate-span→1.0 rule
    (`FriendRecommender.java:383-391`), as a grouped-range join — the
    ranges are a tiny broadcast, the fact scan is untouched."""
    ev = load_table(spark, sf_dir, "events")
    r = ev.groupBy("event_type").agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    return ev.join(F.broadcast(r), "event_type").select(
        "event_id",
        "event_type",
        F.when(
            F.col("vmax") > F.col("vmin"),
            (F.col("value") - F.col("vmin")) / (F.col("vmax") - F.col("vmin")),
        )
        .otherwise(F.lit(1.0))
        .alias("norm_value"),
    )


@register(
    "user_shards",
    oracle="""
    SELECT user_id % 8 AS shard, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
    """,
)
def user_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: modulo sharding (`AnomalousUserDetector.java:270`) — `%` (not
    pmod) to match DuckDB's truncated modulo on the oracle side."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy((F.col("user_id") % 8).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "running_user_avg",
    oracle="""
    SELECT event_id, user_id,
           cast(sum(cast(value AS decimal(38,6)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS double)
             / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS running_avg
    FROM events
    """,
)
def running_user_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: per-key running average — the session-5 custom unary operator
    (`session-5-custom-operators/average/src/main.rs:15-34`) as a running
    window frame; the partial+final design its submission describes is
    Spark's built-in partial aggregation."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("running_avg"),
    )


@register(
    "users_purchase_and_error",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def users_purchase_and_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: set intersection (`FriendRecommender.java:190` retainAll) — as
    a left-semi join of the two distinct key sets."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


@register(
    "post_thread_children",
    oracle=f"""
    WITH RECURSIVE {_O_BASE}, {_O_RESOLVE}, {_O_RESOLVED}
    SELECT post_id,
           string_agg(cast(id AS varchar), ',' ORDER BY ts_ms, id) AS thread,
           count(*) AS n_children
    FROM resolved
    WHERE kind IN ('comment', 'reply')
    GROUP BY post_id
    """,
)
def post_thread_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: a post's activity thread, children time-ordered
    (`BatchPostIdResolver.java:46-52`) — sort_array over collected
    (ts, id) structs, no global sort."""
    from .social import _resolved

    acts = _resolved(spark, sf_dir)
    kids = acts.filter(F.col("kind").isin("comment", "reply"))
    return (
        kids.groupBy("post_id")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("ts_ms", "id"))
                    ),
                    lambda s: s["id"].cast("string"),
                ),
            ).alias("thread"),
            F.count(F.lit(1)).alias("n_children"),
        )
    )


@register(
    "unique_users_two_stage",
    oracle="""
    WITH dedup AS (
      SELECT DISTINCT cast(floor(epoch(ts) / 3600) * 3600 AS bigint) AS h,
             user_id
      FROM events
    )
    SELECT cast(h - i * 3600 AS bigint) AS window_start,
           count(DISTINCT user_id) AS n_users
    FROM dedup, range(0, 12) t(i)
    GROUP BY 1
    """,
)
def unique_users_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 scale path (exact): dedupe (hour-bucket, user) FIRST — a
    map-side-combinable distinct that shrinks the stream to ≤ users/hour —
    then sliding-window countDistinct over the deduped pairs. Replicates
    12× only the deduped rows instead of every event
    (vs `unique_users_12h_1h`, whose docstring promised this variant)."""
    ev = load_table(spark, sf_dir, "events")
    dedup = ev.select(
        (F.floor(F.col("ts").cast("double") / 3600) * 3600)
        .cast("long")
        .alias("h"),
        "user_id",
    ).distinct()
    return (
        dedup.groupBy(
            F.window(F.timestamp_seconds("h"), "12 hours", "1 hour").alias("w")
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            F.col("w.start").cast("long").alias("window_start"), "n_users"
        )
    )


@register(
    "tumbling_counts_10s",
    oracle="""
    SELECT cast(floor(epoch(ts) / 10) * 10 AS bigint) AS window_start,
           user_id, count(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_counts_10s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: 10-second keyed tumbling counts — the session-1/4 wiki-edit
    window (`session-1-flink/.../WikipediaAnalysisWindowed.java:78-87`)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 seconds").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "user_id",
            "n_events",
        )
    )


@register(
    "word_counts",
    oracle="""
    SELECT w AS word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY 1
    """,
)
def word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/A10: the canonical flatMap + hash-routed fold — Timely's word
    count (`session-2-timely/timely-playground/src/wc.rs:30-43`) as
    explode + groupBy (partial aggregation does the per-worker fold)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "events_asof_last_purchase",
    oracle="""
    SELECT l.event_id, l.user_id,
           cast(floor(epoch(l.ts)) AS bigint) AS ts_s,
           cast(floor(epoch(r.ts)) AS bigint) AS purchase_ts_s,
           r.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type <> 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def events_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every non-purchase event enriched with the user's most
    recent prior purchase (operators/asof.py union–window plan — one
    key-partitioned sort, no range-join blowup). Oracle: DuckDB's native
    ASOF LEFT JOIN."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["ts", "value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_s"),
        F.col("ts_asof").cast("long").alias("purchase_ts_s"),
        F.col("value_asof").alias("purchase_value"),
    )


@register(
    "value_percentiles_exact",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           max(CASE WHEN rn = 1 + (n - 1) // 2 THEN value END) AS p50,
           max(CASE WHEN rn = 1 + ((n - 1) * 9) // 10 THEN value END) AS p90,
           max(CASE WHEN rn = 1 + ((n - 1) * 99) // 100 THEN value END) AS p99
    FROM ranked
    GROUP BY event_type
    """,
)
def value_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rank-based percentiles per key (p50/p90/p99 as the value at
    row index 1+⌊p·(n−1)⌋ of the (value, id) order) — integer indexing
    instead of interpolation, so both engines pick the same physical row.
    One window pass + one aggregate; at scale this is the sort-based exact
    path next to `approx_percentile` sketches."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )

    def pick(num: int, den: int):
        idx = 1 + ((F.col("n") - 1) * num) / den
        return F.max(F.when(F.col("rn") == F.floor(idx), F.col("value")))

    return ranked.groupBy("event_type").agg(
        pick(1, 2).alias("p50"), pick(9, 10).alias("p90"), pick(99, 100).alias("p99")
    )


@register(
    "event_rollup",
    oracle="""
    SELECT coalesce(event_type, '<all>') AS event_type,
           coalesce(cast(user_id % 8 AS varchar), '<all>') AS shard,
           count(*) AS n
    FROM events
    GROUP BY ROLLUP (event_type, user_id % 8)
    """,
)
def event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP totals (type → type×shard → grand total) — the
    multi-level aggregation surface the reference lacks and Spark provides
    natively (SURVEY §2.4 note); one Expand-based pass, no re-scans."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.rollup("event_type", (F.col("user_id") % 8).cast("string").alias("shard"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce("shard", F.lit("<all>")).alias("shard"),
            "n",
        )
    )


@register(
    "global_time_order_sample",
    oracle="""
    SELECT rn, event_id
    FROM (SELECT event_id,
                 row_number() OVER (ORDER BY ts, event_id) AS rn
          FROM events)
    WHERE rn % 997 = 0
    """,
)
def global_time_order_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: global timestamp sort (the producer's TreeMap merge,
    `SN/Producer.java:21-46`) verified positionally — every 997th rank of
    the total (ts, id) order, computed with the two-stage range-prefix
    rank (`operators/prefix.py`: range partition → partition-count offset
    metadata → parallel per-partition row_number) so no single-partition
    window appears in the plan. The sampled output keeps the hash compare
    order-insensitive yet order-sensitive to the sort itself."""
    from ..operators.prefix import global_index

    ev = load_table(spark, sf_dir, "events")
    ranked = global_index(ev.select("event_id", "ts"), ["ts", "event_id"])
    return ranked.filter(F.col("rn") % 997 == 0).select("rn", "event_id")


@register(
    "salted_event_counts",
    oracle="""
    SELECT event_type, count(*) AS n FROM events GROUP BY 1
    """,
)
def salted_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted two-stage count on a deliberately hot key (5 event
    types over all rows): shard each key across 16 salts, merge partials —
    identical result to a direct groupBy, but no single reducer ever sees
    a whole hot key (operators/skew.py; the reference's broadcast +
    mod-shard trick restructured, `AnomalousUserDetector.java:66,270`)."""
    from ..operators.skew import salted_count

    ev = load_table(spark, sf_dir, "events")
    return salted_count(ev, ["event_type"], n_salt=16)


# --- Deterministic HyperLogLog (cross-engine verifiable) --------------------
# Spark's built-in approx_count_distinct is engine-specific (its HLL++ bias
# tables aren't mirrorable in SQL), which left this query with no oracle and
# no correctness signal. Instead the sketch itself is implemented from its
# public definition (Flajolet et al. 2007) over the shared md5-derived h64
# hash, with INTEGER-exact register math so Spark and DuckDB agree bit for
# bit: register = h mod m; rho = leading-zero rank of the remaining 50 bits
# (a generated 50-branch CASE — no float log2); the harmonic sum is kept in
# fixed point as sum(2^(51 - max_rho)), an exact bigint, and the raw-HLL
# estimate divides a shared double constant by it exactly once.

HLL_M = 1024  # registers (p=10); std error 1.04/sqrt(m) ~ 3.25%
_HLL_W_BITS = 50  # h64 yields 60 bits; 10 index the register
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
# alpha * m^2 * 2^51 * 1000: one double literal shared by both engines
# (repr round-trips, so both parse the identical IEEE value).
HLL_C_MILLI = _HLL_ALPHA * HLL_M * HLL_M * float(1 << 51) * 1000.0


def _hll_rho_spark(w):
    """rho = 51 - bit_length(w) for the 50-bit rest. bit_length comes from
    ``length(bin(w))`` — both engines print the unpadded binary string, so
    the lengths (and thus rho) are identical by construction, and one
    string call replaces the former 50-branch comparison CASE (which made
    the sketch ~4× slower than the exact twin at sf0.1)."""
    return F.when(w == 0, _HLL_W_BITS + 1).otherwise(
        F.lit(_HLL_W_BITS + 1) - F.length(F.bin(w))
    )


_HLL_RHO_SQL = (
    f"CASE WHEN w = 0 THEN {_HLL_W_BITS + 1} "
    f"ELSE {_HLL_W_BITS + 1} - length(bin(w)) END"
)


@register(
    "unique_users_approx",
    oracle=f"""
    WITH h AS (
      SELECT cast(floor(epoch(ts)/3600)*3600 - i*3600 AS bigint)
               AS window_start,
             {o_h64('cast(user_id AS varchar)')} AS h
      FROM events, range(0, 12) t(i)
    ),
    split AS (
      SELECT window_start, h % {HLL_M} AS reg, h // {HLL_M} AS w FROM h
    ),
    regs AS (
      SELECT window_start, reg, max({_HLL_RHO_SQL}) AS max_rho
      FROM split GROUP BY 1, 2
    ),
    z AS (
      SELECT window_start,
             cast(count(*) AS bigint) AS n_regs,
             cast(sum(1::BIGINT << (51 - max_rho))
                  + ({HLL_M} - count(*)) * {1 << 51} AS bigint) AS z_fx
      FROM regs GROUP BY 1
    )
    SELECT window_start, n_regs, z_fx,
           cast(floor({HLL_C_MILLI!r} / cast(z_fx AS double)) AS bigint)
             AS est_milli
    FROM z
    """,
)
def unique_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 approx scale path: deterministic HyperLogLog per 12h/1h sliding
    window (the bounded-memory form of the reference's per-window
    Set-union unique-user counts,
    `SN/task/activepost/ActivePostStatistician.java:92-96`).

    Output is the exact sketch state per window — non-empty register count
    ``n_regs``, fixed-point harmonic sum ``z_fx`` = Σ 2^(51−M_j) (a bigint,
    order-independent) — plus the raw-HLL estimate in thousandths
    (``est_milli``; small/large-range corrections are post-processing over
    (n_regs, z_fx) and engine-local, see ``hll_estimate`` in
    tests/test_operators.py for the corrected form and its error-bound
    test vs the exact twin `unique_users_12h_1h`).

    Scale shape: state is min(users, {HLL_M}) registers per window no
    matter the cardinality — partial aggregation merges registers map-side
    (max is associative), so the shuffle carries at most m rows per
    (window, partition) where the exact variant carries every distinct
    user. Registers are built TWO-STAGE (the A4 dedup-before-Expand
    discipline): per-1h-bucket (reg, max_rho) partials first on the raw
    stream, then the 12× sliding Expand runs over the partials and a
    second max merges them — so the md5/rho work happens once per event,
    never 12× inside the Expand, and the Expand's input is already
    register-collapsed. The h-split/rho/shift math is integer-only,
    bit-identical in DuckDB.
    """
    from ..functions.hashing import h64

    ev = load_table(spark, sf_dir, "events")
    h = h64(F.col("user_id").cast("string"))
    split = ev.select(
        (F.floor(F.col("ts").cast("long") / 3600) * 3600).alias("hour"),
        (h % HLL_M).alias("reg"),
        h.alias("h"),
    ).select(
        "hour",
        "reg",
        _hll_rho_spark(F.expr(f"h div {HLL_M}")).alias("rho"),
    )
    hour_regs = split.groupBy("hour", "reg").agg(F.max("rho").alias("rho"))
    regs = (
        hour_regs.select(
            F.explode(
                F.array(
                    *[F.col("hour") - F.lit(i * 3600) for i in range(12)]
                )
            ).alias("window_start"),
            "reg",
            "rho",
        )
        .groupBy("window_start", "reg")
        .agg(F.max("rho").alias("max_rho"))
    )
    z = regs.groupBy("window_start").agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(
            F.expr("shiftleft(cast(1 AS bigint), cast(51 - max_rho AS int))")
        ).alias("s"),
    )
    return z.select(
        "window_start",
        "n_regs",
        (
            F.col("s") + (F.lit(HLL_M) - F.col("n_regs")) * F.lit(1 << 51)
        ).cast("bigint").alias("z_fx"),
        F.floor(F.lit(HLL_C_MILLI) / F.col("z_fx").cast("double"))
        .cast("bigint")
        .alias("est_milli"),
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "event_type_pivot",
    oracle=f"""
    SELECT cast(user_id % 16 AS bigint) AS shard,
           {", ".join(
             f"cast(count(*) FILTER (event_type = '{t}') AS bigint)"
             f" AS n_{t}" for t in _EVENT_TYPES)},
           {", ".join(
             f"cast(sum(cast(value AS decimal(38,6)))"
             f"     FILTER (event_type = '{t}') AS double)"
             f" AS v_{t}" for t in _EVENT_TYPES)}
    FROM events
    GROUP BY 1
    """,
)
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT surface: per-shard counts AND value sums spread into one
    column pair per event type — the wide report shape every BI layer
    asks for. Expressed as conditional aggregation (count/sum FILTER),
    which is exactly what Spark compiles `.pivot()` into when the pivot
    values are known; listing them (`_EVENT_TYPES`) skips the extra
    distinct-scan `.pivot(col)` would run and keeps the oracle mirror
    trivial. One map-side-combined groupBy — pivot width is a constant,
    shuffle carries one row per shard."""
    from ..functions.numeric import dsum

    ev = load_table(spark, sf_dir, "events")
    aggs = []
    for t in _EVENT_TYPES:
        aggs.append(
            F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
        )
    for t in _EVENT_TYPES:
        aggs.append(
            dsum(F.when(F.col("event_type") == t, F.col("value"))).alias(
                f"v_{t}"
            )
        )
    return ev.groupBy(
        (F.col("user_id") % 16).alias("shard")
    ).agg(*aggs)


@register(
    "moving_value_avg_1h_range",
    oracle="""
    SELECT event_id, user_id, ts_s,
           cast(count(*) OVER w AS bigint) AS n_1h,
           cast(sum(cast(value AS decimal(38,6))) OVER w AS double)
             / count(*) OVER w AS avg_1h
    FROM (SELECT event_id, user_id,
                 cast(floor(epoch(ts)) AS bigint) AS ts_s, value
          FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def moving_value_avg_1h_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE window frame: each event's trailing-1h per-user
    moving average — `RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW` over
    epoch seconds, the time-based frame the ROWS-frame running aggs
    (`running_user_avg`) can't express (a frame of "the last hour"
    contains however many events fall there, ties included, so the result
    is order-independent within equal timestamps by construction).

    Scale shape: one exchange on user_id; frames are evaluated with a
    sliding two-pointer pass inside each partition — no per-frame rescan;
    the decimal-sum discipline keeps the double averages bit-identical
    across engines."""
    from ..functions.numeric import _DEC

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_s"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-3600, 0)
    )
    return base.select(
        "event_id",
        "user_id",
        "ts_s",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        (
            F.sum(F.col("value").cast(_DEC)).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("avg_1h"),
    )


@register(
    "events_props_json",
    oracle="""
    WITH j AS (
      SELECT event_type,
             CASE WHEN json_valid(props)
                  THEN cast(json_extract(props, '$.k') AS bigint) END AS k
      FROM events
      WHERE props IS NOT NULL
    )
    SELECT event_type,
           count(*) AS n,
           cast(sum(k) AS bigint) AS sum_k,
           cast(min(k) AS bigint) AS min_k,
           cast(max(k) AS bigint) AS max_k,
           count(DISTINCT k) AS distinct_k
    FROM j
    GROUP BY 1
    """,
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the JSON `props` payload with a
    declared schema (`from_json`, not regex) and aggregate the typed field
    — the schema-on-read path every event pipeline needs for property
    bags (the reference carries its payloads pre-parsed; Spark reads them
    as data, SURVEY §1.1).

    Scale shape: `from_json` is a codegen'd JVM projection (Jackson per
    partition, no Python); extraction fuses into the scan stage so only
    the typed bigint reaches the one-shuffle grouped aggregate. A real
    deployment would also push `props IS NOT NULL` to the parquet scan —
    visible here as PushedFilters."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("k", LongType())])
    ev = load_table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    j = ev.select(
        "event_type", F.from_json("props", schema).getField("k").alias("k")
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").cast("bigint").alias("min_k"),
        F.max("k").cast("bigint").alias("max_k"),
        F.countDistinct("k").alias("distinct_k"),
    )


@register(
    "event_cube",
    oracle="""
    SELECT coalesce(event_type, '<all>') AS event_type,
           coalesce(cast(hour(ts) AS varchar), '<all>') AS hour_of_day,
           count(*) AS n,
           cast(sum(cast(value AS decimal(38,6))) AS double) AS sum_value
    FROM events
    GROUP BY CUBE (event_type, hour(ts))
    """,
)
def event_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE totals over (event_type, hour-of-day): all four grouping sets
    (both, each alone, grand total) in ONE Expand-based pass — the
    completion of the multi-level aggregation surface next to
    `event_rollup` (ROLLUP emits only the 3 hierarchical sets). At scale
    the Expand multiplies rows 4×, but only after map-side partial
    aggregation keys them down."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.cube(
            "event_type", F.hour("ts").cast("string").alias("hour_of_day")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce("hour_of_day", F.lit("<all>")).alias("hour_of_day"),
            "n",
            "sum_value",
        )
    )


@register(
    "customer_balance_quartiles",
    oracle="""
    WITH q AS (
      SELECT c_nationkey,
             cast(ntile(4) OVER (PARTITION BY c_nationkey
                                 ORDER BY c_acctbal DESC, c_custkey)
                  AS bigint) AS quartile,
             c_acctbal
      FROM customer
    )
    SELECT c_nationkey, quartile,
           count(*) AS n_custs,
           cast(sum(cast(c_acctbal AS decimal(38,6))) AS double) AS total_bal
    FROM q GROUP BY 1, 2
    """,
)
def customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency bucketing: per-nation balance quartiles via
    `ntile` — the rank-bucket window the relational family lacked.
    Deterministic because the order is fully tie-broken (balance, then
    key): both engines assign identical bucket boundaries.

    Scale shape: the window partitions by nation (never an unkeyed global
    ntile — that is one reducer); per-partition sort is nation-sized. For
    a skewed bucketing key, the histogram-offset plan
    (`quality_quantile_filter`) is the escape hatch."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    q = c.select(
        "c_nationkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        "c_acctbal",
    )
    return q.groupBy("c_nationkey", "quartile").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.sum(F.col("c_acctbal").cast("decimal(38,6)"))
        .cast("double")
        .alias("total_bal"),
    )


@register(
    "user_event_gaps",
    oracle="""
    WITH g AS (
      SELECT user_id,
             cast(floor(epoch(ts)) AS bigint)
               - lag(cast(floor(epoch(ts)) AS bigint))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS gap_s
      FROM events
    )
    SELECT user_id,
           count(gap_s) AS n_gaps,
           cast(max(gap_s) AS bigint) AS max_gap_s,
           cast(sum(gap_s) AS bigint) AS total_gap_s,
           cast(floor(1000000.0 * sum(gap_s) / count(gap_s)) AS bigint)
             AS avg_gap_fx
    FROM g
    WHERE gap_s IS NOT NULL
    GROUP BY 1
    """,
)
def user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap profile per user via `lag` — the consecutive-row
    window surface (the reference's last-three-timestamps ring,
    `AnomalousUserDetector.java:209-246`, generalized to full gap
    statistics). Gaps are integer epoch-seconds; the mean is an exact
    integer-ratio floor, so both engines agree bit-for-bit.

    Scale shape: user-partitioned window (per-key sort, never global),
    then one grouped aggregate reusing the same user partitioning."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("long")
    g = ev.select(
        "user_id", (sec - F.lag(sec).over(w)).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.max("gap_s").cast("bigint").alias("max_gap_s"),
        F.sum("gap_s").cast("bigint").alias("total_gap_s"),
        F.floor(1000000.0 * F.sum("gap_s") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("avg_gap_fx"),
    )


@register(
    "user_days_view_not_purchase",
    oracle="""
    SELECT user_id,
           cast(strftime(cast(ts AS date), '%Y-%m-%d') AS varchar) AS day
    FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id,
           cast(strftime(cast(ts AS date), '%Y-%m-%d') AS varchar) AS day
    FROM events WHERE event_type = 'purchase'
    """,
)
def user_days_view_not_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 as an explicit EXCEPT on a composite key: the (user, day) pairs
    with browsing but no purchase — window-shopping days. Spark plans set
    difference as distinct + left-anti — one shuffle per side on the
    composite key, no row products."""
    ev = load_table(spark, sf_dir, "events")

    def key(t: str) -> DataFrame:
        return ev.filter(F.col("event_type") == t).select(
            "user_id", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
        )

    return key("view").subtract(key("purchase"))
