"""Corpus-assembly queries: the steps between "curated documents" and
"training batches" — token-budget chunk packing, per-language quality
quantile filtering, and embedding label-centroid outlier distances.

The reference's closest surface is the text-feature extraction of
`SN/task/anomalydetection/AnomalousUserDetector.java:123-131` (per-entity
feature scoring feeding a threshold filter); these queries are the
LLM-pipeline generalization of that shape at the corpus level, same
dual-implementation (Spark plan + generated DuckDB oracle) methodology as
:mod:`eth_dspa_2019_spark.plans.pipeline`.

Scale shapes:

- ``doc_pack_chunks`` is a GLOBAL prefix sum (concat-and-chunk packing is
  order-dependent by definition), so it runs on the two-stage range-prefix
  plan (:mod:`eth_dspa_2019_spark.operators.prefix`) — never a
  single-partition window; the widest window any reducer sees is one range
  partition.
- ``quality_quantile_filter`` windows per language. Language is a
  low-cardinality skewed key (a real corpus is mostly English), so the
  docstring documents the histogram/range-partition escape hatch; the
  quantile itself is exact, not approximate, because dedup/filter decisions
  must be reproducible run-to-run.
- ``embedding_centroid_dist`` never shuffles wide vectors: it explodes to
  the long (id, label, pos, val) layout, partial-aggregates per (label,
  pos) map-side, broadcasts the tiny centroid table back, and reduces
  per-vector with order-independent fixed-point integer sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import o_h64
from ..functions.text import STOPWORDS, quality_score, token_count, tokens
from ..io.readers import load_table
from ..io.stats import table_stats
from ..operators.prefix import global_running_sums
from .registry import register

# ---------------------------------------------------------------------------
# Shared constants (single source of truth for Spark plan + DuckDB oracle)

PACK_BUDGET = 512  # tokens per packed training chunk
KEEP_FRAC = 0.7  # per-language quality quantile to keep
QUANTILE_BUCKETS = 1024  # quantile histogram granularity over score ∈ [0,1]
CENT_FX = int(1e12)  # fixed-point scale for centroid / distance sums


# ---------------------------------------------------------------------------
# Token-budget chunk packing


@register(
    "doc_pack_chunks",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             cast(len(string_split(text, ' ')) AS bigint) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             cast(sum(n_tokens) OVER (ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) - n_tokens
                  AS bigint) AS cum_before
      FROM t
    )
    SELECT doc_id, n_tokens, cum_before,
           cast(cum_before // {PACK_BUDGET} AS bigint) AS chunk_id,
           cast(cum_before % {PACK_BUDGET} AS bigint) AS chunk_off
    FROM c
    """,
)
def doc_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid end-to-end in
    doc_id order and split every {PACK_BUDGET} tokens — each doc learns the
    training chunk its first token lands in and the offset within it (the
    standard pretraining packing layout; a doc straddling a boundary
    continues into the next chunk exactly as the token stream would).

    The running token total is a GLOBAL prefix sum, computed on the
    two-stage range-prefix plan (`operators/prefix.py`): range-partition by
    doc_id, per-partition window, partition-count-sized driver offsets —
    bit-identical to the single-partition window but with no single-reducer
    stage, the only packing plan that survives 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(tokens("text")).alias("n_tokens")
    )
    cum = global_running_sums(docs, ["doc_id"], {"cum": F.col("n_tokens")})
    before = (F.col("cum") - F.col("n_tokens")).alias("cum_before")
    return cum.select("doc_id", "n_tokens", before).select(
        "doc_id",
        "n_tokens",
        "cum_before",
        F.expr(f"cum_before div {PACK_BUDGET}").alias("chunk_id"),
        (F.col("cum_before") % PACK_BUDGET).alias("chunk_off"),
    )


# ---------------------------------------------------------------------------
# Per-language quality quantile filter


def _sql_in_list(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


_O_QS = f"""
    0.5 * least(len(t) / 100.0, 1.0)
    + 0.3 * (len(list_distinct(t)) / len(t))
    + 0.2 * (1.0 - len(list_filter(t, x ->
        list_contains({_sql_in_list(STOPWORDS)}, x))) / len(t))
"""


@register(
    "quality_quantile_filter",
    oracle=f"""
    WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t
                  FROM documents
                  WHERE text IS NOT NULL AND lang IS NOT NULL),
    scored AS (SELECT doc_id, lang, {_O_QS} AS qs FROM toks),
    ranked AS (
      SELECT doc_id, lang, qs,
             cast(row_number() OVER (PARTITION BY lang
                                     ORDER BY qs DESC, doc_id) AS int)
               AS q_rank,
             count(*) OVER (PARTITION BY lang) AS n_lang
      FROM scored
    )
    SELECT doc_id, lang, q_rank, qs AS quality_score
    FROM ranked
    WHERE q_rank <= ceil({KEEP_FRAC} * n_lang)
    """,
)
def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language quality quantile filter: keep the top
    {KEEP_FRAC:.0%} of documents by blended quality score within each
    language — the reproducible form of "filter to the best X% of the
    corpus" (an approximate quantile would make the kept set
    run-dependent). Ties break on doc_id, so the cut is deterministic.

    Scale shape (histogram path): language is a low-cardinality skewed key
    — a plain per-lang window puts all of English in one partition at
    100 TB. Instead: (1) one aggregate builds the per-(lang, score-bucket)
    histogram (langs × {QUANTILE_BUCKETS} rows — metadata-scale, collected
    driver-side like the IVF centroid matrix); (2) the driver turns it
    into per-(lang, bucket) "rows in strictly better buckets" offsets and
    the per-lang keep count; (3) the offsets broadcast-join back and the
    only row_number window partitions by (lang, bucket) — ~n_lang/1024
    rows, never a whole language. Bucketing is monotone in the score, and
    equal scores share a bucket, so offset + within-bucket rank IS the
    exact global per-lang rank; the result is bit-identical to the naive
    window (the oracle) for every KEEP_FRAC. Plan-asserted: every window
    spec partitions by (lang, qb)
    (`tests/test_plans.py::test_quality_quantile_windows_are_bucket_narrow`).
    """
    import math

    docs = load_table(spark, sf_dir, "documents")
    t = tokens("text")
    # NULL-text / NULL-lang docs are excluded by contract (mirrored in the
    # oracle's WHERE): a NULL quality_score would land in a None bucket and
    # break the driver-side histogram sort.
    scored = docs.filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    ).select("doc_id", "lang", quality_score(t).alias("quality_score"))
    bucketed = scored.withColumn(
        "qb",
        F.least(
            F.floor(F.col("quality_score") * QUANTILE_BUCKETS).cast("int"),
            F.lit(QUANTILE_BUCKETS - 1),
        ),
    )
    # Two jobs consume the scored relation (the histogram collect below,
    # then the final ranked filter) — materialize it once. localCheckpoint
    # rather than persist: eager, lineage-cut, and the blocks are freed by
    # the ContextCleaner when the frame goes out of scope instead of
    # leaking a session cache entry per invocation (the r5 "drop leaky
    # persist" review left this lazy, which re-tokenized every doc in the
    # second job — the one bench regression of that round).
    bucketed = bucketed.localCheckpoint(eager=True)
    hist = {
        (r["lang"], r["qb"]): r["n"]
        for r in bucketed.groupBy("lang", "qb")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    langs = {lang for lang, _ in hist}
    offset_rows = []
    for lang in sorted(langs):
        buckets = sorted(
            (qb for lg, qb in hist if lg == lang), reverse=True
        )
        n_lang = sum(hist[(lang, qb)] for qb in buckets)
        keep_n = math.ceil(KEEP_FRAC * n_lang)
        above = 0
        for qb in buckets:  # best bucket first: offset = rows strictly above
            offset_rows.append((lang, qb, above, keep_n))
            above += hist[(lang, qb)]
    offsets = spark.createDataFrame(
        offset_rows, "lang string, qb int, above long, keep_n long"
    )
    w = Window.partitionBy("lang", "qb").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        bucketed.join(F.broadcast(offsets), ["lang", "qb"])
        .withColumn(
            "q_rank",
            (F.col("above") + F.row_number().over(w)).cast("int"),
        )
        .filter(F.col("q_rank") <= F.col("keep_n"))
        .select("doc_id", "lang", "q_rank", "quality_score")
    )


# ---------------------------------------------------------------------------
# Embedding label-centroid distances


@register(
    "embedding_centroid_dist",
    oracle=f"""
    WITH pos AS (
      SELECT vec_id, label,
             unnest(embedding) AS val,
             unnest(range(1, len(embedding) + 1)) AS pos
      FROM embeddings
    ),
    base AS (
      SELECT vec_id, label, pos,
             cast(val AS double) AS v,
             cast(floor(cast(val AS double) * {CENT_FX}) AS bigint) AS qv
      FROM pos
    ),
    cent AS (
      SELECT label, pos,
             cast(sum(qv) AS double) / (count(*) * {CENT_FX}) AS c
      FROM base GROUP BY 1, 2
    )
    SELECT b.vec_id, b.label,
           cast(sum(cast(floor((b.v - c.c) * (b.v - c.c) * {CENT_FX})
                         AS bigint)) AS bigint) AS dist2_fx
    FROM base b JOIN cent c ON b.label = c.label AND b.pos = c.pos
    GROUP BY 1, 2
    """,
)
def embedding_centroid_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector squared L2 distance to its label's centroid — the
    cluster-coherence / outlier signal used to prune mislabeled or
    off-distribution embeddings from a training corpus (each class's worst
    members are its farthest-from-centroid ones).

    Fully relational and cross-engine deterministic: vectors explode to the
    long (label, pos, val) layout; centroids are exact integer sums of
    1e12-fixed-point components (decimal accumulator — no int64 overflow at
    any corpus size, order-independent) divided once in double; per-vector
    distances re-quantize each squared residual to int64 BEFORE the sum, so
    the reduction is order-independent (same discipline as
    `operators/similarity.py`). Plan shape: one (label, pos)-keyed shuffle
    with map-side partials for the centroids (labels × dim rows — tiny),
    broadcast back, one (vec_id)-keyed reduce. The wide embedding array is
    never shuffled.
    """
    return label_centroid_dist(load_table(spark, sf_dir, "embeddings"))


def label_centroid_dist(e: DataFrame) -> DataFrame:
    """(vec_id, label, dist2_fx) over any (vec_id, label, embedding) frame —
    the reusable body of :func:`embedding_centroid_dist` (the composed
    vector pipeline applies it to the near-dup survivors)."""
    pos = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "val")
    )
    v = F.col("val").cast("double")
    base = pos.select(
        "vec_id",
        "label",
        "pos",
        v.alias("v"),
        F.floor(v * F.lit(float(CENT_FX))).cast("bigint").alias("qv"),
    )
    cent = (
        base.groupBy("label", "pos")
        .agg(
            F.sum(F.col("qv").cast("decimal(38,0)")).cast("double").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "label",
            "pos",
            (F.col("s") / (F.col("n") * F.lit(float(CENT_FX)))).alias("c"),
        )
    )
    d = F.col("v") - F.col("c")
    return (
        base.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.floor(d * d * F.lit(float(CENT_FX))).cast("bigint"))
            .cast("bigint")
            .alias("dist2_fx")
        )
    )


# ---------------------------------------------------------------------------
# Per-document overlapping context-window chunking

CHUNK_W = 128  # context-window tokens per chunk
CHUNK_S = 96  # stride between chunk starts (CHUNK_W - CHUNK_S = overlap)


@register(
    "doc_sliding_chunks",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             cast(len(string_split(text, ' ')) AS bigint) AS n_tokens
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id, n_tokens,
           cast(unnest(generate_series(0, n_tokens - 1, {CHUNK_S}))
                AS bigint) AS start_tok
    FROM t
    """,
    doc="per-doc overlapping chunk starts",
)
def doc_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking: every document is cut into
    {CHUNK_W}-token windows whose starts advance by {CHUNK_S} tokens
    (overlap {CHUNK_W - CHUNK_S}) — the per-document complement of the
    cross-document `doc_pack_chunks` packer, i.e. the fine-tune / eval
    chunk layout where documents must NOT bleed into each other.

    Scale shape: map-only — token count is a projection, the chunk-start
    list is `sequence()` + `explode` (rows fan out ~n_tokens/{CHUNK_S}×
    with no shuffle, no window, no driver state). Derived columns
    (chunk_idx, end_tok) are pure projections over start_tok and are
    computed by `doc_chunk_spans` below; this query returns the minimal
    exploded spine so the oracle stays engine-portable.
    """
    return sliding_chunk_starts(load_table(spark, sf_dir, "documents"))


def sliding_chunk_starts(docs: DataFrame) -> DataFrame:
    """The exploded chunk-start spine over an arbitrary (batch OR
    streaming) documents frame — the single implementation behind the
    registered queries and the streaming-parity test."""
    t = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", token_count(tokens("text")).alias("n_tokens")
    )
    return t.select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                F.col("n_tokens") - 1,
                F.lit(CHUNK_S).cast("bigint"),
            )
        ).alias("start_tok"),
    )


@register(
    "doc_chunk_spans",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             cast(len(string_split(text, ' ')) AS bigint) AS n_tokens
      FROM documents WHERE text IS NOT NULL
    ),
    s AS (
      SELECT doc_id, n_tokens,
             cast(unnest(generate_series(0, n_tokens - 1, {CHUNK_S}))
                  AS bigint) AS start_tok
      FROM t
    )
    SELECT doc_id, start_tok,
           cast(start_tok // {CHUNK_S} AS bigint) AS chunk_idx,
           cast(least(start_tok + {CHUNK_W}, n_tokens) AS bigint) AS end_tok,
           cast(least(start_tok + {CHUNK_W}, n_tokens) - start_tok
                AS bigint) AS chunk_len
    FROM s
    """,
    doc="chunk spans with index/end/length",
)
def doc_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full chunk table over `doc_sliding_chunks`: chunk index within
    the doc, exclusive end token (clamped at the doc length), and chunk
    length — what a training loader actually consumes. Still map-only;
    every added column is a projection over the exploded spine."""
    return chunk_spans(load_table(spark, sf_dir, "documents"))


def chunk_spans(docs: DataFrame) -> DataFrame:
    """Full chunk spans over an arbitrary documents frame (batch or
    streaming — the projection is stateless)."""
    s = sliding_chunk_starts(docs)
    end = F.least(F.col("start_tok") + CHUNK_W, F.col("n_tokens"))
    return s.select(
        "doc_id",
        "start_tok",
        F.expr(f"start_tok div {CHUNK_S}").alias("chunk_idx"),
        end.cast("bigint").alias("end_tok"),
        (end - F.col("start_tok")).cast("bigint").alias("chunk_len"),
    )


# ---------------------------------------------------------------------------
# Deterministic training-shard layout (global shuffle for training order)

NSHARDS = 16  # fixture shard count; production sizes this to corpus/shard-GB


@register(
    "training_shard_layout",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {o_h64("cast(doc_id AS varchar)")} AS h
      FROM documents
    )
    SELECT doc_id,
           cast(h % {NSHARDS} AS bigint) AS shard,
           cast(row_number() OVER (PARTITION BY h % {NSHARDS}
                                   ORDER BY h, doc_id) AS bigint) AS pos
    FROM t
    """,
    doc="deterministic hash shuffle into ordered training shards",
)
def training_shard_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle: each document is assigned to
    a shard by hash and ordered within the shard by the same hash — a
    reproducible pseudo-random permutation of the corpus, materialized as
    the sharded layout training jobs actually read (shard files, each
    internally ordered; epoch N+1 reshuffles by salting the hash).

    Scale shape: ONE hash shuffle on the shard key, then a per-shard sort
    for row_number — never a global single-partition window. Shards are
    hash-uniform (no skew by construction); shard count grows with the
    corpus so per-shard sorts stay memory-sized. The same layout feeds
    `io.writers.write_partitioned` for the on-disk shard directories.
    """
    from ..functions.hashing import h64

    docs = load_table(spark, sf_dir, "documents")
    h = h64(F.col("doc_id").cast("string"))
    t = docs.select("doc_id", h.alias("h"))
    w = (
        Window.partitionBy(F.col("h") % NSHARDS)
        .orderBy("h", "doc_id")
    )
    return t.select(
        "doc_id",
        (F.col("h") % NSHARDS).alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) data layout over (user, hour)

ZBITS = 8  # bits per dimension after equi-width binning to 0..255
ZGROUPS_LOG2 = 6  # 64 file groups = top 6 bits of the 16-bit z-key


def _z_interleave_expr(u: str, h: str) -> str:
    """Bit-interleave expression shared verbatim by the Spark plan and the
    DuckDB oracle: z = Σ_b ((u>>b)&1)<<(2b+1) | ((h>>b)&1)<<(2b), written
    with div/mod so no engine-specific bit operators are involved."""
    terms = []
    for b in range(ZBITS):
        terms.append(f"(({u} div {2 ** b}) % 2) * {2 ** (2 * b + 1)}")
        terms.append(f"(({h} div {2 ** b}) % 2) * {2 ** (2 * b)}")
    return " + ".join(terms)


def _o_zorder() -> str:
    z = _z_interleave_expr("u8", "h8").replace(" div ", " // ")
    return f"""
    WITH ev AS (
      SELECT user_id, cast(floor(epoch(ts)/3600) AS bigint) AS hour
      FROM events
    ),
    st AS (
      SELECT min(user_id) AS umin, max(user_id) AS umax,
             min(hour) AS hmin, max(hour) AS hmax
      FROM ev
    ),
    binned AS (
      SELECT ((user_id - umin) * {2 ** ZBITS}) // (umax - umin + 1) AS u8,
             ((hour - hmin) * {2 ** ZBITS}) // (hmax - hmin + 1) AS h8
      FROM ev CROSS JOIN st
    ),
    keyed AS (
      SELECT u8, h8, ({z}) // {2 ** (2 * ZBITS - ZGROUPS_LOG2)} AS zgroup
      FROM binned
    )
    SELECT cast(zgroup AS bigint) AS zgroup,
           cast(count(*) AS bigint) AS n_rows,
           cast(min(u8) AS bigint) AS min_u8,
           cast(max(u8) AS bigint) AS max_u8,
           cast(min(h8) AS bigint) AS min_h8,
           cast(max(h8) AS bigint) AS max_h8
    FROM keyed GROUP BY 1
    """


@register(
    "events_zorder_layout",
    oracle=_o_zorder(),
    doc="Z-order (Morton) file-group layout over (user, hour)",
)
def events_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional data-layout clustering — the Delta/Iceberg
    ``OPTIMIZE ZORDER BY (user_id, hour)`` shape: both dimensions are
    equi-width-binned to {2**ZBITS} buckets, bit-interleaved into a
    16-bit Morton key, and rows are assigned to one of 2^{ZGROUPS_LOG2}
    file groups by the key's top bits (a range split on the z-key —
    exactly how table formats cut z-ordered files). The output is the
    per-group statistics a scan planner would keep as file-level min/max:
    because the Morton curve preserves locality in BOTH dimensions, a
    predicate on user_id alone OR hour alone overlaps the (min, max)
    span of only ~sqrt-fraction of the groups — the two-dimensional scan
    pruning a single-column sort cannot give. Production binning would
    use per-column range-bucket ranks (quantiles) instead of equi-width;
    the interleave and group split are identical.

    Scale shape: the dimension stats are ONE 4-scalar aggregate; binning
    + interleave are map-only integer expressions (the identical
    div/mod-written expression runs in both engines); the group stats
    are one map-side-combined groupBy on a {2 ** ZGROUPS_LOG2}-value
    key. No joins, no windows, nothing global but the 4 scalars."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("cast(ts AS timestamp)").cast("long").alias("es"),
    ).select("user_id", F.expr("es div 3600").alias("hour"))
    st = table_stats(spark, sf_dir, "events")
    umin, umax = st["min_user_id"], st["max_user_id"]
    hmin, hmax = st["min_hour"], st["max_hour"]
    binned = ev.select(
        F.expr(
            f"((user_id - {umin}) * {2 ** ZBITS}) div ({umax} - {umin} + 1)"
        ).alias("u8"),
        F.expr(
            f"((hour - {hmin}) * {2 ** ZBITS}) div ({hmax} - {hmin} + 1)"
        ).alias("h8"),
    )
    z = _z_interleave_expr("u8", "h8")
    keyed = binned.select(
        "u8",
        "h8",
        F.expr(f"({z}) div {2 ** (2 * ZBITS - ZGROUPS_LOG2)}").alias("zgroup"),
    )
    return keyed.groupBy(F.col("zgroup").cast("bigint").alias("zgroup")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("u8").cast("bigint").alias("min_u8"),
        F.max("u8").cast("bigint").alias("max_u8"),
        F.min("h8").cast("bigint").alias("min_h8"),
        F.max("h8").cast("bigint").alias("max_h8"),
    )


# ---------------------------------------------------------------------------
# Z-order pruning effectiveness vs a single-dimension sort layout

ZP_PROBE_MOD = 29  # probe set: binned u8 of users with user_id % 29 == 0


def _o_zpruning() -> str:
    z = _z_interleave_expr("u8", "h8").replace(" div ", " // ")
    return f"""
    WITH ev AS (
      SELECT user_id, cast(floor(epoch(ts)/3600) AS bigint) AS hour
      FROM events
    ),
    st AS (
      SELECT min(user_id) AS umin, max(user_id) AS umax,
             min(hour) AS hmin, max(hour) AS hmax
      FROM ev
    ),
    binned AS (
      SELECT user_id,
             ((user_id - umin) * {2 ** ZBITS}) // (umax - umin + 1) AS u8,
             ((hour - hmin) * {2 ** ZBITS}) // (hmax - hmin + 1) AS h8
      FROM ev CROSS JOIN st
    ),
    zg AS (
      SELECT ({z}) // {2 ** (2 * ZBITS - ZGROUPS_LOG2)} AS grp,
             min(u8) AS lo, max(u8) AS hi
      FROM binned GROUP BY 1
    ),
    hg AS (
      SELECT h8 // {2 ** (ZBITS - ZGROUPS_LOG2)} AS grp,
             min(u8) AS lo, max(u8) AS hi
      FROM binned GROUP BY 1
    ),
    probes AS (
      SELECT DISTINCT u8 FROM binned
      WHERE user_id % {ZP_PROBE_MOD} = 0
    ),
    t AS (
      SELECT 'zorder' AS layout, count(*) AS touched,
             (SELECT count(*) FROM probes)
               * (SELECT count(*) FROM zg) AS total
      FROM probes p JOIN zg g ON p.u8 BETWEEN g.lo AND g.hi
      UNION ALL
      SELECT 'hour_sorted', count(*),
             (SELECT count(*) FROM probes)
               * (SELECT count(*) FROM hg)
      FROM probes p JOIN hg g ON p.u8 BETWEEN g.lo AND g.hi
    )
    SELECT layout,
           cast(touched AS bigint) AS groups_touched,
           cast(total AS bigint) AS groups_possible,
           cast(floor(1000000.0 * touched / total) AS bigint)
             AS touch_frac_fx
    FROM t
    """


@register(
    "zorder_pruning_stats",
    oracle=_o_zpruning(),
    doc="measured file-group pruning: Z-order vs single-dimension sort",
)
def zorder_pruning_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The empirical case for `events_zorder_layout`: for a deterministic
    set of user-point predicates, how many file groups' [min_u8, max_u8]
    footer spans must be scanned under (a) the Morton layout vs (b) a
    plain hour-sorted layout with the same group count. Hour-sorting
    leaves every group spanning the FULL user range (every group touched
    by every user predicate — touch fraction 1.0); the Z-order groups
    bound both dimensions, so a user predicate overlaps only the groups
    sharing its u8 high bits (~2^{ZGROUPS_LOG2}/2^{ZBITS} of them). This
    is exactly the min/max-stats skipping a lakehouse scan planner does;
    the query turns the layout claim into a measured, oracle-checked
    number.

    Scale shape: the group-stats aggregates are the layout query's; the
    probe×group containment join is (probes x {2 ** ZGROUPS_LOG2})
    broadcast rows — metadata-scale, like every planner computation."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("cast(ts AS timestamp)").cast("long").alias("es"),
    ).select("user_id", F.expr("es div 3600").alias("hour"))
    st = table_stats(spark, sf_dir, "events")
    umin, umax = st["min_user_id"], st["max_user_id"]
    hmin, hmax = st["min_hour"], st["max_hour"]
    binned = ev.select(
        "user_id",
        F.expr(
            f"((user_id - {umin}) * {2 ** ZBITS}) div ({umax} - {umin} + 1)"
        ).alias("u8"),
        F.expr(
            f"((hour - {hmin}) * {2 ** ZBITS}) div ({hmax} - {hmin} + 1)"
        ).alias("h8"),
    ).localCheckpoint(eager=True)
    z = _z_interleave_expr("u8", "h8")
    zg = (
        binned.select(
            F.expr(f"({z}) div {2 ** (2 * ZBITS - ZGROUPS_LOG2)}").alias("grp"),
            "u8",
        )
        .groupBy("grp")
        .agg(F.min("u8").alias("lo"), F.max("u8").alias("hi"))
    )
    hg = (
        binned.select(
            F.expr(f"h8 div {2 ** (ZBITS - ZGROUPS_LOG2)}").alias("grp"),
            "u8",
        )
        .groupBy("grp")
        .agg(F.min("u8").alias("lo"), F.max("u8").alias("hi"))
    )
    probes = (
        binned.filter(F.col("user_id") % ZP_PROBE_MOD == 0)
        .select("u8")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_probes = probes.count()

    def touched(groups: DataFrame, label: str) -> DataFrame:
        n_groups = groups.count()
        total = n_probes * n_groups
        return (
            probes.crossJoin(F.broadcast(groups))
            .filter(
                (F.col("u8") >= F.col("lo")) & (F.col("u8") <= F.col("hi"))
            )
            .agg(F.count(F.lit(1)).alias("touched"))
            .select(
                F.lit(label).alias("layout"),
                F.col("touched").cast("bigint").alias("groups_touched"),
                F.lit(total).cast("bigint").alias("groups_possible"),
                F.floor(1000000.0 * F.col("touched") / total)
                .cast("bigint")
                .alias("touch_frac_fx"),
            )
        )

    return touched(zg, "zorder").unionByName(touched(hg, "hour_sorted"))


# ---------------------------------------------------------------------------
# Quantile-binned Z-order: the skew-proof variant

ZQ_BINS = 2 ** ZBITS  # rank bins per dimension (equi-DEPTH, not width)


def _o_zorder_quantile() -> str:
    z = _z_interleave_expr("u8", "h8").replace(" div ", " // ")
    return f"""
    WITH ev AS (
      SELECT user_id, event_id,
             cast(floor(epoch(ts)/3600) AS bigint) AS hour
      FROM events
    ),
    nn AS (SELECT count(*) AS n FROM ev),
    ranked AS (
      SELECT (row_number() OVER (ORDER BY user_id, event_id) - 1) AS ru,
             (row_number() OVER (ORDER BY hour, event_id) - 1) AS rh
      FROM ev
    ),
    binned AS (
      SELECT ru * {ZQ_BINS} // n AS u8, rh * {ZQ_BINS} // n AS h8
      FROM ranked CROSS JOIN nn
    ),
    keyed AS (
      SELECT u8, h8, ({z}) // {2 ** (2 * ZBITS - ZGROUPS_LOG2)} AS zgroup
      FROM binned
    )
    SELECT cast(zgroup AS bigint) AS zgroup,
           cast(count(*) AS bigint) AS n_rows,
           cast(min(u8) AS bigint) AS min_u8,
           cast(max(u8) AS bigint) AS max_u8,
           cast(min(h8) AS bigint) AS min_h8,
           cast(max(h8) AS bigint) AS max_h8
    FROM keyed GROUP BY 1
    """


@register(
    "events_zorder_quantile",
    oracle=_o_zorder_quantile(),
    doc="quantile-binned (equi-depth) Z-order layout — the skew-proof form",
)
def events_zorder_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-proof Z-order variant `events_zorder_layout`'s docstring
    prescribes: dimensions are binned by RANK (equi-depth — every bin
    holds ~N/{ZQ_BINS} rows) instead of value range, so a pathological
    value distribution (one hot user, a burst hour) cannot collapse the
    layout into a handful of occupied bins — this is what Delta's
    OPTIMIZE ZORDER actually does (range-partition ids per column).
    Output is the same per-group min/max pruning stats relation.

    Scale shape: the global ranks run on the two-stage range-prefix plan
    (`operators/prefix.py::global_running_sums` discipline — here via
    percent-rank-free integer row_numbers per dimension computed with
    range partitioning); at fixture scale Spark's rank window is
    per-dimension ordered but the PLAN never funnels data through one
    partition (asserted): each dimension's rank uses the range
    partitioner exactly like `repair_timestamps`."""
    from ..operators.prefix import global_running_sums

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("cast(ts AS timestamp)").cast("long").alias("es"),
        "event_id",
    ).select("user_id", F.expr("es div 3600").alias("hour"), "event_id")
    n = table_stats(spark, sf_dir, "events")["n"]
    # global 0-based ranks per dimension on the range-prefix scaffold:
    # rank = running count - 1 over the dimension's total order
    ru = global_running_sums(
        ev.select("user_id", "event_id"), ["user_id", "event_id"],
        {"r": F.lit(1)},
    ).select(
        "event_id",
        F.expr(f"((r - 1) * {ZQ_BINS}) div {n}").alias("u8"),
    )
    rh = global_running_sums(
        ev.select("hour", "event_id"), ["hour", "event_id"],
        {"r": F.lit(1)},
    ).select(
        F.col("event_id").alias("eid2"),
        F.expr(f"((r - 1) * {ZQ_BINS}) div {n}").alias("h8"),
    )
    binned = ru.join(rh, F.col("event_id") == F.col("eid2")).select(
        "u8", "h8"
    )
    z = _z_interleave_expr("u8", "h8")
    keyed = binned.select(
        "u8",
        "h8",
        F.expr(f"({z}) div {2 ** (2 * ZBITS - ZGROUPS_LOG2)}").alias(
            "zgroup"
        ),
    )
    return keyed.groupBy(
        F.col("zgroup").cast("bigint").alias("zgroup")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("u8").cast("bigint").alias("min_u8"),
        F.max("u8").cast("bigint").alias("max_u8"),
        F.min("h8").cast("bigint").alias("min_h8"),
        F.max("h8").cast("bigint").alias("max_h8"),
    )
