"""Vector similarity search over an ``array<float>`` embedding column.

Two paths:

- :func:`cosine_topk` — brute-force exact cosine top-k: broadcast the query
  set against the corpus, JVM-side ``zip_with``/``aggregate`` dot products.
  The baseline, and exactly what you want when the query set is small.
- :func:`ann_topk_lsh` — random-hyperplane LSH: each vector is bucketed by
  the sign pattern of P fixed hyperplane projections; a query only scans its
  own bucket. At 100 TB the bucket join replaces the corpus×queries product
  with an equi-join on the bucket key (and buckets can be made multi-probe
  by unioning neighbor buckets).
- :func:`ivf_topk` — inverted-file ANN: corpus partitioned into K
  data-adaptive lists by nearest coarse centroid (:func:`stride_centroids`
  seed, optionally :func:`kmeans_refine`d); queries scan their top-nprobe
  lists. Data-dependent buckets where LSH's are oblivious; recall tunes at
  query time via nprobe.

Cross-engine determinism: per-element products are computed in double
(float32→double widening is exact, IEEE multiply is deterministic), then
quantized to 1e-15 fixed-point BIGINTs via ``floor`` — floor of an identical
double is identical everywhere, and integer sums are order-independent —
so the reduction is bit-stable across Spark and DuckDB. (A decimal(38,12)
cast is NOT enough: Spark rounds via BigDecimal.valueOf's shortest-string
repr while DuckDB scales the raw double, and they disagree at ~1 ulp.)
Hyperplane sign constants are Python-side md5-derived ±1 literals embedded
identically into the Spark plan and the DuckDB oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

FIXED_POINT = int(1e15)


def plane_signs(num_planes: int, dim: int, prefix: str = "") -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix (md5-parity), identical constants
    for the Spark plan and the SQL oracle. ``prefix`` derives independent
    matrices (one per LSH band)."""
    return [
        [
            1
            if hashlib.md5(f"{prefix}plane{p}#dim{i}".encode()).digest()[0] % 2 == 0
            else -1
            for i in range(dim)
        ]
        for p in range(num_planes)
    ]


def _fx(prod: Column) -> Column:
    return F.floor(prod * F.lit(float(FIXED_POINT))).cast("bigint")


def norm2_fx(emb: Column) -> Column:
    """Σ floor(x_i²·1e15) as an exact, order-independent BIGINT."""
    return F.aggregate(
        emb,
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + _fx(x.cast("double") * x.cast("double")),
    )


def dot_fx(a: Column, b: Column) -> Column:
    """Σ floor(a_i·b_i·1e15) as an exact, order-independent BIGINT."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _fx(x.cast("double") * y.cast("double"))),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def cosine_sim(dot: Column, n2a: Column, n2b: Column) -> Column:
    """Fixed-point scales cancel: dot·1e15 / (√(a·1e15)·√(b·1e15))."""
    return dot.cast("double") / (
        F.sqrt(n2a.cast("double")) * F.sqrt(n2b.cast("double"))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, rank, cos_sim).

    The query side is broadcast — the corpus is scanned once, no shuffle of
    the corpus vectors at all; ranking shuffles only (query, candidate)
    score rows, partitioned by query.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        norm2_fx(F.col(emb_col)).alias("q_n2"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(emb_col).alias("c_emb"),
        norm2_fx(F.col(emb_col)).alias("c_n2"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_sim(
                dot_fx(F.col("q_emb"), F.col("c_emb")),
                F.col("q_n2"),
                F.col("c_n2"),
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "cos_sim")
    )


def neardup_pairs_lsh(
    corpus: DataFrame,
    threshold: float,
    bands: int = 8,
    planes_per_band: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs ``(a, b, cos_sim)`` with
    ``a < b`` and ``cos_sim >= threshold`` — the vector-space sibling of
    MinHash LSH dedup (`operators/dedup.py`).

    Multi-band hyperplane LSH: B independent sign-pattern buckets per
    vector; a pair is a candidate iff it collides in ANY band (recall
    ≈ 1-(1-p^P)^B with p = 1-θ/π per plane). Candidates come from a
    per-(band, bucket) equi-self-join — ONE shuffle on the bucket key,
    never an all-pairs product — then exact fixed-point cosine verifies
    candidates only. Exactly the all-pairs-free shape that survives a
    100 TB corpus; recall/bucket-granularity tune via bands/planes.
    """
    base = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(emb_col).alias("emb"),
        norm2_fx(F.col(emb_col)).alias("n2"),
        *[
            bucket_expr(emb_col, plane_signs(planes_per_band, dim, f"band{b}:")).alias(
                f"bk{b}"
            )
            for b in range(bands)
        ],
    )
    bucketed = base.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"bk{b}").alias("bucket")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    x, y = bucketed.alias("x"), bucketed.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
        .distinct()
    )
    va = base.select(
        F.col("vec_id").alias("a"), F.col("emb").alias("a_emb"), F.col("n2").alias("a_n2")
    )
    vb = base.select(
        F.col("vec_id").alias("b"), F.col("emb").alias("b_emb"), F.col("n2").alias("b_n2")
    )
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .select(
            "a",
            "b",
            cosine_sim(
                dot_fx(F.col("a_emb"), F.col("b_emb")),
                F.col("a_n2"),
                F.col("b_n2"),
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def stride_centroids(
    corpus: DataFrame,
    stride: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse-quantizer seed: every ``stride``-th vector by id
    becomes a centroid — K ≈ N/stride, SQL-mirrorable (``vec_id % stride``),
    and a reasonable diversity sample when ids are uncorrelated with
    embedding geometry. Production IVF refines these with
    :func:`kmeans_refine`; the stride seed keeps the registered query
    oracle-checkable."""
    return corpus.filter((F.col(id_col) % stride) == 0).select(
        F.col(id_col).alias("centroid_id"), F.col(emb_col).alias("c_emb")
    )


def _centroid_scores(
    df: DataFrame, centroids: DataFrame, id_col: str, emb_col: str
) -> DataFrame:
    """(id, emb, n2, centroid_id, cs): cosine of every row against every
    centroid. The centroid side is broadcast — K is tiny (≈√N or N/stride)
    — so this is a shuffle-free map-side expansion of N×K rows."""
    cents = F.broadcast(
        centroids.select(
            "centroid_id", "c_emb", norm2_fx(F.col("c_emb")).alias("c_n2")
        )
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(emb_col).alias("emb"),
            norm2_fx(F.col(emb_col)).alias("n2"),
        )
        .join(cents)
        .select(
            "id",
            "emb",
            "n2",
            "centroid_id",
            cosine_sim(
                dot_fx(F.col("emb"), F.col("c_emb")),
                F.col("n2"),
                F.col("c_n2"),
            ).alias("cs"),
        )
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine, centroid-id
    tie-break): (vec_id, centroid_id, emb, n2) — the IVF inverted lists.

    The argmax is a groupBy(id) max over the broadcast-join expansion; the
    K rows per id are produced consecutively in the same partition, so the
    partial (map-side) aggregate collapses them before the exchange — the
    shuffle carries ~N rows, not N×K. The max struct leads with
    (cs, -centroid_id), which is a total order per group, so the trailing
    emb/n2 fields ride along without ever being compared."""
    scored = _centroid_scores(corpus, centroids, id_col, emb_col)
    best = scored.groupBy("id").agg(
        F.max(
            F.struct(
                F.col("cs"),
                (-F.col("centroid_id")).alias("nc"),
                F.col("emb"),
                F.col("n2"),
            )
        ).alias("m")
    )
    return best.select(
        F.col("id").alias("vec_id"),
        (-F.col("m.nc")).alias("centroid_id"),
        F.col("m.emb").alias("emb"),
        F.col("m.n2").alias("n2"),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF approximate cosine top-k: (query_id, vec_id, rank, cos_sim).

    The inverted-file shape that survives a 100 TB corpus: corpus vectors
    are partitioned into K data-adaptive lists by nearest centroid
    (:func:`ivf_assign` — one ~N-row shuffle, buildable once and reusable
    across query batches); each query ranks the K centroids and scans only
    its top-``nprobe`` lists. The probe relation (queries × nprobe, with
    the query vector riding along) is broadcast against the lists, so the
    scan is an equi-join on centroid_id touching ~nprobe/K of the corpus —
    never the corpus×queries product. Versus LSH buckets: centroids track
    the actual density of the corpus, and recall tunes at query time via
    nprobe with no index rebuild."""
    assigned = ivf_assign(corpus, centroids, id_col, emb_col)
    qscored = _centroid_scores(queries, centroids, id_col, emb_col)
    wq = Window.partitionBy("id").orderBy(F.desc("cs"), F.asc("centroid_id"))
    probe = (
        qscored.withColumn("prn", F.row_number().over(wq))
        .filter(F.col("prn") <= nprobe)
        .select(
            F.col("id").alias("query_id"),
            "centroid_id",
            F.col("emb").alias("q_emb"),
            F.col("n2").alias("q_n2"),
        )
    )
    scored = (
        assigned.join(F.broadcast(probe), "centroid_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_sim(
                dot_fx(F.col("q_emb"), F.col("emb")),
                F.col("q_n2"),
                F.col("n2"),
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "cos_sim")
    )


def kmeans_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    iters: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Lloyd's refinement of an IVF coarse quantizer, pure DataFrame ops:
    assign (broadcast argmax, as :func:`ivf_assign`) → per-dimension means
    via posexplode + a single (centroid, dim)-keyed partial-aggregated
    shuffle → array rebuild. Empty clusters keep their previous centroid.
    Each iteration is checkpointed so the lineage stays O(1) deep. The
    refined centroids plug straight into :func:`ivf_topk`; refinement is
    float math (means), so queries over refined centroids are verified by
    recall against brute force rather than a SQL oracle."""
    cur = centroids.localCheckpoint(eager=True)
    for _ in range(iters):
        assigned = ivf_assign(corpus, cur, id_col, emb_col)
        means = (
            assigned.select(
                "centroid_id", F.posexplode("emb").alias("pos", "x")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"].cast("float"),
                ).alias("new_emb")
            )
        )
        cur = (
            cur.join(means, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("new_emb"), F.col("c_emb")).alias("c_emb"),
            )
            .localCheckpoint(eager=True)
        )
    return cur


def bucket_expr(emb_col: str, signs: list[list[int]]) -> Column:
    """LSH bucket id: bit p = [Σ_i s_{p,i}·x_i ≥ 0]. The projection folds
    left-to-right in double over a zipped ±1 literal array — the same
    addition order as the oracle's left-associated ``a+b+c`` chain, so the
    doubles are bit-identical. (An unrolled 8×64-term scalar expression
    gives the same result but costs seconds of codegen compile.)"""
    bucket = None
    for p, row in enumerate(signs):
        arr = F.array(*[F.lit(float(s)) for s in row])
        proj = F.aggregate(
            F.zip_with(F.col(emb_col), arr, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj >= 0, F.lit(1 << p).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        bucket = bit if bucket is None else bucket + bit
    return bucket


def o_bucket_expr(emb_col: str, signs: list[list[int]]) -> str:
    """DuckDB mirror of :func:`bucket_expr` (1-based list indexing)."""
    bits = []
    for p, row in enumerate(signs):
        terms = " ".join(
            ("+ " if s > 0 else "- ") + f"cast({emb_col}[{i + 1}] AS double)"
            for i, s in enumerate(row)
        ).lstrip("+ ")
        bits.append(f"(CASE WHEN {terms} >= 0 THEN {1 << p} ELSE 0 END)")
    return "cast(" + " + ".join(bits) + " AS bigint)"


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH buckets: a query
    is compared only against corpus vectors in its own bucket (recall
    follows the hyperplane collision curve; the oracle implements the same
    algorithm, so correctness is checked as implementation parity)."""
    signs = plane_signs(num_planes, dim)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        norm2_fx(F.col(emb_col)).alias("q_n2"),
        bucket_expr(emb_col, signs).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(emb_col).alias("c_emb"),
        norm2_fx(F.col(emb_col)).alias("c_n2"),
        bucket_expr(emb_col, signs).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_sim(
                dot_fx(F.col("q_emb"), F.col("c_emb")),
                F.col("q_n2"),
                F.col("c_n2"),
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "cos_sim")
    )
