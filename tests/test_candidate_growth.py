"""Candidate-growth regression for the dedup/ANN bucketing (VERDICT r5
#3): SCALE.md's central claim — every candidate generator is bucketed and
never-all-pairs — measured empirically, not just plan-asserted. Each
family's candidate-pair count is measured at two corpus slices (10×
apart, carved from the sf0.1 tables by id so both points share one data
distribution) with the family's documented scale knob applied
(band_bits / planes ~ log₂N, K ~ √N, fixed shingle-df cap), and the
fitted growth exponent alpha = log(C₂/C₁)/log(N₂/N₁) must stay below the
family's bound. A generator regressing to an unbucketed all-pairs shape
jumps to alpha ≈ 2 and fails.

Counts use a +N floor (C+N) so near-zero candidate counts at the small
slice can't produce a spurious exponent. Thresholds sit well above the
measured values (headroom for distribution noise) and well below 2:

    family               measured   bound   design shape
    minhash 16/4          ~1.0      1.35    banded LSH, collisions ~ dups
    ngram df-cap 8        ~1.2      1.55    cap bounds per-shingle fanout
    simhash wide          ~1.3      1.65    band_bits grows with log2 N
    hyperplane LSH        ~1.1      1.40    planes grow with log2 N
    IVF sum(n_c^2)        ~1.5      1.75    K=sqrt(N) -> N^1.5 pair mass
                                            (query path probes 1 bucket:
                                            per-query work sqrt(N))
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from eth_dspa_2019_spark.operators.dedup import (
    _band_rows,
    minhash_signatures,
    shingles,
    simhash_wide,
)
from eth_dspa_2019_spark.operators.similarity import (
    ivf_assign,
    lsh_buckets_batches,
    stride_centroids,
)

_SF01 = "/root/testdata/sf0.1"
_DOC_SLICES = (500, 5000)
_EMB_SLICES = (500, 2000)


def _alpha(points: list[tuple[int, int]]) -> float:
    (n1, c1), (n2, c2) = points[0], points[-1]
    return math.log((c2 + n2) / (c1 + n1)) / math.log(n2 / n1)


def _band_pair_count(br, id_col: str = "id") -> int:
    a, b = br.alias("a"), br.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(f"a.{id_col}", f"b.{id_col}")
        .distinct()
        .count()
    )


def _doc_slices(spark):
    docs = spark.read.parquet(f"{_SF01}/documents.parquet").select(
        "doc_id", "text"
    )
    return [
        (n, docs.filter(F.col("doc_id") < n)) for n in _DOC_SLICES
    ]


def test_minhash_lsh_candidates_subquadratic(spark):
    pts = []
    for n, d in _doc_slices(spark):
        sh = shingles(d)
        c = _band_pair_count(_band_rows(minhash_signatures(sh, 16), 16, 4))
        pts.append((n, c))
    assert _alpha(pts) <= 1.35, pts


def test_ngram_capped_candidates_subquadratic(spark):
    cap = 8  # the max_shingle_df mechanism, scaled to bite at test size
    pts = []
    for n, d in _doc_slices(spark):
        sh = shingles(d).persist()
        rare = sh.join(
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= cap)
            .select("shingle"),
            "shingle",
            "semi",
        )
        a, b = rare.alias("a"), rare.alias("b")
        c = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select("a.id", "b.id")
            .distinct()
            .count()
        )
        sh.unpersist()
        pts.append((n, c))
    assert _alpha(pts) <= 1.55, pts


def test_simhash_wide_candidates_subquadratic(spark):
    """band_bits is the knob that grows with log2(corpus) — 64 buckets
    per band at the small slice, 4096 at the large (SCALE.md table)."""
    word_bits = (48, 36)
    pts = []
    for n, d in _doc_slices(spark):
        bb = 6 if n < 2048 else 12
        sims = simhash_wide(d)
        mask = (1 << bb) - 1
        structs, bid = [], 0
        for w, bits in enumerate(word_bits):
            for i in range(bits // bb):
                structs.append(
                    F.struct(
                        F.lit(bid).alias("band_id"),
                        F.shiftright(F.col(f"sim_{w}"), i * bb)
                        .bitwiseAND(mask)
                        .alias("band_key"),
                    )
                )
                bid += 1
        br = sims.select(
            "id", F.explode(F.array(*structs)).alias("band")
        ).select("id", "band.band_id", "band.band_key")
        pts.append((n, _band_pair_count(br)))
    assert _alpha(pts) <= 1.65, pts


def _emb_slices(spark):
    embs = spark.read.parquet(f"{_SF01}/embeddings.parquet")
    return [
        (n, embs.filter(F.col("vec_id") < n)) for n in _EMB_SLICES
    ]


def test_hyperplane_lsh_candidates_subquadratic(spark):
    """planes per band grow with log2(N/target_load) so bucket count
    tracks the corpus."""
    pts = []
    for n, e in _emb_slices(spark):
        planes = max(4, math.ceil(math.log2(n / 8)))
        bucketed = (
            e.select("vec_id", F.col("embedding").alias("emb"))
            .mapInPandas(
                lsh_buckets_batches(4, planes, 64),
                schema="vec_id long, band int, bucket long",
            )
        )
        x, y = bucketed.alias("x"), bucketed.alias("y")
        c = (
            x.join(
                y,
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.vec_id") < F.col("y.vec_id")),
            )
            .select("x.vec_id", "y.vec_id")
            .distinct()
            .count()
        )
        pts.append((n, c))
    assert _alpha(pts) <= 1.40, pts


def test_ivf_bucket_mass_matches_design(spark):
    """IVF with K=sqrt(N): the within-bucket pair mass sum(n_c^2) is
    N^1.5 BY DESIGN (each query probes one ~sqrt(N)-sized list); the
    regression guards the gap to quadratic — a degenerate assignment
    (everything in one list) fails."""
    pts = []
    for n, e in _emb_slices(spark):
        k = math.ceil(math.sqrt(n))
        stride = max(1, n // k)
        cents = stride_centroids(e, stride, "vec_id", "embedding")
        asg = ivf_assign(e, cents, "vec_id", "embedding")
        sizes = [
            r["c"]
            for r in asg.groupBy("centroid_id")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ]
        pts.append((n, sum(s * s for s in sizes)))
    assert _alpha(pts) <= 1.75, pts


def test_pruned_correlation_sketch_beats_random_at_sf01(spark):
    """Sketch-effectiveness evidence for `user_correlation_sketch_pruned`
    (VERDICT r5 #7): at sf0.1 (1 500 users — the smallest scale where
    grid correlations rise above noise), the banded sign-sketch must
    recover most of the brute-force top-20 grid-correlated pairs.
    Random band collisions alone would recover ~B/2^(P/B) ≈ 32% (~6/20);
    the centered sketch measures 16/20 (with the r7 bit-extraction sign
    words) — the floor of 12 sits between, failing if the sketch
    regresses to noise (e.g. uncentered signs, which measure at the
    random baseline)."""
    from pyspark.sql import functions as F2

    from eth_dspa_2019_spark.plans import all_queries
    from eth_dspa_2019_spark.plans.behavior import CORR_TOPK, _hourly_series

    sf = _SF01
    series = _hourly_series(spark, sf)
    grid_h = float(series.select("hour").distinct().count())
    stats = series.groupBy("user_id").agg(
        F2.sum("v").alias("su"),
        F2.sum(F2.col("v") * F2.col("v")).alias("sqv"),
    )
    a = series.select(
        F2.col("user_id").alias("u1"), "hour", F2.col("v").alias("va")
    )
    b = series.select(
        F2.col("user_id").alias("u2"),
        F2.col("hour").alias("hb"),
        F2.col("v").alias("vb"),
    )
    shared = (
        a.join(b, (F2.col("hour") == F2.col("hb")) & (F2.col("u1") < F2.col("u2")))
        .groupBy("u1", "u2")
        .agg(F2.sum(F2.col("va") * F2.col("vb")).alias("sxy"))
    )
    t1 = stats.select(
        F2.col("user_id").alias("u1"),
        F2.col("su").alias("su1"),
        F2.col("sqv").alias("sqv1"),
    )
    t2 = stats.select(
        F2.col("user_id").alias("u2"),
        F2.col("su").alias("su2"),
        F2.col("sqv").alias("sqv2"),
    )
    d = lambda c: F2.col(c).cast("double")  # noqa: E731
    num = F2.lit(grid_h) * d("sxy") - d("su1") * d("su2")
    varp = (F2.lit(grid_h) * d("sqv1") - d("su1") * d("su1")) * (
        F2.lit(grid_h) * d("sqv2") - d("su2") * d("su2")
    )
    truth = (
        shared.join(t1, "u1")
        .join(t2, "u2")
        .filter(varp > 0)
        .select(
            "u1",
            "u2",
            F2.floor(1e6 * num / F2.sqrt(varp)).cast("bigint").alias("c"),
        )
        .orderBy(F2.desc("c"), "u1", "u2")
        .limit(CORR_TOPK)
        .collect()
    )
    tp = {(r.u1, r.u2) for r in truth}
    # fixed-band fixture (demoted from the registry in r7 — VERDICT r6
    # #1 — but kept as the regression pin for the sketch mechanics at a
    # pinned knob): rpb=4 measured 17/20
    from eth_dspa_2019_spark.plans.behavior import (
        user_correlation_sketch_pruned,
    )

    pruned = user_correlation_sketch_pruned(spark, sf)
    pp = {(r.u1, r.u2) for r in pruned.collect()}
    assert len(tp & pp) >= 12, f"recall {len(tp & pp)}/{len(tp)}"
    # registered auto form (rpb=8 at 1 500 users): longer bands trade
    # recall on WEAK pairs for linear collision mass (collision prob
    # p_agree^8 per band concentrates at high |corr| — the fixture's
    # top-20 is mostly moderate pairs, the regime the knob deliberately
    # lets decay); measured 6/20 at sf0.1 vs a ~1/20 random baseline
    # (12 bands / 2^8 buckets) — the floor fails if the sketch regresses
    # to noise (uncentered signs measure at the random baseline)
    auto = all_queries()["grid_correlation_pruned_auto"].spark(spark, sf)
    ap = {(r.u1, r.u2) for r in auto.collect()}
    assert len(tp & ap) >= 4, f"auto recall {len(tp & ap)}/{len(tp)}"


def test_auto_corr_sketch_candidates_subquadratic(spark):
    """The auto-sized correlation sketch (bits-per-band ~ log2 users —
    `plans/behavior.py::grid_correlation_pruned_auto`) must keep its
    candidate mass sub-quadratic in the user count. The fixed-band
    registered form measured a 166 s quadratic cliff at 10x in the scale
    run (SCALE.md "Measured scaling"); this pins the knob rule."""
    from eth_dspa_2019_spark.functions.hashing import h64
    from eth_dspa_2019_spark.plans.behavior import (
        CORR_AUTO_BANDS,
        _hourly_series,
        corr_rpb_for_users,
    )

    series_full = _hourly_series(spark, _SF01)
    pts = []
    for n in (500, 1500):
        series = series_full.filter(F.col("user_id") < n)
        rpb = corr_rpb_for_users(n)
        planes = CORR_AUTO_BANDS * rpb
        stats = series.groupBy("user_id").agg(
            F.sum("v").alias("su"), F.count(F.lit(1)).alias("cu")
        )
        n_words = (planes + 59) // 60
        cent = series.join(stats, "user_id").select(
            "user_id",
            "hour",
            (F.col("v") * F.col("cu") - F.col("su")).alias("w"),
            *[
                h64(
                    F.concat(
                        F.lit(f"corrsketch{wd}#"),
                        F.col("hour").cast("string"),
                    )
                ).alias(f"hw{wd}")
                for wd in range(n_words)
            ],
        )
        aggs = [
            F.sum(
                F.col("w")
                * (
                    F.shiftright(F.col(f"hw{p // 60}"), p % 60)
                    .bitwiseAND(1)
                    * 2
                    - 1
                )
            ).alias(f"s{p}")
            for p in range(planes)
        ]
        sig = cent.groupBy("user_id").agg(*aggs).select(
            "user_id",
            *[
                F.when(F.col(f"s{p}") > 0, 1).otherwise(0).alias(f"b{p}")
                for p in range(planes)
            ],
        )
        structs = [
            F.struct(
                F.lit(b).alias("band_id"),
                sum(
                    (F.col(f"b{b * rpb + r}") * (1 << r) for r in range(1, rpb)),
                    F.col(f"b{b * rpb}"),
                ).alias("band_key"),
            )
            for b in range(CORR_AUTO_BANDS)
        ]
        bands = sig.select(
            "user_id", F.explode(F.array(*structs)).alias("bd")
        ).select("user_id", "bd.band_id", "bd.band_key")
        x, y = bands.alias("x"), bands.alias("y")
        c = (
            x.join(
                y,
                (F.col("x.band_id") == F.col("y.band_id"))
                & (F.col("x.band_key") == F.col("y.band_key"))
                & (F.col("x.user_id") < F.col("y.user_id")),
            )
            .select("x.user_id", "y.user_id")
            .distinct()
            .count()
        )
        pts.append((n, c))
    assert _alpha(pts) <= 1.5, pts


def test_fuzzy_rare_gram_candidates_subquadratic(spark):
    """VERDICT r6 #2: the fuzzy edit-distance join's old (length-band,
    first-token) blocking measured 87x pair growth for 10x docs —
    block-density driven, with Zipfian first tokens making one block
    quadratic at corpus scale. The rare-gram key (each side joins on its
    K globally-rarest q-grams) must keep candidate mass sub-quadratic: a
    hot gram stops being anyone's rarest as its df grows, so block size
    is self-limiting."""
    from eth_dspa_2019_spark.plans.llm import fuzzy_rare_gram_candidates

    pts = []
    for n, d in _doc_slices(spark):
        c = fuzzy_rare_gram_candidates(
            d.withColumnRenamed("text", "text")
        ).count()
        pts.append((n, c))
    assert _alpha(pts) <= 1.55, pts


def test_semantic_dedup_pair_mass_subquadratic(spark):
    """SemDedup candidates are bounded by CLUSTER size: with the
    km_stride_for knob (K ~ sqrt(N)) the within-cluster pair mass
    sum(n_c^2) is ~N^1.5 by design — a degenerate assignment that dumps
    the corpus into one cluster regresses to alpha ~ 2 and fails."""
    from eth_dspa_2019_spark.plans.vectors import sem_cluster_assign

    pts = []
    for n, e in _emb_slices(spark):
        asg = sem_cluster_assign(e)
        sizes = [
            r["c"]
            for r in asg.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ]
        pts.append((n, sum(s * s for s in sizes)))
    assert _alpha(pts) <= 1.75, pts


def test_nd_knobs_candidate_mass_subquadratic(spark):
    """Pins the r9 100x-probe fix (`plans/vectors.py::nd_knobs`): with
    BOTH banding knobs derived from the corpus (planes-per-band from the
    load=8 rule, bands +2/bit for recall) the banded candidate mass must
    stay subquadratic. The fixed 8x6 banding this replaced measured
    alpha ~ 2 past its design point (est. ~2.5e9 candidates at 200k
    vectors, DNF at the 100x probe); a regression to fixed knobs fails
    this at the first decade."""
    from eth_dspa_2019_spark.plans.vectors import nd_knobs

    pts = []
    for n, e in _emb_slices(spark):
        rpb, bands = nd_knobs(n)
        bucketed = e.select(
            "vec_id", F.col("embedding").alias("emb")
        ).mapInPandas(
            lsh_buckets_batches(bands, rpb, 64),
            schema="vec_id long, band int, bucket long",
        )
        x, y = bucketed.alias("x"), bucketed.alias("y")
        c = (
            x.join(
                y,
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.vec_id") < F.col("y.vec_id")),
            )
            .select("x.vec_id", "y.vec_id")
            .distinct()
            .count()
        )
        pts.append((n, c))
    assert _alpha(pts) <= 1.40, pts


def test_codebook_stride_knobs_cap_growth():
    """The 10x certification cliff class, pinned: stride-seeded IVF/PQ
    codebooks must stop growing linearly once the cap binds (encode /
    assign cost is N*K — a fixed stride makes it N^2/stride), and the
    Python knob must equal its SQL mirror's integer arithmetic at every
    scale, including both cap boundaries."""
    import duckdb

    from eth_dspa_2019_spark.plans.vectors import (
        IVF_NLIST_CAP,
        IVF_STRIDE,
        PQ_CB_CAP,
        ivf_stride,
        pq_stride,
    )
    from eth_dspa_2019_spark.operators.similarity import PQ_STRIDE

    con = duckdb.connect()
    for n in (1, 200, 2000, PQ_STRIDE * PQ_CB_CAP, PQ_STRIDE * PQ_CB_CAP + 1,
              IVF_STRIDE * IVF_NLIST_CAP, IVF_STRIDE * IVF_NLIST_CAP + 1,
              20_000, 200_000, 10_000_000):
        # knob == ceil-div form == SQL mirror arithmetic
        assert pq_stride(n) == max(PQ_STRIDE, -(-n // PQ_CB_CAP))
        assert ivf_stride(n) == max(IVF_STRIDE, -(-n // IVF_NLIST_CAP))
        sql_pq, sql_ivf = con.execute(
            f"SELECT greatest({PQ_STRIDE}, ({n} + {PQ_CB_CAP - 1}) // {PQ_CB_CAP}),"
            f" greatest({IVF_STRIDE}, ({n} + {IVF_NLIST_CAP - 1}) // {IVF_NLIST_CAP})"
        ).fetchone()
        assert pq_stride(n) == sql_pq and ivf_stride(n) == sql_ivf, n
        # the caps actually bind: codebook size is bounded at every N
        assert -(-n // pq_stride(n)) <= PQ_CB_CAP + 1
        assert -(-n // ivf_stride(n)) <= IVF_NLIST_CAP + 1
    # fixture scales keep the floor strides -> gate values unchanged
    assert pq_stride(200) == PQ_STRIDE and pq_stride(2000) == 8
    assert ivf_stride(200) == IVF_STRIDE and ivf_stride(2000) == IVF_STRIDE
