"""Hybrid retrieval: reciprocal-rank fusion of a lexical (BM25) ranking
and a semantic (embedding cosine) ranking over the same corpus — the
standard hybrid-search surface (Cormack et al., SIGIR'09 RRF) that a
training-data pipeline uses to pull "relevant by words OR by meaning"
documents for a probe query.

Reference parity note: the reference engine has no retrieval surface;
this extends the LLM-pipeline family (SURVEY.md §2 additions) by
composing the BM25 scorer (`plans/llm.py`) with the fixed-point cosine
kernel (`operators/similarity.py`) — one fusion operator, two existing
index families.

Cross-engine determinism: ranks on both legs are integer row_numbers
over exactly-reproducible orderings (BM25 scores are fixed-point
BIGINTs; cosine ordering keys are the same textual double expression
over exact floor-quantized BIGINT dot/norm sums in both engines), and
the fused score is pure integer arithmetic — ``RRF_FX // (RRF_K +
rank)`` summed over the legs — so the output hashes bit-identically.

Scale shape: each leg is the already-audited shape (BM25: one postings
shuffle + broadcast query terms + TakeOrdered; cosine: broadcast ONE
query vector onto a linear scan — no join, no shuffle until the
TakeOrdered). Fusion itself joins two k-row relations — driver-trivial
at any corpus size. Depth-k lists, never full rankings, cross the
fusion boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io.readers import load_table
from ..operators.similarity import FIXED_POINT
from ..functions.text import tokens
from .llm import BM25_FX, BM25_QTERMS, bm25_from_postings
from .registry import register

RRF_K = 60  # the canonical RRF smoothing constant
RRF_FX = 1_000_000  # fixed-point scale: contribution = RRF_FX // (K + rank)
FUSE_DEPTH = 50  # per-leg ranked-list depth fed into the fusion
FUSE_TOPK = 10  # fused results returned
QUERY_VEC_ID = 0  # the probe: document 0's embedding (vec_id == doc_id)


def _o_lex_leg() -> str:
    """BM25 ranked list to depth FUSE_DEPTH (same scorer as _o_bm25 in
    plans/llm.py, parameterized depth)."""
    return f"""
    tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE text IS NOT NULL
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    st AS (SELECT count(*) AS n, sum(dl) // count(*) AS avgdl FROM dl),
    cf AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1),
    dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    q AS (
      SELECT c.tok,
             length(bin(((SELECT n FROM st) - d.df) // d.df + 1))
               AS idf_bits
      FROM cf c JOIN dfreq d ON d.tok = c.tok
      ORDER BY c.cnt DESC, c.tok LIMIT {BM25_QTERMS}
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
    terms AS (
      SELECT t.doc_id,
             cast(floor({BM25_FX}.0
                  * cast(q.idf_bits * t.tf * 88 * st.avgdl AS double)
                  / cast(40 * st.avgdl * t.tf + 12 * st.avgdl
                         + 36 * d.dl AS double)) AS bigint) AS term_fx
      FROM tf t
      JOIN q ON q.tok = t.tok
      JOIN dl d ON d.doc_id = t.doc_id
      CROSS JOIN st
    ),
    lex AS (
      SELECT doc_id,
             cast(row_number() OVER (ORDER BY sum(term_fx) DESC, doc_id)
                  AS int) AS lex_rank
      FROM terms GROUP BY doc_id
      ORDER BY lex_rank LIMIT {FUSE_DEPTH}
    )
    """


def _o_vec_leg() -> str:
    """Cosine ranked list to depth FUSE_DEPTH for the single probe vector
    (fixed-point dots as in plans/vectors.py; the probe's own norm is a
    constant factor and drops out of the ordering)."""
    return f"""
    el AS (
      SELECT vec_id, i, cast(embedding[i] AS double) AS x
      FROM (SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS i,
                   embedding
            FROM embeddings)
    ),
    qv AS (SELECT i, x AS qx FROM el WHERE vec_id = {QUERY_VEC_ID}),
    dots AS (
      SELECT e.vec_id,
             sum(cast(floor(e.x * qv.qx * {FIXED_POINT}.0) AS bigint)) AS dp
      FROM el e JOIN qv ON qv.i = e.i
      WHERE e.vec_id != {QUERY_VEC_ID}
      GROUP BY 1
    ),
    norms AS (
      SELECT vec_id,
             sum(cast(floor(x * x * {FIXED_POINT}.0) AS bigint)) AS n2
      FROM el GROUP BY 1
    ),
    vec AS (
      SELECT vec_id AS doc_id,
             cast(row_number() OVER (
               ORDER BY cast(dp AS double) / sqrt(cast(n2 AS double)) DESC,
                        vec_id) AS int) AS vec_rank
      FROM dots JOIN norms USING (vec_id)
      ORDER BY vec_rank LIMIT {FUSE_DEPTH}
    )
    """


def _o_rrf() -> str:
    return f"""
    WITH {_o_lex_leg()},
    {_o_vec_leg()}
    SELECT doc_id,
           cast(coalesce(lex_rank, 0) AS int) AS lex_rank,
           cast(coalesce(vec_rank, 0) AS int) AS vec_rank,
           cast(coalesce({RRF_FX} // ({RRF_K} + lex_rank), 0)
              + coalesce({RRF_FX} // ({RRF_K} + vec_rank), 0) AS bigint)
             AS rrf_fx,
           cast(row_number() OVER (
             ORDER BY coalesce({RRF_FX} // ({RRF_K} + lex_rank), 0)
                    + coalesce({RRF_FX} // ({RRF_K} + vec_rank), 0) DESC,
                      doc_id) AS int) AS rank
    FROM lex FULL OUTER JOIN vec USING (doc_id)
    ORDER BY rank LIMIT {FUSE_TOPK}
    """


@register(
    "hybrid_rrf_search",
    oracle=_o_rrf(),
    doc=(
        f"hybrid search: RRF fusion (k={RRF_K}) of BM25 and cosine "
        f"depth-{FUSE_DEPTH} lists, top-{FUSE_TOPK}"
    ),
)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the two retrieval legs this engine
    already ships: the BM25 head-terms lexical ranking and the brute
    cosine semantic ranking for document 0's embedding as the probe.
    ``rrf_fx = Σ_leg RRF_FX // (RRF_K + rank_leg)`` (absent from a leg
    → contributes 0), fused top-{FUSE_TOPK} with doc_id tie-break.

    Plan: the lexical leg reuses :func:`plans.llm.bm25_from_postings`
    (postings shuffle + broadcast query + TakeOrdered); the semantic
    leg broadcasts ONE probe vector into a zip_with/aggregate
    projection over the embeddings scan — zero joins, zero shuffles
    before its TakeOrdered. The fusion full-outer join sees 2×{FUSE_DEPTH}
    rows total, independent of corpus size."""
    # --- lexical leg: BM25 to depth FUSE_DEPTH ---
    tok = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.explode(tokens("text")).alias("tok"))
    ).localCheckpoint(eager=True)
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    lex = bm25_from_postings(tf, dl, topk=FUSE_DEPTH).select(
        "doc_id", F.col("rank").alias("lex_rank")
    )

    # --- semantic leg: single-probe cosine to depth FUSE_DEPTH ---
    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        "embedding"
    ).collect()  # ONE probe vector — driver-side by construction
    qlit = "array(" + ",".join(
        f"cast({float(x)!r} as double)" for x in qrow[0].embedding
    ) + ")"
    scored = emb.filter(F.col("vec_id") != QUERY_VEC_ID).select(
        F.col("vec_id").alias("doc_id"),
        F.expr(
            f"aggregate(zip_with(embedding, {qlit}, (a, b) -> "
            f"cast(floor(cast(a as double) * cast(b as double) "
            f"* {FIXED_POINT}.0) as bigint)), 0L, (acc, v) -> acc + v)"
        ).alias("dp"),
        F.expr(
            "aggregate(embedding, 0L, (acc, x) -> acc + "
            f"cast(floor(cast(x as double) * cast(x as double) "
            f"* {FIXED_POINT}.0) as bigint))"
        ).alias("n2"),
    ).select(
        "doc_id",
        F.expr("cast(dp as double) / sqrt(cast(n2 as double))").alias("sim"),
    )
    wv = Window.orderBy(F.desc("sim"), "doc_id")
    vec = (
        scored.orderBy(F.desc("sim"), "doc_id")
        .limit(FUSE_DEPTH)
        .withColumn("vec_rank", F.row_number().over(wv).cast("int"))
        .select("doc_id", "vec_rank")
    )

    # --- fusion: two k-row relations, integer-exact RRF ---
    fused_expr = (
        f"coalesce({RRF_FX} div ({RRF_K} + lex_rank), 0) "
        f"+ coalesce({RRF_FX} div ({RRF_K} + vec_rank), 0)"
    )
    fused = (
        lex.join(vec, "doc_id", "full_outer")
        .withColumn("rrf_fx", F.expr(fused_expr).cast("bigint"))
    )
    wf = Window.orderBy(F.desc("rrf_fx"), "doc_id")
    return (
        fused.orderBy(F.desc("rrf_fx"), "doc_id")
        .limit(FUSE_TOPK)
        .withColumn("rank", F.row_number().over(wf).cast("int"))
        .select(
            "doc_id",
            # 0 = "absent from this leg's depth-k list" (keeps the output
            # columns non-nullable ints — cross-engine repr-stable)
            F.coalesce("lex_rank", F.lit(0)).cast("int").alias("lex_rank"),
            F.coalesce("vec_rank", F.lit(0)).cast("int").alias("vec_rank"),
            "rrf_fx",
            "rank",
        )
    )
