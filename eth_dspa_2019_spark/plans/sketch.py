"""Sketch-based approximate aggregation: count-min-sketch heavy hitters.

Companion to the deterministic HyperLogLog in :mod:`.misc`
(``unique_users_approx``): where HLL bounds the state of a DISTINCT count,
the count-min sketch bounds the state of per-key frequency estimation — the
building block for heavy-hitter detection over unbounded key domains
(reference analog: the per-post activity counters of
`SN/task/activepost/ActivePostStatistician.java:71-96`, which keep exact
per-key state; the sketch is the 100-TB form where the key domain doesn't
fit).

Like the HLL, the sketch is implemented from its public definition
(Cormode & Muthukrishnan 2005) over the shared md5-derived ``h64`` hash
with integer-only bucket math, so Spark and the DuckDB oracle agree bit
for bit and the query carries a real correctness signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import MERSENNE31, h64, o_h64, perm_coeffs
from ..io.readers import load_table
from .registry import register

CMS_D = 4  # hash rows; P(over-estimate > eps) <= (1/2)^D per row bound
CMS_W = 512  # buckets per row; eps ~ e / W of the stream length
_CMS_COEFFS = perm_coeffs(CMS_D)


def _o_cms() -> str:
    b_cols = ", ".join(
        f"((({a} * hb + {b}) % {MERSENNE31}) % {CMS_W}) AS b{r}"
        for r, (a, b) in enumerate(_CMS_COEFFS)
    )
    pair_union = " UNION ALL ".join(
        f"SELECT {r} AS r, b{r} AS bucket FROM hashed" for r in range(CMS_D)
    )
    sketch_joins = " ".join(
        f"JOIN sketch s{r} ON s{r}.r = {r} AND s{r}.bucket = u.b{r}"
        for r in range(CMS_D)
    )
    least_args = ", ".join(f"s{r}.cnt" for r in range(CMS_D))
    return f"""
    WITH hb AS (
      SELECT user_id,
             {o_h64('cast(user_id AS varchar)')} % {MERSENNE31} AS hb
      FROM events
    ),
    hashed AS (SELECT user_id, {b_cols} FROM hb),
    pairs AS ({pair_union}),
    sketch AS (SELECT r, bucket, count(*) AS cnt FROM pairs GROUP BY 1, 2),
    users AS (
      SELECT user_id, min(b0) AS b0, min(b1) AS b1, min(b2) AS b2,
             min(b3) AS b3, count(*) AS n_exact
      FROM hashed GROUP BY user_id
    )
    SELECT u.user_id, u.n_exact, least({least_args}) AS est_count
    FROM users u {sketch_joins}
    """


def with_cms_buckets(df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """(key, b0..b{D-1}): one md5 base hash per row, D integer bucket
    derivations — shared by the batch query and the streaming sketch."""
    hb = (h64(F.col(key_col).cast("string")) % MERSENNE31).alias("hb")
    return df.select(key_col, hb).select(
        key_col,
        *[
            (((F.lit(a) * F.col("hb") + F.lit(b)) % MERSENNE31) % CMS_W).alias(
                f"b{r}"
            )
            for r, (a, b) in enumerate(_CMS_COEFFS)
        ],
    )


def cms_pairs(hashed: DataFrame) -> DataFrame:
    """Explode bucketed rows into the (r, bucket) update stream the D×W
    counter table aggregates — associative, so partials merge map-side in
    batch and incrementally across micro-batches in streaming."""
    return hashed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), F.col(f"b{r}").alias("bucket")
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("p")
    ).select("p.r", "p.bucket")


@register("event_heavy_hitters_cms", oracle=_o_cms())
def event_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-frequency estimates from a D×W count-min sketch,
    next to the exact count so the over-estimate property (est >= exact,
    bounded by the sketch eps) is visible in the output.

    Scale shape: the sketch itself is the point — its state is exactly
    D × W = 4×512 counters regardless of stream length or key
    cardinality, and every counter update is associative, so the groupBy
    collapses map-side to at most D·W rows per partition before the
    shuffle (vs one row per distinct key for the exact count). Estimating
    a candidate set is D broadcast joins against the ≤ D·W-row sketch —
    the exact per-user count emitted here is the test surface, not the
    scale path (at 100 TB you'd query the sketch for candidates from a
    sample or a prior window, never enumerate all keys).
    """
    ev = load_table(spark, sf_dir, "events")
    hashed = with_cms_buckets(ev)
    sketch = cms_pairs(hashed).groupBy("r", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    users = hashed.groupBy("user_id").agg(
        *[F.min(f"b{r}").alias(f"b{r}") for r in range(CMS_D)],
        F.count(F.lit(1)).alias("n_exact"),
    )
    est = users
    for r in range(CMS_D):
        s_r = (
            sketch.filter(F.col("r") == r)
            .select(
                F.col("bucket").alias(f"b{r}"), F.col("cnt").alias(f"c{r}")
            )
        )
        est = est.join(F.broadcast(s_r), f"b{r}")
    return est.select(
        "user_id",
        "n_exact",
        F.least(*[F.col(f"c{r}") for r in range(CMS_D)]).alias("est_count"),
    )
