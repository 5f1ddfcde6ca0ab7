"""Task 3 — unusual-activity (anomaly) detection
(`SN/task/anomalydetection/AnomalousUserDetector.java`, deterministic batch
spec `SN/validation/Task3Evaluator.java:45-98`).

Per-activity features keyed by user (the reference's ValueState, O1, batch
form = window functions over the per-user ordered stream):

- activity frequency: 3·HOUR / max(1, t_now − t_2back) ms (F6)
- last comment/post content length (F4)
- last comment/post unique-words ratio (F5)

with ``-1`` as the not-applicable sentinel, then GLOBAL running means per
feature that skip the sentinels (A12/O4), and the threshold predicate
feature < 0.5·avg or > 2·avg (frequency: only > 2·avg) (F7).

Deterministic-spec deviations from the reference, both deliberate:

- the reference's streaming output is order/parallelism-dependent (each
  detector instance holds its own Signatures copy, `:248-274`); the defined
  semantics here is the batch evaluator's single ordered scan, with the
  total order (ts_ms, id, person_id, kind);
- fractional features (frequency, ratios) are quantized to 1e-6 fixed-point
  BIGINTs before the running sums (floor of an identical IEEE double is
  identical in every engine, integer running sums are exactly associative),
  and the reference's iterated-Integer-truncation running mean for lengths
  is replaced by the exact running mean — cross-engine-reproducible
  semantics instead of a Java-integer-division artifact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import KIND_COMMENT, KIND_POST, KIND_REPLY
from .prefix import global_running_sums

HOUR_MS = 3_600_000
Q = 1_000_000  # fixed-point scale for fractional features

# feature name -> (is quantized) — lengths stay raw ints
FEATURES = ("freq", "clen", "plen", "cratio", "pratio")


def _uniq_ratio(content: Column) -> Column:
    toks = F.split(content, r"\s+")
    return F.size(F.array_distinct(toks)) / F.size(toks)


def user_features(acts: DataFrame) -> DataFrame:
    """Per-activity feature vector (ts_ms, id, person_id, freq, clen, plen,
    cratio, pratio) — `Features.update`
    (`AnomalousUserDetector.java:110-143`): frequency from the last three
    activity timestamps of the user, content features from the CURRENT
    activity's kind (comment/reply vs post vs other), -1 sentinels
    elsewhere. Fractionals are 1e-6 fixed-point BIGINTs."""
    w_user = Window.partitionBy("person_id").orderBy("ts_ms", "id", "kind")
    t2 = F.lag("ts_ms", 2).over(w_user)
    is_comment = F.col("kind").isin(KIND_COMMENT, KIND_REPLY)
    is_post = F.col("kind") == KIND_POST
    neg = F.lit(-1).cast("bigint")
    freq = F.when(
        t2.isNotNull(),
        F.floor(
            F.lit(float(3 * HOUR_MS * Q))
            / F.greatest(F.col("ts_ms") - t2, F.lit(1))
        ),
    ).otherwise(neg)
    return acts.select(
        "ts_ms",
        "id",
        "kind",
        "person_id",
        freq.alias("freq"),
        F.when(is_comment, F.length("content").cast("bigint")).otherwise(neg).alias("clen"),
        F.when(is_post, F.length("content").cast("bigint")).otherwise(neg).alias("plen"),
        F.when(is_comment, F.floor(_uniq_ratio(F.col("content")) * Q))
        .otherwise(neg)
        .alias("cratio"),
        F.when(is_post, F.floor(_uniq_ratio(F.col("content")) * Q))
        .otherwise(neg)
        .alias("pratio"),
    )


def anomalies(acts: DataFrame) -> DataFrame:
    """(ts_ms, user_id) rows whose feature vector is abnormal vs the global
    running means *including the current activity* (`Task3Evaluator.java:
    81-89`: signature update precedes the isNormal check).

    The global running means are computed with the two-stage range-prefix
    plan (`operators/prefix.py`) — per-range-partition running sums plus
    broadcast partition offsets — bit-identical to a single global ordered
    scan (the sums are BIGINT fixed-point, hence associative), but with no
    single-partition window anywhere in the plan."""
    feats = user_features(acts)
    order = ["ts_ms", "id", "person_id", "kind"]
    exprs = {}
    for f in FEATURES:
        c = F.col(f)
        exprs[f"{f}_s"] = F.when(c != -1, c)
        exprs[f"{f}_c"] = F.when(c != -1, F.lit(1))
    run = global_running_sums(feats, order, exprs)
    scored = run.select("ts_ms", "person_id", *FEATURES, *[
        (F.col(f"{f}_s").cast("double") / F.col(f"{f}_c")).alias(f"{f}_avg")
        for f in FEATURES
    ])

    def hi_lo(f: str) -> Column:
        c = F.col(f).cast("double")
        return (F.col(f) != -1) & (
            (c < 0.5 * F.col(f"{f}_avg")) | (c > 2.0 * F.col(f"{f}_avg"))
        )

    freq_c = F.col("freq").cast("double")
    abnormal = (
        ((F.col("freq") != -1) & (freq_c > 2.0 * F.col("freq_avg")))
        | hi_lo("clen")
        | hi_lo("plen")
        | hi_lo("cratio")
        | hi_lo("pratio")
    )
    return scored.filter(abnormal).select(
        "ts_ms", F.col("person_id").alias("user_id")
    )
