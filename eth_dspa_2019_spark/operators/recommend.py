"""Task 2 — friend recommendation operators
(`SN/task/recommendation/FriendRecommender.java`, batch spec
`SN/validation/Task2Evaluator.java:61-148`).

Pipeline: static profile similarity (set-intersection joins over the
person_* attribute tables, J3) + windowed co-activity similarity (per-post
co-occurrence self-join, J4/A6/A7) → per-(window, eigen) min–max
normalization + 0.3·static + 0.7·dynamic blend → top-5 (T1/F8), with
already-friends excluded by anti-join (J2/U2).

Scale notes: the eigen side is 10 users — every join against it is a
broadcast; the co-occurrence self-join is keyed by (window, post), so its
shuffle is bounded by per-post activity, never the full stream; the static
similarity join runs once, off the streaming path, exactly as the reference
computes it at job start (`FriendRecommender.java:158-210`).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

STATIC_WEIGHT = 0.3
DYNAMIC_WEIGHT = 0.7
TOP_N = 5
N_EIGEN = 10  # eigen users = the N smallest user ids (reference: fixed list,
# `SN/util/Config.java:72`)


@dataclass(frozen=True)
class AttrTable:
    """Deterministic synthetic person-attribute table: person p holds
    objects {(p·prime + j·coprime) % mod : j < card} — the fixture stand-in
    for person_hasInterest_tag / isLocatedIn / studyAt / workAt."""

    tbl: int
    prime: int
    coprime: int
    mod: int
    card: int


ATTR_TABLES = (
    AttrTable(0, 7, 13, 97, 5),  # hasInterest_tag
    AttrTable(1, 11, 1, 50, 1),  # isLocatedIn_place
    AttrTable(2, 5, 17, 60, 2),  # studyAt_organisation
    AttrTable(3, 3, 29, 80, 3),  # workAt_organisation
)

FRIEND_FAN = 3  # friends(e) = {(e·3 + j) % U : j = 1..3}


def synth_person_attrs(users: DataFrame) -> DataFrame:
    """(person_id, tbl, object_id) edge list across the 4 attribute tables."""
    parts = []
    for t in ATTR_TABLES:
        parts.append(
            users.select(
                "user_id",
                F.explode(F.sequence(F.lit(0), F.lit(t.card - 1))).alias("j"),
            )
            .select(
                F.col("user_id").alias("person_id"),
                F.lit(t.tbl).alias("tbl"),
                ((F.col("user_id") * t.prime + F.col("j") * t.coprime) % t.mod).alias(
                    "object_id"
                ),
            )
            .distinct()
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def synth_friend_edges(users: DataFrame, num_users: int) -> DataFrame:
    """(eigen_id, user_id) friendship edges for the eigen users."""
    return (
        users.filter(F.col("user_id") < N_EIGEN)
        .select(
            F.col("user_id").alias("eigen_id"),
            F.explode(F.sequence(F.lit(1), F.lit(FRIEND_FAN))).alias("j"),
        )
        .select(
            "eigen_id",
            ((F.col("eigen_id") * FRIEND_FAN + F.col("j")) % num_users).alias(
                "user_id"
            ),
        )
    )


def candidate_grid(users: DataFrame, friends: DataFrame) -> DataFrame:
    """eigens × users minus self minus already-friends (anti-join, J2).
    Zero-similarity candidates are kept — the reference's per-table maps
    contain every user of the table, intersection size 0 included
    (`FriendRecommender.java:181-189`)."""
    eigens = users.filter(F.col("user_id") < N_EIGEN).select(
        F.col("user_id").alias("eigen_id")
    )
    grid = (
        eigens.crossJoin(users)
        .filter(F.col("user_id") != F.col("eigen_id"))
    )
    return grid.join(F.broadcast(friends), ["eigen_id", "user_id"], "left_anti")


def static_similarity(grid: DataFrame, attrs: DataFrame) -> DataFrame:
    """(eigen_id, user_id, s): Σ over tables of |attr(eigen) ∩ attr(user)|
    — the set-intersection similarity join (J3/U3), zero-filled on the
    candidate grid."""
    a = attrs.filter(F.col("person_id") < N_EIGEN)
    inter = (
        F.broadcast(a.select(
            F.col("person_id").alias("eigen_id"), "tbl", "object_id"
        ))
        .join(
            attrs.select(F.col("person_id").alias("user_id"), "tbl", "object_id"),
            ["tbl", "object_id"],
        )
        .filter(F.col("user_id") != F.col("eigen_id"))
        .groupBy("eigen_id", "user_id")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    return grid.join(inter, ["eigen_id", "user_id"], "left").select(
        "eigen_id", "user_id", F.coalesce("s", F.lit(0)).alias("s")
    )


def windowed_activity_counts(resolved: DataFrame) -> DataFrame:
    """(window_end, post_id, person_id, c): per-user activity counts per
    post per 4h/1h sliding window (A6/W4)."""
    acts = resolved.withColumn("ets", F.timestamp_millis(F.col("ts_ms")))
    return (
        acts.groupBy(
            F.window("ets", "4 hours", "1 hour").alias("w"),
            "post_id",
            "person_id",
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.col("w.end").cast("long").alias("window_end"),
            "post_id",
            "person_id",
            "c",
        )
    )


def dynamic_similarity(counts: DataFrame, friends: DataFrame) -> DataFrame:
    """(window_end, eigen_id, user_id, d): Σ over posts of
    eigenCount·userCount per window (J4), friends/self excluded — the
    windowed co-occurrence self-join, eigen side broadcast."""
    e = counts.filter(F.col("person_id") < N_EIGEN).select(
        "window_end",
        "post_id",
        F.col("person_id").alias("eigen_id"),
        F.col("c").alias("ec"),
    )
    d = (
        F.broadcast(e)
        .join(counts, ["window_end", "post_id"])
        .filter(F.col("person_id") != F.col("eigen_id"))
        .groupBy(
            "window_end", "eigen_id", F.col("person_id").alias("user_id")
        )
        .agg(F.sum(F.col("ec") * F.col("c")).alias("d"))
    )
    return d.join(
        F.broadcast(friends), ["eigen_id", "user_id"], "left_anti"
    ).select("window_end", "eigen_id", "user_id", "d")


def recommendations(
    static: DataFrame, dynamic: DataFrame, windows: DataFrame
) -> DataFrame:
    """(window_end, eigen_id, rank, rec_user_id, score): min–max normalize
    each similarity within its per-(window, eigen) range (degenerate span →
    1.0, `FriendRecommender.java:383-391`), blend 0.3·static + 0.7·dynamic,
    take top-5 by (score desc, user asc) (T1/F8).

    Candidates are the static grid (every user has static entries here, so
    the reference's dynamic-only branch — score = 0.7·dynamicPart with no
    static term — is structurally empty); absent dynamic similarity
    defaults to 0, normalized against the window's dynamic range
    (`FriendRecommender.java:377-392`).

    Scale plan — never materialize windows × users: users WITHOUT a dynamic
    entry in a window all share the same dynamicPart, so their score order
    is their static order, and the true top-5 of a (window, eigen) can only
    contain (a) that window's dynamic users and (b) the first
    5 + |dynamic users| entries of the eigen's static ranking (at most that
    many static-ranked users can be displaced). The scored relation is
    O(windows × (5 + max_dyn)) instead of O(windows × users)."""
    sranges = static.groupBy("eigen_id").agg(
        F.min("s").alias("smin"), F.max("s").alias("smax")
    )
    dranges = dynamic.groupBy("window_end", "eigen_id").agg(
        F.min("d").alias("dmin"),
        F.max("d").alias("dmax"),
        F.count(F.lit(1)).alias("dc"),
    )
    srk = Window.partitionBy("eigen_id").orderBy(F.desc("s"), F.asc("user_id"))
    static_rk = static.withColumn("srank", F.row_number().over(srk))
    # Displacement bound per eigen: a (window, eigen) top-5 can reach at
    # most TOP_N + dc(window, eigen) deep into the static ranking, so the
    # per-eigen max of dc bounds the static head. Joined as a broadcast
    # (N_EIGEN rows) instead of the former driver collect() — that scalar
    # job re-executed the whole dynamic-similarity subtree at plan-build
    # time, before the real job ran it again (guide §1.2: don't compute
    # things twice; §5: keep data work off the driver).
    dc_eigen = dranges.groupBy("eigen_id").agg(F.max("dc").alias("dc_max"))
    static_head = (
        static_rk.join(F.broadcast(dc_eigen), "eigen_id", "left")
        .filter(
            F.col("srank") <= TOP_N + F.coalesce(F.col("dc_max"), F.lit(0))
        )
        .drop("dc_max")
    )
    # (a) the window's dynamic users, with their static similarity attached
    dyn_cand = dynamic.join(static.withColumnRenamed("s", "s2"), ["eigen_id", "user_id"])
    dyn_cand = dyn_cand.select(
        "window_end", "eigen_id", "user_id", F.col("s2").alias("s"), "d"
    )
    # (b) the static head, replicated per window, minus users already in (a)
    stat_cand = (
        windows.crossJoin(F.broadcast(static_head))
        .join(
            dynamic.select("window_end", "eigen_id", "user_id"),
            ["window_end", "eigen_id", "user_id"],
            "left_anti",
        )
        .select(
            "window_end",
            "eigen_id",
            "user_id",
            "s",
            F.lit(None).cast("long").alias("d"),
        )
    )
    cand = (
        dyn_cand.unionByName(stat_cand)
        .join(F.broadcast(sranges), "eigen_id")
        .join(
            F.broadcast(dranges.select("window_end", "eigen_id", "dmin", "dmax")),
            ["window_end", "eigen_id"],
            "left",
        )
    )
    spart = F.when(
        F.col("smax") > F.col("smin"),
        (F.col("s") - F.col("smin")) / (F.col("smax") - F.col("smin")),
    ).otherwise(F.lit(1.0))
    dval = F.coalesce(F.col("d"), F.lit(0))
    dpart = F.when(
        F.col("dmax").isNotNull() & (F.col("dmax") > F.col("dmin")),
        (dval - F.col("dmin")) / (F.col("dmax") - F.col("dmin")),
    ).otherwise(F.lit(1.0))
    scored = cand.select(
        "window_end",
        "eigen_id",
        "user_id",
        (STATIC_WEIGHT * spart + DYNAMIC_WEIGHT * dpart).alias("score"),
    )
    w = Window.partitionBy("window_end", "eigen_id").orderBy(
        F.desc("score"), F.asc("user_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_N)
        .select(
            "window_end",
            "eigen_id",
            "rank",
            F.col("user_id").alias("rec_user_id"),
            "score",
        )
    )
