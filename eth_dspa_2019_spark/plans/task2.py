"""Registered Task 2 (friend recommendation) queries — static similarity,
windowed co-activity similarity, and the blended top-5 recommendations
(`SN/task/recommendation/FriendRecommender.java`, batch spec
`SN/validation/Task2Evaluator.java:61-148`).

Oracle SQL is generated from the same AttrTable/friend constants as the
Spark operators; score arithmetic is pure integer-derived double math, so
both engines produce bit-identical scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.readers import load_table
from ..operators.recommend import (
    ATTR_TABLES,
    DYNAMIC_WEIGHT,
    FRIEND_FAN,
    N_EIGEN,
    STATIC_WEIGHT,
    TOP_N,
    candidate_grid,
    dynamic_similarity,
    recommendations,
    static_similarity,
    synth_friend_edges,
    synth_person_attrs,
    windowed_activity_counts,
)
from .registry import register
from .social import _O_BASE, _O_RESOLVE, _O_RESOLVED


def _attrs_sql() -> str:
    parts = [
        f"SELECT DISTINCT user_id AS person_id, {t.tbl} AS tbl, "
        f"(user_id * {t.prime} + j * {t.coprime}) % {t.mod} AS object_id "
        f"FROM users, range(0, {t.card}) t(j)"
        for t in ATTR_TABLES
    ]
    return " UNION ALL ".join(parts)


_O_STATIC = f"""
    users AS (SELECT DISTINCT user_id FROM events),
    umax AS (SELECT max(user_id) + 1 AS nu FROM events),
    attrs AS ({_attrs_sql()}),
    friends AS (
      SELECT e.user_id AS eigen_id,
             (e.user_id * {FRIEND_FAN} + j) % (SELECT nu FROM umax) AS user_id
      FROM users e, range(1, {FRIEND_FAN + 1}) t(j)
      WHERE e.user_id < {N_EIGEN}
    ),
    grid AS (
      SELECT e.user_id AS eigen_id, u.user_id
      FROM users e, users u
      WHERE e.user_id < {N_EIGEN} AND u.user_id != e.user_id
        AND NOT EXISTS (SELECT 1 FROM friends f
                        WHERE f.eigen_id = e.user_id AND f.user_id = u.user_id)
    ),
    inter AS (
      SELECT a.person_id AS eigen_id, b.person_id AS user_id, count(*) AS s
      FROM attrs a
      JOIN attrs b ON a.tbl = b.tbl AND a.object_id = b.object_id
      WHERE a.person_id < {N_EIGEN} AND b.person_id != a.person_id
      GROUP BY 1, 2
    ),
    static AS (
      SELECT g.eigen_id, g.user_id, coalesce(i.s, 0) AS s
      FROM grid g
      LEFT JOIN inter i ON i.eigen_id = g.eigen_id AND i.user_id = g.user_id
    )
"""

_O_DYNAMIC = """
    cnts AS (
      SELECT (ts_ms // 3600000) * 3600 - i * 3600 + 14400 AS window_end,
             post_id, person_id, count(*) AS c
      FROM resolved, range(0, 4) t(i)
      GROUP BY 1, 2, 3
    ),
    dyn AS (
      SELECT e.window_end, e.person_id AS eigen_id,
             u.person_id AS user_id, CAST(sum(e.c * u.c) AS BIGINT) AS d
      FROM cnts e
      JOIN cnts u ON e.window_end = u.window_end AND e.post_id = u.post_id
      WHERE e.person_id < {n_eigen} AND u.person_id != e.person_id
      GROUP BY 1, 2, 3
    ),
    dyn_x AS (
      SELECT dyn.* FROM dyn
      WHERE NOT EXISTS (SELECT 1 FROM friends f
                        WHERE f.eigen_id = dyn.eigen_id
                          AND f.user_id = dyn.user_id)
    )
""".format(n_eigen=N_EIGEN)


def _users(spark: SparkSession, sf_dir: str):
    from ..io.stats import table_stats

    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    num_users = table_stats(spark, sf_dir, "events")["max_user_id"] + 1
    return users, num_users


@register(
    "task2_static_similarity",
    oracle=f"""
    WITH {_O_STATIC}
    SELECT eigen_id, user_id, s FROM static
    """,
)
def task2_static_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/U3/J2: static profile similarity — per-table set-intersection
    equi-joins summed over the 4 person_* tables, zero-filled on the
    friend-excluded candidate grid."""
    users, num_users = _users(spark, sf_dir)
    friends = synth_friend_edges(users, num_users)
    grid = candidate_grid(users, friends)
    return static_similarity(grid, synth_person_attrs(users))


@register(
    "task2_activity_counts",
    oracle=f"""
    WITH RECURSIVE {_O_BASE}, {_O_RESOLVE}, {_O_RESOLVED},
    cnts AS (
      SELECT (ts_ms // 3600000) * 3600 - i * 3600 + 14400 AS window_end,
             post_id, person_id, count(*) AS c
      FROM resolved, range(0, 4) t(i)
      GROUP BY 1, 2, 3
    )
    SELECT window_end, post_id, person_id, c FROM cnts
    """,
)
def task2_activity_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/W4: per-user activity counts per post per 4h/1h sliding window —
    the map-accumulator aggregate feeding Task 2
    (`FriendRecommender.java:212-238`), flattened into rows."""
    from .social import _resolved

    return windowed_activity_counts(_resolved(spark, sf_dir))


@register(
    "task2_dynamic_similarity",
    oracle=f"""
    WITH RECURSIVE {_O_BASE}, {_O_RESOLVE}, {_O_RESOLVED}, {_O_STATIC},
    {_O_DYNAMIC}
    SELECT window_end, eigen_id, user_id, d FROM dyn_x
    """,
)
def task2_dynamic_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/A6/A7/W4: windowed co-occurrence similarity — per-post per-user
    activity counts over 4h/1h windows, eigenCount·userCount summed over
    posts, friends/self excluded."""
    users, num_users = _users(spark, sf_dir)
    friends = synth_friend_edges(users, num_users)
    from .social import _resolved

    counts = windowed_activity_counts(_resolved(spark, sf_dir))
    return dynamic_similarity(counts, friends)


@register(
    "task2_recommendations",
    oracle=f"""
    WITH RECURSIVE {_O_BASE}, {_O_RESOLVE}, {_O_RESOLVED}, {_O_STATIC},
    {_O_DYNAMIC},
    sranges AS (SELECT eigen_id, min(s) AS smin, max(s) AS smax
                FROM static GROUP BY 1),
    dranges AS (SELECT window_end, eigen_id, min(d) AS dmin, max(d) AS dmax
                FROM dyn_x GROUP BY 1, 2),
    wins AS (SELECT DISTINCT window_end FROM cnts),
    scored AS (
      SELECT w.window_end, s.eigen_id, s.user_id,
             {STATIC_WEIGHT} * (CASE WHEN sr.smax > sr.smin
                   THEN (s.s - sr.smin) / (sr.smax - sr.smin)
                   ELSE 1.0 END)
           + {DYNAMIC_WEIGHT} * (CASE WHEN dr.dmax IS NOT NULL
                        AND dr.dmax > dr.dmin
                   THEN (coalesce(dx.d, 0) - dr.dmin) / (dr.dmax - dr.dmin)
                   ELSE 1.0 END) AS score
      FROM wins w
      CROSS JOIN static s
      JOIN sranges sr ON sr.eigen_id = s.eigen_id
      LEFT JOIN dyn_x dx ON dx.window_end = w.window_end
                        AND dx.eigen_id = s.eigen_id
                        AND dx.user_id = s.user_id
      LEFT JOIN dranges dr ON dr.window_end = w.window_end
                          AND dr.eigen_id = s.eigen_id
    )
    SELECT window_end, eigen_id, rank, user_id AS rec_user_id, score
    FROM (SELECT *, cast(row_number() OVER (
            PARTITION BY window_end, eigen_id
            ORDER BY score DESC, user_id) AS int) AS rank
          FROM scored)
    WHERE rank <= {TOP_N}
    """,
)
def task2_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/F8: the full Task 2 pipeline — min–max-normalized
    0.3·static + 0.7·dynamic blend, top-5 per (window, eigen user) with
    deterministic (score desc, user asc) tie-break."""
    users, num_users = _users(spark, sf_dir)
    friends = synth_friend_edges(users, num_users)
    grid = candidate_grid(users, friends)
    from .social import _resolved

    # recommendations() consumes static 3x (ranges, ranking, dyn-candidate
    # join) and dynamic 4x (ranges, per-eigen bound, candidates, anti-join)
    # — without a barrier Spark re-executes each subtree per consumer
    # (guide §5 caching / §3.3 materialize reused intermediates: the
    # r11-baseline plan was 490 nodes with 152 Exchanges and zero reuse).
    # Materialize each narrow similarity relation once; counts feeds both
    # dynamic and the window list, so it is materialized first. All three
    # are small by construction (static: N_EIGEN x users; counts/dynamic:
    # bounded by per-window co-activity).
    static = static_similarity(
        grid, synth_person_attrs(users)
    ).localCheckpoint(eager=True)
    counts = windowed_activity_counts(
        _resolved(spark, sf_dir)
    ).localCheckpoint(eager=True)
    dynamic = dynamic_similarity(counts, friends).localCheckpoint(
        eager=True
    )
    windows = counts.select("window_end").distinct()
    return recommendations(static, dynamic, windows)
