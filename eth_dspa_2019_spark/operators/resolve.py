"""Reply→root-post resolution: the reference's central shared preprocessing
stage (`SN/task/postidresolution/PostIdResolver.java:99-225` streaming with
memcached+timers; batch spec `SN/validation/BatchPostIdResolver.java:54-91`,
`SN/validation/GenerateExpectedMappings.java:25-57`).

Spark-first design: the child→parent comment forest is resolved with a
**pointer-doubling join fixpoint** — each iteration either resolves an entry
(its parent is already resolved) or re-points it two hops up, so the number
of iterations is O(log max_depth), each one an equi-join on the child id.
No external K/V store, no per-record RPC: the mapping is an ordinary
DataFrame, and at cluster scale each iteration is one hash-partitioned join
of the (still-unresolved) mapping against itself. ``localCheckpoint``
truncates the growing lineage between iterations.

The reference disambiguates overlapping post/comment id spaces with string
key prefixes ``p_``/``r_`` in memcached (F13,
`SN/task/postidresolution/PostIdResolver.java:87-91`); typed columns make
that encoding unnecessary here — comment ids and post ids live in separate
columns (``id`` vs ``root``/``post_id``) and never meet in one key space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import KIND_COMMENT, KIND_LIKE, KIND_POST, KIND_REPLY

MAX_ITERS = 64  # supports comment-tree depth up to 2^64 — effectively unbounded


def resolve_post_ids(acts: DataFrame) -> DataFrame:
    """(child_id, root_post_id) for every comment and reply.

    Comments carry their root directly (reply_to_postId); replies start as
    pointers to their parent comment/reply and are chased to the root by
    pointer doubling.
    """
    mapping = acts.filter(F.col("kind").isin(KIND_COMMENT, KIND_REPLY)).select(
        "id",
        F.when(F.col("kind") == KIND_COMMENT, F.col("post_id")).alias("root"),
        F.when(F.col("kind") == KIND_REPLY, F.col("parent_id")).alias("ptr"),
    )
    mapping = mapping.localCheckpoint(eager=True)
    for _ in range(MAX_ITERS):
        unresolved = mapping.filter(F.col("root").isNull())
        if unresolved.limit(1).count() == 0:
            break
        resolved = mapping.filter(F.col("root").isNotNull())
        # chase one hop: parent resolved → take its root; else point to
        # parent's parent (path doubling halves remaining chain depth)
        chased = (
            unresolved.alias("u")
            .join(mapping.alias("p"), F.col("u.ptr") == F.col("p.id"), "left")
            .select(
                F.col("u.id").alias("id"),
                F.col("p.root").alias("root"),
                F.col("p.ptr").alias("ptr"),
            )
        )
        mapping = resolved.unionByName(chased).localCheckpoint(eager=True)
    return mapping.select("id", F.col("root").alias("root_post_id"))


def resolved_activities(acts: DataFrame) -> DataFrame:
    """The activity stream with every row's ``post_id`` resolved to its root
    post — the input to Tasks 1/2/3. Posts key by their own id, comments and
    likes by their direct target, replies by the chased root
    (`SN/util/Activity.java:75-77`)."""
    mapping = resolve_post_ids(acts)
    replies = (
        acts.filter(F.col("kind") == KIND_REPLY)
        .drop("post_id")
        .join(mapping.withColumnRenamed("id", "rid"), F.col("id") == F.col("rid"), "left")
        .withColumn("post_id", F.col("root_post_id"))
        .drop("rid", "root_post_id")
    )
    rest = acts.filter(F.col("kind").isin(KIND_POST, KIND_COMMENT, KIND_LIKE))
    return rest.unionByName(replies.select(*rest.columns))
