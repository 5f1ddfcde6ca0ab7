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
    # Working-set iteration: only the still-unresolved rows are re-chased
    # and re-materialized each round, so the per-round checkpoint volume
    # shrinks geometrically (the fixpoint's 100-TB property) instead of
    # re-writing the full mapping every round. `parts` accumulates lazy
    # filters over already-checkpointed rounds — the final union reads each
    # row exactly once. The lookup side is parts ∪ working, i.e. every
    # node's LATEST entry, which is what makes the chase pointer-DOUBLING
    # (a static lookup would degrade to one hop per round).
    parts = [mapping.filter(F.col("root").isNotNull())]
    working = mapping.filter(
        F.col("root").isNull() & F.col("ptr").isNotNull()
    )
    # dangling pointers (parent id absent) can never resolve: root stays
    # null, matching the pre-rewrite output for dirty inputs
    parts.append(mapping.filter(F.col("root").isNull() & F.col("ptr").isNull()))
    for _ in range(MAX_ITERS):
        if working.limit(1).count() == 0:
            break
        lookup = parts[0]
        for p in parts[1:]:
            lookup = lookup.unionByName(p)
        lookup = lookup.unionByName(working)
        # chase one hop: parent resolved → take its root; else point to
        # parent's parent (path doubling halves remaining chain depth)
        chased = (
            working.alias("u")
            .join(lookup.alias("p"), F.col("u.ptr") == F.col("p.id"), "left")
            .select(
                F.col("u.id").alias("id"),
                F.col("p.root").alias("root"),
                F.col("p.ptr").alias("ptr"),
            )
            .localCheckpoint(eager=True)
        )
        parts.append(chased.filter(F.col("root").isNotNull()))
        parts.append(
            chased.filter(F.col("root").isNull() & F.col("ptr").isNull())
        )
        working = chased.filter(
            F.col("root").isNull() & F.col("ptr").isNotNull()
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.unionByName(working)
    return out.select("id", F.col("root").alias("root_post_id"))


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


def comment_depths(acts: DataFrame) -> DataFrame:
    """(id, depth) for every comment and reply: hops to the root post
    (comments = 1, a reply to a comment = 2, ...) — the tree-structure
    profile of the resolution forest (`SN/task/postidresolution/
    PostIdResolver.java` resolves identity; this measures the chains it
    chases).

    Same pointer-doubling fixpoint as :func:`resolve_post_ids`, with a
    hop ACCUMULATOR: an unresolved entry carries (ptr, acc) = "acc
    original edges collapsed into this pointer"; chasing onto another
    unresolved entry adds its acc (path doubling sums the two collapsed
    segments exactly), chasing onto a resolved entry yields
    acc + parent_depth. O(log max_depth) joins, same as resolution.
    Dangling chains (parent never present) keep depth NULL.
    """
    mapping = acts.filter(F.col("kind").isin(KIND_COMMENT, KIND_REPLY)).select(
        "id",
        F.when(F.col("kind") == KIND_COMMENT, F.lit(1).cast("long")).alias(
            "depth"
        ),
        F.when(F.col("kind") == KIND_REPLY, F.col("parent_id")).alias("ptr"),
        F.when(F.col("kind") == KIND_REPLY, F.lit(1).cast("long")).alias(
            "acc"
        ),
    )
    mapping = mapping.localCheckpoint(eager=True)
    parts = [mapping.filter(F.col("depth").isNotNull())]
    working = mapping.filter(F.col("depth").isNull() & F.col("ptr").isNotNull())
    parts.append(mapping.filter(F.col("depth").isNull() & F.col("ptr").isNull()))
    for _ in range(MAX_ITERS):
        if working.limit(1).count() == 0:
            break
        lookup = parts[0]
        for p in parts[1:]:
            lookup = lookup.unionByName(p)
        lookup = lookup.unionByName(working)
        chased = (
            working.alias("u")
            .join(lookup.alias("p"), F.col("u.ptr") == F.col("p.id"), "left")
            .select(
                F.col("u.id").alias("id"),
                # parent resolved → depth = acc + parent depth; else keep
                # accumulating through the parent's own pointer
                (F.col("u.acc") + F.col("p.depth")).alias("depth"),
                F.col("p.ptr").alias("ptr"),
                (F.col("u.acc") + F.coalesce(F.col("p.acc"), F.lit(0))).alias(
                    "acc"
                ),
            )
            .localCheckpoint(eager=True)
        )
        parts.append(chased.filter(F.col("depth").isNotNull()))
        parts.append(
            chased.filter(F.col("depth").isNull() & F.col("ptr").isNull())
        )
        working = chased.filter(
            F.col("depth").isNull() & F.col("ptr").isNotNull()
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.unionByName(working)
    return out.select("id", "depth")
