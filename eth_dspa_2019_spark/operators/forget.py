"""Deletion propagation (right-to-be-forgotten): given a doc-id delete
set, purge the corpus AND every derived relation built from it — the
compliance-driven operation a 100-TB training-data pipeline must support
(GDPR Art. 17 and friends). The corpus's tombstone protocol (O5,
`sources/activity.py`) covers the SOURCE stream; this covers the DERIVED
state: postings, document lengths, dedup artifacts, shard layouts.

Batch side here; the standing-state retraction twins live in
`streaming/postings.py::StreamingPostingsIndex.delete_docs` and
`streaming/corpus_dedup.py::StreamingCorpusDedup.delete_batch` (tombstone
delta + anti-join reads + purge-at-compaction).

Scale shape: every purge is one anti-join per relation with the delete
set BROADCAST (a delete batch is doc-id-sized, never corpus-sized), so
propagation over N derived relations is N map-side probes over their
scans — no shuffle is introduced anywhere. The audit's per-relation
counts are scalar aggregates (1-row funnels).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def delete_id_col(deletes: DataFrame, id_col: str | None = None) -> Column:
    """The delete-id column of a delete frame. A compliance primitive
    must not guess: without an explicit ``id_col`` the frame must have
    exactly ONE column — silently taking ``columns[0]`` of a wider frame
    would purge by the wrong column with no error."""
    if id_col is not None:
        if id_col not in deletes.columns:
            raise ValueError(
                f"delete frame has no column {id_col!r}; has {deletes.columns}"
            )
        return F.col(id_col)
    if len(deletes.columns) != 1:
        raise ValueError(
            "ambiguous delete frame: pass the delete-id column name "
            f"explicitly for a multi-column frame (got {deletes.columns})"
        )
    return F.col(deletes.columns[0])


def purge_relation(
    rel: DataFrame,
    deletes: DataFrame,
    id_col: str,
    delete_id: str | None = None,
) -> DataFrame:
    """``rel`` minus all rows whose ``id_col`` is in the delete set —
    one broadcast anti-join, the universal propagation step."""
    d = F.broadcast(
        deletes.select(delete_id_col(deletes, delete_id).alias("__del_id"))
        .distinct()
    )
    return rel.join(d, rel[id_col] == d["__del_id"], "left_anti")


def purge_relations(
    relations: dict[str, tuple[DataFrame, str]], deletes: DataFrame
) -> dict[str, DataFrame]:
    """Propagate one delete set through every derived relation:
    ``{name: (df, id_col)}`` → ``{name: purged_df}``."""
    return {
        name: purge_relation(df, deletes, idc)
        for name, (df, idc) in relations.items()
    }


def purge_audit(
    relations: dict[str, tuple[DataFrame, str]],
    deletes: DataFrame,
    delete_id: str | None = None,
) -> DataFrame:
    """The compliance report: one row per relation with
    ``(relation, rows_before, rows_after, rows_purged)``. Each relation
    contributes ONE aggregate pass (left-join flag + conditional count),
    so the audit costs one scan per relation regardless of corpus size."""
    d = F.broadcast(
        deletes.select(delete_id_col(deletes, delete_id).alias("__del_id"))
        .distinct()
    )
    parts = []
    for name, (df, idc) in sorted(relations.items()):
        flagged = df.join(d, df[idc] == d["__del_id"], "left")
        parts.append(
            flagged.agg(
                F.lit(name).alias("relation"),
                F.count(F.lit(1)).alias("rows_before"),
                (F.count(F.lit(1)) - F.count("__del_id")).alias("rows_after"),
                F.count("__del_id").alias("rows_purged"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
