"""Streaming incremental corpus dedup (VERDICT r5 #4) — the production
daily-ingest shape that the batch query `incremental_dedup_newbatch`
(`plans/llm.py`) models: a standing corpus's dedup artifacts (prefix-key
hashes, MinHash band rows, the shingle relation — see
`operators/dedup.py::corpus_dedup_artifacts`) live as engine state; each
arriving micro-batch of documents is scored against that state
(`incremental_dedup_against`: exact prefix semi-join + banded new⋈corpus
LSH with exact-Jaccard verify — never corpus×corpus), and the KEPT
documents' artifacts are appended to the state so later batches dedup
against everything that survived before them.

Semantics: batch k is scored against corpus ∪ kept(batches < k). By
default within-batch duplicates are NOT scored against each other —
matching the batch query, whose new side is scored against the corpus
side only. ``self_dedup=True`` adds the within-batch pass (the full
daily-ingest semantics when the source itself can contain dups): exact
prefix-key groups and MinHash-LSH near-dup pairs INSIDE the batch keep
their min-doc_id canonical and mark the rest, so of k copies arriving
together exactly one survives into the corpus.

State is O(corpus artifacts), persisted through the shared
versioned-snapshot harness (`streaming/durable.py`) as APPEND-ONLY
deltas: each batch commits only the kept docs' keys/bands/shingles
(O(batch) writes), with periodic compaction and rollback-on-replay — so
a restarted process resumes with the full standing corpus instead of
re-hashing 100 TB, and a replayed batch rescores idempotently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    corpus_dedup_artifacts,
    h64,
    incremental_dedup_against,
    minhash_lsh_pairs,
)
from ..operators.forget import delete_id_col
from .durable import COMPACT_EVERY, DurableTables, flat_checkpoint

_KEYS_SCHEMA = "id long, key_hash long"
_BANDS_SCHEMA = "id long, band_id int, band_key string"
_SHINGLES_SCHEMA = "id long, shingle string"
_DELETED_SCHEMA = "doc_id long"


class StreamingCorpusDedup:
    """Folds micro-batches of documents against the standing corpus
    state; optionally durable under ``state_dir``."""

    def __init__(
        self,
        spark: SparkSession,
        corpus: DataFrame | None = None,
        state_dir: str | None = None,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        num_perm: int = 16,
        bands: int = 8,
        threshold: float = 0.2,
        prefix: int = 64,
        grow: bool = True,
        self_dedup: bool = False,
    ):
        self.spark = spark
        self.params = dict(
            id_col=id_col, text_col=text_col, n=n, num_perm=num_perm,
            bands=bands, threshold=threshold, prefix=prefix,
        )
        self.grow = grow
        self.self_dedup = self_dedup
        self._corpus_src = corpus
        self.state = DurableTables(
            spark,
            state_dir,
            fulls={},
            deltas={
                "keys": _KEYS_SCHEMA,
                "bands": _BANDS_SCHEMA,
                "shingles": _SHINGLES_SCHEMA,
                # right-to-be-forgotten tombstone log: append-only doc-id
                # deletes; standing artifacts are read through an
                # anti-join on it and physically purged at compaction
                "deleted": _DELETED_SCHEMA,
            },
        )
        self._since_compact = 0
        if self.state.committed_batch is not None:
            self._adopt(self.state.load_latest())
        else:
            self._seed()

    def _seed(self) -> None:
        """(Re)build the standing state from the seed corpus — runs when
        no committed snapshot exists (first start, or rollback past v0)."""
        self.deleted = self.spark.createDataFrame([], _DELETED_SCHEMA)
        if self._corpus_src is None:
            self.keys = self.spark.createDataFrame([], _KEYS_SCHEMA)
            self.bands = self.spark.createDataFrame([], _BANDS_SCHEMA)
            self.shingles = self.spark.createDataFrame([], _SHINGLES_SCHEMA)
        else:
            p = self.params
            k, b, sh = corpus_dedup_artifacts(
                self._corpus_src, p["id_col"], p["text_col"],
                n=p["n"], num_perm=p["num_perm"], bands=p["bands"],
                prefix=p["prefix"],
            )
            self.keys = k.transform(flat_checkpoint)
            self.bands = b.transform(flat_checkpoint)
            self.shingles = sh.transform(flat_checkpoint)
        self._empty_deltas()

    def _adopt(self, tables: dict[str, DataFrame]) -> None:
        self.keys = tables["keys"]
        self.bands = tables["bands"]
        self.shingles = tables["shingles"]
        self.deleted = tables["deleted"]
        self._empty_deltas()

    def _empty_deltas(self) -> None:
        self._delta = {
            "keys": self.keys.limit(0),
            "bands": self.bands.limit(0),
            "shingles": self.shingles.limit(0),
            "deleted": self.deleted.limit(0),
        }

    # -- durability hooks -------------------------------------------------
    def begin_batch(self, batch_id: int) -> None:
        tables = self.state.begin_batch(batch_id)
        if tables is not None:
            self._since_compact = 0
            if self.state.committed_batch is None:
                self._seed()  # rolled back past the first commit
            else:
                self._adopt(tables)
        else:
            # fresh staging area; folds MERGE into it (unionByName) so a
            # delete and an ingest in one begin/commit cycle both persist
            self._empty_deltas()

    def commit(self, batch_id: int) -> None:
        """Persist this batch's kept-doc artifacts as the version deltas.
        The first commit's compaction also captures the seed corpus, so
        recovery never re-hashes it."""
        self.state.commit(
            batch_id,
            fulls={},
            deltas=self._delta,
            compacted={
                # compactions persist the PURGED artifacts (tombstones
                # applied) — physical deletion rides the existing
                # compaction cadence, the log-structured delete shape
                "keys": self._active(self.keys, "id"),
                "bands": self._active(self.bands, "id"),
                "shingles": self._active(self.shingles, "id"),
                "deleted": self.deleted,
            },
        )

    def _fold_within_batch(
        self, new_docs: DataFrame, scored: DataFrame
    ) -> DataFrame:
        """Within-batch dedup pass (``self_dedup=True``): exact
        prefix-key groups keep their min-id; MinHash-LSH near-dup pairs
        go through connected components (`dedup_clusters`) so each
        component keeps exactly its min-id canonical (a single
        greater-of-pair pass would leak survivors on pair chains). The
        marks OR into the corpus-screen flags — output schema unchanged."""
        from ..operators.dedup import dedup_clusters

        p = self.params
        idc, txt = p["id_col"], p["text_col"]
        key = h64(F.substring(F.col(txt), 1, p["prefix"]))
        keyed = new_docs.select(F.col(idc).alias("doc_id"), key.alias("kh"))
        canon = keyed.groupBy("kh").agg(F.min("doc_id").alias("canon"))
        wb_exact = (
            keyed.join(canon, "kh")
            .filter(F.col("doc_id") != F.col("canon"))
            .select("doc_id")
            .withColumn("wbe", F.lit(True))
        )
        pairs = minhash_lsh_pairs(
            new_docs, idc, txt, n=p["n"], num_perm=p["num_perm"],
            bands=p["bands"], threshold=p["threshold"],
        )
        wb_near = (
            dedup_clusters(pairs)
            .filter(F.col("id") != F.col("cluster_id"))
            .select(F.col("id").alias("doc_id"))
            .withColumn("wbn", F.lit(True))
        )
        return (
            scored.join(wb_exact, "doc_id", "left")
            .join(wb_near, "doc_id", "left")
            .select(
                "doc_id",
                (F.col("is_exact_dup") | F.coalesce("wbe", F.lit(False)))
                .alias("is_exact_dup"),
                (F.col("is_near_dup") | F.coalesce("wbn", F.lit(False)))
                .alias("is_near_dup"),
            )
            .withColumn(
                "keep", ~(F.col("is_exact_dup") | F.col("is_near_dup"))
            )
        )

    def _active(self, df: DataFrame, idc: str) -> DataFrame:
        """A standing artifact with tombstones applied — every read goes
        through this view, so deletion is visible immediately while the
        physical purge waits for compaction. The tombstone side
        broadcasts (doc-id-sized); on an empty log this is a no-op
        map-side probe."""
        return df.join(
            F.broadcast(self.deleted),
            df[idc] == self.deleted["doc_id"],
            "left_anti",
        )

    def delete_batch(self, ids: DataFrame) -> None:
        """Right-to-be-forgotten fold: retract the given doc ids from the
        standing dedup state. O(delete-set) commit — only the tombstone
        delta persists; a later copy of a forgotten document scores as
        NEW (the whole point of the retraction). Call between
        ``begin_batch`` and ``commit`` like ``process_batch``."""
        d = (
            ids.select(delete_id_col(ids).cast("long").alias("doc_id"))
            .distinct()
            .transform(flat_checkpoint)
        )
        # merge, don't overwrite: an ingest fold staged earlier in this
        # same batch keeps its artifact deltas in the durable log
        self._delta["deleted"] = self._delta["deleted"].unionByName(d)
        self.deleted = self.deleted.unionByName(d)
        self._since_compact += 1
        if self._since_compact >= COMPACT_EVERY:
            # flat_checkpoint, not raw localCheckpoint: the anti-join
            # plan's preserved stats would re-seed the geometric
            # sizeInBytes blowup the r8 soak caught (durable.py docstring)
            self.keys = self._active(self.keys, "id").transform(
                flat_checkpoint
            )
            self.bands = self._active(self.bands, "id").transform(
                flat_checkpoint
            )
            self.shingles = self._active(self.shingles, "id").transform(
                flat_checkpoint
            )
            self._since_compact = 0

    # -- the fold ---------------------------------------------------------
    def process_batch(self, new_docs: DataFrame) -> DataFrame:
        """Score one micro-batch against the standing state; returns
        (doc_id, is_exact_dup, is_near_dup, keep) for the batch. With
        ``grow``, the kept docs' artifacts join the state."""
        p = self.params
        new_docs = new_docs.transform(flat_checkpoint)
        caches: list[DataFrame] = []
        scored = incremental_dedup_against(
            self._active(self.keys, "id"),
            self._active(self.bands, "id"),
            self._active(self.shingles, "id"),
            new_docs,
            p["id_col"], p["text_col"], n=p["n"], num_perm=p["num_perm"],
            bands=p["bands"], threshold=p["threshold"], prefix=p["prefix"],
            cache_registry=caches,
        )
        if self.self_dedup:
            scored = self._fold_within_batch(new_docs, scored)
        scored = scored.transform(flat_checkpoint)
        for c in caches:
            c.unpersist()
        if not self.grow:
            # nothing to stage; leave any delete delta from this batch
            return scored
        kept = new_docs.join(
            scored.filter(F.col("keep")).select(
                F.col("doc_id").alias(p["id_col"])
            ),
            p["id_col"],
        )
        dk, db, dsh = corpus_dedup_artifacts(
            kept, p["id_col"], p["text_col"], n=p["n"],
            num_perm=p["num_perm"], bands=p["bands"], prefix=p["prefix"],
        )
        # O(batch) eager work: only the kept delta checkpoints; the
        # standing tables stay lazy unions compacted every COMPACT_EVERY
        # batches (the in-memory mirror of the store's layout). Merge
        # into any delta staged earlier this batch (e.g. a delete fold).
        dk = dk.transform(flat_checkpoint)
        db = db.transform(flat_checkpoint)
        dsh = dsh.transform(flat_checkpoint)
        self._delta["keys"] = self._delta["keys"].unionByName(dk)
        self._delta["bands"] = self._delta["bands"].unionByName(db)
        self._delta["shingles"] = self._delta["shingles"].unionByName(dsh)
        self.keys = self.keys.unionByName(dk)
        self.bands = self.bands.unionByName(db)
        self.shingles = self.shingles.unionByName(dsh)
        self._since_compact += 1
        if self._since_compact >= COMPACT_EVERY:
            self.keys = self.keys.transform(flat_checkpoint)
            self.bands = self.bands.transform(flat_checkpoint)
            self.shingles = self.shingles.transform(flat_checkpoint)
            self._since_compact = 0
        return scored


def corpus_dedup_stream(
    spark: SparkSession,
    new_docs_dir: str,
    schema,
    corpus: DataFrame | None,
    out_dir: str,
    checkpoint_dir: str,
    state_dir: str | None = None,
    _fail_at_batch: int | None = None,
    **params,
) -> "StreamingCorpusDedup":
    """Wire the standing-corpus dedup to a parquet micro-batch stream of
    new documents (one file per trigger): each batch's scores land in
    ``{out_dir}/batch-{id}`` with overwrite semantics — with ``state_dir``
    set, exactly-once across process restarts (same discipline as
    `streaming/resolution.py::resolve_activities_stream`).
    ``_fail_at_batch`` injects a crash AFTER that batch's state commit."""
    det = StreamingCorpusDedup(spark, corpus, state_dir, **params)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        det.begin_batch(batch_id)
        scored = det.process_batch(batch_df)
        scored.write.mode("overwrite").parquet(
            f"{out_dir}/batch-{batch_id:05d}"
        )
        det.commit(batch_id)
        if _fail_at_batch is not None and batch_id == _fail_at_batch:
            raise RuntimeError(
                f"injected crash after committing batch {batch_id}"
            )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(new_docs_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return det
