"""Deletion propagation (right-to-be-forgotten), batch + streaming:

- the registered `deletion_propagation` audit is gate-checked vs DuckDB
  (tests/test_correctness.py picks it up from the registry);
- the streaming postings index retracts deleted docs: delete-then-search
  == rebuild-the-index-from-the-purged-corpus (df/avgdl margins shift),
  across a crash-restart with tombstone deltas;
- the streaming corpus dedup retracts artifacts: a copy of a FORGOTTEN
  document scores as new, and post-delete scoring == a detector seeded
  from the purged corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_dspa_2019_spark.io.readers import load_table
from eth_dspa_2019_spark.streaming.corpus_dedup import StreamingCorpusDedup
from eth_dspa_2019_spark.streaming.postings import StreamingPostingsIndex

_PARAMS = dict(n=3, num_perm=16, bands=8, threshold=0.2, prefix=64)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _chunks(docs, n):
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    cuts = [lo + (hi - lo) * i // n for i in range(n)] + [hi + 1]
    return [
        docs.filter((F.col("doc_id") >= a) & (F.col("doc_id") < b))
        .localCheckpoint(eager=True)
        for a, b in zip(cuts[:-1], cuts[1:])
    ]


def test_postings_delete_equals_rebuild_from_purged_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = _chunks(docs, 3)
    deletes = docs.filter(F.col("doc_id") % 17 == 3).select("doc_id")

    idx = StreamingPostingsIndex(spark)
    for b, c in enumerate(chunks[:2]):
        idx.begin_batch(b)
        idx.process_batch(c)
        idx.commit(b)
    idx.begin_batch(2)
    idx.delete_docs(deletes)
    idx.commit(2)
    idx.begin_batch(3)
    idx.process_batch(chunks[2])
    idx.commit(3)

    # reference: one-shot index over the purged corpus (batch-3 docs that
    # are in the delete set must ALSO be gone — tombstones outlive the
    # delete batch)
    ref = StreamingPostingsIndex(spark)
    ref.begin_batch(0)
    ref.process_batch(
        docs.join(deletes, "doc_id", "left_anti")
    )
    ref.commit(0)
    assert _rows(idx.search()) == _rows(ref.search())
    # and the live postings carry no deleted doc
    assert (
        idx._live(idx.tf).join(deletes, "doc_id", "inner").count() == 0
    )


def test_postings_delete_crash_restart(spark, sf_dir, tmp_path):
    """Crash after the delete batch's state commit; a fresh process must
    adopt the tombstones (rollback-on-replay path included)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = _chunks(docs, 3)
    deletes = docs.filter(F.col("doc_id") % 17 == 3).select("doc_id")
    st = str(tmp_path / "state")

    idx = StreamingPostingsIndex(spark, st)
    for b, c in enumerate(chunks[:2]):
        idx.begin_batch(b)
        idx.process_batch(c)
        idx.commit(b)
    idx.begin_batch(2)
    idx.delete_docs(deletes)
    idx.commit(2)
    # process dies here; the engine replays batch 2 on restart
    idx2 = StreamingPostingsIndex(spark, st)
    idx2.begin_batch(2)  # replay → rollback to v1, re-delete
    idx2.delete_docs(deletes)
    idx2.commit(2)
    idx2.begin_batch(3)
    idx2.process_batch(chunks[2])
    idx2.commit(3)

    ref = StreamingPostingsIndex(spark)
    ref.begin_batch(0)
    ref.process_batch(docs.join(deletes, "doc_id", "left_anti"))
    ref.commit(0)
    assert _rows(idx2.search()) == _rows(ref.search())


def test_dedup_forgotten_doc_scores_as_new(spark, sf_dir):
    """After deleting a standing doc, an exact copy of its text arriving
    later must be KEPT — the corpus has genuinely forgotten it."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") % 2 == 0).localCheckpoint(eager=True)
    # the victim must be the ONLY seed doc with its prefix key — the
    # testdata corpus is dup-heavy, and deleting one of several docs
    # sharing a key correctly leaves the twins' key standing
    key = F.md5(F.substring("text", 1, 64)).alias("k")
    uniq = (
        seed.select("doc_id", key)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"), F.min("doc_id").alias("doc_id"))
        .filter(F.col("c") == 1)
        .orderBy("doc_id")
        .limit(1)
    )
    victim = seed.join(uniq.select("doc_id"), "doc_id").localCheckpoint(
        eager=True
    )
    vid = victim.collect()[0]["doc_id"]
    probe = victim.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    ).localCheckpoint(eager=True)

    det = StreamingCorpusDedup(spark, seed, **_PARAMS)
    det.begin_batch(0)
    before = det.process_batch(probe)
    det.commit(0)
    assert _rows(before.select("doc_id", "is_exact_dup")) == [
        (vid + 1_000_000, True)
    ]

    det.begin_batch(1)
    det.delete_batch(spark.createDataFrame([(vid,)], "doc_id long"))
    det.commit(1)
    det.begin_batch(2)
    after = det.process_batch(probe)
    det.commit(2)
    got = after.collect()[0]
    assert got["is_exact_dup"] is False and got["keep"] is True


def test_dedup_delete_equals_rebuild_from_purged_corpus(spark, sf_dir):
    """Post-delete scoring == a fresh detector seeded with corpus minus
    the delete set (state retraction is exactly corpus purge)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") % 2 == 0).localCheckpoint(eager=True)
    newb = docs.filter(F.col("doc_id") % 2 == 1).localCheckpoint(eager=True)
    deletes = seed.filter(F.col("doc_id") % 17 == 3).select("doc_id")

    det = StreamingCorpusDedup(spark, seed, grow=False, **_PARAMS)
    det.begin_batch(0)
    det.delete_batch(deletes)
    det.commit(0)
    det.begin_batch(1)
    got = det.process_batch(newb)
    det.commit(1)

    purged = seed.join(deletes, "doc_id", "left_anti")
    ref = StreamingCorpusDedup(spark, purged, grow=False, **_PARAMS)
    ref.begin_batch(0)
    want = ref.process_batch(newb)
    ref.commit(0)
    assert _rows(got) == _rows(want)


def test_purge_relations_matches_audit(spark, sf_dir):
    """purge_relations output counts == the audit's rows_after, and no
    purged relation retains a deleted id."""
    from eth_dspa_2019_spark.operators.forget import (
        purge_audit,
        purge_relations,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    deletes = docs.filter(F.col("doc_id") % 17 == 3).select("doc_id")
    tok = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    rels = {"documents": (docs, "doc_id"), "doc_lengths": (dl, "doc_id")}
    audit = {
        r["relation"]: r for r in purge_audit(rels, deletes).collect()
    }
    purged = purge_relations(rels, deletes)
    for name, (df, idc) in rels.items():
        p = purged[name]
        assert p.count() == audit[name]["rows_after"]
        assert df.count() == audit[name]["rows_before"]
        assert (
            p.join(deletes, p[idc] == deletes["doc_id"], "inner").count()
            == 0
        )


def test_paragraph_dedup_forgets_keeper_paragraphs(spark, sf_dir):
    """Deleting a keeper doc retracts the paragraph hashes it owned: a
    later doc repeating those paragraphs keeps them again, and scoring
    equals a fresh detector that never saw the forgotten doc."""
    from eth_dspa_2019_spark.streaming.paragraph_dedup import (
        StreamingParagraphDedup,
    )

    from eth_dspa_2019_spark.streaming.paragraph_dedup import (
        _batch_paragraphs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    first = docs.orderBy("doc_id").limit(20).localCheckpoint(eager=True)
    # pick a victim whose every paragraph hash is unique within the seed:
    # retraction-by-keeper equals rebuild-without-victim exactly then
    # (with cross-doc duplicates, a rebuild would re-elect keepers among
    # docs whose content the stream legitimately never stored)
    ps = _batch_paragraphs(first, "doc_id", "text")
    shared = (
        ps.groupBy("ph")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("ph")
    )
    vid = (
        ps.join(shared, "ph", "left_anti")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nu"))
        .join(
            ps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("np")),
            "doc_id",
        )
        .filter(F.col("nu") == F.col("np"))
        .agg(F.min("doc_id"))
        .collect()[0][0]
    )
    assert vid is not None, "no all-unique-paragraph doc in the seed"
    probe = first.filter(F.col("doc_id") == vid).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    ).localCheckpoint(eager=True)

    det = StreamingParagraphDedup(spark)
    det.begin_batch(0)
    det.process_batch(first)
    det.commit(0)
    det.begin_batch(1)
    before = det.process_batch(probe).collect()[0]
    det.commit(1)
    # every probe paragraph is a dup of the standing keeper's
    assert before["n_dropped"] == before["n_paras"]

    det.begin_batch(2)
    det.delete_batch(spark.createDataFrame([(vid,)], "doc_id long"))
    det.commit(2)
    det.begin_batch(3)
    after = det.process_batch(probe).collect()[0]
    det.commit(3)

    # reference: a detector whose history never contained the victim —
    # but DID see the probe once (batch 1 kept nothing, so only the
    # victim-less first batch matters)
    ref = StreamingParagraphDedup(spark)
    ref.begin_batch(0)
    ref.process_batch(first.filter(F.col("doc_id") != vid))
    ref.commit(0)
    ref.begin_batch(1)
    want = ref.process_batch(probe).collect()[0]
    ref.commit(1)
    assert (after["n_dropped"], after["clean_text"]) == (
        want["n_dropped"],
        want["clean_text"],
    )
    # the forgotten doc's unique paragraphs survive in the probe
    assert after["n_dropped"] < after["n_paras"]


def test_delete_edge_cases_empty_and_all(spark, sf_dir):
    """Empty delete set is a no-op; deleting the whole standing corpus
    makes every arriving doc score as new."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") % 2 == 0).localCheckpoint(eager=True)
    newb = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .limit(50)
        .localCheckpoint(eager=True)
    )
    empty = spark.createDataFrame([], "doc_id long")

    det = StreamingCorpusDedup(spark, seed, grow=False, **_PARAMS)
    det.begin_batch(0)
    base = det.process_batch(newb)
    det.commit(0)
    det.begin_batch(1)
    det.delete_batch(empty)
    det.commit(1)
    det.begin_batch(2)
    after_noop = det.process_batch(newb)
    det.commit(2)
    assert _rows(base) == _rows(after_noop)

    det.begin_batch(3)
    det.delete_batch(seed.select("doc_id"))
    det.commit(3)
    det.begin_batch(4)
    after_all = det.process_batch(newb)
    det.commit(4)
    assert after_all.filter(~F.col("keep")).count() == 0

    idx = StreamingPostingsIndex(spark)
    idx.begin_batch(0)
    idx.process_batch(seed)
    idx.commit(0)
    n0 = idx.search().count()
    idx.begin_batch(1)
    idx.delete_docs(empty)
    idx.commit(1)
    assert idx.search().count() == n0
    idx.begin_batch(2)
    idx.delete_docs(seed.select("doc_id"))
    idx.commit(2)
    assert idx.search().count() == 0


def test_postings_ingest_and_delete_compose_in_one_batch(
    spark, sf_dir, tmp_path
):
    """An ingest fold and a delete fold in the SAME begin/commit cycle
    must BOTH reach the durable log (r8 ADVICE: the staged delta was
    overwritten, so crash-recovery silently lost either the batch's
    postings or its tombstones — a right-to-be-forgotten violation)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = _chunks(docs, 2)
    deletes = docs.filter(F.col("doc_id") % 17 == 3).select("doc_id")
    st = str(tmp_path / "state")

    idx = StreamingPostingsIndex(spark, st)
    idx.begin_batch(0)
    idx.process_batch(chunks[0])
    idx.commit(0)
    idx.begin_batch(1)
    idx.process_batch(chunks[1])
    idx.delete_docs(deletes)  # same cycle as the ingest
    idx.commit(1)

    # a fresh process recovering from durable state alone
    recovered = StreamingPostingsIndex(spark, st)
    ref = StreamingPostingsIndex(spark)
    ref.begin_batch(0)
    ref.process_batch(docs.join(deletes, "doc_id", "left_anti"))
    ref.commit(0)
    assert _rows(recovered.search()) == _rows(ref.search())


def test_dedup_ingest_and_delete_compose_in_one_batch(
    spark, sf_dir, tmp_path
):
    """Same-cycle composition for the corpus-dedup state: after crash
    recovery, a copy of the same-cycle INGESTED doc scores as a dup
    (its artifact delta persisted) and a copy of the same-cycle DELETED
    doc scores as new (its tombstone delta persisted)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") % 2 == 0).localCheckpoint(eager=True)
    key = F.md5(F.substring("text", 1, 64)).alias("k")
    uniq = (
        seed.select("doc_id", key)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"), F.min("doc_id").alias("doc_id"))
        .filter(F.col("c") == 1)
        .orderBy("doc_id")
        .limit(1)
    )
    vid = seed.join(uniq.select("doc_id"), "doc_id").collect()[0]["doc_id"]
    sentinel = spark.createDataFrame(
        [(9_000_001, "zqxj " * 40)], "doc_id long, text string"
    ).localCheckpoint(eager=True)
    st = str(tmp_path / "state")

    det = StreamingCorpusDedup(spark, seed, st, **_PARAMS)
    det.begin_batch(0)
    det.process_batch(sentinel)  # ingest fold ...
    det.delete_batch(
        spark.createDataFrame([(vid,)], "doc_id long")
    )  # ... and delete fold, same cycle
    det.commit(0)

    recovered = StreamingCorpusDedup(spark, None, st, **_PARAMS)
    probe = spark.createDataFrame(
        [(9_000_002, "zqxj " * 40)], "doc_id long, text string"
    )
    victim_copy = (
        docs.filter(F.col("doc_id") == vid)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    recovered.begin_batch(1)
    got = recovered.process_batch(probe.unionByName(victim_copy))
    recovered.commit(1)
    by_id = {r["doc_id"]: r for r in got.collect()}
    assert by_id[9_000_002]["is_exact_dup"] is True  # ingest persisted
    assert by_id[vid + 1_000_000]["keep"] is True  # tombstone persisted


def test_delete_id_col_requires_unambiguous_column(spark):
    """The compliance primitive must not guess the delete-id column:
    multi-column frames need an explicit name (r8 ADVICE)."""
    import pytest

    from eth_dspa_2019_spark.operators.forget import purge_relation

    rel = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    )
    wide = spark.createDataFrame(
        [("x", 1)], "other string, doc_id long"
    )
    with pytest.raises(ValueError, match="ambiguous"):
        purge_relation(rel, wide, "doc_id")
    got = purge_relation(rel, wide, "doc_id", delete_id="doc_id")
    assert _rows(got.select("doc_id")) == [(2,)]
    with pytest.raises(ValueError, match="no column"):
        purge_relation(rel, wide, "doc_id", delete_id="nope")
