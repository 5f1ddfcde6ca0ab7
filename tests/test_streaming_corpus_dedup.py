"""Streaming incremental corpus dedup == its batch forms (VERDICT r5 #4):

- fixed standing corpus: streaming the new side in K micro-batches must
  reproduce the oracle-checked batch query `incremental_dedup_newbatch`
  exactly (the new docs are scored against the corpus only, so the split
  cannot matter);
- growing corpus: batch k scores against corpus ∪ kept(<k) — streaming
  over K splits must equal the manual sequential fold of
  `operators.dedup.incremental_dedup`, survive a crash-restart on the
  same state/checkpoint dirs, and persist only O(batch) deltas.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from eth_dspa_2019_spark.io.readers import load_table
from eth_dspa_2019_spark.operators.dedup import incremental_dedup
from eth_dspa_2019_spark.plans.llm import (
    BANDS,
    DEDUP_PREFIX,
    JACCARD_THRESHOLD,
    NUM_PERM,
    SHINGLE_N,
)
from eth_dspa_2019_spark.plans.registry import all_queries
from eth_dspa_2019_spark.streaming.corpus_dedup import corpus_dedup_stream

_PARAMS = dict(
    n=SHINGLE_N,
    num_perm=NUM_PERM,
    bands=BANDS,
    threshold=JACCARD_THRESHOLD,
    prefix=DEDUP_PREFIX,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _stage_chunks(docs, col, n_chunks, base):
    lo, hi = docs.agg(F.min(col), F.max(col)).collect()[0]
    cuts = [lo + (hi - lo) * i // n_chunks for i in range(n_chunks)] + [hi + 1]
    for i, (clo, chi) in enumerate(zip(cuts[:-1], cuts[1:])):
        docs.filter((F.col(col) >= clo) & (F.col(col) < chi)).coalesce(
            1
        ).write.mode("overwrite").parquet(str(base / f"chunk{i}"))
    return f"{base}/chunk*"


def test_stream_fixed_corpus_equals_batch_query(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    newb = docs.filter(F.col("doc_id") % 2 == 1)
    rglob = _stage_chunks(newb, "doc_id", 3, tmp_path / "new")
    odir = str(tmp_path / "scored")
    det = corpus_dedup_stream(
        spark, rglob, newb.schema, corpus, odir, str(tmp_path / "ck"),
        grow=False, **_PARAMS,
    )
    emitted = spark.read.parquet(f"{odir}/batch-*")
    batch = all_queries()["incremental_dedup_newbatch"].spark(spark, sf_dir)
    assert _rows(emitted) == _rows(batch)
    # grow=False: the standing key set is untouched by the stream — still
    # exactly the seed corpus's distinct prefix hashes
    from eth_dspa_2019_spark.operators.dedup import corpus_dedup_artifacts

    seed_keys, _, _ = corpus_dedup_artifacts(
        corpus, "doc_id", "text", n=SHINGLE_N, num_perm=NUM_PERM,
        bands=BANDS, prefix=DEDUP_PREFIX,
    )
    assert _rows(det.keys) == _rows(seed_keys)


def test_stream_growing_corpus_crash_restart(spark, sf_dir, tmp_path):
    """Growing mode: crash after batch 1's state commit, restart on the
    same dirs — the emitted scores must equal the uninterrupted
    sequential fold, and the state deltas must partition the standing
    shingle relation (O(batch) persistence)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") % 4 == 0)
    newb = docs.filter(F.col("doc_id") % 4 != 0)
    n_chunks = 3
    lo, hi = newb.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    cuts = [lo + (hi - lo) * i // n_chunks for i in range(n_chunks)] + [hi + 1]
    chunks = [
        newb.filter(
            (F.col("doc_id") >= clo) & (F.col("doc_id") < chi)
        )
        for clo, chi in zip(cuts[:-1], cuts[1:])
    ]
    rglob = _stage_chunks(newb, "doc_id", n_chunks, tmp_path / "new")
    odir = str(tmp_path / "scored")
    ck = str(tmp_path / "ck")
    sdir = str(tmp_path / "state")

    try:
        corpus_dedup_stream(
            spark, rglob, newb.schema, seed, odir, ck, state_dir=sdir,
            _fail_at_batch=1, **_PARAMS,
        )
        raise AssertionError("injected crash did not fire")
    except Exception as ex:
        assert "injected crash" in str(ex)

    det = corpus_dedup_stream(
        spark, rglob, newb.schema, seed, odir, ck, state_dir=sdir, **_PARAMS
    )

    # reference: the uninterrupted sequential fold
    expected = []
    standing = seed
    for chunk in chunks:
        scored = incremental_dedup(standing, chunk, **_PARAMS)
        expected.append(scored.localCheckpoint(eager=True))
        kept = chunk.join(
            scored.filter(F.col("keep")).select("doc_id"), "doc_id"
        )
        standing = standing.unionByName(kept).localCheckpoint(eager=True)
    exp = expected[0]
    for e in expected[1:]:
        exp = exp.unionByName(e)

    emitted = spark.read.parquet(f"{odir}/batch-*")
    assert _rows(emitted) == _rows(exp)

    # O(batch) persistence: seed shingles live in the v0 compaction, each
    # batch's delta holds only its kept docs' shingles — together they
    # partition the standing relation
    from eth_dspa_2019_spark.operators.dedup import shingles

    deltas = sorted(glob.glob(f"{sdir}/v*/shingles__delta.parquet"))
    assert len(deltas) == n_chunks
    n_delta = sum(spark.read.parquet(d).count() for d in deltas)
    n_seed = shingles(seed, "doc_id", "text", SHINGLE_N).count()
    assert n_seed + n_delta == det.shingles.count()


def test_self_dedup_marks_within_batch_copies(spark, sf_dir, tmp_path):
    """self_dedup=True: of k identical docs arriving in ONE batch, only
    the min-id canonical survives into the corpus; near-dup chains go
    through connected components so each component keeps exactly one.
    Without the flag, within-batch copies all pass (the batch-query
    semantics) — asserted as the contrast."""
    from eth_dspa_2019_spark.streaming.corpus_dedup import StreamingCorpusDedup

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 20)
    )
    # batch = originals + exact copies at +1000 ids (same text)
    copies = docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    batch = docs.unionByName(copies)
    seed = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 120))

    det = StreamingCorpusDedup(
        spark, seed, None, self_dedup=True, **_PARAMS
    )
    scored = det.process_batch(batch)
    rows = {r["doc_id"]: r for r in scored.collect()}
    for i in [r["doc_id"] for r in docs.collect()]:
        # every +1000 copy is marked exact-dup within the batch; the
        # original (min id) is NOT marked by the self pass
        assert rows[i + 1000]["is_exact_dup"], i
        assert not rows[i + 1000]["keep"], i
    # at least the non-corpus-colliding originals survive
    assert any(r["keep"] for r in rows.values())
    # the corpus grew by exactly the kept docs' keys (copies excluded)
    kept = [d for d, r in rows.items() if r["keep"]]
    assert all(d < 1000 for d in kept)

    det2 = StreamingCorpusDedup(
        spark, seed, None, self_dedup=False, **_PARAMS
    )
    scored2 = det2.process_batch(batch)
    rows2 = {r["doc_id"]: r for r in scored2.collect()}
    # contrast: without the self pass, a copy's flags equal its original's
    for i in [r["doc_id"] for r in docs.collect()]:
        assert rows2[i + 1000]["keep"] == rows2[i]["keep"], i
