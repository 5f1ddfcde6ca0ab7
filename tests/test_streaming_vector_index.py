"""Incrementally-maintained IVF-SQ8 index == one-pass batch index: stream
K embedding-splits into `StreamingVectorIndex` and searching must
reproduce `ivf_sq8_topk` over the same ingested corpus with the SAME
frozen codebook — including across a crash-restart, and after a
right-to-be-forgotten delete (streamed-index search == batch index
rebuilt from the purged corpus)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_dspa_2019_spark.io.readers import load_table
from eth_dspa_2019_spark.operators.similarity import ivf_sq8_topk
from eth_dspa_2019_spark.streaming.vector_index import (
    StreamingVectorIndex,
    vector_index_stream,
)

K = 5
NPROBE = 3
CAND_K = 15


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _stage_chunks(vecs, n_chunks, base):
    lo, hi = vecs.agg(F.min("vec_id"), F.max("vec_id")).collect()[0]
    cuts = [lo + (hi - lo) * i // n_chunks for i in range(n_chunks)] + [hi + 1]
    for i, (clo, chi) in enumerate(zip(cuts[:-1], cuts[1:])):
        vecs.filter(
            (F.col("vec_id") >= clo) & (F.col("vec_id") < chi)
        ).coalesce(1).write.mode("overwrite").parquet(str(base / f"chunk{i}"))
    return f"{base}/chunk*"


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )


def _queries(emb):
    return emb.filter(F.col("vec_id") < 10)


def _batch_want(emb, idx):
    """The batch operator over the same corpus with the streamed index's
    frozen codebook (search equality is exact only under one codebook)."""
    cents = idx.centroids.select("centroid_id", "c_emb")
    return ivf_sq8_topk(
        emb, _queries(emb), cents, k=K, nprobe=NPROBE, cand_k=CAND_K
    )


def test_streamed_index_search_equals_batch(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    rglob = _stage_chunks(emb, 3, tmp_path / "vecs")
    idx = vector_index_stream(spark, rglob, emb.schema, str(tmp_path / "ck"))
    got = idx.search(_queries(emb), k=K, nprobe=NPROBE, cand_k=CAND_K)
    assert _rows(got) == _rows(_batch_want(emb, idx))


def test_streamed_index_crash_restart(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    rglob = _stage_chunks(emb, 3, tmp_path / "vecs")
    ck, st = str(tmp_path / "ck"), str(tmp_path / "state")
    try:
        vector_index_stream(
            spark, rglob, emb.schema, ck, st, _fail_at_batch=1
        )
        raise AssertionError("injected crash did not surface")
    except AssertionError:
        raise  # the guard itself must not be swallowed (ADVICE r9)
    except Exception:
        pass
    idx = vector_index_stream(spark, rglob, emb.schema, ck, st)
    got = idx.search(_queries(emb), k=K, nprobe=NPROBE, cand_k=CAND_K)
    assert _rows(got) == _rows(_batch_want(emb, idx))
    # exactly-once across the crash: no vector ingested twice
    assert (
        idx.lists.count()
        == idx.lists.select("vec_id").distinct().count()
    )


def test_streamed_index_delete_equals_rebuild_from_purged(spark, sf_dir):
    """Retract a slice of vectors mid-stream; the standing index must
    search identically to a batch index REBUILT from the purged corpus
    (same frozen codebook), and the tombstoned ids must never appear."""
    emb = _emb(spark, sf_dir)
    lo, hi = emb.agg(F.min("vec_id"), F.max("vec_id")).collect()[0]
    cuts = [lo + (hi - lo) * i // 3 for i in range(3)] + [hi + 1]
    doomed = emb.filter(
        (F.col("vec_id") % 5 == 3) & (F.col("vec_id") >= 10)
    ).select("vec_id")
    idx = StreamingVectorIndex(spark)
    for b, (a, z) in enumerate(zip(cuts[:-1], cuts[1:])):
        idx.begin_batch(b)
        idx.process_batch(
            emb.filter((F.col("vec_id") >= a) & (F.col("vec_id") < z))
        )
        if b == 1:  # delete fold in the same cycle as an ingest fold
            idx.delete_vecs(doomed)
        idx.commit(b)

    live = emb.join(doomed, "vec_id", "left_anti")
    got = idx.search(_queries(emb), k=K, nprobe=NPROBE, cand_k=CAND_K)
    assert _rows(got) == _rows(_batch_want(live, idx))
    gone = got.join(doomed, got.vec_id == doomed.vec_id, "inner").count()
    assert gone == 0
