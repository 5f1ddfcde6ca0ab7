"""Unit tests for operator-library edge cases not reachable from the
registered fixture queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eth_dspa_2019_spark.operators import dedup as dd
from eth_dspa_2019_spark.operators.resolve import resolve_post_ids
from eth_dspa_2019_spark.schemas import KIND_COMMENT, KIND_REPLY


def test_minhash_lsh_param_validation(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="divisible"):
        dd.minhash_lsh_pairs(df, num_perm=16, bands=5)
    with pytest.raises(ValueError, match="bands"):
        dd.minhash_lsh_pairs(df, num_perm=4, bands=8)


def test_simhash_pigeonhole_guard(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_hamming"):
        dd.simhash_pairs(df, bits=48, band_bits=12, max_hamming=6)


def test_simhash_wide_guards(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_hamming"):
        # 84 bits / 14-bit bands = 6 bands ≤ max_hamming 6 → no pigeonhole
        dd.simhash_pairs_wide(
            df, word_bits=(42, 42), band_bits=14, max_hamming=6
        )
    with pytest.raises(ValueError, match="whole bands"):
        dd.simhash_pairs_wide(df, word_bits=(48, 40), band_bits=12)


def test_simhash_wide_exact_vs_bruteforce(spark, sf_dir):
    """Banding is pigeonhole-complete: the operator's pair set must EQUAL
    the brute-force all-pairs Hamming ≤ 6 set over the same 84-bit
    fingerprints (recall AND precision, not just plausibility)."""
    from eth_dspa_2019_spark.io.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    sims = {
        r["id"]: (r["sim_0"], r["sim_1"])
        for r in dd.simhash_wide(docs, "doc_id", "text").collect()
    }
    ids = sorted(sims)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if (
            bin(sims[a][0] ^ sims[b][0]).count("1")
            + bin(sims[a][1] ^ sims[b][1]).count("1")
        )
        <= 6
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in dd.simhash_pairs_wide(docs, "doc_id", "text").collect()
    }
    assert got == brute


def test_multiprobe_recall_dominates_single_bucket(spark, sf_dir):
    """At the same plane count, probing the P distance-1 buckets on top of
    the query's own bucket can only add candidates — recall@5 vs brute
    force must be ≥ the single-bucket variant's."""
    from eth_dspa_2019_spark.io.readers import load_table
    from eth_dspa_2019_spark.operators.similarity import (
        ann_topk_lsh,
        ann_topk_multiprobe,
        cosine_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    single = {
        (r.query_id, r.vec_id)
        for r in ann_topk_lsh(emb, queries, k=5, num_planes=12).collect()
    }
    multi = {
        (r.query_id, r.vec_id)
        for r in ann_topk_multiprobe(
            emb, queries, k=5, num_planes=12
        ).collect()
    }
    assert len(exact & multi) >= len(exact & single)


def test_ivf_kmeans_refine_recall(spark, sf_dir):
    """Lloyd-refined IVF centroids must (a) preserve the centroid count —
    empty clusters keep their previous centroid, (b) reach recall@5 ≥ 0.4
    vs brute force at nprobe=3 on the near-random fixture embeddings
    (measured: stride 0.50, refined 0.54 at sf0.001 — random data is the
    worst case for IVF; clustered corpora do far better)."""
    from eth_dspa_2019_spark.io.readers import load_table
    from eth_dspa_2019_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_refine,
        stride_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    seed = stride_centroids(emb, 31)
    refined = kmeans_refine(emb, seed, iters=2)
    assert refined.count() == seed.count()
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(emb, queries, refined, k=5, nprobe=3).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.4


def test_resolve_deep_chain(spark):
    """Pointer doubling resolves a 40-deep reply chain (far beyond the
    fixture's natural depth) in O(log depth) iterations."""
    rows = [(0, KIND_COMMENT, 100, None)]  # comment 0 → post 100
    rows += [(i, KIND_REPLY, None, i - 1) for i in range(1, 41)]
    acts = spark.createDataFrame(
        rows, "id long, kind string, post_id long, parent_id long"
    )
    m = resolve_post_ids(acts)
    got = {r["id"]: r["root_post_id"] for r in m.collect()}
    assert got == {i: 100 for i in range(41)}


def test_exact_dedup_canonical_min(spark):
    df = spark.createDataFrame(
        [(5, "x"), (2, "x"), (9, "y")], "doc_id long, text string"
    )
    out = {
        r["canonical_id"]: r["n_docs"]
        for r in dd.exact_dedup(df, "doc_id", F.col("text")).collect()
    }
    assert out == {2: 2, 9: 1}


def test_ngram_jaccard_df_cap_keeps_values_exact(spark):
    """With a cap low enough that shingles actually go hot ("common tail
    here" has df=3 > 2), every pair the capped path reports must carry the
    EXACT full-set Jaccard (the hot correction re-adds hot-shingle
    matches). Pairs sharing ONLY hot shingles — (1,3) here — are the
    documented recall trade-off and disappear; pairs that also share a
    rare shingle — (1,2) — survive with the exact value."""
    docs = spark.createDataFrame(
        [
            (1, "common tail here alpha beta gamma"),
            (2, "common tail here alpha beta delta"),
            (3, "common tail here zeta eta theta"),
            (4, "unrelated words entirely different text"),
        ],
        "doc_id long, text string",
    )
    uncapped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dd.ngram_jaccard_pairs(
            docs, threshold=0.1, max_shingle_df=None
        ).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dd.ngram_jaccard_pairs(
            docs, threshold=0.1, max_shingle_df=2
        ).collect()
    }
    assert (1, 2) in capped and capped[(1, 2)] == uncapped[(1, 2)]
    assert (1, 3) in uncapped and (1, 3) not in capped  # hot-only pair
    for k, v in capped.items():
        assert v == uncapped[k]


def test_lsh_plan_has_no_allpairs_join(spark):
    """The LSH verify step must compute Jaccard for candidates only — the
    optimized plan must not contain a shingle-shingle self-join without the
    candidate restriction (the round-1 quadratic-blowup bug)."""
    df = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3} common tail here") for i in range(6)],
        "doc_id long, text string",
    )
    pairs = dd.minhash_lsh_pairs(df, num_perm=8, bands=4, threshold=0.1)
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    # the candidate pairs relation must sit below the common-shingle join:
    # the optimized plan joins shingles via the candidate ids, and the only
    # shingle=shingle equi-join also carries the candidate id equi-conditions
    import re

    selfjoins = [
        ln
        for ln in plan.splitlines()
        if "shingle" in ln and "Join" in ln
    ]
    for ln in selfjoins:
        assert "id" in ln, f"shingle self-join without id restriction: {ln}"
    pairs.collect()  # and it runs


def test_merge_intervals_semantics(spark):
    from eth_dspa_2019_spark.operators.intervals import merge_intervals

    iv = spark.createDataFrame(
        [
            (0, 10),   # island A
            (5, 12),   # overlaps
            (12, 20),  # touches (half-open => merges)
            (12, 20),  # exact duplicate
            (30, 35),  # island B (gap)
        ],
        "s long, e long",
    )
    got = sorted(tuple(r) for r in merge_intervals(iv).collect())
    assert got == [(0, 20, 4), (30, 35, 1)]


def test_interval_join_no_nested_loop(spark, sf_dir):
    from eth_dspa_2019_spark.plans.registry import all_queries

    df = all_queries()["purchases_in_error_windows"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "SinglePartition" not in plan  # merge runs on the prefix plan


def hll_estimate(n_regs: int, z_fx: int, m: int | None = None) -> float:
    """Corrected HLL estimator over the engine's exact sketch state
    (n_regs, z_fx) — the standard small-range (linear counting) correction
    applied to the raw harmonic-mean estimate. Engine-local post-processing:
    the cross-engine query emits only integer-exact state + raw estimate."""
    import math

    from eth_dspa_2019_spark.plans.misc import HLL_M

    m = m or HLL_M
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m * float(1 << 51) / z_fx
    empty = m - n_regs
    if raw <= 2.5 * m and empty > 0:
        return m * math.log(m / empty)
    return raw


def test_hll_error_bound_vs_exact(spark, sf_dir):
    """The corrected HLL estimate must track the exact per-window distinct
    count within a falsifiable relative-error bound (m=1024 -> sigma ~3.25%;
    linear counting dominates at fixture cardinalities). A broken hash
    split, rho chain, or register merge blows way past 15%."""
    from eth_dspa_2019_spark.plans.registry import all_queries

    approx = {
        r["window_start"]: hll_estimate(r["n_regs"], r["z_fx"])
        for r in all_queries()["unique_users_approx"].spark(spark, sf_dir).collect()
    }
    exact = {
        r["window_start"]: r["n_users"]
        for r in all_queries()["unique_users_12h_1h"].spark(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    # Tiny windows (a handful of users) legitimately miss by 1 register
    # collision, a huge relative error on exact=5 — so the bound is
    # relative-OR-small-absolute. A broken sketch fails both by miles.
    bad = [
        (w, exact[w], approx[w])
        for w in exact
        if abs(approx[w] - exact[w]) / exact[w] > 0.15
        and abs(approx[w] - exact[w]) > 2.0
    ]
    assert not bad, f"HLL error out of bound (first 5): {bad[:5]}"


def test_sq8_topk_recall_vs_bruteforce(spark, sf_dir):
    """The int8 approximate scan + exact re-rank must recover (nearly) the
    exact top-5: quantized ordering errs by at most ~1/127 per component,
    so a 3× candidate oversample yields recall@5 ≈ 1 on the fixture."""
    from eth_dspa_2019_spark.io.readers import load_table
    from eth_dspa_2019_spark.operators.similarity import cosine_topk, sq8_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.vec_id)
        for r in sq8_topk(emb, queries, k=5, cand_k=15).collect()
    }
    assert len(exact & got) / len(exact) >= 0.9


def test_sq8_codes_are_int8_and_norm_exact(spark, sf_dir):
    """Quantized codes must stay in [-127, 127] (true int8 storage) and the
    stored integer norm must equal Σ q_i² recomputed from the codes."""
    from eth_dspa_2019_spark.io.readers import load_table
    from eth_dspa_2019_spark.operators.similarity import quantize_sq8_batches

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    qz = emb.mapInPandas(
        quantize_sq8_batches(), schema="vec_id long, qvec array<tinyint>, qn2 long"
    ).collect()
    assert len(qz) == 50
    for r in qz:
        assert all(-127 <= v <= 127 for v in r.qvec)
        assert sum(int(v) * int(v) for v in r.qvec) == r.qn2
        assert max(abs(v) for v in r.qvec) == 127  # scale hits the int8 range


def test_cms_estimates_bound_exact_counts(spark, sf_dir):
    """Count-min property: the sketch NEVER under-estimates, and the
    over-estimate is bounded by the collision mass — with W=512 buckets per
    row and D=4 rows, max over-estimate ≤ 2e·total/W comfortably."""
    from eth_dspa_2019_spark.plans.sketch import (
        CMS_W,
        event_heavy_hitters_cms,
    )

    rows = event_heavy_hitters_cms(spark, sf_dir).collect()
    assert rows
    total = sum(r.n_exact for r in rows)
    assert all(r.est_count >= r.n_exact for r in rows)
    bound = 2 * 2.7182818 * total / CMS_W
    assert max(r.est_count - r.n_exact for r in rows) <= bound


def test_boilerplate_strip_token_accounting(spark, sf_dir):
    """Every output must satisfy len(tokens(clean_text)) == n_tokens −
    n_removed, and a document with zero hot-gram occurrences must come
    back verbatim."""
    from eth_dspa_2019_spark.io.readers import load_table
    from eth_dspa_2019_spark.plans.llm import boilerplate_strip

    docs = {r.doc_id: r.text for r in load_table(spark, sf_dir, "documents").collect()}
    out = boilerplate_strip(spark, sf_dir).collect()
    assert len(out) == len(docs)
    for r in out:
        n_clean = len(r.clean_text.split(" ")) if r.clean_text else 0
        assert n_clean == r.n_tokens - r.n_removed
        if r.n_removed == 0:
            assert r.clean_text == docs[r.doc_id]


def test_ivf_sq8_recall_within_ivf(spark, sf_dir):
    """IVF+SQ8 can only lose recall through the SAME list pruning as plain
    IVF (the quantized scan + 3x oversample re-rank recovers the exact
    within-list order) — so its hits against brute force must be within
    one of plain IVF's on the fixture."""
    from eth_dspa_2019_spark.io.readers import load_table
    from eth_dspa_2019_spark.operators.similarity import (
        cosine_topk,
        ivf_sq8_topk,
        ivf_topk,
        stride_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    cents = stride_centroids(emb, 31)
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    ivf = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(emb, queries, cents, k=5, nprobe=3).collect()
    }
    sq = {
        (r.query_id, r.vec_id)
        for r in ivf_sq8_topk(
            emb, queries, cents, k=5, nprobe=3, cand_k=15
        ).collect()
    }
    assert len(exact & sq) >= len(exact & ivf) - 1


def test_pandas_udf_quality_score_equals_expression(spark, sf_dir):
    """§2.11 pandas_udf surface: the registered scalar Arrow UDF must
    produce bit-identical scores to the codegen expression path (and be
    callable from plain SQL after registration)."""
    from eth_dspa_2019_spark.functions.text import (
        make_quality_score_udf,
        quality_score,
        tokens,
    )
    from eth_dspa_2019_spark.io.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    udf = make_quality_score_udf()
    both = docs.select(
        "doc_id",
        quality_score(tokens("text")).alias("expr_score"),
        udf(F.col("text")).alias("udf_score"),
    )
    bad = both.filter(F.col("expr_score") != F.col("udf_score")).count()
    assert bad == 0
    # SQL-registered form
    spark.udf.register("quality_score", make_quality_score_udf())
    docs.createOrReplaceTempView("qdocs")
    n = spark.sql(
        "SELECT count(*) AS n FROM qdocs WHERE quality_score(text) > 0.5"
    ).collect()[0].n
    assert n > 0


def test_chunk_spans_tile_documents_exactly(spark, sf_dir):
    """Chunk spans must cover every token of every doc: first chunk starts
    at 0, consecutive starts advance by the stride, the last span ends at
    n_tokens, and every span is non-empty and at most CHUNK_W long."""
    from eth_dspa_2019_spark.plans.corpus import CHUNK_S, CHUNK_W
    from eth_dspa_2019_spark.plans.registry import all_queries

    rows = (
        all_queries()["doc_chunk_spans"]
        .spark(spark, sf_dir)
        .collect()
    )
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for doc_id, spans in by_doc.items():
        spans.sort(key=lambda r: r["start_tok"])
        assert spans[0]["start_tok"] == 0
        for i, s in enumerate(spans):
            assert s["chunk_idx"] == i
            assert s["start_tok"] == i * CHUNK_S
            assert 1 <= s["chunk_len"] <= CHUNK_W
            assert s["end_tok"] == s["start_tok"] + s["chunk_len"]
        # the last span ends exactly at the doc boundary and starts inside
        # it (overlapping strides may make the final window a suffix of the
        # previous one for docs shorter than CHUNK_S + CHUNK_W — that is
        # inherent to W > S chunking, not an error)
        n_tokens = spans[-1]["end_tok"]
        assert spans[-1]["start_tok"] < n_tokens
        assert all(s["end_tok"] <= n_tokens for s in spans)


def test_training_shard_layout_is_a_permutation(spark, sf_dir):
    """Every doc appears exactly once; within a shard, pos is the dense
    1..n_shard sequence; the assignment is deterministic across runs."""
    from eth_dspa_2019_spark.plans.registry import all_queries

    q = all_queries()["training_shard_layout"]
    rows = sorted(
        (r["doc_id"], r["shard"], r["pos"]) for r in q.spark(spark, sf_dir).collect()
    )
    docs = [r[0] for r in rows]
    assert len(docs) == len(set(docs))
    by_shard: dict = {}
    for _, shard, pos in rows:
        by_shard.setdefault(shard, []).append(pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    rows2 = sorted(
        (r["doc_id"], r["shard"], r["pos"]) for r in q.spark(spark, sf_dir).collect()
    )
    assert rows == rows2


def test_bpe_pair_counts_against_python(spark, sf_dir):
    """The distributed pair count must equal a direct Python count over
    the same corpus (top-K with the same deterministic tie-break)."""
    from collections import Counter

    from eth_dspa_2019_spark.io.readers import load_table
    from eth_dspa_2019_spark.plans.llm import BPE_TOPK
    from eth_dspa_2019_spark.plans.registry import all_queries

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    c: Counter = Counter()
    for r in docs:
        if r["text"] is None:
            continue
        for w in r["text"].split(" "):
            for i in range(len(w) - 1):
                c[w[i : i + 2]] += 1
    expected = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOPK]
    got = [
        (r["pair"], r["cnt"])
        for r in all_queries()["bpe_pair_counts"].spark(spark, sf_dir).collect()
    ]
    assert got == expected


def test_pq_topk_recall_vs_bruteforce(spark, sf_dir):
    """The PQ lookup scan + exact re-rank must recover most of the exact
    top-5. The fixture embeddings are near-random (unclusterable), the
    hostile case for PQ — 16 subspaces x ~N/7 codebook entries + a 5x
    oversample reach recall 0.78 (sf0.001) / 0.96 (sf0.01) — measured;
    random candidates would sit at ~0.03."""
    from eth_dspa_2019_spark.io.readers import load_table
    from eth_dspa_2019_spark.operators.similarity import cosine_topk, pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.vec_id)
        for r in pq_topk(emb, queries, k=5, cand_k=25).collect()
    }
    assert len(exact & got) / len(exact) >= 0.75


def test_pq_codes_shape_and_determinism(spark, sf_dir):
    """PQ global-scale quantization must be idempotent across runs (the
    codebook is data-derived, no RNG anywhere) and the scan must emit one
    row per (query, corpus vector) pair before the self-filter."""
    from eth_dspa_2019_spark.io.readers import load_table
    from eth_dspa_2019_spark.operators.similarity import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    a = sorted(map(tuple, pq_topk(emb, queries, k=5).collect()))
    b = sorted(map(tuple, pq_topk(emb, queries, k=5).collect()))
    assert a == b and len(a) == 15


def test_ivf_pq_recall_within_ivf(spark, sf_dir):
    """IVF+PQ loses recall through IVF's list pruning AND PQ's coarse
    codes; with a 5x oversample the PQ ranking recovers most of the
    within-list exact order, so hits against brute force must be within
    two of plain IVF's on the fixture."""
    from eth_dspa_2019_spark.io.readers import load_table
    from eth_dspa_2019_spark.operators.similarity import (
        cosine_topk,
        ivf_pq_topk,
        ivf_topk,
        stride_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    cents = stride_centroids(emb, 31)
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    ivf = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(emb, queries, cents, k=5, nprobe=3).collect()
    }
    pq = {
        (r.query_id, r.vec_id)
        for r in ivf_pq_topk(
            emb, queries, cents, k=5, nprobe=3, cand_k=25
        ).collect()
    }
    assert len(exact & pq) >= len(exact & ivf) - 2
