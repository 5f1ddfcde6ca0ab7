"""Physical-plan audits: the properties that matter at 100 TB must be
visible in the optimized plan, not assumed (SURVEY §4.2)."""

from __future__ import annotations

from eth_dspa_2019_spark.plans import all_queries


def _executed_plan(spark, sf_dir, name: str) -> str:
    df = all_queries()[name].spark(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    plan = _executed_plan(spark, sf_dir, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    # shipdate/discount/quantity predicates must reach the parquet reader
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read the full 16-column lineitem
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read_schema  # untouched column stays unread


def test_q5_broadcasts_dimensions(spark, sf_dir):
    plan = _executed_plan(spark, sf_dir, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan


def test_q1_whole_stage_codegen_and_partial_agg(spark, sf_dir):
    df = all_queries()["q1_pricing_summary"].spark(spark, sf_dir)
    df.collect()  # finalize the AQE plan so codegen spans are visible
    plan = df._jdf.queryExecution().executedPlan().toString()
    # whole-stage codegen spans show as `*(n)` operator prefixes
    assert "*(1)" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_windowed_two_stage_single_expand(spark, sf_dir):
    """sliding_counts_12h_30m pre-aggregates into 30-min tumbling buckets:
    the 24× sliding `Expand` must run over the partials, i.e. AFTER the
    first aggregation, never over the raw events."""
    df = all_queries()["sliding_counts_12h_30m"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    expand_pos = plan.find("Expand")
    assert expand_pos != -1
    # at least one HashAggregate must appear BELOW (after in text) Expand —
    # the tumbling pre-aggregation feeding it
    assert "HashAggregate" in plan[expand_pos:]


def test_task1_unique_users_dedups_before_expand(spark, sf_dir):
    """task1_unique_users must run the (hour, post, person) distinct BEFORE
    the 12× sliding-window Expand — replicating raw events 12× through the
    Expand is the SCALE.md scale-killer the two-stage shape removes."""
    df = all_queries()["task1_unique_users"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    expand_pos = plan.find("Expand")
    assert expand_pos != -1
    # the dedup aggregate must sit below (after in text) the Expand
    assert "HashAggregate" in plan[expand_pos:]


def test_cosine_topk_broadcasts_queries(spark, sf_dir):
    plan = _executed_plan(spark, sf_dir, "cosine_topk_bruteforce")
    assert "Broadcast" in plan  # query vectors replicated, corpus scanned once


def test_doc_pack_chunks_has_no_single_partition_window(spark, sf_dir):
    """Packing is a global prefix sum; it must run on the two-stage
    range-prefix plan, never an unkeyed (single-reducer) window."""
    plan = _executed_plan(spark, sf_dir, "doc_pack_chunks")
    assert "windowspecdefinition(__pfx_pid" in plan
    assert "SinglePartition" not in plan


def test_quality_quantile_windows_are_bucket_narrow(spark, sf_dir):
    """The per-lang quantile must never window a whole language (English
    at 100 TB = one partition): every window spec in the plan partitions
    by (lang, qb) — the histogram-offset plan — and the offsets table is
    broadcast, not shuffled."""
    plan = _executed_plan(spark, sf_dir, "quality_quantile_filter")
    specs = [
        ln for ln in plan.splitlines() if "windowspecdefinition" in ln
    ]
    assert specs, "expected the within-bucket row_number window"
    assert all("qb" in ln for ln in specs)
    assert "BroadcastHashJoin" in plan


def test_embedding_centroid_dist_broadcasts_centroids(spark, sf_dir):
    """The labels×dim centroid table is broadcast back to the exploded
    vector relation — the wide embedding arrays are never shuffled."""
    plan = _executed_plan(spark, sf_dir, "embedding_centroid_dist")
    assert "BroadcastHashJoin" in plan


def test_simhash_wide_candidates_stay_bucket_bounded(spark, sf_dir):
    """The wide-band candidate generation must be an equi-join on
    (band_id, band_key) — never a cross product over the fingerprint
    relation. This is the plan property that makes band_bits the
    corpus-scale knob (bucket population N/2^band_bits)."""
    plan = _executed_plan(spark, sf_dir, "simhash_pairs_wide")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band_id" in plan and "band_key" in plan


def test_ann_multiprobe_joins_on_bucket_only(spark, sf_dir):
    """Multi-probe ANN: the corpus is hashed once and joined to the
    (P+1)-expanded broadcast query side on the bucket id — no
    corpus×queries product anywhere in the plan."""
    plan = _executed_plan(spark, sf_dir, "ann_topk_multiprobe")
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan


def test_ivf_topk_never_builds_unbroadcast_product(spark, sf_dir):
    """The only row expansions in the IVF plan are broadcast-backed: the
    N×K centroid scoring (K tiny) and the probe join on centroid_id. A
    plain CartesianProduct — corpus shuffled against queries — must never
    appear; that is the product IVF exists to avoid."""
    plan = _executed_plan(spark, sf_dir, "ivf_topk")
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan


def test_tfidf_topk_window_is_doc_partitioned(spark, sf_dir):
    """doc_tfidf_topk's top-K must partition its window by doc_id (millions
    of small partitions) — a global, unpartitioned Window sort would be the
    one-reducer scale-killer."""
    df = all_queries()["doc_tfidf_topk"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    win_frag = plan[plan.find("Window"):][:400]
    assert "doc_id" in win_frag  # partition spec carries the doc key


def test_duplicate_span_scores_no_pairwise_join(spark, sf_dir):
    """duplicate_span_scores is linear in corpus shingles: one df groupBy +
    one back-join on shingle — no doc×doc self-join anywhere."""
    df = all_queries()["duplicate_span_scores"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # exactly one equi-join (shingle df back-join)
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + plan.count(
        "BroadcastHashJoin"
    ) == 1


def test_mixture_sample_broadcasts_rates(spark, sf_dir):
    """domain_mixture_sample: the per-domain rate table must broadcast onto
    the corpus scan — the corpus itself is never shuffled for the keep
    filter."""
    plan = _executed_plan(spark, sf_dir, "domain_mixture_sample")
    assert "BroadcastHashJoin" in plan
    # the only exchange is for the tiny per-source count aggregation
    assert "CartesianProduct" not in plan


def test_cms_sketch_joins_are_broadcast(spark, sf_dir):
    """event_heavy_hitters_cms: all four sketch-row lookups must be
    broadcast joins of the ≤ D·W-row sketch — the per-user side is never
    shuffled for the estimate."""
    plan = _executed_plan(spark, sf_dir, "event_heavy_hitters_cms")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_sq8_refine_fetch_is_broadcast(spark, sf_dir):
    """ann_topk_sq8: the exact re-rank fetches full-precision vectors via a
    broadcast of the tiny candidate list against the corpus — no shuffle of
    the corpus, no unbroadcast product."""
    plan = _executed_plan(spark, sf_dir, "ann_topk_sq8")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # candidate-list refine fetch


def test_boilerplate_strip_hot_set_broadcast(spark, sf_dir):
    """boilerplate_strip: the hot-gram set (small by construction) must
    broadcast onto the positional gram stream; nothing in the plan may be
    a cross product."""
    plan = _executed_plan(spark, sf_dir, "boilerplate_strip")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_incremental_dedup_is_equi_join_only(spark, sf_dir):
    """incremental_dedup_newbatch: both screens are equi-joins (prefix-hash
    semi-join, (band_id, band_key) new-vs-corpus join) — never a
    new×corpus product, never corpus×corpus anything."""
    plan = _executed_plan(spark, sf_dir, "incremental_dedup_newbatch")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band_id" in plan and "band_key" in plan


def test_q4_semi_join_and_pushdown(spark, sf_dir):
    """q4: the EXISTS must plan as a semi-join (orders never widened by
    lineitem columns) with the date range pushed to the orders scan."""
    plan = _executed_plan(spark, sf_dir, "q4_priority_with_returns")
    assert "LeftSemi" in plan
    assert "PushedFilters: [" in plan and "o_orderdate" in plan


def test_q10_topk_is_take_ordered(spark, sf_dir):
    """q10: the global top-20 must be a TakeOrderedAndProject (distributed
    heap), never a full global Sort."""
    plan = _executed_plan(spark, sf_dir, "q10_returned_revenue_topk")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # nation broadcast


def test_range_frame_is_user_partitioned(spark, sf_dir):
    """moving_value_avg_1h_range: the RANGE frame must partition by
    user_id (one exchange, per-user sliding evaluation) — no unkeyed
    global window."""
    df = all_queries()["moving_value_avg_1h_range"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    win_frag = plan[plan.find("Window"):][:500]
    assert "user_id" in win_frag
    assert "SinglePartition" not in plan


def test_ivf_sq8_no_unbroadcast_product(spark, sf_dir):
    """ivf_sq8_topk: probe and refine sides broadcast; the quantized list
    scan is an equi-join on centroid_id — no corpus×queries product."""
    plan = _executed_plan(spark, sf_dir, "ivf_sq8_topk")
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan


def test_q7_double_nation_broadcast(spark, sf_dir):
    """Both role-copies of the nation dim must broadcast — a dim joined
    twice is two broadcasts, never a fact shuffle."""
    plan = _executed_plan(spark, sf_dir, "q7_cross_nation_volume")
    assert plan.count("BroadcastHashJoin") >= 2


def test_q14_single_aggregate_with_pushdown(spark, sf_dir):
    """Promo and total revenue come from ONE grouped aggregate (two
    conditional sums), and the 1996 ship-date range reaches the scan."""
    plan = _executed_plan(spark, sf_dir, "q14_promo_revenue_share")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    # one partial+final pair, not two separate aggregations unioned: at
    # most one hash Exchange (on the month grouping expr) besides the
    # part-dim BroadcastExchange, and never a single-partition funnel
    # (upper bound, not exact count: a benign AQE/version exchange must
    # not fail the suite — ADVICE r5)
    assert plan.count("Exchange hashpartitioning(") <= 1
    assert "Exchange SinglePartition" not in plan


def test_q16_blacklist_is_broadcast_anti(spark, sf_dir):
    plan = _executed_plan(spark, sf_dir, "q16_part_supplier_variety")
    assert "LeftAnti, BuildRight" in plan
    # part predicate prunes via the broadcast join, lineitem scan stays
    # 3-column (partkey, suppkey join keys; no price columns read)
    read_schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    li_schema = [s for s in read_schemas if "l_partkey" in s][0]
    assert "l_extendedprice" not in li_schema


def test_q18_qualifying_set_semi_joins(spark, sf_dir):
    plan = _executed_plan(spark, sf_dir, "q18_large_volume_orders")
    assert "LeftSemi" in plan


def test_doc_chunk_spans_is_map_only(spark, sf_dir):
    """Overlapping chunking must be pure fan-out: no shuffle, no window."""
    plan = _executed_plan(spark, sf_dir, "doc_chunk_spans")
    assert "Exchange" not in plan
    assert "Window" not in plan


def test_training_shard_layout_single_shard_shuffle(spark, sf_dir):
    """At most one hash shuffle on the shard key; the row_number window
    must be shard-partitioned, never a global single-partition sort
    (upper bound, not exact count — ADVICE r5)."""
    plan = _executed_plan(spark, sf_dir, "training_shard_layout")
    assert plan.count("Exchange hashpartitioning(") <= 1
    assert "Exchange SinglePartition" not in plan


def test_bpe_pair_counts_topk_is_take_ordered(spark, sf_dir):
    plan = _executed_plan(spark, sf_dir, "bpe_pair_counts")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final pair count


def test_events_props_json_fuses_into_scan_stage(spark, sf_dir):
    """from_json must stay a JVM codegen projection over a pruned scan:
    only (event_type, props) read, NULL filter pushed, one shuffle."""
    plan = _executed_plan(spark, sf_dir, "events_props_json")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "IsNotNull(props)" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "value" not in read_schema and "user_id" not in read_schema


def test_unigram_surprisal_vocab_aggregates_map_side(spark, sf_dir):
    """The vocabulary count must be a partial+final HashAggregate pair
    (Zipf mass collapses before the exchange) and the scalar total a
    broadcast — never a CartesianProduct over data-sized relations."""
    plan = _executed_plan(spark, sf_dir, "doc_unigram_surprisal")
    assert plan.count("HashAggregate") >= 4  # vocab pair + per-doc pair
    assert "CartesianProduct" not in plan


def test_event_cube_is_single_expand_pass(spark, sf_dir):
    """CUBE must compile to ONE Expand (4 grouping sets in one pass),
    never a union of per-set re-scans."""
    plan = _executed_plan(spark, sf_dir, "event_cube")
    assert plan.count("Expand") == 1
    assert plan.count("FileScan parquet") == 1


def test_event_funnel_has_no_row_product(spark, sf_dir):
    """Each funnel stage is an equi-join on user_id against the previous
    frontier (plus a time predicate) — never a row×row product."""
    plan = _executed_plan(spark, sf_dir, "event_funnel")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_retention_cohorts_single_fact_partitioning(spark, sf_dir):
    """First-touch and the back-join both key on user_id; the distinct
    collapses before the small matrix aggregate."""
    plan = _executed_plan(spark, sf_dir, "user_retention_cohorts")
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4  # min pair + distinct/count pairs


def test_activity_correlation_joins_on_hour_only(spark, sf_dir):
    """Pairs must come from the shared-hour equi-join (co-occurrence
    bound), never a user×user product; top-k is TakeOrdered."""
    plan = _executed_plan(spark, sf_dir, "user_activity_correlation")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_balance_quartiles_window_is_nation_partitioned(spark, sf_dir):
    plan = _executed_plan(spark, sf_dir, "customer_balance_quartiles")
    assert "SinglePartition" not in plan
    win = plan[plan.find("Window"):][:300]
    assert "c_nationkey" in win


def test_event_gaps_window_is_user_partitioned(spark, sf_dir):
    plan = _executed_plan(spark, sf_dir, "user_event_gaps")
    assert "SinglePartition" not in plan
    win = plan[plan.find("Window"):][:300]
    assert "user_id" in win


def test_pruned_correlation_has_no_unsketched_pair_join(spark, sf_dir):
    """VERDICT r5 #7: the sketch-pruned correlation must never build the
    raw hour-keyed user×user product — the only pair-inequality join in
    the plan is the banded sketch self-join (carries a band key), and
    every hour-equi join also carries a candidate user equality."""
    plan = _executed_plan(spark, sf_dir, "grid_correlation_pruned_auto")
    assert "CartesianProduct" not in plan
    assert "band_key" in plan  # the sketch screen is actually in the plan
    for line in plan.splitlines():
        if "Join" not in line:
            continue
        cond = line
        # a '<' between user ids is only allowed inside the banded join
        if "user_id" in cond and " < " in cond:
            assert "band_key" in cond, line
        # an hour-equi join must be candidate-driven (u2 equality rides
        # along), never the bare series self-join on hour alone
        if "hour" in cond and " = " in cond and "band_key" not in cond:
            assert "ub" in cond or "u2" in cond or "user_id" in cond, line


def test_q8_broadcasts_all_dims(spark, sf_dir):
    """Q8's seven-relation constellation: every dim broadcasts; lineitem
    is the only shuffled relation and no cartesian appears."""
    plan = _executed_plan(spark, sf_dir, "q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in plan


def test_q21_decorrelated_no_cartesian(spark, sf_dir):
    """Q21's EXISTS/NOT-EXISTS composition must run as keyed aggregations
    + joins — no correlated re-execution, no cartesian/nested-loop."""
    plan = _executed_plan(spark, sf_dir, "q21_suppliers_kept_waiting")
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4  # two grouped rollups, partial+final


def test_q11_global_scalar_is_broadcast(spark, sf_dir):
    """The HAVING-vs-total comparison joins a 1-row broadcast, never
    rescans or single-partitions the grouped relation."""
    plan = _executed_plan(spark, sf_dir, "q11_important_stock")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q12_derived_predicates_stay_in_scan_stage(spark, sf_dir):
    """The derived shipmode/commit/receipt predicates are pure
    projections of scan columns — they must filter BEFORE the orders
    join (no Exchange between the lineitem scan and the filter)."""
    plan = _executed_plan(spark, sf_dir, "q12_shipmode_priority")
    assert "CartesianProduct" not in plan
    # the lineitem side reads only the columns the derivation needs
    read_schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    li = [s for s in read_schemas if "l_orderkey" in s][0]
    assert "l_extendedprice" not in li and "l_tax" not in li


def test_bloom_probe_is_broadcast_and_bounded(spark, sf_dir):
    """The Bloom filter's set-bits relation (<= BLOOM_M rows at ANY
    member count) must broadcast to the probe side — never a shuffle of
    the probe relation against the filter."""
    from eth_dspa_2019_spark.plans.sketch import BLOOM_M, bloom_build
    from eth_dspa_2019_spark.io.readers import load_table
    from pyspark.sql import functions as F2

    plan = _executed_plan(spark, sf_dir, "bloom_membership_screen")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    ev = load_table(spark, sf_dir, "events")
    members = ev.filter(
        (F2.col("event_type") == "purchase") & (F2.col("value") > 300)
    ).select("user_id").distinct()
    assert bloom_build(members, "user_id").count() <= BLOOM_M


def test_triangle_count_wedge_join_is_keyed(spark, sf_dir):
    """The wedge join must be an equi-join on the shared endpoint and the
    closing-edge lookup an equi-join on the wedge pair — never a
    cartesian (the degree orientation's whole point)."""
    plan = _executed_plan(spark, sf_dir, "graph_triangle_count")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_zorder_layout_is_map_only_plus_one_aggregate(spark, sf_dir):
    """Bin + interleave must stay map-only integer projections; the only
    shuffle is the group-stats aggregate on the (<= 64-value) zgroup key,
    with a map-side partial so the tiny key space never funnels raw rows.
    No joins at all (the 4 dimension stats are literals in the plan)."""
    plan = _executed_plan(spark, sf_dir, "events_zorder_layout")
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    assert plan.count("Exchange hashpartitioning(") <= 1
    assert "partial_count" in plan or "partial" in plan.lower()


def test_paragraph_dedup_election_is_aggregated_before_join(spark, sf_dir):
    """First-occurrence election must be groupBy(para).min — a map-side
    combined aggregate — joined back by paragraph hash; no window over the
    full paragraph stream and no single-partition funnel anywhere."""
    plan = _executed_plan(spark, sf_dir, "doc_paragraph_dedup")
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan


def test_bm25_query_terms_are_broadcast(spark, sf_dir):
    """The query-term relation must broadcast onto the postings stream;
    no cartesian anywhere; the top-k is a limit, not a global sort of
    all scores through one partition before it."""
    plan = _executed_plan(spark, sf_dir, "bm25_search_topk")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_quantile_sketch_has_no_single_partition_stage(spark, sf_dir):
    """The cumulative step runs on the SKETCH via a triangular join —
    no data-sized single-partition window may appear."""
    plan = _executed_plan(spark, sf_dir, "value_quantile_sketch")
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_cdc_merge_is_one_keyed_join(spark, sf_dir):
    """MERGE = snapshot x changes on the merge key plus a union with the
    tiny insert set: equi-join only, no cartesian, no window."""
    plan = _executed_plan(spark, sf_dir, "customer_cdc_merge")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
