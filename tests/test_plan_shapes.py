"""Physical-plan assertions: the scale properties SURVEY §4 promises —
pushdown, pruning, broadcast joins, top-k without global sort — must
show up in the actual plans, not just in docstrings."""

from __future__ import annotations

from bqfetch_spark.registry import all_queries
from tests.conftest import SF_CORRECT

REG = all_queries()


def _plan(spark, name: str) -> str:
    df = REG[name].fn(spark, SF_CORRECT)
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(spark, name: str) -> str:
    from bqfetch_spark.compat import formatted_plan

    df = REG[name].fn(spark, SF_CORRECT)
    return formatted_plan(df)


def test_q01_filter_pushed_to_scan(spark):
    plan = _formatted(spark, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q01_column_pruning(spark):
    plan = _formatted(spark, "q01_pricing_summary")
    # scan must read only the 7 needed columns, not all 11
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = m.group(1).split(",")
    assert len(cols) == 7, cols
    assert not any("l_orderkey" in c for c in cols)


def test_q06_broadcasts_dimension(spark):
    plan = _plan(spark, "q06_shipping_priority")
    assert "BroadcastHashJoin" in plan


def test_q05_topk_avoids_global_sort(spark):
    plan = _plan(spark, "q05_topk_orders")
    assert "TakeOrderedAndProject" in plan


def test_q08_semi_join_operator(spark):
    plan = _plan(spark, "q08_semi_join")
    assert "LeftSemi" in plan


def test_q01_whole_stage_codegen(spark):
    df = REG["q01_pricing_summary"].fn(spark, SF_CORRECT)
    df.collect()  # AQE only materializes codegen stages in the final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # "*(n)" prefixes mark whole-stage-codegen'd operators
    assert "*(" in plan


def test_q30_partial_aggregation(spark):
    plan = _formatted(spark, "q30_tumbling_window")
    assert "partial_count" in plan or "partial_sum" in plan


def test_q18_no_forced_broadcast_of_customer(spark):
    """customer is fact-sized: only the three bounded dimensions
    (region, nation_region, supplier) carry explicit broadcast hints;
    the customer join strategy is left to AQE."""
    df = REG["q18_local_supplier_volume"].fn(spark, SF_CORRECT)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 3, analyzed.count("ResolvedHint")


def test_q34_topk_avoids_global_window(spark):
    plan = _plan(spark, "q34_token_frequencies")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_q25_ntile_adaptive_spelling(spark, monkeypatch):
    """Quartile assignment picks its physical spelling by estimated
    input size (plans/ranks.with_ntile_auto). Small input (sf0.01,
    under the crossover): the plain single-window ntile — the scalable
    machinery is pure overhead here. Large input (crossover forced to
    0): the range-exchange + offset spelling with NO data-sized
    unpartitioned window — the only unpartitioned windows run over
    per-partition count rows (metadata)."""
    import bqfetch_spark.plans.ranks as ranks

    small = _plan(spark, "q25_ntile_quartiles")
    assert "ntile" in small
    assert "row_number() windowspecdefinition(__pid" not in small

    monkeypatch.setattr(ranks, "SINGLE_SORT_BYTES", -1)
    big = _plan(spark, "q25_ntile_quartiles")
    assert "ntile" not in big
    # one deterministic-bucket corpus exchange (round-8 one-pass shape)
    assert "hashpartitioning(__pid" in big
    # the data-sized rank window is clustered on the bucket id
    assert "row_number() windowspecdefinition(__pid" in big


def test_q69_self_join_is_salted(spark):
    """The within-cell self-join must partition on (cell_id, salt) —
    k cells alone under-parallelize when k < task slots, and AQE would
    coalesce the tiny-bytes exchange under the compute-heavy join."""
    plan = _plan(spark, "q69_embedding_neardup_ivf")
    assert any(
        "Exchange hashpartitioning" in l and "cell_id" in l and "salt" in l
        for l in plan.splitlines()
    ), plan


def test_qx266_signature_subtree_shared(spark):
    """qx266's banded Hamming self-join must read the SHARED
    checkpointed signature frame on both sides (round 14): without the
    checkpoint the static plan re-derives the token-explode + 60-vote
    aggregate per side, and the broadcast side's copy is NOT covered
    by AQE exchange reuse (measured 3.25 → 2.55 s isolated). The plan
    therefore contains zero parquet scans of documents and no
    duplicated vote aggregate."""
    plan = _plan(spark, "qx266_simhash_exact")
    assert "Scan parquet" not in plan, plan
    # the 60-vote aggregate runs in the (already-materialized)
    # checkpoint, not in this plan — neither side re-derives it
    assert plan.count("Scan ExistingRDD") <= 2, plan


def test_q40_dedup_exchanges_on_hash_key(spark):
    """Exact dedup must shuffle on the 8-byte xxhash64(text) pre-key,
    never on the raw text column."""
    plan = _plan(spark, "q40_exact_dedup")
    exchanges = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert exchanges, plan
    assert all("fp#" in l and "text#" not in l for l in exchanges), exchanges


def test_q76_pii_is_pure_projection(spark):
    # redaction must run at scan bandwidth: no exchange anywhere
    plan = _plan(spark, "q76_pii_redact")
    assert "Exchange" not in plan


def test_q77_contamination_broadcasts_eval_side(spark):
    plan = _plan(spark, "q77_contamination")
    assert "BroadcastHashJoin" in plan


def test_q75_single_exchange_for_both_agg_levels(spark):
    # per-(doc,bigram) count and per-doc max/sum must ride ONE doc_id
    # exchange (hash partitioning on a subset of the grouping keys)
    plan = _plan(spark, "q75_repetition_stats")
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_q78_interval_join_is_hash_not_nested_loop(spark):
    # keyless interval join must become a bucket equi-join, never a
    # nested-loop over facts × intervals
    plan = _plan(spark, "q78_interval_join")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q82_holdout_is_take_ordered(spark):
    # exact-k hash sample must be per-partition heaps, not a global sort
    plan = _plan(spark, "q82_holdout_sample")
    assert "TakeOrderedAndProject" in plan


def test_q83_profile_single_scan(spark):
    # all columns' stats (incl. 3 exact distinct counts) must come from
    # ONE table scan via the Expand-based distinct-aggregate rewrite
    import re

    plan = _plan(spark, "q83_column_profile")
    assert len(re.findall(r"FileScan parquet", plan)) == 1
    assert "Expand" in plan


def test_qx258_split_report_single_scan(spark):
    # VERDICT r9 #6: the doc_frac denominator must come from the 3-row
    # aggregate itself (unpartitioned window-sum), not a second corpus
    # action — ONE FileScan of documents in the whole plan
    import re

    plan = _plan(spark, "qx258_split_assignment")
    assert len(re.findall(r"FileScan parquet", plan)) == 1
    assert "Window" in plan


def test_qx104_grouping_sets_single_expand(spark):
    # three grouping sets must plan as ONE Expand into ONE hash
    # aggregate (a single hashpartitioning exchange) — no per-set
    # rescans of the fact
    import re

    plan = _plan(spark, "qx104_grouping_sets")
    assert plan.count("Expand") == 1, plan
    assert len(re.findall(r"FileScan parquet", plan)) == 1
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_qx105_chunking_is_exchange_free(spark):
    # sequence+explode+substring is a pure narrow map: no exchange at
    # all, chunks inherit the scan's partitioning
    plan = _plan(spark, "qx105_doc_chunking")
    assert "Exchange" not in plan, plan
    assert "Generate" in plan


def test_qx106_stats_are_broadcast_back(spark):
    # the tiny per-type moments frame must broadcast onto the event
    # stream — the flag pass may not shuffle the fact
    plan = _plan(spark, "qx106_zscore_outliers")
    assert "BroadcastHashJoin" in plan


def test_qx107_topk_and_no_cartesian(spark):
    # both top-k boundaries (vocab, final pairs) are per-partition
    # heaps; the pair self-join is an equi-join on doc_id
    plan = _plan(spark, "qx107_token_cooccurrence")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_qx108_banding_makes_equi_join(spark):
    # the length-band blocking must turn the similarity join into an
    # equi-join — never an all-pairs nested loop
    plan = _plan(spark, "qx108_fuzzy_name_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_qx110_moments_single_scan_per_table(spark):
    # the five exact moments must come from ONE pass over the join —
    # no per-moment rescans (2 scans total: orders + lineitem)
    import re

    plan = _plan(spark, "qx110_correlation")
    assert len(re.findall(r"FileScan parquet", plan)) == 2, plan


def test_qx111_window_runs_on_reduced_frame(spark):
    # the normalizing total is a window over bucket COUNTS (post-agg),
    # never a single-partition pass over raw events: the aggregate
    # must appear below the window in the plan tree
    plan = _plan(spark, "qx111_value_histogram")
    assert "Window" in plan
    w = plan.index("Window")
    assert "HashAggregate" in plan[w:], plan


def test_qx112_hopping_is_one_expand_one_exchange(spark):
    # the 2x window expansion must be a single Expand into ONE
    # partial-aggregated hash agg — never per-window rescans
    import re

    plan = _plan(spark, "qx112_hopping_window")
    assert plan.count("Expand") == 1, plan
    assert len(re.findall(r"FileScan parquet", plan)) == 1
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_qx114_windows_run_on_contingency_cells(spark):
    # expected-count windows must run over the ~25-cell frame: the
    # fact-reducing aggregate appears BELOW (after, in toString order)
    # the first Window operator
    plan = _plan(spark, "qx114_chisquare")
    w = plan.index("Window")
    assert "HashAggregate" in plan[w:], plan


def test_qx115_single_user_exchange_serves_window_and_agg(spark):
    # the lag window and the pair aggregation must ride ONE user_id
    # hash exchange; the pair agg partial-combines map-side
    import re

    plan = _plan(spark, "qx115_markov_transitions")
    user_ex = re.findall(r"Exchange hashpartitioning\(user_id", plan)
    assert len(user_ex) == 1, plan


def test_qx116_single_user_exchange_serves_window_and_agg(spark):
    import re

    plan = _plan(spark, "qx116_time_weighted_avg")
    user_ex = re.findall(r"Exchange hashpartitioning\(user_id", plan)
    assert len(user_ex) == 1, plan


def test_qx117_ks_scale_path_uses_bucket_exchange(spark, monkeypatch):
    # the CDF counters ride with_global_cumsums — adaptive since round
    # 8: single window at fixture scale, the deterministic-bucket
    # exchange when forced past the crossover; the fact join
    # broadcasts the filtered customer side in both regimes
    import bqfetch_spark.plans.ranks as ranks

    # fixture scale: the caller-checkpointed counters route to the
    # plain running-sum window — no bucket machinery in the plan
    small = _plan(spark, "qx117_ks_test")
    assert "windowspecdefinition" in small
    assert "__pid" not in small

    monkeypatch.setattr(ranks, "SINGLE_SORT_BYTES", -1)
    monkeypatch.setattr(ranks, "SINGLE_SORT_ROWS", -1)
    big = _plan(spark, "qx117_ks_test")
    # scale path: bucket exchange + broadcast offsets join on __pid
    assert "hashpartitioning(__pid" in big
    assert "BroadcastHashJoin" in big


def test_qx120_benford_partial_aggregates(spark):
    # the 9-digit count must partial-combine map-side: each map task
    # sends <=9 rows into the single exchange
    plan = _formatted(spark, "qx120_benford")
    assert "partial_count" in plan


def test_qx122_mad_never_shuffles_the_fact(spark):
    # both stats frames broadcast back; the only hash exchanges are
    # the two tiny per-type percentile aggregations
    import re

    plan = _plan(spark, "qx122_mad_outliers")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    fact_ex = re.findall(r"Exchange hashpartitioning\(event_type[^)]*\), 3[0-9]", plan)
    assert len(fact_ex) <= 2, plan


def test_qx127_weighted_sample_is_take_ordered(spark):
    # Efraimidis-Spirakis reduces weighted sampling to top-k: the plan
    # must be per-partition heaps + O(k) merge, never a global sort
    plan = _plan(spark, "qx127_weighted_sample")
    assert "TakeOrderedAndProject" in plan


def test_qx128_winsorize_broadcasts_percentiles(spark):
    plan = _plan(spark, "qx128_winsorize")
    assert "BroadcastHashJoin" in plan


def test_qx130_journey_topk_avoids_global_sort(spark):
    plan = _plan(spark, "qx130_user_journey")
    assert "TakeOrderedAndProject" in plan


def test_qx133_knn_scores_per_corpus_block(spark):
    # round-13 shape: the corpus moves ONCE into hashed block groups
    # scored in applyInPandas (query side replicated per block) — no
    # pair join, no cartesian fallback, and exactly one exchange
    # carries the vectors (the blk group-by; the top-k window rides
    # the skinny scored rows)
    plan = _plan(spark, "qx133_knn_classify")
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_qx134_no_single_partition_exchange(spark):
    # percent_rank/cume_dist partition by event_type: the plan must
    # never coalesce to one task for a global window
    plan = _plan(spark, "qx134_percent_rank")
    assert "Exchange SinglePartition" not in plan, plan


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Spark's runtime Bloom-filter join pruning — the 100 TB lever
    that pre-filters the fact shuffle with a bloom built from the
    selective dimension side. The application-side threshold defaults
    to 10 GB (it triggers naturally at warehouse scale); lowering it
    here proves the machinery fires on this engine's join shape: the
    plan must build `bloom_filter_agg` over the filtered orders keys
    and probe it (`might_contain`) on the lineitem side before the
    shuffle."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_CORRECT}/orders.parquet").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_qx138_tfidf_single_corpus_scan(spark):
    # tf and df must share ONE scan+explode: df is a window over the
    # tf frame, not a second aggregate branch (which would re-explode
    # the corpus — measured 3 scans before the chain spelling). The
    # only other scan is the pruned count(*) for N.
    import re

    plan = _plan(spark, "qx138_tfidf_keywords")
    assert len(re.findall(r"FileScan parquet", plan)) == 2, plan


def test_qx148_query_terms_broadcast_onto_tf(spark):
    """BM25's query side must broadcast onto the tf stream (the
    inverted-index access pattern); the corpus-sized side is never the
    build side of a shuffle join for the 5-term query frame."""
    plan = _plan(spark, "qx148_bm25_retrieval")
    assert "BroadcastHashJoin" in plan


def test_qx152_single_scan(spark):
    """The correlation matrix must compute ALL sufficient statistics in
    one aggregate pass: exactly one lineitem scan in the plan, and one
    final-aggregate pair (partial + final)."""
    plan = _plan(spark, "qx152_correlation_matrix")
    assert plan.count("lineitem.parquet") == 1, plan.count("lineitem.parquet")


def test_qx151_scale_path_has_no_single_partition_sort(spark, monkeypatch):
    """Gini's global ascending rank is adaptive (plans/ranks): at
    fixture scale the customer frame is far under the single-sort
    crossover, so the plain window is the chosen physical plan; past
    the crossover (forced here) the rank must come from the
    bucket-exchange machinery — deterministic-bucket exchange, local
    per-bucket ranks, no SinglePartition window over the whole
    customer-revenue frame."""
    import bqfetch_spark.plans.ranks as ranks

    monkeypatch.setattr(ranks, "SINGLE_SORT_BYTES", -1)
    monkeypatch.setattr(ranks, "SINGLE_SORT_ROWS", -1)
    plan = _plan(spark, "qx151_gini_concentration")
    assert "hashpartitioning(__pid" in plan
    # the row_number window over ranked customers partitions on __pid
    # (per-bucket local ranks + broadcast offsets), never a
    # SinglePartition window over the whole customer frame
    assert "windowspecdefinition(__pid" in plan


def test_global_rank_single_corpus_exchange(spark, monkeypatch):
    """Round-8 one-pass proof (VERDICT r7 #2): with_global_rank must
    shuffle the corpus exactly ONCE. The round-7 spelling
    (repartitionByRange + nondeterministic spark_partition_id) ran the
    data-sized range exchange twice — counts branch and data branch.
    The deterministic bucket id moves the counts to a map-side partial
    aggregate of the UN-shuffled frame, so the only data-sized
    exchange left is the single explicit repartition
    (REPARTITION_BY_NUM); everything else shuffles n_buckets-sized
    metadata. rangepartitioning must be gone entirely."""
    import bqfetch_spark.plans.ranks as ranks
    from tests.conftest import SF_CORRECT

    monkeypatch.setattr(ranks, "SINGLE_SORT_BYTES", -1)  # force scale path
    monkeypatch.setattr(ranks, "SINGLE_SORT_ROWS", -1)
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    r = ranks.with_global_rank(docs, ["n_chars", "doc_id"], 16)
    r.collect()  # materialize so AQE finalizes the plan
    plan = r._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("REPARTITION_BY_NUM") == 1, final
    assert "rangepartitioning" not in final
    # counts reach the offsets window via map-side partial aggregation,
    # never a corpus shuffle
    assert "partial_count" in final


def test_qx150_single_user_exchange(spark):
    """The PIT join is the union-scan idiom: no range/cartesian join in
    the plan — the enrichment rides hashpartitioning(user_id) windows."""
    plan = _plan(spark, "qx150_pit_enrich")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "hashpartitioning(user_id" in plan


def test_qx146_bfs_visits_each_node_once(spark):
    """BFS output: hop 0 is exactly the source; every settled node
    appears once; hops are consistent with edges (no hop jumps)."""
    from pyspark.sql import functions as F

    from bqfetch_spark.operators.graph import BFS_SOURCE

    rows = REG["qx146_bfs_hops"].fn(spark, SF_CORRECT).collect()
    by_nation = {r.nation: r.hops for r in rows}
    assert by_nation[BFS_SOURCE] == 0
    assert sum(1 for h in by_nation.values() if h == 0) == 1
    assert len(rows) == len(by_nation) == 25
    hops = sorted(h for h in by_nation.values() if h is not None)
    # hop levels are contiguous from 0 (frontier expansion can't skip)
    assert hops[0] == 0 and all(b - a <= 1 for a, b in zip(hops, hops[1:]))


def test_qx145_triangle_total_divisible_by_three(spark):
    """Each triangle contributes exactly 3 corner participations."""
    rows = REG["qx145_triangle_count"].fn(spark, SF_CORRECT).collect()
    assert sum(r.n_triangles for r in rows) % 3 == 0
    assert len(rows) == 25  # zero-count nations kept


def test_qx147_cms_bounds_hold_and_topk_exact(spark):
    """The CMS flags must all be True (Spark's sketch within the
    one-sided CMS guarantee) and the top-k must agree with a direct
    exact recount."""
    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import load_catalog

    rows = REG["qx147_heavy_hitters_cms"].fn(spark, SF_CORRECT).collect()
    assert all(r.est_in_bounds for r in rows)
    docs = load_catalog(spark, SF_CORRECT).table("documents")
    exact = dict(
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .count()
        .collect()
    )
    for r in rows:
        assert exact[r.token] == r.n_exact


def test_qx150_no_future_leakage(spark):
    """PIT semantics: every enriched purchase's state_since must be <=
    its own ts (never a future version) and must be a real version
    start for that user."""
    rows = REG["qx150_pit_enrich"].fn(spark, SF_CORRECT).collect()
    assert len(rows) > 0
    enriched = [r for r in rows if r.browse_state is not None]
    assert enriched  # fixture has browsing history before purchases
    for r in enriched:
        assert r.state_since <= r.ts


def test_qx156_gopher_is_pure_projection(spark):
    # rule battery must run at scan bandwidth: no exchange anywhere
    plan = _plan(spark, "qx156_gopher_quality_filter")
    assert "Exchange" not in plan


def test_q101_sq8_broadcasts_scale_and_queries(spark):
    # corpus scanned once: both small sides (1-row scale, 5-row query
    # set) ride broadcast nested loop joins; no hash exchange before
    # the per-query top-k window
    plan = _plan(spark, "q101_ann_sq8")
    assert plan.count("BroadcastNestedLoopJoin") >= 2, plan


def test_qx155_bloom_side_is_broadcast(spark):
    # the m/64-word bloom filter frame must reach the wave via a
    # broadcast hash join on word_idx — the probe stream itself is
    # never exchanged for the membership test
    plan = _plan(spark, "qx155_bloom_prefilter_dedup")
    assert "BroadcastHashJoin [word_idx" in plan or (
        "BroadcastHashJoin" in plan and "word_idx" in plan
    ), plan


def test_registry_has_no_plan_scale_killers(spark):
    """Registry-wide plan hygiene (mirrors scripts/plan_audit.py): no
    query's physical plan may contain a row-at-a-time Python UDF
    (BatchEvalPython — Arrow paths plan as ArrowEvalPython /
    MapInPandas / FlatMapGroupsInPandas) or a non-broadcast cartesian
    product (CartesianProduct — intended broadcast cross joins plan as
    BroadcastNestedLoopJoin). Streaming wrappers are skipped: their
    outer frame is just a sink read and their per-wave plans have
    dedicated tests; heavier multi-job queries are exercised at the
    smoke SF."""
    from tests.conftest import SF_SMOKE

    offenders = {}
    for name, q in sorted(REG.items()):
        if "streaming" in q.tags:
            continue
        plan = q.fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        hard = [f for f in ("BatchEvalPython", "CartesianProduct") if f in plan]
        if hard:
            offenders[name] = hard
    assert not offenders, offenders


def test_qx171_disjunction_pushes_part_side_or_filter(spark):
    """Q19's optimizer lesson, pinned: the part-only atoms of the
    OR-of-ANDs predicate must reach the part scan as one pushed Or
    filter (three size bands), not evaluate post-join only."""
    plan = _formatted(spark, "qx171_disjunctive_revenue")
    import re

    pushed = re.findall(r"PushedFilters: \[([^\]]*)", plan)
    part_side = [p for p in pushed if "p_size" in p]
    assert part_side and "Or(" in part_side[0], pushed


def test_aqe_splits_skewed_join_partition(spark):
    """The engine's skew posture relies on AQE's runtime skew-join
    split as the first line of defense (plans/skew.py salting is the
    manual fallback) — pin that it actually fires: a 200k-row hot key
    against 31 cold keys must execute with a skew=true sort-merge join
    in the final adaptive plan, i.e. the hot partition was split, not
    serialized through one task."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(300_000).select(
            F.when(F.col("id") < 200_000, 0).otherwise((F.col("id") % 31) + 1).alias("k"),
            F.col("id").alias("v"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(32).select(F.col("id").alias("k"), F.lit("dim").alias("d"))
        j = left.join(right, "k")
        assert len(j.collect()) == 300_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_qx197_vocab_join_is_broadcast_topk_is_heap(spark):
    """qx197's two scale-critical shapes: the V-row vocabulary must
    reach the token stream as a BROADCAST join build side, and the
    vocabulary cut must plan as TakeOrderedAndProject (per-partition
    heaps) — never a global sort of the token vocabulary."""
    from bqfetch_spark.registry import all_queries

    df = all_queries()["qx197_vocab_oov_rate"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_qx219_single_moments_pass(spark):
    """qx219's scale claim: the corpus moments pass materializes ONCE
    (eager checkpoint of the groups-sized stats frame) — the pair
    stage's plan joins two 10-row RDD scans under broadcast, with NO
    embeddings scan, no posexplode, and no cartesian product."""
    plan = _plan(spark, "qx219_embedding_frechet")
    assert "Exchange hashpartitioning(label" not in plan, plan
    assert "embeddings" not in plan, plan  # corpus scan happened pre-checkpoint
    assert "posexplode" not in plan.lower(), plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_qx223_eval_side_broadcasts(spark):
    """qx223's scale claim: the eval id set and eval gram set reach the
    corpus stream as broadcasts (benchmark-sized), so the corpus text
    is never shuffled for the embargo join."""
    plan = _plan(spark, "qx223_decontaminated_split")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan
    # no corpus-wide exchange carries the text column
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line, line


def test_dynamic_partition_pruning_fires_on_partitioned_layout(spark):
    """Scale machinery: when the partition-column filter is only known
    at runtime (a join against a filtered dim), Spark must inject a
    dynamicpruning subquery into the partitioned scan — at 100 TB this
    is the difference between listing 2 day-directories and all of
    them. q38 pins the STATIC PartitionFilter; this pins the dynamic
    leg, plus value-equality against a static spelling."""
    from pyspark.sql import functions as F

    from bqfetch_spark.operators.lakehouse import (
        layout_dir_for,
        write_partitioned_events,
    )

    write_partitioned_events(spark, SF_CORRECT, layout_dir_for(SF_CORRECT))
    fact = spark.read.parquet(layout_dir_for(SF_CORRECT))
    dates = [
        r.event_date
        for r in fact.select("event_date").distinct().orderBy("event_date").collect()
    ]
    assert len(dates) > 5
    dim = spark.createDataFrame(
        [(d, "keep" if i < 2 else "drop") for i, d in enumerate(dates)],
        "event_date date, tag string",
    )
    j = (
        fact.join(dim.filter(F.col("tag") == "keep"), "event_date")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan

    want = sorted(
        map(
            tuple,
            fact.filter(F.col("event_date").isin(dates[:2]))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect(),
        )
    )
    assert sorted(map(tuple, j.collect())) == want


def test_qx249_lateral_decorrelates_to_window(spark):
    """The correlated LATERAL top-N must be decorrelated by Catalyst:
    an equi-join plus a rank window with WindowGroupLimit pushdown
    (per-partition top-k heaps before the full window) — never a
    nested-loop or cartesian re-scan of orders per customer."""
    plan = _plan(spark, "qx249_lateral_topn")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "WindowGroupLimit" in plan, plan


def test_qx248_variant_stays_jvm_side(spark):
    """parse_json + variant_get must run as JVM expressions — no
    Python evaluation anywhere in the semi-structured path."""
    plan = _plan(spark, "qx248_variant_ingest")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_qx252_aggregates_pushed_to_parquet_footers(spark):
    """MIN/MAX/COUNT must be answered from row-group footer statistics:
    the DSv2 scan carries PushedAggregation (one per audited table) —
    a stats query that never reads data pages."""
    plan = _plan(spark, "qx252_footer_aggregates")
    assert plan.count("PushedAggregation: [COUNT(*)") >= 2, plan


def test_qx253_scan_has_runtime_pruning_subquery(spark):
    """The fact scan's PartitionFilters must carry a dynamicpruning#
    subquery — the day set is only knowable at runtime, and the scan
    must skip non-matching day directories rather than read them."""
    plan = _plan(spark, "qx253_dynamic_partition_pruning")
    assert "dynamicpruning" in plan, plan


def test_qx254_bucketed_join_no_join_key_exchange(spark):
    """The fact-fact join must ride the bucket layout: no exchange on
    either join key anywhere in the plan — the only exchanges are the
    post-join groupBy/orderBy over the groups-sized frame."""
    df = REG["qx254_bucketed_join"].fn(spark, SF_CORRECT)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in final
    for line in final.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "o_orderkey" not in line and "l_orderkey" not in line, line
