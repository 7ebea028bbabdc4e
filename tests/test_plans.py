"""Physical-plan regression guards: the properties that make these operators
scale (pushdown, pruning, broadcast dims, map-side partial aggregation) must
survive refactors — a correct-but-full-scan plan is a perf bug at 100 TB."""

import __spark_entry__ as em


def _plan(spark, sf_dir, name):
    df = em.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_snapshot_scan_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "snapshot_scan")
    assert "PushedFilters: [" in plan and "GreaterThan(l_quantity,25.0)" in plan
    # pruned: ignored columns never reach the reader
    assert "l_comment" not in plan and "l_tax" not in plan


def test_revenue_join_broadcasts_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must never shuffle the fact side


def test_pricing_summary_partial_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    # two HashAggregates (partial + final) around one Exchange: map-side combine
    assert plan.count("HashAggregate") >= 2
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_merge_compact_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "merge_compact")
    # compaction folds map-side: exactly one exchange for the groupBy
    assert plan.count("Exchange hashpartitioning") == 1


def test_checker_full_outer_on_keys(spark, sf_dir):
    plan = _plan(spark, sf_dir, "checker_diff")
    assert "FullOuter" in plan


def test_ann_lsh_bucket_join_not_nested_loop(spark, sf_dir):
    # the exploded (band, value) equi-join must hash-partition; the old
    # OR-of-band-equalities predicate degraded to a nested-loop cross product
    plan = _plan(spark, sf_dir, "ann_lsh")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_cosine_dup_pairs_bucket_kernel_no_join(spark, sf_dir):
    # near-dup verification happens inside per-(band, bucket) Arrow kernels:
    # exactly one grouping shuffle feeds FlatMapGroupsInPandas and NO join
    # operator (a pairwise join formulation pays an interpreted fold per
    # candidate; any cartesian/nested-loop shape is O(n^2) at corpus scale)
    plan = _plan(spark, sf_dir, "cosine_dup_pairs")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan


def test_token_stats_no_shuffle(spark, sf_dir):
    # pure per-row JVM expressions over one scan: no exchange at all
    plan = _plan(spark, sf_dir, "token_stats")
    assert "Exchange" not in plan


def test_rep_stats_partial_aggregation(spark, sf_dir):
    # explode -> two agg levels, both with map-side partial aggregation
    plan = _plan(spark, sf_dir, "rep_stats")
    assert plan.count("HashAggregate") >= 4  # partial+final per level
    # only doc_id + text reach the scan
    assert "lang" not in plan and "source" not in plan


def test_pii_redact_no_shuffle_and_pruned(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pii_redact")
    assert "Exchange" not in plan  # embarrassingly parallel per document
    assert "lang" not in plan and "source" not in plan


def test_session_windows_single_shuffle(spark, sf_dir):
    # one exchange on the grouping key; session merge happens inside the agg
    plan = _plan(spark, sf_dir, "session_windows")
    assert plan.count("Exchange hashpartitioning") == 1


def test_contamination_broadcast_inverted_index(spark, sf_dir):
    # the eval side is a benchmark (small by definition): its gram relation
    # must broadcast so the corpus-side inverted index never shuffles to join
    plan = _plan(spark, sf_dir, "contamination")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_ann_ivf_index_pruning_join(spark, sf_dir):
    # the stored-index query path must broadcast the probe relation against
    # the list-partitioned assignments — never a nested-loop/cartesian shape
    plan = _plan(spark, sf_dir, "ann_ivf_index")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_doc_chunks_no_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "doc_chunks")
    assert "Exchange" not in plan  # per-row slicing + explode only
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_clf_score_no_shuffle_and_pruned(spark, sf_dir):
    plan = _plan(spark, sf_dir, "clf_score")
    assert "Exchange" not in plan  # pure per-row scoring
    assert "text:string" in plan and "n_chars" not in plan


def test_span_dedup_single_window_shuffle(spark, sf_dir):
    # one exchange for the span-keyed window, one for the doc group-back
    plan = _plan(spark, sf_dir, "span_dedup")
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_contamination_bloom_arrow_prefilter(spark, sf_dir):
    plan = _plan(spark, sf_dir, "contamination_bloom")
    # bloom membership runs as an Arrow kernel; the verify join stays broadcast
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_temporal_joins_no_nested_loop(spark, sf_dir):
    for q in ("asof_attribution", "interval_join_errors"):
        plan = _plan(spark, sf_dir, q)
        assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_waiting_suppliers_semi_anti_hash_joins(spark, sf_dir):
    plan = _plan(spark, sf_dir, "waiting_suppliers")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_top_supplier_broadcasts_scalar_and_dim(spark, sf_dir):
    # Q15 shape: the MAX(rev) single row and the supplier dim both broadcast;
    # the fact side must never sort-merge
    plan = _plan(spark, sf_dir, "top_supplier")
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_important_parts_scalar_join_is_broadcast_side(spark, sf_dir):
    # Q11 shape: the global-total comparison joins a SINGLE-ROW broadcast —
    # a BroadcastNestedLoopJoin against one row is the canonical decorrelated
    # scalar subquery and costs O(N); a SortMergeJoin here would shuffle the
    # whole per-part aggregate for nothing
    plan = _plan(spark, sf_dir, "important_parts")
    assert "SortMergeJoin" not in plan
    assert "BroadcastExchange" in plan


def test_bigram_lm_score_hash_joins_only(spark, sf_dir):
    # model lookups are hash equi-joins on pair/prev; any nested-loop shape
    # would be O(corpus x vocabulary)
    plan = _plan(spark, sf_dir, "bigram_lm_score")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_source_caps_single_shuffle(spark, sf_dir):
    # one hash shuffle on source + per-group window; no join, no extra pass
    plan = _plan(spark, sf_dir, "source_caps")
    assert plan.count("Exchange hashpartitioning") == 1 and "Join" not in plan


def test_nation_trade_flows_broadcasts_all_dims(spark, sf_dir):
    # Q7 shape: supplier/customer/both nation aliases broadcast; the only
    # shuffle-joined pair is lineitem x orders on orderkey
    plan = _plan(spark, sf_dir, "nation_trade_flows")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_large_orders_aggregates_before_join(spark, sf_dir):
    # Q18 shape: the HAVING aggregate must reduce lineitem before any join
    # (HashAggregate below the join), and the customer dim broadcasts
    plan = _plan(spark, sf_dir, "large_orders")
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_disjunctive_revenue_equi_join_extracted(spark, sf_dir):
    # Q19 shape: the common l_partkey = p_partkey conjunct becomes the hash
    # key; the OR-of-ANDs must never degrade the join to a nested loop
    plan = _plan(spark, sf_dir, "disjunctive_revenue")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_gopher_rules_no_shuffle(spark, sf_dir):
    # pure per-document projection: no exchange anywhere, pruned scan
    plan = _plan(spark, sf_dir, "gopher_rules")
    assert "Exchange" not in plan
    assert "n_comment" not in plan  # only (doc_id, text) reach the reader


def test_ann_pq_single_scan_no_pair_join(spark, sf_dir):
    # fused encode+ADC+re-rank: one Arrow kernel over the corpus, top-k via
    # one window — never a pairwise join relation
    plan = _plan(spark, sf_dir, "ann_pq")
    assert "MapInPandas" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Join" not in plan  # no join operator at all


def test_temperature_mix_broadcast_quota(spark, sf_dir):
    # the quota table (n_sources rows) must broadcast; the only hash
    # exchange partitions by source for the rank window
    plan = _plan(spark, sf_dir, "temperature_mix")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_substring_dedup_hash_join_partial_agg(spark, sf_dir):
    """dup_spans: the dup-window count must partial-aggregate map-side
    (skew-bounded for mega-frequent boilerplate windows), the seed join must
    be an equi-join on the hash pair (never a nested loop), and the scan
    must prune to (doc_id, text)."""
    plan = _plan(spark, sf_dir, "substring_dedup")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "partial_count" in plan or "partial" in plan.lower()
    assert "n_chars" not in plan  # column pruning reached the parquet scan


def test_at_rest_cdc_parsers_single_key_window(spark, sf_dir):
    """The four at-rest transport gates share one scale shape: binaryFile
    scan -> Arrow whole-file decode (MapInPandas) -> exactly one shuffle
    for the key-ordered replay. No nested loop, no Cartesian, no extra
    exchanges before the window."""
    for name in ("binlog_file_parse", "pgoutput_file_parse", "kafka_segment_parse"):
        plan = _plan(spark, sf_dir, name)
        assert "MapInPandas" in plan, name
        assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, name
        # one replay window -> one hashpartitioning exchange on the key
        assert plan.count("Exchange hashpartitioning") == 1, name
    plan = _plan(spark, sf_dir, "oplog_file_parse")
    # r16: the per-_id fold is a group-carry MapInPandas over key-sorted
    # partitions (one hash exchange + one sort) — per-group
    # FlatMapGroupsInPandas paid one Arrow call per DOCUMENT
    assert plan.count("MapInPandas") == 2  # whole-file parse + carry fold
    assert "Sort " in plan or "Sort\n" in plan or "+- Sort" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_media_decode_kernels_no_shuffle(spark, sf_dir):
    """r12 media gates: generate + decode are chained Arrow map passes —
    any Exchange before the decode kernel would mean the planner inserted
    a pointless shuffle between two narrow transforms."""
    for name in ("jpeg_progressive_decode", "gif_decode", "gif_frames"):
        plan = _plan(spark, sf_dir, name)
        assert "MapInPandas" in plan, name
        assert "Exchange hashpartitioning" not in plan, name


def test_media_pipeline_one_agg_shuffle(spark, sf_dir):
    """The composed mixed-format pipeline shuffles exactly once: the tiny
    per-format rollup after the single decode pass."""
    plan = _plan(spark, sf_dir, "media_pipeline")
    assert "MapInPandas" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """Bucketing is the co-location lever for repeated big-big joins at
    100 TB: two tables bucketed+sorted by the join key must join with ZERO
    Exchange in the physical plan (and no broadcast — this is the big-big
    path). The unbucketed twin of the same join MUST shuffle, proving the
    bucket metadata (not table size) is what eliminated the exchanges."""
    db = f"bucketdemo_{abs(hash(str(tmp_path))) % 10**8}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    try:
        orders = spark.range(0, 10000).selectExpr(
            "id AS o_orderkey", "id % 997 AS o_custkey", "id * 7 % 1000 AS amount"
        )
        lines = spark.range(0, 30000).selectExpr(
            "id % 10000 AS l_orderkey", "id % 50 AS qty"
        )
        for name, df, key in (("bo", orders, "o_orderkey"), ("bl", lines, "l_orderkey")):
            (df.write.bucketBy(8, key).sortBy(key).format("parquet")
               .mode("overwrite").saveAsTable(f"{db}.{name}"))
        bo, bl = spark.table(f"{db}.bo"), spark.table(f"{db}.bl")
        joined = bo.hint("merge").join(bl, bo["o_orderkey"] == bl["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        assert joined.count() == 30000

        # unbucketed twin: same data, same hint -> must exchange both sides
        orders.createOrReplaceTempView("ubo")
        lines.createOrReplaceTempView("ubl")
        un = spark.sql(
            "SELECT /*+ MERGE(ubl) */ * FROM ubo JOIN ubl"
            " ON ubo.o_orderkey = ubl.l_orderkey"
        )
        un_plan = un._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in un_plan
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_zorder_key_pure_codegen_single_agg_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "zorder_key")
    # the Morton key is a JVM shift/mask expression (no Python eval), over a
    # two-column pruned scan, with exactly the one aggregation exchange
    assert "Python" not in plan
    assert "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint>" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_phash_band_join_is_equi_hash(spark, sf_dir):
    # the 4x16-bit band explode + self-join must hash-partition on the band
    # key — an OR-of-bands predicate would degrade to a nested-loop product
    plan = _plan(spark, sf_dir, "image_dup_pairs")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_orc_sequenced_broadcast_ordinal_single_maxby_shuffle(spark, sf_dir):
    # the manifest-ordinal map must broadcast (it is push-count sized) and
    # final-state resolution is ONE max_by shuffle on the key
    plan = _plan(spark, sf_dir, "orc_sequenced")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_restore_sinker_single_shuffle_arrow_stage(spark, sf_dir):
    # RESTORE-mode serialization: exactly one shuffle (the key groupBy with
    # a map-side partial collect_list) feeding one Arrow MapInPandas stage;
    # command rendering is pure JVM expressions above it
    plan = _plan(spark, sf_dir, "redis_restore_statements")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("MapInPandas") == 1
    assert "partial_collect_list" in plan


def test_incremental_band_joins_are_equi_hash(spark, sf_dir):
    # the incremental probes (new bands vs index UNION batch) must stay
    # equi-hash on the band key — never a nested-loop / cartesian product
    for gate in ("phash_incremental", "video_incremental"):
        plan = _plan(spark, sf_dir, gate)
        assert "BroadcastNestedLoopJoin" not in plan, gate
        assert "CartesianProduct" not in plan, gate
        assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, gate


def test_video_dup_pairs_equi_hash_no_all_pairs(spark, sf_dir):
    plan = _plan(spark, sf_dir, "video_dup_pairs")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
