package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug._

/** Dumps the formatted physical plan of each headline query to PLANS.md —
  * the scale audit: check PushedFilters / ReadSchema on every scan,
  * broadcast joins on dim tables, and WholeStageCodegen coverage.
  *
  * Usage: runMain graft.Explain [sfDir] [outFile]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outFile = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val headline = Seq("q1_pricing_summary", "q3_shipping_priority",
      "q5_region_revenue", "q_window_topn", "q_dedup_exact", "q_minhash_lsh",
      "q_cosine_topk", "q_events_hourly", "q_semi_join", "q_asof_join",
      "q_sessionize", "q_dedup_digest", "q_embedding_near_dup",
      "q_ann_near_dup", "q_lsh_buckets", "q_load_maxerror",
      "q_contamination", "q_pack_sequences", "q_mm_byte_histogram",
      "q_stress_hot_near_dup", "q_stress_contam_skew", "q_pipeline_e2e",
      "q_mixture_weights", "q_range_join", "q_ivf_assign", "q_ivf_search",
      "q_dedup_clusters", "q_cms_heavy_hitters", "q_label_centroids",
      "q_bucketed_join", "q_partition_prune", "q_vocab_coverage", "q_tfidf",
      "q_semdedup", "q_importance_weights", "q_unigram_ce", "q_containment",
      "q_retention", "q_zorder_layout", "q_power_iteration", "q_funnel",
      "q_feature_norm", "q_stress_chain_clusters", "q_ann_recall",
      "q_pq_encode", "q_pq_search", "q_line_dedup", "q_merge_upsert",
      "q_cdc_latest", "q_bloom_dedup", "q_stress_salted_join", "q_pivot",
      "q_temperature_mix", "q_span_dedup", "q_scd2_intervals",
      "q_bpe_merge_step", "q_minhash_recall", "q_profile_stats",
      "q_reservoir_sample", "q_ivfpq_search", "q_snapshot_diff",
      "q_dq_checks", "q_cluster_size_hist", "q_embedding_drift",
      "q_token_budget", "q_content_chunks", "q_rate_anomaly", "q_mm_entropy",
      "q_delta_agg", "q_delete_propagation", "q_schema_evolution",
      "q_dup_triangles", "q_pmi", "q_session_window", "q_simhash_near_dup",
      "q_fuzzy_match", "q_moving_avg", "q_asof_native", "q_dpp_join",
      "q_source_overlap", "q_gram_novelty", "q_length_percentiles",
      "q_bm25_topk", "q_domain_cap", "q_dedup_keep_best",
      "q_stress_hot_band", "q_trunc_recall", "q_modality_agreement",
      "q_pii_scan", "q_dataset_card",
      "q_knn_classify", "q_cosine_curve", "q_shard_manifest",
      "q_jaccard_curve", "q_filter_attribution", "q_grouped_topk",
      "q_allpairs_jaccard", "q_sketch_merge",
      "q_ndcg_eval", "q_weighted_sample", "q_boilerplate_strip",
      "q_er_clusters", "q_pagerank", "q_label_prop", "q_join_cardinality", "q_url_canon",
      "q_mm_phash", "q_hll_intersection", "q_stream_reservoir", "q_seasonal_baseline",
      "q_aqp_sum", "q_pareto_docs", "q_stress_hot_phash", "q_path_transitions",
      "q_multiprobe_recall", "q_time_travel",
      "q_grid_join", "q_consistent_shards", "q_skew_planner",
      "q_jl_projection", "q_incremental_lsh", "q_dedup_ensemble",
      "q_stress_twophase_agg", "q_sliding_window", "q_orc_roundtrip",
      "q_grid_knn", "q_grid_occupancy", "q_recursive_cte",
      "q_exists_subquery", "q_lateral_join", "q_bigram_ce",
      "q_er_blocking_audit", "q_zipf_slope")

    // plan-reading notes where the toy-SF plan alone would mislead a
    // 100 TB audit — emitted under the query's plan block
    val notes = Map(
      "q_grid_join" -> ("The 9x neighbor-cell explode rides on the LEFT " +
        "side only; the join is a plain (kx, ky) key-equality shuffle. " +
        "A broadcast visible at toy SF is the optimizer's size choice — " +
        "at corpus scale both sides shuffle and per-cell candidate work " +
        "is bounded by point density, with the hot-bucket subdivision " +
        "discipline available for dense cells."),
      "q_jl_projection" -> ("The projection is explode(16) + one hash " +
        "aggregate per (vec, j) — a narrow 4x-smaller replacement table; " +
        "the distortion AUDIT broadcasts 3 probe rows on both arms " +
        "(BNLJ by design, q_cosine_topk's shape). Projection cost is " +
        "linear in the corpus; audit cost rides on the probe budget."),
      "q_incremental_lsh" -> ("The band self-join is batch-vs-index: the " +
        "delta filter sits on the RIGHT side before the join, so " +
        "per-ingest cost is proportional to batch size at fixed bucket " +
        "density — never index-vs-index."),
      "q_skew_planner" -> ("Two hash aggregates; the second runs over " +
        "the per-key count frame (|keys| rows), so the forecast costs " +
        "one pass over the fact table and shuffles only key counts."),
      "q_containment" -> ("All joins are UNHINTED: the `BroadcastHashJoin`s " +
        "visible at this toy SF are the optimizer's size-based choice (no " +
        "`broadcast()` hint in the code) and degrade to shuffle joins when " +
        "the eval/gram sides outgrow the threshold. Hot grams (df > 5% of " +
        "corpus docs) are dropped from both join sides before pairing."),
      "q_unigram_ce" -> ("The vocab join is UNHINTED — broadcast here is " +
        "the optimizer's size-based choice, not a mandatory hint; a " +
        "corpus-scale vocab falls back to a key-equality shuffle join."),
      "q_merge_upsert" -> ("MERGE is ONE full-outer key join (SMJ — full " +
        "outer cannot broadcast) CASE-resolved per row; the change-set " +
        "derivation scans are test-fixture synthesis, not part of the " +
        "operator (production changes arrive as a feed)."),
      "q_cdc_latest" -> ("max(struct) compacts versions map-side before " +
        "the exchange (partial aggregate in the plan) — the row_number " +
        "formulation would sort every version of every key instead."),
      "q_bloom_dedup" -> ("The mask table is a 64-row aggregate joined by " +
        "size-chosen broadcast; the exact anti-join leg receives only " +
        "bloom-positive rows, the Union's other leg skips the join " +
        "entirely."),
      "q_stress_salted_join" -> ("The merge hint pins SMJ so the salted " +
        "(k, salt) exchange is visible at toy SF — otherwise the " +
        "replicated dim auto-broadcasts, which at scale is the other " +
        "valid skew defense."),
      "q_temperature_mix" -> ("The only BroadcastNestedLoopJoins are the " +
        "two 1-row scalar totals (corpus tokens, p^alpha normalizer) — " +
        "the scalar-subquery-without-collect idiom; the corpus is " +
        "scanned once."),
      "q_minhash_recall" -> ("Truth candidates use PPJoin prefix " +
        "filtering over a fixed ~50-doc probe budget; the 1-row metric " +
        "joins are BNLJ by design. Audit cost does not grow with the " +
        "corpus."),
      "q_simhash_near_dup" -> ("The only data-sized stage is the " +
        "signature scan (simhash48 is one codegen'd byte scan; 8 bytes " +
        "per doc shuffle, never text). Candidates are a key-equality " +
        "self-join on the 16-bit signature chunks, and verify is a " +
        "popcount on the signatures already in the join output — no " +
        "join back to token sets, unlike the MinHash path."),
      "q_fuzzy_match" -> ("Record-linkage shape: the block join is " +
        "key-equality on (w1, w2) — pair surface is per-block " +
        "quadratic, never corpus-quadratic — and the codegen'd " +
        "levenshtein sees only the 40-char key, so no full text crosses " +
        "the exchange."),
      "q_moving_avg" -> ("RANGE frame: one hash-exchange on event_type " +
        "+ one in-partition sort serves both window aggregates; the " +
        "value-bounded frame makes tied timestamps deterministic " +
        "without a unique tiebreaker."),
      "q_asof_native" -> ("AsOfJoinExec is the custom physical operator " +
        "(LogicalPlan + Strategy + SparkPlan via extraStrategies / " +
        "GraftExtensions); EnsureRequirements inserted the per-side " +
        "exchanges and sorts from its declared distribution/ordering, " +
        "exactly as for sort-merge join. Each side shuffles only " +
        "itself (right side: 3 columns), vs the union+window plan " +
        "shuffling both sides padded to the left schema — the byte win " +
        "appears when the left is wide; at this toy SF the extra " +
        "stage makes it slower than q_asof_join, which is why the " +
        "composition stays the default."),
      "q_dpp_join" -> ("The fact scan's PartitionFilters carry a " +
        "`dynamicpruning` subquery fed by the dim join's broadcast — " +
        "partitions outside the dim's filtered day set are never " +
        "listed. The broadcast hint is justified-small: one row per " +
        "day, time-bounded at any corpus size."),
      "q_source_overlap" -> ("Lines cross the exchange as md5 digests; " +
        "the distinct (source, digest) projection collapses per-source " +
        "repeats BEFORE the self-join, bounding the per-digest join " +
        "surface at source-count (a few dozen), not occurrence count."),
      "q_bm25_topk" -> ("The `w IN (terms)` filter sits directly on the " +
        "exploded word generator, so only query-term postings reach the " +
        "tf shuffle — the inverted-index access path computed scan-side. " +
        "The idf/avgdl side is term-count rows; its broadcast is the " +
        "optimizer's size choice, not a hint. TakeOrderedAndProject " +
        "caps the result driver-side at k rows per partition."),
      "q_grouped_topk" -> ("ObjectHashAggregate is the bounded " +
        "TopKAggregator: a size-k buffer per (group, partition), " +
        "map-side partial merge, k rows per group crossing the " +
        "exchange. Compare q_window_topn's plan — same result set, but " +
        "Window/Sort sorts every row of each customer partition."),
      "q_allpairs_jaccard" -> ("Exact set-similarity self-join: the " +
        "candidate join reads PREFIX rows only (each doc's rarest " +
        "⌊0.1·n⌋+1 grams under the global df-ascending order), keyed on " +
        "the gram's 64-bit hash (longs exchange cheaper than strings; a " +
        "collision only adds candidates the exact verify rejects). The " +
        "window pair (row_number + count over doc_id) shares ONE " +
        "exchange+sort; length and positional filters prune inside the " +
        "join stage before the distinct. The verify joins are doc-keyed " +
        "equi-joins into the persisted gram table; jaccard4 is the " +
        "fused two-pointer codegen expression. All three pruning rules " +
        "are exactness-preserving — the oracle is the unpruned " +
        "brute-force join."),
      "q_sketch_merge" -> ("Three corpus passes (8-shard sketches, " +
        "2-shard sketches, exact distinct) that a production pipeline " +
        "would fuse into one; the point of the query is the equality " +
        "assertion: hll_union_agg yields the identical estimate under " +
        "both shard layouts, proving the partial states a " +
        "1000-executor fleet ships are partition-invariant. Every " +
        "aggregate here is map-side combinable; sketches cross the " +
        "exchange at ~2.5 KB each (lgK 12)."),
      "q_knn_classify" -> ("The broadcast() hint on the probe batch is " +
        "justified-small: probes are the query workload (model-sized by " +
        "definition), never corpus-scaled. The ObjectHashAggregate is " +
        "the bounded TopKAggregator — 5 pairs per (probe, partition) " +
        "cross the shuffle, not the scored set; the final vote window " +
        "runs over probe-count rows."),
      "q_pagerank" -> ("Iterative plan: localCheckpoint truncates " +
        "lineage each round, so the printed plan shows only the FINAL " +
        "round's contribution join + aggregate reading the previous " +
        "round's checkpoint blocks — per-round cost is exactly this " +
        "plan, one keyed shuffle over the kN-edge frame. The kNN edge " +
        "build (label-blocked scored join + bounded top-k) ran before " +
        "the loop and is cached."),
      "q_label_prop" -> ("Same iterative shape as q_pagerank: the plan " +
        "shows the last propagation round over checkpoint blocks. The " +
        "vote mode is a struct-max aggregate — no Window anywhere; the " +
        "ANN graph build is the q_ann_recall bucket-candidate " +
        "discipline."),
      "q_er_clusters" -> ("The blocking join is key-equality on " +
        "(nation, digit-string) — near-unique blocks, so the pairwise " +
        "levenshtein verify sees block-bounded candidates. The closure " +
        "loop is the pointer-jump CC kernel; its per-round plan is the " +
        "q_dedup_clusters shape over the match graph."),
      "q_join_cardinality" -> ("Both sketches are fixed depth×width " +
        "cell aggregates (map-side combined); the estimate join touches " +
        "sketch cells only. The single BroadcastNestedLoopJoin is the " +
        "1-row exact × 1-row estimate cross — the scalar idiom."),
      "q_mm_phash" -> ("Payload bytes never shuffle: the dHash is a " +
        "narrow codegen'd pass ending in an 8-byte signature; the band " +
        "self-join is key-equality on 14-bit slices, and the hamming " +
        "verify reads the signatures already in the join output — the " +
        "q_simhash_near_dup discipline on media bytes."))

    val sb = new StringBuilder
    sb ++= "# Physical plans (generated by `runMain graft.Explain`)\n\n"
    sb ++= s"Scale dir: `$sfDir`. Read the plans for: `PushedFilters`/\n"
    sb ++= "`ReadSchema` on scans (pushdown + pruning), `BroadcastHashJoin` on\n"
    sb ++= "dimension joins, `WholeStageCodegen` span coverage, and partial\n"
    sb ++= "(`HashAggregate` before exchange) aggregation.\n"
    headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb ++= s"\n## $name\n\n```\n"
      sb ++= df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb ++= "```\n"
      notes.get(name).foreach(n => sb ++= s"\n> $n\n")
      spark.catalog.clearCache() // per-query persisted tables (see Bench)
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    println(s"wrote $outFile")
    spark.stop()
  }
}
