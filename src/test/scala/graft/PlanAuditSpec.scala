package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gate over the whole query surface: the properties
  * that make the 100 TB story true must hold for every SparkEntry query,
  * not just the ones PLANS.md happens to show.
  *
  *  - no CartesianProduct anywhere (an all-pairs join would be a scale
  *    killer appearing as a "correct" plan at test SF);
  *  - BroadcastNestedLoopJoin only where a broadcast cross join is the
  *    point (q_cosine_topk broadcasts 3 query vectors against the corpus);
  *  - every parquet scan prunes its schema: no scan reads all columns of
  *    the wide tables unless the query genuinely needs them.
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  // queries whose physical plan intentionally contains a broadcast cross:
  // q_cosine_topk broadcasts 3 query vectors; q_above_avg and
  // q_mixture_weights broadcast a single-row aggregate (the
  // scalar-subquery-without-collect idiom)
  // (the IVF family — q_ivf_assign/q_ivf_search/q_kmeans_step — needs no
  // entry here: centroids are driver-held literals, so assignment is a
  // narrow projection with no join at all)
  // q_vocab_coverage broadcasts its single-row corpus total the same way,
  // as does q_zorder_layout's min/max bounds row and q_temperature_mix's
  // two scalar totals (corpus tokens, p^alpha normalizer);
  // q_knn_classify broadcasts the probe batch (the query workload —
  // model-sized by definition, like q_cosine_topk's query vectors) and
  // q_bm25_topk its term-count-row idf/avgdl table
  // q_unigram_ce broadcasts its single-row corpus-total aggregate (the
  // replacement for what was an unpartitioned window over the vocab)
  private val crossJoinByDesign =
    Set("q_cosine_topk", "q_ann_recall", "q_above_avg", "q_mixture_weights",
      "q_vocab_coverage", "q_zorder_layout", "q_temperature_mix",
      "q_minhash_recall", "q_pmi", "q_knn_classify", "q_bm25_topk",
      "q_unigram_ce",
      // q_trunc_recall broadcasts its 3-probe query set on both arms,
      // exactly like q_cosine_topk / q_ann_recall, and q_ndcg_eval's
      // exact arm is the same 3-row broadcast cross
      "q_trunc_recall", "q_ndcg_eval",
      // q_multiprobe_recall broadcasts the 3-query probe set (9 rows per
      // query) on both arms — the same shape as q_ann_recall
      "q_multiprobe_recall",
      // q_join_cardinality crosses its two single-row aggregates (exact
      // count x sketch estimate) — the scalar idiom again;
      // q_hll_intersection's non-equi pair join runs over the ≤|sources|
      // sketch aggregate (bounded by construction, like the centroids)
      "q_join_cardinality", "q_hll_intersection",
      // q_jl_projection broadcasts the 3-probe query set on the original-
      // distance arm — the q_cosine_topk shape verbatim
      "q_jl_projection",
      // q_leakage_split broadcasts its single-row leaky-cluster scalar
      // (the scalar-subquery-without-collect idiom)
      "q_leakage_split",
      // q_bigram_ce broadcasts its single-row (N, V) model-size scalar —
      // the q_unigram_ce corpus-total idiom; q_er_blocking_audit crosses
      // its three 1-row metric aggregates (record count, truth count,
      // candidate stats) plus the 1-row data-derived rec-id offset, which
      // q_er_clusters now shares
      "q_bigram_ce", "q_er_blocking_audit", "q_er_clusters")

  // queries that run their own writes/side effects before returning a
  // frame; they execute real IO so the audit just compiles their plan
  private val sideEffecting = Set("q_csv_roundtrip", "q_load_maxerror")

  test("no CartesianProduct in any query plan; cross joins only by design") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, build) =>
      val plan = build(spark, dir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !crossJoinByDesign(name))
        offenders += s"$name: BroadcastNestedLoopJoin"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  // Windows with an EMPTY partition spec funnel every row through one
  // task — fine only over provably bounded input. Allowlisted cases:
  //  - q_dpp_join: builds its 3-row day dim with a global Window over
  //    distinct days (bounded by the calendar);
  //  - q_importance_weights: corpus totals over the ≤128-row DSIR
  //    feature-bucket frame;
  //  - q_power_iteration: vector norm over the 64-row per-dimension
  //    aggregate (bounded by embedding dimensionality);
  //  - q_shard_manifest: token share over the 16-row shard aggregate
  //    (one hex digit of md5 = 16 shards by construction);
  //  - q_vocab_coverage: rank over the TakeOrdered top-1000 slice
  //    (bounded by the preceding LIMIT, never the vocab).
  private val globalWindowByDesign =
    Set("q_dpp_join", "q_importance_weights", "q_power_iteration",
      "q_shard_manifest", "q_vocab_coverage")

  test("no Window with an empty partition spec over data-scale input") {
    // matches the physical Window operator header and captures the
    // partition spec between "windowspecdefinition(" and the first
    // ORDER-BY-ish token; an empty partition spec renders as
    // windowspecdefinition(<order exprs...>) with no partition columns —
    // detected via the Window node's "[partitionSpec: []" rendering...
    // Spark 4 prints `Window [...], [part], [order]`; a missing middle
    // list shows as `Window [...], [order]` — so instead audit the
    // ANALYZED plan, where partitionSpec is structured.
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) =>
        globalWindowByDesign(name) || sideEffecting(name) }
      .foreach { case (name, build) =>
        val analyzed = build(spark, dir).queryExecution.analyzed
        analyzed.foreach {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty =>
            offenders += s"$name: unpartitioned Window"
          case _ =>
        }
      }
    assert(offenders.isEmpty, offenders.distinct.mkString("\n"))
  }

  test("q_reservoir_sample plans through the bounded aggregator, not a Window") {
    val plan = SparkEntry.queries("q_reservoir_sample")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "q_reservoir_sample must use MinKAggregator, not a window sort")
    assert(plan.contains("ObjectHashAggregate"),
      "expected the typed-aggregator plan shape")
  }

  test("q_partition_prune reads exactly one of the day partitions at scan") {
    // the whole point of the directory layout: the read-back scan must
    // carry the day predicate as a PARTITION filter (pruned at listing,
    // before any IO), not as a post-scan data filter over all 30 days.
    val df = SparkEntry.queries("q_partition_prune")(spark, dir)
    // sparkPlan, not executedPlan: AQE wraps the latter in an
    // AdaptiveSparkPlanExec whose collect() does not recurse into the
    // not-yet-executed inner plan
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("graft_day_part")) => s
    }
    assert(scans.nonEmpty, "no scan over the day-partitioned layout found")
    scans.foreach { s =>
      assert(s.partitionFilters.exists(_.references.exists(_.name == "day")),
        s"day predicate not pushed as a partition filter: ${s.metadata}")
      val selected = s.relation.location.listFiles(s.partitionFilters, s.dataFilters)
      assert(selected.length == 1,
        s"expected 1 pruned day partition, scan selects ${selected.length}")
    }
  }

  test("q7_nation_volume pushes the nation-pair implication below the joins") {
    // the disjunctive pair predicate can't be pushed by Catalyst, but the
    // hand-derived IN-pair implication must reach BOTH nation scans as a
    // pushed filter, so supplier and customer shrink before any fact join
    val plan = SparkEntry.queries("q7_nation_volume")(spark, dir)
      .queryExecution.executedPlan.toString
    val pushed = "In\\(n_name".r.findAllIn(plan).size
    assert(pushed >= 2,
      s"expected the nation pair pushed into both nation scans:\n$plan")
  }

  test("lineitem scans prune columns (never read the full 16-column schema)") {
    val wide = Seq("q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue")
    val ScanCols = """FileScan parquet \[([^\]]*)\]""".r
    wide.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      val lineitemScans = ScanCols.findAllMatchIn(plan).map(_.group(1))
        .filter(_.contains("l_")).toSeq
      assert(lineitemScans.nonEmpty, s"$name: no lineitem scan found")
      lineitemScans.foreach { cols =>
        val nCols = cols.split(",").length
        assert(nCols < 10, s"$name reads too many lineitem columns: $cols")
      }
    }
  }
}
