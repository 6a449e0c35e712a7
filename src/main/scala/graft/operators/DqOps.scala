package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.Tables.t

/** Data-quality operators — the validation pass a training-data pipeline
  * runs before ingest promotes a batch: referential integrity, domain
  * rules, and per-column profiling. The reference delegates this to
  * hand-written SQL checks run as `sql` jobs; here each is a first-class
  * oracle-gated operator.
  *
  * At 100 TB: all three are single-pass shapes. FK checks are anti-join
  * COUNTS (the orphan rows never materialize), rules are conditional sums
  * inside one scan (no shuffle beyond the single aggregated row), and the
  * profile defaults to one HLL-sketch pass (exact distincts, which force
  * either an Expand or per-column passes, are the oracle-gated audit arm).
  */
object DqOps {

  /** Referential integrity: orphan counts for each child→parent edge of
    * the star schema. Each edge is a left-anti join aggregated to a
    * count; the fact side never re-sorts, and the counts union into a
    * 4-row report.
    */
  def qFkIntegrity(s: SparkSession, dir: String): DataFrame = {
    // one pass per edge: LEFT join against the unique-keyed parent key
    // column, then conditional count — total and orphan counts come out of
    // the same scan, and the orphan rows never materialize. No broadcast
    // hint: part/supplier/nation auto-broadcast under the threshold, and a
    // 100 TB customer key column correctly falls back to a keyed shuffle.
    def orphans(rel: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame =
      child.select(col(childKey))
        .join(parent.select(col(parentKey)),
          col(childKey) === col(parentKey), "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col(parentKey).isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(rel).as("relation"), col("n_child"), col("n_orphans"))
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
    orphans("lineitem->orders", li, "l_orderkey", ord, "o_orderkey")
      .unionByName(orphans("lineitem->part", li, "l_partkey",
        t(s, dir, "part"), "p_partkey"))
      .unionByName(orphans("lineitem->supplier", li, "l_suppkey",
        t(s, dir, "supplier"), "s_suppkey"))
      .unionByName(orphans("orders->customer", ord, "o_custkey",
        t(s, dir, "customer"), "c_custkey"))
      .orderBy("relation")
  }

  val qFkIntegrityOracle: String =
    """SELECT 'lineitem->orders' AS relation,
      |  (SELECT count(*) FROM lineitem) AS n_child,
      |  (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
      |    (SELECT o_orderkey FROM orders)) AS n_orphans
      |UNION ALL
      |SELECT 'lineitem->part',
      |  (SELECT count(*) FROM lineitem),
      |  (SELECT count(*) FROM lineitem WHERE l_partkey NOT IN
      |    (SELECT p_partkey FROM part))
      |UNION ALL
      |SELECT 'lineitem->supplier',
      |  (SELECT count(*) FROM lineitem),
      |  (SELECT count(*) FROM lineitem WHERE l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier))
      |UNION ALL
      |SELECT 'orders->customer',
      |  (SELECT count(*) FROM orders),
      |  (SELECT count(*) FROM orders WHERE o_custkey NOT IN
      |    (SELECT c_custkey FROM customer))
      |ORDER BY relation""".stripMargin

  /** Domain-rule violations over lineitem (+ the cross-table
    * ship-before-order rule): ONE scan with conditional sums — at scale
    * a single map-side pass shuffling one row.
    */
  def qDqRules(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
    val ord = t(s, dir, "orders").select("o_orderkey", "o_orderdate")
    def viol(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    li.join(ord, col("l_orderkey") === col("o_orderkey"), "left")
      .agg(
        count(lit(1)).as("n_rows"),
        viol(col("l_quantity") <= 0).as("bad_quantity"),
        viol(col("l_extendedprice") <= 0).as("bad_price"),
        viol(col("l_discount") < 0 || col("l_discount") > 1).as("bad_discount"),
        viol(col("l_tax") < 0 || col("l_tax") > 1).as("bad_tax"),
        viol(col("l_shipdate") < col("o_orderdate")).as("ship_before_order"),
        viol(col("o_orderdate").isNull).as("orphan_order"))
  }

  val qDqRulesOracle: String =
    """SELECT count(*) AS n_rows,
      |  CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_quantity,
      |  CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_price,
      |  CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
      |  CAST(sum(CASE WHEN l_tax < 0 OR l_tax > 1 THEN 1 ELSE 0 END) AS BIGINT) AS bad_tax,
      |  CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS ship_before_order,
      |  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orphan_order
      |FROM lineitem LEFT JOIN orders ON o_orderkey = l_orderkey""".stripMargin

  private val ProfileCols =
    Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")

  /** Per-column EXACT profile of orders (nulls, distincts, min/max as
    * strings), one row per column — the dataset-card building block for
    * relational tables. Strings for min/max keep the row shape uniform
    * across column types.
    *
    * Shape: one single-distinct aggregate pass PER COLUMN, union'd.
    * The earlier one-agg-with-four-count_distincts form planned as an
    * Expand — Catalyst replicates every input row once per distinct
    * aggregate, a 4× shuffle amplification of the full scan keyed on
    * every distinct value. Per-column passes each prune the scan to that
    * single column (a few percent of the row width on a real warehouse
    * table) and plan as an ordinary two-phase distinct aggregate, so the
    * total I/O is the profiled columns once — less than the Expand plan's
    * one full-width scan, and with no amplified shuffle. For sketch-based
    * one-pass profiling at 100 TB see [[qDqProfileApprox]].
    */
  def qDqProfile(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val perCol = ProfileCols.map { c =>
      val isDouble =
        ord.schema(c).dataType == org.apache.spark.sql.types.DoubleType
      // doubles route through DECIMAL(18,2) before the string cast:
      // double→string rendering (shortest-round-trip vs scientific
      // cutoffs) is engine-specific, decimal rendering is not
      def str(e: org.apache.spark.sql.Column) =
        if (isDouble) e.cast("decimal(18,2)").cast("string")
        else e.cast("string")
      ord.select(col(c)).agg(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        count_distinct(col(c)).as("n_distinct"),
        str(min(col(c))).as("min_value"),
        str(max(col(c))).as("max_value"))
        .select(lit(c).as("column_name"), col("n_nulls"),
          col("n_distinct"), col("min_value"), col("max_value"))
    }
    perCol.reduce(_.unionAll(_)).orderBy("column_name")
  }

  /** The 100 TB arm of the profile: ONE full pass, `approx_count_distinct`
    * (HyperLogLog++) per column — HLL aggregates are ordinary (non-distinct)
    * aggregates, so four of them in one agg plan as a single scan with
    * partial map-side aggregation and NO Expand, and the shuffle carries
    * four fixed-size sketches instead of every distinct value. This is the
    * default a dataset-card pipeline should run at scale; [[qDqProfile]]
    * is the exact, oracle-gated twin. `DqOpsSpec` asserts this frame plans
    * a single scan with no Expand; [[qDqProfileApprox]] wraps it with a
    * self-gating tolerance check so the registered query is fully
    * hash-gated despite HLL estimates not being bit-comparable across
    * engines.
    */
  private[graft] def qDqProfileApproxRaw(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val aggs = ProfileCols.flatMap { c =>
      val isDouble =
        ord.schema(c).dataType == org.apache.spark.sql.types.DoubleType
      def str(e: org.apache.spark.sql.Column) =
        if (isDouble) e.cast("decimal(18,2)").cast("string")
        else e.cast("string")
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        approx_count_distinct(col(c), 0.02).as(s"${c}_distinct"),
        str(min(col(c))).as(s"${c}_min"),
        str(max(col(c))).as(s"${c}_max"))
    }
    val one = ord.agg(aggs.head, aggs.tail: _*)
    val stackExpr = ProfileCols.map { c =>
      s"'$c', ${c}_nulls, ${c}_distinct, ${c}_min, ${c}_max"
    }.mkString(s"stack(${ProfileCols.size}, ", ", ", ")")
    one.select(expr(
        s"$stackExpr AS (column_name, n_nulls, n_distinct, min_value, max_value)"))
      .orderBy("column_name")
  }

  /** The REGISTERED approx profile (round 15): [[qDqProfileApproxRaw]]'s
    * one-pass HLL frame joined against the exact twin on column_name,
    * emitting the exact distinct count plus a boolean verdict that the
    * HLL estimate landed within ±5% of it. This makes the query fully
    * hash-gated by a deterministic DuckDB oracle (exact counts + literal
    * TRUE) — the artifact is self-describing, with no oracle-less row a
    * reviewer must adjudicate from prose: an HLL drift beyond tolerance
    * turns the row red instead of being invisible. The extra exact pass
    * is the CORRECTNESS harness's cost, not the operator's — the 100 TB
    * production entry point is the raw one-pass arm, whose plan shape
    * (single scan, no Expand) `DqOpsSpec` still audits directly and whose
    * deterministic facets [[qDqProfileApproxDet]] hash-gates alone.
    */
  def qDqProfileApprox(s: SparkSession, dir: String): DataFrame = {
    val approx = qDqProfileApproxRaw(s, dir)
    val exact = qDqProfile(s, dir)
      .select(col("column_name"), col("n_distinct").as("n_distinct_exact"))
    approx.join(exact, Seq("column_name"))
      .select(col("column_name"), col("n_nulls"), col("n_distinct_exact"),
        col("min_value"), col("max_value"),
        (abs(col("n_distinct").cast("double") / col("n_distinct_exact") - 1.0)
          <= 0.05).as("approx_within_5pct"))
      .orderBy("column_name")
  }

  val qDqProfileApproxOracle: String =
    """SELECT 'o_custkey' AS column_name,
      |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct_exact,
      |  CAST(min(o_custkey) AS VARCHAR) AS min_value,
      |  CAST(max(o_custkey) AS VARCHAR) AS max_value,
      |  TRUE AS approx_within_5pct FROM orders
      |UNION ALL
      |SELECT 'o_orderstatus',
      |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(count(DISTINCT o_orderstatus) AS BIGINT),
      |  min(o_orderstatus), max(o_orderstatus), TRUE FROM orders
      |UNION ALL
      |SELECT 'o_totalprice',
      |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(count(DISTINCT o_totalprice) AS BIGINT),
      |  CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
      |  CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR), TRUE FROM orders
      |UNION ALL
      |SELECT 'o_orderpriority',
      |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(count(DISTINCT o_orderpriority) AS BIGINT),
      |  min(o_orderpriority), max(o_orderpriority), TRUE FROM orders
      |ORDER BY column_name""".stripMargin

  val qDqProfileOracle: String =
    """SELECT 'o_custkey' AS column_name,
      |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
      |  CAST(min(o_custkey) AS VARCHAR) AS min_value,
      |  CAST(max(o_custkey) AS VARCHAR) AS max_value FROM orders
      |UNION ALL
      |SELECT 'o_orderstatus',
      |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(count(DISTINCT o_orderstatus) AS BIGINT),
      |  min(o_orderstatus), max(o_orderstatus) FROM orders
      |UNION ALL
      |SELECT 'o_totalprice',
      |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(count(DISTINCT o_totalprice) AS BIGINT),
      |  CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
      |  CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) FROM orders
      |UNION ALL
      |SELECT 'o_orderpriority',
      |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(count(DISTINCT o_orderpriority) AS BIGINT),
      |  min(o_orderpriority), max(o_orderpriority) FROM orders
      |ORDER BY column_name""".stripMargin

  /** The deterministic facets of [[qDqProfileApproxRaw]] under the full
    * hash gate: nulls/min/max are exact even in the HLL arm (only
    * n_distinct is approximate), so this projection of the SAME one-pass
    * plan is oracle-checkable. Together with the self-gating
    * [[qDqProfileApprox]] wrapper, every facet of the approx arm is now
    * oracle-gated: the deterministic columns by value here, the HLL
    * column by ±5% verdict there.
    */
  def qDqProfileApproxDet(s: SparkSession, dir: String): DataFrame =
    qDqProfileApproxRaw(s, dir).drop("n_distinct")

  val qDqProfileApproxDetOracle: String =
    """SELECT 'o_custkey' AS column_name,
      |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
      |  CAST(min(o_custkey) AS VARCHAR) AS min_value,
      |  CAST(max(o_custkey) AS VARCHAR) AS max_value FROM orders
      |UNION ALL
      |SELECT 'o_orderstatus',
      |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  min(o_orderstatus), max(o_orderstatus) FROM orders
      |UNION ALL
      |SELECT 'o_totalprice',
      |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
      |  CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) FROM orders
      |UNION ALL
      |SELECT 'o_orderpriority',
      |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  min(o_orderpriority), max(o_orderpriority) FROM orders
      |ORDER BY column_name""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_fk_integrity", qFkIntegrity, Some(qFkIntegrityOracle)),
    QueryDef("q_dq_rules", qDqRules, Some(qDqRulesOracle)),
    QueryDef("q_dq_profile", qDqProfile, Some(qDqProfileOracle)),
    QueryDef("q_dq_profile_approx", qDqProfileApprox,
      Some(qDqProfileApproxOracle)),
    QueryDef("q_dq_profile_approx_det", qDqProfileApproxDet,
      Some(qDqProfileApproxDetOracle)),
  )
}
