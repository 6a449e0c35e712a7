package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.Tables.t

/** Incremental-maintenance operators — the three kernels that keep a
  * long-lived lake table correct as new data arrives, each expressed as
  * the single-join plan it must be at 100 TB:
  *
  *  - MERGE (upsert + delete): one full-outer key-equality join between
  *    target and change set, CASE-resolved per row. The reference's
  *    insert-delta job class (jobclass/insert-delta.rb) is the
  *    DELETE-then-INSERT half of this; MERGE is the general form every
  *    CDC consumer needs.
  *  - CDC latest-version compaction: collapse a change stream to the
  *    newest version per key with a partial-aggregatable max(struct) —
  *    one shuffle, no per-key sort, unlike the row_number() formulation
  *    whose window must sort every partition.
  *  - Bloom-prefiltered incremental dedup: the scale path for
  *    "new batch vs seen store" when the seen store is huge — a
  *    register-blocked bloom filter built IN SQL (bit_or of per-digest
  *    bit masks), broadcast to prefilter the batch, with an exact
  *    anti-join only over the may-match survivors. Output is exact for
  *    any hash function (no false negatives by construction), so the
  *    oracle is the plain anti-join.
  */
object LakeOps {

  /** MERGE kernel: a deterministic change set (updates, deletes, inserts
    * derived from disjoint `o_orderkey % 21` classes) merged into orders
    * via ONE full-outer join — the canonical MERGE plan. Kept/updated/
    * inserted rows resolve with CASE on the change op; matched deletes
    * drop. At 100 TB the join is the only corpus-owning stage (AQE sizes
    * it; the change side usually broadcasts), and a copy-on-write table
    * format rewrites only the files the join matched.
    */
  def qMergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val m = col("o_orderkey") % 21
    // price deltas are exact-in-binary (+100.0), so merge output is
    // reproducible across engines without per-row rounding
    val updates = o.filter(m === 0).select(
      col("o_orderkey").as("key"), lit("U").as("op"),
      (col("o_totalprice") + 100.0).as("new_price"),
      col("o_orderpriority").as("new_priority"))
    val deletes = o.filter(m === 1).select(
      col("o_orderkey").as("key"), lit("D").as("op"),
      lit(null).cast("double").as("new_price"),
      lit(null).cast("string").as("new_priority"))
    val inserts = o.filter(m === 2).select(
      (col("o_orderkey") + 100000000L).as("key"), lit("I").as("op"),
      col("o_totalprice").as("new_price"),
      col("o_orderpriority").as("new_priority"))
    val changes = updates.union(deletes).union(inserts)
    val merged = o.join(changes, o("o_orderkey") === changes("key"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(
        when(col("op").isin("U", "I"), col("new_price"))
          .otherwise(col("o_totalprice")).as("price"),
        coalesce(col("new_priority"), col("o_orderpriority")).as("o_orderpriority"))
    merged.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("price").cast("decimal(30,6)")).cast("double"), 2).as("total"))
      .orderBy("o_orderpriority")
  }

  val qMergeUpsertOracle: String =
    """WITH changes AS (
      |  SELECT o_orderkey AS key, 'U' AS op, o_totalprice + 100.0 AS new_price,
      |         o_orderpriority AS new_priority
      |  FROM orders WHERE o_orderkey % 21 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 'D', NULL, NULL FROM orders WHERE o_orderkey % 21 = 1
      |  UNION ALL
      |  SELECT o_orderkey + 100000000, 'I', o_totalprice, o_orderpriority
      |  FROM orders WHERE o_orderkey % 21 = 2),
      |merged AS (
      |  SELECT CASE WHEN c.op IN ('U', 'I') THEN c.new_price
      |              ELSE o.o_totalprice END AS price,
      |         coalesce(c.new_priority, o.o_orderpriority) AS o_orderpriority
      |  FROM orders o FULL OUTER JOIN changes c ON o.o_orderkey = c.key
      |  WHERE c.op IS NULL OR c.op <> 'D')
      |SELECT o_orderpriority, count(*) AS n_rows,
      |  round(CAST(sum(CAST(price AS DECIMAL(30,6))) AS DOUBLE), 2) AS total
      |FROM merged GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  /** Latest-version-per-key CDC compaction over the events change feed:
    * `max(struct(ts, event_id, …))` picks the newest version (event_id
    * breaks timestamp ties deterministically) in ONE partial-aggregatable
    * shuffle — map-side combine collapses each key to a single struct
    * before the exchange, so a key with a million versions ships one row
    * per input partition, where the equivalent `row_number() = 1` window
    * must shuffle and sort every version of every key.
    */
  def qCdcLatest(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_versions"),
        max(struct(col("ts"), col("event_id"),
          col("event_type"), col("value"))).as("last"))
      .select(col("user_id"), col("n_versions"),
        col("last.event_type").as("last_type"),
        round(col("last.value"), 4).as("last_value"))
      .orderBy("user_id")

  val qCdcLatestOracle: String =
    """WITH ranked AS (
      |  SELECT user_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts DESC, event_id DESC) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n_versions
      |  FROM events)
      |SELECT user_id, n_versions, event_type AS last_type,
      |  round(value, 4) AS last_value
      |FROM ranked WHERE rn = 1 ORDER BY user_id""".stripMargin

  // Register-blocked bloom geometry: 64 blocks x 64 bits, k=2 bit
  // positions per digest within its block. At 100 TB the block count
  // scales with the seen store (the mask table stays a bit_or-mergeable
  // aggregate; broadcasting it costs 8 bytes per block).
  private val BloomBlocks = 64

  private def block(c: Column): Column = pmod(xxhash64(c), lit(BloomBlocks))

  // both bit positions in one expression so build and probe sides are
  // textually identical (no false negatives by construction)
  private def bits(digestCol: String): Column = expr(
    s"shiftleft(CAST(1 AS BIGINT), CAST(pmod(xxhash64($digestCol, 1), 64) AS INT)) | " +
      s"shiftleft(CAST(1 AS BIGINT), CAST(pmod(xxhash64($digestCol, 2), 64) AS INT))")

  /** Incremental dedup with a bloom prefilter — the "new batch vs huge
    * seen store" scale path. The seen store folds to a [[BloomBlocks]]-row
    * mask table (`bit_or` of per-digest bit pairs — a register-blocked
    * bloom filter built entirely in codegen'd SQL, no driver-side bloom
    * object); the batch probes it through an auto-broadcast join and
    * splits: bloom-negative rows are PROVABLY new (same hashes on both
    * sides → no false negatives) and skip the join; only may-match rows
    * pay the exact digest anti-join against the store. False positives
    * cost extra join input, never wrong output, so the oracle is the
    * plain anti-join.
    */
  def qBloomDedup(s: SparkSession, dir: String): DataFrame = {
    val digests = t(s, dir, "documents")
      .select(col("doc_id"), md5(encode(col("text"), "UTF-8")).as("digest"))
    val seen = digests.filter(col("doc_id") % 2 === 0).select("digest")
    val batch = digests.filter(col("doc_id") % 2 =!= 0)
    val bloom = seen
      .groupBy(block(col("digest")).as("blk"))
      .agg(bit_or(bits("digest")).as("mask"))
    val probed = batch
      .withColumn("blk", block(col("digest")))
      .withColumn("b", bits("digest"))
      .join(bloom, Seq("blk"), "left")
      // an absent block (mask NULL) means no seen digest hashed there
      .withColumn("might",
        coalesce(col("mask").bitwiseAND(col("b")) === col("b"), lit(false)))
    val provablyNew = probed.filter(!col("might")).select("doc_id")
    val confirmedNew = probed.filter(col("might"))
      .join(seen, Seq("digest"), "left_anti").select("doc_id")
    provablyNew.union(confirmedNew).orderBy("doc_id")
  }

  val qBloomDedupOracle: String =
    """SELECT b.doc_id FROM documents b
      |WHERE b.doc_id % 2 <> 0 AND NOT EXISTS (
      |  SELECT 1 FROM documents s
      |  WHERE s.doc_id % 2 = 0 AND md5(s.text) = md5(b.text))
      |ORDER BY b.doc_id""".stripMargin

  /** SCD Type-2 validity intervals from the change feed: each version of
    * a key is valid from its own timestamp until the next version's
    * (`lead` over the per-key window); the newest version stays open
    * (`is_current`). One shuffle on the key, per-key sort inside the
    * window — the standard dimension-history build. Durations compare as
    * floor-of-epoch-seconds deltas so the arithmetic is integer-exact in
    * both engines.
    */
  def qScd2Intervals(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id"),
        coalesce(col("valid_to").cast("long") - col("ts").cast("long"),
          lit(-1L)).as("duration_sec"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "event_id")
  }

  val qScd2IntervalsOracle: String =
    """WITH iv AS (
      |  SELECT user_id, event_id, ts AS valid_from,
      |    lead(ts) OVER (PARTITION BY user_id
      |                   ORDER BY ts, event_id) AS valid_to
      |  FROM events)
      |SELECT user_id, event_id,
      |  coalesce(CAST(floor(epoch(valid_to)) AS BIGINT) -
      |           CAST(floor(epoch(valid_from)) AS BIGINT), -1) AS duration_sec,
      |  valid_to IS NULL AS is_current
      |FROM iv ORDER BY user_id, event_id""".stripMargin

  /** Snapshot diff — change-data-feed between two table versions (what
    * Delta/Iceberg CDF computes from the log; computed here relationally
    * from the data): v2 is v1 after the [[qMergeUpsert]] change classes,
    * and the diff classifies every key as inserted / deleted / updated /
    * unchanged by ONE full-outer key join comparing row digests. At
    * 100 TB this is the audit that validates a migration or replication
    * stream — digest compare means wide rows ship as one hash column.
    */
  def qSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val m = col("o_orderkey") % 21
    // v2 = merge result as rows (same change classes as qMergeUpsert)
    val v2 = o.filter(m =!= 1)
      .select(col("o_orderkey").as("key"),
        when(m === 0, col("o_totalprice") + 100.0)
          .otherwise(col("o_totalprice")).as("price"))
      .union(o.filter(m === 2).select(
        (col("o_orderkey") + 100000000L).as("key"), col("o_totalprice").as("price")))
    val v1 = o.select(col("o_orderkey").as("key"), col("o_totalprice").as("price"))
    // digest a FIXED-POINT rendering: double→string formatting differs
    // across engines (sci-notation thresholds), decimal(18,2) does not
    val d1 = v1.select(col("key"),
      md5(col("price").cast("decimal(18,2)").cast("string")).as("dig1"))
    val d2 = v2.select(col("key"),
      md5(col("price").cast("decimal(18,2)").cast("string")).as("dig2"))
    d1.join(d2, Seq("key"), "full_outer")
      .select(when(col("dig1").isNull, "inserted")
        .when(col("dig2").isNull, "deleted")
        .when(col("dig1") =!= col("dig2"), "updated")
        .otherwise("unchanged").as("change"))
      .groupBy("change").agg(count(lit(1)).as("n_keys"))
      .orderBy("change")
  }

  val qSnapshotDiffOracle: String =
    """WITH o AS (
      |  SELECT o_orderkey, o_totalprice, o_orderkey % 21 AS m FROM orders),
      |v1 AS (SELECT o_orderkey AS key, o_totalprice AS price FROM o),
      |v2 AS (
      |  SELECT o_orderkey AS key,
      |    CASE WHEN m = 0 THEN o_totalprice + 100.0 ELSE o_totalprice END AS price
      |  FROM o WHERE m <> 1
      |  UNION ALL
      |  SELECT o_orderkey + 100000000, o_totalprice FROM o WHERE m = 2),
      |d1 AS (SELECT key, md5(CAST(CAST(price AS DECIMAL(18,2)) AS VARCHAR)) AS dig1 FROM v1),
      |d2 AS (SELECT key, md5(CAST(CAST(price AS DECIMAL(18,2)) AS VARCHAR)) AS dig2 FROM v2)
      |SELECT CASE WHEN dig1 IS NULL THEN 'inserted'
      |            WHEN dig2 IS NULL THEN 'deleted'
      |            WHEN dig1 <> dig2 THEN 'updated'
      |            ELSE 'unchanged' END AS change,
      |  count(*) AS n_keys
      |FROM d1 FULL OUTER JOIN d2 USING (key)
      |GROUP BY 1 ORDER BY change""".stripMargin

  /** Data-quality validation — the dbt-test / Great-Expectations rule
    * pass every warehouse load runs before publishing: primary-key
    * uniqueness, referential integrity (anti-join — the only
    * corpus-owning rule, key-equality shuffled), domain ranges, and
    * non-negativity, each reported as a violation count. Every rule is
    * one aggregate over one scan or one anti-join; rules over the same
    * table share the scan.
    */
  def qDqChecks(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    val pkDup = o.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .agg(count(lit(1)).as("n")).select(lit("pk_unique_orderkey").as("rule"), col("n"))
    val fkOrphan = l.select(col("l_orderkey"))
      .join(o.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n")).select(lit("fk_lineitem_orders").as("rule"), col("n"))
    val qtyRange = l.filter(col("l_quantity") < 1 || col("l_quantity") > 50)
      .agg(count(lit(1)).as("n")).select(lit("range_quantity_1_50").as("rule"), col("n"))
    val priceNonNeg = o.filter(col("o_totalprice") <= 0)
      .agg(count(lit(1)).as("n")).select(lit("positive_totalprice").as("rule"), col("n"))
    pkDup.union(fkOrphan).union(qtyRange).union(priceNonNeg).orderBy("rule")
  }

  val qDqChecksOracle: String =
    """SELECT rule, CAST(n AS BIGINT) AS n FROM (
      |  SELECT 'pk_unique_orderkey' AS rule,
      |    (SELECT count(*) FROM (
      |       SELECT o_orderkey FROM orders GROUP BY o_orderkey
      |       HAVING count(*) > 1) d) AS n
      |  UNION ALL
      |  SELECT 'fk_lineitem_orders',
      |    (SELECT count(*) FROM lineitem l
      |     WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                       WHERE o.o_orderkey = l.l_orderkey))
      |  UNION ALL
      |  SELECT 'range_quantity_1_50',
      |    (SELECT count(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)
      |  UNION ALL
      |  SELECT 'positive_totalprice',
      |    (SELECT count(*) FROM orders WHERE o_totalprice <= 0)) u
      |ORDER BY rule""".stripMargin

  /** Incremental aggregate maintenance — the materialized-view law: an
    * aggregate over (state ∪ delta) equals the MERGE of the two partial
    * aggregates, because count/sum/min/max form commutative monoids
    * (avg derives from sum/count). Here the orders table is split into a
    * "state" batch and a "delta" batch (`o_orderkey % 5`), each partially
    * aggregated, and the partials merged — the oracle recomputes from the
    * full table, proving merge == recompute.
    *
    * Scale shape: this is WHY a 100 TB rollup never re-reads history —
    * each refresh aggregates only the delta (map-side combined) and
    * merges group-count-sized partials. Sums run in DECIMAL so partial
    * association is exact (double sums would hash-diverge on merge
    * order); the merge itself is a group-keyed aggregate over 2×groups
    * rows.
    */
  def qDeltaAgg(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    def partial(df: DataFrame): DataFrame =
      df.groupBy("o_orderpriority").agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(30,6)")).as("s"),
        min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
    val state = partial(o.filter(col("o_orderkey") % 5 =!= 0))
    val delta = partial(o.filter(col("o_orderkey") % 5 === 0))
    state.union(delta)
      .groupBy("o_orderpriority")
      .agg(sum("n").as("n_rows"),
        sum("s").as("s"), min("mn").as("min_price"), max("mx").as("max_price"))
      .select(col("o_orderpriority"), col("n_rows"),
        round(col("s").cast("double"), 2).as("total"),
        col("min_price"), col("max_price"),
        round(col("s").cast("double") / col("n_rows"), 4).as("avg4"))
      .orderBy("o_orderpriority")
  }

  // the oracle recomputes from scratch: merge-of-partials == full recompute
  val qDeltaAggOracle: String =
    """SELECT o_orderpriority, count(*) AS n_rows,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE), 2) AS total,
      |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) / count(*), 4) AS avg4
      |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  /** GDPR delete propagation ("right to be forgotten"): a forget-set of
    * customers cascades through the foreign-key chain — their orders die
    * with them, and lineitems die with those orders. Reported as a
    * per-table deletion audit (before/deleted/after), which is the
    * compliance artifact the actual delete job writes.
    *
    * Scale shape: pure key propagation — each hop is an equi-join whose
    * right side is the PREVIOUS hop's key set (forget-set-sized, 1/97 of
    * customers; AQE broadcasts it while small, shuffles when not). The
    * fact tables are each scanned once and never pair with anything
    * larger than the propagated key set. The delete itself at 100 TB is
    * the same semi-join driving a copy-on-write file rewrite.
    */
  def qDeletePropagation(s: SparkSession, dir: String): DataFrame = {
    val forget = t(s, dir, "customer")
      .filter(col("c_custkey") % 97 === 0).select(col("c_custkey"))
    val orders = t(s, dir, "orders")
    val deadOrders = orders
      .join(forget, orders("o_custkey") === forget("c_custkey"), "left_semi")
      .select(col("o_orderkey"))
    val custRows = t(s, dir, "customer")
      .select(lit("customer").as("tbl"), (col("c_custkey") % 97 === 0).as("dead"))
    val orderRows = orders
      .join(forget, orders("o_custkey") === forget("c_custkey"), "left_outer")
      .select(lit("orders").as("tbl"), forget("c_custkey").isNotNull.as("dead"))
    val li = t(s, dir, "lineitem")
    val liRows = li
      .join(deadOrders, li("l_orderkey") === deadOrders("o_orderkey"), "left_outer")
      .select(lit("lineitem").as("tbl"), deadOrders("o_orderkey").isNotNull.as("dead"))
    custRows.union(orderRows).union(liRows)
      .groupBy("tbl")
      .agg(count(lit(1)).as("rows_before"),
        sum(when(col("dead"), 1L).otherwise(0L)).as("rows_deleted"))
      .withColumn("rows_after", col("rows_before") - col("rows_deleted"))
      .orderBy("tbl")
  }

  val qDeletePropagationOracle: String =
    """WITH forget AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
      |dead_orders AS (
      |  SELECT o_orderkey FROM orders
      |  WHERE o_custkey IN (SELECT c_custkey FROM forget)),
      |u AS (
      |  SELECT 'customer' AS tbl, count(*) AS rows_before,
      |    sum(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END) AS rows_deleted
      |  FROM customer
      |  UNION ALL
      |  SELECT 'lineitem', count(*),
      |    sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM dead_orders)
      |        THEN 1 ELSE 0 END)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'orders', count(*),
      |    sum(CASE WHEN o_custkey IN (SELECT c_custkey FROM forget)
      |        THEN 1 ELSE 0 END)
      |  FROM orders)
      |SELECT tbl, rows_before, CAST(rows_deleted AS BIGINT) AS rows_deleted,
      |  CAST(rows_before - rows_deleted AS BIGINT) AS rows_after
      |FROM u ORDER BY tbl""".stripMargin

  /** Time-travel read — the MVCC reconstruction every lakehouse "AS OF
    * version V" query performs: a base snapshot (version 0) plus an
    * append-only change log (upserts at v1, deletes + inserts at v2),
    * replayed per key as "latest record with version ≤ V wins, delete
    * tombstones drop the key". The query materializes all three
    * versions' row counts and exact cent totals side by side — the audit
    * a reproducibility review runs ("what did the table say when the
    * model trained?"). Totals go through DECIMAL(18,2)·100 so both
    * engines sum exact integers, never floats.
    *
    * Scale shape: each AS-OF arm is one per-key max(struct) aggregate
    * over base ∪ log — map-side combined, keyed shuffle, no window; the
    * arm count is the (bounded) number of versions audited. A real lake
    * reads only the files the version manifest lists — the kernel here
    * is the record-level merge those manifests avoid re-running.
    */
  def qTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderkey").as("key"), col("o_totalprice").as("price"),
        (col("o_orderkey") % 21).as("m"))
    val log = o.select(col("key"), col("price"), lit(0L).as("version"), lit("upsert").as("op"))
      .union(o.filter(col("m") === 0).select(col("key"),
        (col("price") + 100.0).as("price"), lit(1L).as("version"), lit("upsert").as("op")))
      .union(o.filter(col("m") === 2).select(col("key"), col("price"),
        lit(2L).as("version"), lit("delete").as("op")))
      .union(o.filter(col("m") === 3).select((col("key") + 200000000L).as("key"),
        col("price"), lit(2L).as("version"), lit("upsert").as("op")))
    Seq(0L, 1L, 2L).map { v =>
      log.filter(col("version") <= v)
        .groupBy("key")
        .agg(max(struct(col("version"), col("op"), col("price"))).as("last"))
        .filter(col("last.op") === "upsert")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("last.price").cast("decimal(18,2)").multiply(100).cast("long"))
            .as("total_cents"))
        .select(lit(v).as("as_of_version"), col("n_rows"), col("total_cents"))
    }.reduce(_ union _).orderBy("as_of_version")
  }

  val qTimeTravelOracle: String =
    """WITH o AS (
      |  SELECT o_orderkey AS key, o_totalprice AS price, o_orderkey % 21 AS m
      |  FROM orders),
      |log AS (
      |  SELECT key, price, 0 AS version, 'upsert' AS op FROM o
      |  UNION ALL SELECT key, price + 100.0, 1, 'upsert' FROM o WHERE m = 0
      |  UNION ALL SELECT key, price, 2, 'delete' FROM o WHERE m = 2
      |  UNION ALL SELECT key + 200000000, price, 2, 'upsert' FROM o WHERE m = 3),
      |snap AS (
      |  SELECT v.v AS as_of_version, l.key,
      |    arg_max(l.op, l.version) AS op,
      |    arg_max(l.price, l.version) AS price
      |  FROM log l JOIN (VALUES (0), (1), (2)) AS v(v) ON l.version <= v.v
      |  GROUP BY 1, 2)
      |SELECT CAST(as_of_version AS BIGINT) AS as_of_version,
      |  count(*) AS n_rows,
      |  CAST(sum(CAST(CAST(price AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
      |    AS total_cents
      |FROM snap WHERE op = 'upsert'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_merge_upsert", qMergeUpsert, Some(qMergeUpsertOracle)),
    QueryDef("q_snapshot_diff", qSnapshotDiff, Some(qSnapshotDiffOracle)),
    QueryDef("q_dq_checks", qDqChecks, Some(qDqChecksOracle)),
    QueryDef("q_cdc_latest", qCdcLatest, Some(qCdcLatestOracle)),
    QueryDef("q_bloom_dedup", qBloomDedup, Some(qBloomDedupOracle)),
    QueryDef("q_scd2_intervals", qScd2Intervals, Some(qScd2IntervalsOracle)),
    QueryDef("q_delta_agg", qDeltaAgg, Some(qDeltaAggOracle)),
    QueryDef("q_delete_propagation", qDeletePropagation, Some(qDeletePropagationOracle)),
    QueryDef("q_time_travel", qTimeTravel, Some(qTimeTravelOracle)),
  )
}
