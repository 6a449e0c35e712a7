package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.Tables.t

/** As-of join — the classic operator Spark SQL lacks natively, composed
  * Spark-first: UNION the two sides tagged, then one window pass per key
  * ordered by event time carries the latest right-side value forward
  * (`last(..., ignoreNulls)` over unbounded-preceding rows). ONE shuffle
  * keyed on the join key, no join node, no range explosion — at 100 TB
  * this beats binned range-joins (no bin-width tuning, no duplicate
  * candidate pairs); it is the standard quotes/trades shape.
  */
object AsOfJoin {

  /** For each row of `left`, attach (as `outCol`) the id of the latest
    * `right` row with `right.ts <= left.ts` within the same `key`, or null
    * if none precedes it. Ties at equal ts match the right row first (a
    * left row at ts sees a right row at the same ts); equal-ts right rows
    * resolve to the largest `rightId` for determinism.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightId: String, outCol: String): DataFrame = {
    val l = left
      .withColumn("__is_r", lit(0))
      .withColumn("__rid", lit(null).cast("long"))
    val r = left.columns.filterNot(c => c == key || c == ts)
      .foldLeft(right.select(col(key), col(ts), col(rightId).cast("long").as("__rid"))
        .withColumn("__is_r", lit(1))) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__is_r").desc, col("__rid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r.select(l.columns.map(col): _*))
      .withColumn(outCol, last("__rid", ignoreNulls = true).over(w))
      .filter(col("__is_r") === 0)
      .drop("__is_r", "__rid")
  }

  /** For each purchase, the latest view by the same user at or before the
    * purchase time; per-user match statistics.
    */
  def qAsOfJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    asOf(purchases, views, "user_id", "ts", "event_id", "matched_view")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("matched_view").isNotNull, 1).otherwise(0)).cast("long").as("n_matched"),
        max("matched_view").as("last_matched_view"))
      .orderBy("user_id")
  }

  /** Same union+window formulation in DuckDB (portable; avoids native
    * ASOF JOIN tie-semantics differences).
    */
  val qAsOfJoinOracle: String =
    """WITH tagged AS (
      |  SELECT user_id, ts, 0 AS is_v, CAST(NULL AS BIGINT) AS vid
      |  FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, ts, 1 AS is_v, event_id AS vid
      |  FROM events WHERE event_type = 'view'),
      |matched AS (
      |  SELECT user_id, is_v,
      |    last_value(vid IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts ASC, is_v DESC, vid ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched_view
      |  FROM tagged)
      |SELECT user_id, count(*) AS n_purchases,
      |  CAST(sum(CASE WHEN matched_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
      |  max(matched_view) AS last_matched_view
      |FROM matched WHERE is_v = 0
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_asof_join", qAsOfJoin, Some(qAsOfJoinOracle)),
  )
}
