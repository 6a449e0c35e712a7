package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The cell-bucketed range join must produce exactly the pair set of the
  * naive range condition for ANY inputs — including intervals aligned on a
  * cell boundary (one covered cell, not two) and points at the interval's
  * inclusive start / exclusive end.
  */
class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def naiveCounts(intervals: Seq[(Long, Long, Long)],
      points: Seq[(Long, Long)], width: Long): Map[Long, Long] =
    intervals.map { case (id, key, start) =>
      id -> points.count { case (k, p) =>
        k == key && p >= start && p < start + width
      }.toLong
    }.filter(_._2 > 0).toMap

  private def bucketedCounts(intervals: Seq[(Long, Long, Long)],
      points: Seq[(Long, Long)], width: Long): Map[Long, Long] = {
    import spark.implicits._
    val i = intervals.toDF("interval_id", "key", "start_us")
    val p = points.toDF("key", "point_us")
    AsOfJoin.rangeJoinCounts(i, p, width).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("randomized equivalence with the naive range join, incl. boundary cases") {
    val rnd = new scala.util.Random(42)
    val width = 100L
    for (round <- 1 to 5) {
      val intervals = (1L to 40L).map { id =>
        // mix arbitrary starts with exactly cell-aligned ones
        val start =
          if (id % 5 == 0) rnd.nextInt(20) * width
          else rnd.nextInt(2000).toLong
        (id, (id % 4), start)
      }
      val points = Seq.tabulate(300) { j =>
        ((j % 4).toLong, rnd.nextInt(2200).toLong)
      } ++
        // exact inclusive-start and exclusive-end points for some intervals
        intervals.take(10).flatMap { case (_, key, start) =>
          Seq((key, start), (key, start + width - 1), (key, start + width))
        }
      assert(bucketedCounts(intervals, points, width) ==
        naiveCounts(intervals, points, width), s"round $round diverged")
    }
  }

  test("native as-of exec matches the union+window composition exactly") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.t(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val viaWindow = AsOfJoin
      .asOf(purchases, views, "user_id", "ts", "event_id", "matched_view")
      .select("event_id", "matched_view").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    val viaNative = AsOfJoin
      .asOfNative(purchases, views, "user_id", "ts", "event_id", "matched_view")
      .select("event_id", "matched_view").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(viaNative.size == viaWindow.size)
    assert(viaNative == viaWindow,
      "per-purchase matched view must be identical across formulations")
    // and the custom node actually planned: the physical plan must
    // contain AsOfJoinExec (not a fallback)
    val plan = AsOfJoin
      .asOfNative(purchases, views, "user_id", "ts", "event_id", "mv")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing from plan:\n$plan")
  }

  test("native as-of randomized equivalence incl. equal-ts ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // dense key/ts collisions to force every tie rule: 40 keys, ts in a
    // tiny range, duplicate right (ts, id) combinations
    val lrows = (0 until 400).map { i =>
      (i.toLong, rnd.nextInt(40).toLong,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(50) * 1000L))
    }
    val rrows = (0 until 400).map { i =>
      (1000L + i, rnd.nextInt(40).toLong,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(50) * 1000L))
    }
    val l = lrows.toDF("event_id", "user_id", "ts")
    val r = rrows.toDF("event_id", "user_id", "ts")
    def collectMap(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "m").collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    val a = collectMap(AsOfJoin.asOf(l, r, "user_id", "ts", "event_id", "m"))
    val b = collectMap(AsOfJoin.asOfNative(l, r, "user_id", "ts", "event_id", "m"))
    assert(a == b, "tie resolution must match the window formulation")
    // sanity on the rule itself: every match is the max id among right
    // rows at the max right-ts <= left-ts for that key
    val rByKey = rrows.groupBy(_._2)
    lrows.foreach { case (id, k, ts) =>
      val due = rByKey.getOrElse(k, Seq()).filter(_._3.getTime <= ts.getTime)
      val expected = if (due.isEmpty) -1L
        else { val mx = due.map(_._3.getTime).max
          due.filter(_._3.getTime == mx).map(_._1).max }
      assert(b(id) == expected, s"left $id: got ${b(id)}, want $expected")
    }
  }

  test("zero-width-safe: width 1 intervals match only the exact point") {
    import spark.implicits._
    val i = Seq((1L, 7L, 500L), (2L, 7L, 501L)).toDF("interval_id", "key", "start_us")
    val p = Seq((7L, 500L), (7L, 502L)).toDF("key", "point_us")
    val got = AsOfJoin.rangeJoinCounts(i, p, 1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L))
  }
}
