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

  test("zero-width-safe: width 1 intervals match only the exact point") {
    import spark.implicits._
    val i = Seq((1L, 7L, 500L), (2L, 7L, 501L)).toDF("interval_id", "key", "start_us")
    val p = Seq((7L, 500L), (7L, 502L)).toDF("key", "point_us")
    val got = AsOfJoin.rangeJoinCounts(i, p, 1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L))
  }
}
