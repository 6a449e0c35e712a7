package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Relational surface is primarily oracle-gated (driver DuckDB compare);
  * this spec holds the invariants that aren't expressible as a single
  * hash-compare, starting with cohort-retention accounting.
  */
class RelationalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("retention cohorts partition the user base and bound retained counts") {
    import org.apache.spark.sql.functions.countDistinct
    val rows = Relational.qRetention(spark, dir).collect()
    assert(rows.nonEmpty)
    val users = graft.Tables.t(spark, dir, "events")
      .agg(countDistinct("user_id")).head().getLong(0)
    assert(rows.map(_.getLong(1)).sum == users,
      "every user belongs to exactly one cohort")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"${r.getString(0)}: d1 > cohort size")
      assert(r.getLong(3) <= r.getLong(1), s"${r.getString(0)}: d7 > cohort size")
    }
    // cohort days are formatted canonically and sorted
    val days = rows.map(_.getString(0))
    assert(days.forall(_.matches("\\d{4}-\\d{2}-\\d{2}")))
    assert(days.sorted.sameElements(days))
  }

  test("funnel stages shrink monotonically and start from the view-user count") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val r = Relational.qFunnel(spark, dir).head()
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel must narrow: $v -> $c -> $p")
    assert(p >= 0 && v > 0)
    val viewUsers = graft.Tables.t(spark, dir, "events")
      .filter(col("event_type") === "view")
      .agg(countDistinct("user_id")).head().getLong(0)
    assert(v == viewUsers)
  }

  test("pivot columns cover the event-type dictionary and totals match") {
    import org.apache.spark.sql.functions.{col, sum => fsum}
    val df = Relational.qPivot(spark, dir)
    assert(df.columns.toSeq ==
      Seq("mnth", "click", "error", "purchase", "signup", "view"))
    val pivotTotal = df.collect()
      .flatMap(r => (1 to 5).map(i => if (r.isNullAt(i)) 0.0 else r.getDouble(i)))
      .sum
    val rawTotal = graft.Tables.t(spark, dir, "events")
      .agg(fsum(col("value"))).head().getDouble(0)
    assert(math.abs(pivotTotal - rawTotal) < 1.0,
      s"pivot total $pivotTotal vs raw $rawTotal")
  }

  test("unpivot emits 3 metric rows per priority with stable names") {
    val rows = Relational.qUnpivot(spark, dir).collect()
    val byPrio = rows.groupBy(_.getString(0))
    assert(byPrio.size == 5)
    byPrio.values.foreach { g =>
      assert(g.map(_.getString(1)).sorted.toSeq ==
        Seq("avg_price", "n_orders", "total_price"))
    }
  }

  test("ntile produces 4 quartiles per priority with sizes within one") {
    val rows = Relational.qNtile(spark, dir).collect()
    val byPrio = rows.groupBy(_.getString(0))
    byPrio.foreach { case (prio, g) =>
      assert(g.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4),
        s"$prio: missing quartiles")
      val sizes = g.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1, s"$prio: unbalanced ntile $sizes")
      // quartile price ranges must be non-overlapping and ordered
      val ordered = g.sortBy(_.getInt(1))
      ordered.sliding(2).foreach { case Array(a, b) =>
        assert(a.getDouble(4) <= b.getDouble(3),
          s"$prio: quartile ranges overlap")
      case _ => ()
      }
    }
  }

  test("path transitions conserve the per-user sequence mass") {
    val rows = Relational.qPathTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val perUser = graft.Tables.t(spark, dir, "events")
      .groupBy("user_id").count().collect().map(_.getLong(1))
    assert(rows.map(_._3).sum == perUser.map(n => math.max(n - 1, 0L)).sum,
      "every consecutive event pair must appear exactly once")
    rows.groupBy(_._1).foreach { case (from, es) =>
      val shareSum = es.map(_._4).sum
      // integer flooring loses at most 1bp per edge
      assert(shareSum <= 10000 && shareSum > 10000 - es.length,
        s"$from: outgoing shares sum to $shareSum bp")
    }
  }

  test("seasonal baseline covers every hourly cell and bounds its ratios") {
    import org.apache.spark.sql.functions.{col, date_trunc}
    val cells = graft.Tables.t(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")), col("event_type"))
      .count().groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Relational.qSeasonalBaseline(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (tp, nCells, nHigh, nLow, maxBp) =>
      assert(nCells == cells(tp), s"$tp: every hourly cell must be scored")
      assert(nHigh + nLow <= nCells, s"$tp: flagged cells exceed total")
      assert(maxBp >= 10000,
        s"$tp: the max deviation cannot sit below its own mean")
      assert((nHigh > 0) == (maxBp >= 15000), s"$tp: high count vs peak ratio")
    }
  }

  test("rate anomaly scores only hours with a full trailing day") {
    import org.apache.spark.sql.functions.{col, date_trunc}
    val hourly = graft.Tables.t(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")), col("event_type"))
      .count().groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Relational.qRateAnomaly(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (tp, nScored, nSpikes, maxBp) =>
      assert(nScored == hourly(tp) - 24,
        s"$tp: scored $nScored of ${hourly(tp)} hours (first 24 must be skipped)")
      assert(nSpikes <= nScored, s"$tp: more spikes than scored hours")
      assert(maxBp > 0, s"$tp: non-positive peak ratio")
      // a spike needs ratio >= 2x => max ratio must agree with the count
      assert((nSpikes > 0) == (maxBp >= 20000), s"$tp: spike count vs peak ratio")
    }
  }

  test("moving window RANGE frame: tied timestamps share one frame") {
    val rows = Relational.qMovingAvg(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // value-bounded frame: any two events with the same (type, second)
    // must see the identical window, hence identical sum AND count —
    // the property a ROWS frame would violate on ties
    rows.groupBy(r => (r._2, r._3)).foreach { case (key, group) =>
      assert(group.map(g => (g._4, g._5)).distinct.length == 1,
        s"tied group $key has divergent frames")
    }
    // the frame is trailing: spot-check 20 rows of one event type
    // against a brute-force trailing-hour sum/count
    val tp = rows.head._2
    val rawByType = graft.Tables.t(spark, dir, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === tp)
      .select("ts", "value").collect()
      .map(r => (r.getTimestamp(0).getTime / 1000, r.getDouble(1)))
    rows.filter(_._2 == tp).take(20).foreach { case (id, _, tsec, sm, n) =>
      val frame = rawByType.filter(e => e._1 >= tsec - 3600 && e._1 <= tsec)
      assert(n == frame.length, s"event $id: frame count $n vs ${frame.length}")
      assert(math.abs(sm - frame.map(_._2).sum) < 0.005 + 1e-9,
        s"event $id: trailing sum $sm vs brute force")
    }
  }

  test("EXISTS / NOT EXISTS decorrelate into semi and anti joins") {
    val df = Relational.qExistsSubquery(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS not decorrelated to semi:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS not decorrelated to anti:\n$plan")
    assert(df.collect().map(_.getLong(1)).sum > 0)
  }

  test("recursive CTE walk terminates with the analytic depth histogram") {
    val rows = Relational.qRecursiveCte(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val users = graft.Tables.t(spark, dir, "events")
      .select("user_id").distinct().collect().map(_.getLong(0))
    // analytic depth: halvings of u until 0 is floor(log2(u)) + 1 (u=0 -> 0)
    val expected = users.groupBy(u =>
      if (u == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(u))
      .map { case (d, us) => (d, us.length.toLong) }
    assert(rows == expected, s"depth histogram mismatch: $rows vs $expected")
  }
}
