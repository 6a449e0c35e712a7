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
}
