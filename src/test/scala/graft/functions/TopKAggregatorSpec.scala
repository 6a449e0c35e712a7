package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** TopKAggregator must agree with the window row_number formulation
  * (including tie-breaks) while keeping only k elements per buffer.
  */
class TopKAggregatorSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("per-group top-3 matches window row_number, ties break to smaller id") {
    import spark.implicits._
    val rows = (1 to 500).map { i =>
      (s"g${i % 7}", (i % 13).toDouble, i.toLong) // deliberate score ties
    }
    val df = rows.toDF("grp", "score", "id")

    val expected = df
      .withColumn("rk", row_number().over(
        Window.partitionBy("grp").orderBy(desc("score"), col("id"))))
      .filter(col("rk") <= 3)
      .select("grp", "score", "id")
      .as[(String, Double, Long)].collect().toSet

    val got = df.as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(TopKAggregator.topK(3))
      .collect()
      .flatMap { case (g, items) => items.map(it => (g, it._1, it._2)) }
      .toSet

    assert(got == expected)
  }

  test("reduce keeps the buffer bounded at k") {
    val agg = new TopKAggregator(2)
    val buf = (1 to 100).foldLeft(agg.zero)((b, i) => agg.reduce(b, (i.toDouble, i.toLong)))
    assert(buf == Seq((100.0, 100L), (99.0, 99L)))
    assert(agg.merge(buf, Seq((150.0, 1L))) == Seq((150.0, 1L), (100.0, 100L)))
  }
}
