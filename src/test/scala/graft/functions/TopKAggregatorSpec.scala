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

  test("reduce/merge is split-invariant: any partitioning yields the global top-k") {
    // Spark may split a group's rows across partitions arbitrarily and
    // merge partials in any tree shape — the aggregator's answer must not
    // depend on it. Pure driver-side check over randomized splits.
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { trial =>
      val k = 1 + rnd.nextInt(5)
      val agg = new TopKAggregator(k)
      val n = rnd.nextInt(40)
      val data = Vector.fill(n)((rnd.nextInt(8).toDouble, rnd.nextInt(20).toLong))
      val expected = data.sortBy { case (s, id) => (-s, id) }.take(k)
      // random number of chunks, each reduced independently, merged in a
      // random fold order (left/right alternating by coin flip)
      val chunks = if (n == 0) Vector(Vector.empty[(Double, Long)])
        else data.grouped(1 + rnd.nextInt(n)).toVector
      val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = partials.reduceLeft { (a, b) =>
        if (rnd.nextBoolean()) agg.merge(a, b) else agg.merge(b, a)
      }
      assert(agg.finish(merged) == expected,
        s"trial $trial (k=$k, n=$n): ${agg.finish(merged)} != $expected")
    }
  }

  test("q_grouped_topk plans as an aggregate, not a window sort") {
    val plan = graft.operators.Relational
      .qGroupedTopK(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), "expected the bounded aggregator")
    assert(!plan.contains("Window"), "grouped top-k must not plan a window")
  }

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

  test("MinKAggregator is split-invariant and matches ascending window rank") {
    val rnd = new scala.util.Random(11)
    (1 to 100).foreach { trial =>
      val k = 1 + rnd.nextInt(5)
      val agg = new MinKAggregator(k)
      val n = rnd.nextInt(40)
      // short random hex keys with deliberate collisions for tie coverage
      val data = Vector.fill(n)(
        (Integer.toHexString(rnd.nextInt(16)), rnd.nextInt(20).toLong))
      val expected = data.sorted.take(k)
      val chunks = if (n == 0) Vector(Vector.empty[(String, Long)])
        else data.grouped(1 + rnd.nextInt(n)).toVector
      val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = partials.reduceLeft { (a, b) =>
        if (rnd.nextBoolean()) agg.merge(a, b) else agg.merge(b, a)
      }
      assert(agg.finish(merged) == expected,
        s"trial $trial (k=$k, n=$n): ${agg.finish(merged)} != $expected")
    }
  }

  test("MinKAggregator reduce keeps the buffer bounded at k") {
    val agg = new MinKAggregator(2)
    val buf = (1 to 100).foldLeft(agg.zero)((b, i) =>
      agg.reduce(b, (f"$i%03d", i.toLong)))
    assert(buf == Seq(("001", 1L), ("002", 2L)))
    assert(agg.merge(buf, Seq(("000", 9L))) == Seq(("000", 9L), ("001", 1L)))
  }
}
