package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Sketch operators: count-min guarantees, HLL/GK error bounds, centroid
  * checksums — plus the connected-components kernel's log-round
  * convergence on an adversarial chain graph.
  */
class SketchOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("cms estimates never undercount and order matches exact top-10") {
    val rows = SketchOps.qCmsHeavyHitters(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (exact, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= exact, s"${r.getString(0)}: CMS undercounted")
      assert(over == est - exact)
    }
    val exacts = rows.map(_.getLong(1))
    assert(exacts.zip(exacts.tail).forall { case (a, b) => a >= b })
  }

  test("hll and gk sketches land inside their asserted bounds") {
    val hll = SketchOps.qApproxDistinct(spark, dir).collect()
    assert(hll.nonEmpty)
    assert(hll.forall(_.getBoolean(2)), "HLL outside ±5% of exact")
    val gk = SketchOps.qApproxQuantiles(spark, dir).collect()
    assert(gk.nonEmpty)
    assert(gk.forall(_.getBoolean(2)), "approx median outside rank bounds")
  }

  test("label centroids cover every vector and match a driver-side fold") {
    import org.apache.spark.sql.functions.col
    val rows = SketchOps.qLabelCentroids(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val vecs = graft.Tables.t(spark, dir, "embeddings")
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    assert(rows.map(_._2).sum == vecs.length)
    val expected = vecs.groupBy(_._1).map { case (label, vs) =>
      val dims = vs.head._2.length
      val checksum = (0 until dims).map { d =>
        val s = vs.map(v => math.round(v._2(d).toDouble * 10000)).sum
        s * (d + 1)
      }.sum
      label -> (vs.length.toLong, checksum)
    }
    rows.foreach { case (label, n, cs) =>
      assert(expected(label) == ((n, cs)), s"label $label centroid mismatch")
    }
  }

  test("connected components converge in log rounds on a 200-node chain") {
    // plain min-label propagation needs ~200 rounds here; the pointer-jump
    // kernel must finish inside maxIter=20 and still find ONE component
    // with representative 0 (the fixpoint probe guarantees exactness, so
    // non-convergence would surface as a split chain)
    import spark.implicits._
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = ClusterOps.connectedComponents(chain, maxIter = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length == 200)
    assert(labels.forall(_._2 == 0L), "chain split: propagation did not converge")
  }

  test("connected components keep disjoint graphs disjoint") {
    import spark.implicits._
    val twoComps = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val labels = ClusterOps.connectedComponents(twoComps, maxIter = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("profile stats report sane cardinalities per column") {
    val rows = SketchOps.qProfileStats(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val total = graft.Tables.t(spark, dir, "lineitem").count()
    assert(rows.keySet == Set("l_returnflag", "l_linestatus", "l_quantity", "l_orderkey"))
    rows.foreach { case (c, (n, nulls, dist)) =>
      assert(n == total, s"$c: row count mismatch")
      assert(nulls + dist <= n + 1, s"$c: impossible null/distinct combination")
      assert(dist >= 1, s"$c: no distinct values")
    }
    assert(rows("l_returnflag")._3 <= 3, "returnflag has 3 flags")
    assert(rows("l_orderkey")._3 > rows("l_quantity")._3,
      "orderkey must be higher-cardinality than quantity")
  }

  test("join cardinality estimate never undercounts and matches the key-count fold") {
    val r = SketchOps.qJoinCardinality(spark, dir).collect().head
    val (exact, est, bp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // driver-side exact: sum over shared keys of count_orders * count_lineitem
    val oc = graft.Tables.t(spark, dir, "orders").select("o_orderkey").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    val lc = graft.Tables.t(spark, dir, "lineitem").select("l_orderkey").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    val expected = oc.keysIterator.map(k => oc(k) * lc.getOrElse(k, 0L)).sum
    assert(exact == expected, "exact cardinality disagrees with driver fold")
    assert(est >= exact, "CMS inner product can only overcount")
    assert(bp == (est - exact) * 10000 / exact)
  }

  test("hll inclusion-exclusion covers every source pair inside its bound") {
    val rows = SketchOps.qHllIntersection(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    val nSources = graft.Tables.t(spark, dir, "documents")
      .select("source").distinct().count()
    assert(rows.length == nSources * (nSources - 1) / 2,
      "one row per unordered source pair")
    rows.foreach { case (a, b, shared, ok) =>
      assert(shared >= 0)
      assert(ok, s"($a,$b): sketch overlap estimate outside its bound")
    }
  }

  test("aqp estimate lands near the exact aggregate at the sample rate") {
    val rows = SketchOps.qAqpSum(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (flag, nExact, sumExact, nSampled, sumEst, errBp) =>
      // 10% hash sample: realized rate within [5%, 15%] of the group
      assert(nSampled * 20 >= nExact && nSampled * 20 <= nExact * 3,
        s"$flag: sample rate ${nSampled.toDouble / nExact} far from 10%")
      assert(errBp == math.floor(math.abs(sumEst - sumExact) * 10000 / sumExact).toLong,
        s"$flag: error arithmetic")
      assert(errBp < 1500, s"$flag: estimate off by ${errBp}bp (> 15%)")
    }
  }

  test("hll merged estimate is invariant to the shard layout") {
    val rows = SketchOps.qSketchMerge(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2),
        s"${r.getString(0)}: 8-shard and 2-shard merged estimates diverged")
      assert(r.getBoolean(3),
        s"${r.getString(0)}: sketch estimate outside the 5% band")
    }
  }
}
