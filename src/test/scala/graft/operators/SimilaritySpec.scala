package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Triangle-blocked near-dup join: exactness across block counts. */
class SimilaritySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("blocked self-join yields the identical pair set for any block target") {
    def rows(blockTarget: Long): Seq[String] =
      Similarity.qEmbeddingNearDup(spark, dir, blockTarget)
        .collect().map(_.mkString("|")).toSeq
    val naive = rows(Long.MaxValue) // every cell below target → B=1 everywhere
    assert(naive.nonEmpty)
    assert(rows(2L) == naive) // forces multi-block cells at sf0.001
    assert(rows(3L) == naive) // block count not dividing the cell evenly
  }

  test("knn classify: one prediction per probe, votes within [1,5]") {
    val rows = Similarity.qKnnClassify(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate probe row")
    rows.foreach { case (q, tl, pl, votes) =>
      assert(q % 25 == 0, s"probe $q not in the probe split")
      assert(votes >= 1 && votes <= 5, s"probe $q: $votes votes")
      assert(tl >= 0 && pl >= 0)
    }
  }

  test("cosine curve bins cover exactly the >= 0.3 near-dup pairs") {
    val curve = Similarity.qCosineCurve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(curve.nonEmpty)
    curve.foreach { case (bin, _) => assert(bin >= 6 && bin <= 20, s"bin $bin") }
    val nPairs = Similarity.qEmbeddingNearDup(spark, dir).count()
    assert(curve.map(_._2).sum == nPairs, "curve must partition the pair set")
  }

  test("pair generation keys on (label, lo, hi) — the bounded-task shape") {
    val plan = Similarity.qEmbeddingNearDup(spark, dir, 2L)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("lo") && plan.contains("hi"))
  }

  test("ann candidate join keys on (label, bucket) and is a strict subset of the exact pairs") {
    val ann = Similarity.qAnnNearDup(spark, dir)
    val plan = ann.queryExecution.optimizedPlan.toString
    assert(plan.contains("bucket"))
    assert(!plan.contains("CartesianProduct"))
    val annPairs = ann.collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val exact = Similarity.qEmbeddingNearDup(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(annPairs.nonEmpty)
    assert(annPairs.subsetOf(exact)) // approximate recall, exact precision
  }

  test("ann recall@10 is bounded, hits never exceed candidates or k") {
    val rows = Similarity.qAnnRecall(spark, dir).collect()
    assert(rows.length == 3, "one row per query vector")
    rows.foreach { r =>
      val (nCand, nHits, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nHits <= 10 && nHits <= nCand,
        s"query ${r.getLong(0)}: $nHits hits, $nCand candidates")
      assert(recall >= 0.0 && recall <= 1.0)
      assert(recall == math.round(nHits / 10.0 * 10000) / 10000.0)
    }
  }

  test("multi-probe candidates and recall dominate the single-bucket arm") {
    val rows = Similarity.qMultiprobeRecall(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
    assert(rows.length == 3)
    rows.foreach { case (qid, nS, rS, nM, rM) =>
      assert(nM >= nS, s"query $qid: probing more buckets cannot shrink candidates")
      assert(rM >= rS, s"query $qid: multi-probe recall cannot drop below single")
      assert(rM >= 0.0 && rM <= 1.0 && rS >= 0.0 && rS <= 1.0)
    }
    assert(rows.exists { case (_, nS, _, nM, _) => nM > nS },
      "at least one query must actually gain candidates from probing")
  }

  test("ndcg eval: idcg bounds dcg and ndcg lands in [0,1]") {
    val rows = Similarity.qNdcgEval(spark, dir).collect()
    assert(rows.length == 3, "one row per query vector")
    rows.foreach { r =>
      val (dcg, idcg, ndcg) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(idcg > 0.0, s"query ${r.getLong(0)}: ideal gain must be positive")
      assert(dcg <= idcg + 1e-9, s"query ${r.getLong(0)}: dcg $dcg exceeds idcg $idcg")
      assert(ndcg >= 0.0 && ndcg <= 1.0)
    }
  }

  test("pq encode assigns every non-codebook vector one code per subspace") {
    val rows = Similarity.qPqEncode(spark, dir).collect()
    val total = graft.Tables.t(spark, dir, "embeddings").count() - 8
    val bySubspace = rows.groupBy(_.getLong(0))
    assert(bySubspace.keySet == (0L until 8L).toSet, "all 8 subspaces present")
    bySubspace.foreach { case (m, rs) =>
      assert(rs.map(_.getLong(2)).sum == total, s"subspace $m must cover the corpus")
      assert(rs.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 8), "codes are 3-bit")
    }
  }

  test("pq adc search ranks 5 ascending-distance hits per query") {
    val rows = Similarity.qPqSearch(spark, dir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.length == 5, s"query $q must rank 5 hits")
      assert(rs.map(_.getLong(3)).sorted.toSeq == (1L to 5L), s"query $q ranks")
      val ds = rs.sortBy(_.getLong(3)).map(_.getLong(2))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b },
        s"query $q distances not ascending: ${ds.mkString(",")}")
      assert(rs.forall(_.getLong(1) >= 8), "hits come from the encoded corpus")
    }
  }

  test("power-iteration step returns a unit vector matching a driver-side fold") {
    val rows = Similarity.qPowerIteration(spark, dir).collect()
    val dims = rows.map(_.getLong(0))
    assert(dims.head == 1 && dims.length == dims.distinct.length)
    // normalized output has unit L2 norm (up to the 4dp rounding)
    val norm = math.sqrt(rows.map(r => r.getDouble(2) * r.getDouble(2)).sum)
    assert(math.abs(norm - 1.0) < 0.01, s"|v1| = $norm")
    // exact integer check: recompute y = (X^T X) v0 with the same
    // fixed-point fold on the driver
    val vecs = graft.Tables.t(spark, dir, "embeddings")
      .select("embedding").collect().map(_.getSeq[Float](0))
    val expected = Array.ofDim[Long](dims.length)
    vecs.foreach { v =>
      val x4 = v.map(x => math.round(x.toDouble * 10000)).toArray
      val s = x4.sum
      var d = 0
      while (d < expected.length) { expected(d) += s * x4(d); d += 1 }
    }
    rows.foreach { r =>
      assert(r.getLong(1) == expected(r.getLong(0).toInt - 1),
        s"dim ${r.getLong(0)}: y mismatch")
    }
  }

  test("feature-norm covers every dimension with sane moments") {
    val rows = Similarity.qFeatureNorm(spark, dir).collect()
    val d = graft.Tables.t(spark, dir, "embeddings")
      .selectExpr("size(embedding)").head().getInt(0)
    assert(rows.length == d, s"expected $d dims, got ${rows.length}")
    val n = graft.Tables.t(spark, dir, "embeddings").count()
    rows.foreach { r =>
      assert(r.getDouble(2) > 0, s"dim ${r.getLong(0)}: std must be positive")
      // |z|>3 holds for well under half of any sample (Chebyshev: <= n/9)
      assert(r.getLong(3) <= n / 9 + 1, s"dim ${r.getLong(0)}: too many outliers")
    }
  }
}
