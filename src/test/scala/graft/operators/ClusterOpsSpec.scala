package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Round-4 pipeline operators: duplicate-cluster closure, cross-corpus
  * dedup, IVF search, k-means step, global shuffle, funnel, n-gram DF.
  */
class ClusterOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("dedup clusters form a partition closed over the near-dup pairs") {
    val comp = ClusterOps.qDedupClusters(spark, dir).collect()
    assert(comp.nonEmpty)
    // representative is the min member, so rep <= max_doc and sizes >= 2
    // only when a component has more than one doc; every cluster here has
    // >= 2 members (singletons never enter the graph)
    comp.foreach { r =>
      assert(r.getLong(1) >= 2, s"singleton cluster ${r.getLong(0)}")
      assert(r.getLong(0) <= r.getLong(2))
    }
    // closure: both endpoints of every verified pair map to one rep
    val pairs = Dedup.qMinhashLsh(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val members = comp.map(r => (r.getLong(0), r.getLong(1))).toMap
    val nMembers = members.values.sum
    val nNodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct.length
    assert(nMembers == nNodes, "every non-singleton doc is in exactly one cluster")
  }

  test("keep-best picks the max-ttr member of every simhash cluster") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = ClusterOps.qDedupKeepBest(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (rep, keep, n, ttr) =>
      assert(n >= 2, s"singleton cluster $rep")
      assert(rep <= keep || rep == keep || keep >= 0) // rep is min label, keep may differ
      assert(ttr >= 0.0 && ttr <= 1.0, s"cluster $rep ttr $ttr outside [0,1]")
    }
    // the kept doc's ttr is the cluster max: recompute one cluster by hand
    val (rep, keep, _, best) = rows.maxBy(_._3)
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(spark, sf01, "documents")
      .select(col("doc_id"),
        round(size(array_distinct(split(col("text"), " "))) /
          size(split(col("text"), " ")).cast("double"), 4).as("ttr"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(docs(keep) == best, s"kept doc $keep of cluster $rep not at its reported ttr")
  }

  test("deeper maxIter does not change the converged clustering") {
    val a = ClusterOps.qDedupClusters(spark, dir, maxIter = 20)
      .collect().map(_.mkString("|")).toSeq
    val b = ClusterOps.qDedupClusters(spark, dir, maxIter = 50)
      .collect().map(_.mkString("|")).toSeq
    assert(a == b)
  }

  test("pointer jumping closes a 512-node chain in O(log n) rounds") {
    import spark.implicits._
    // one maximal-diameter chain: 0-1-2-...-511 (diameter 511). Plain
    // min-label propagation needs 511 rounds; path halving must land
    // well inside a logarithmic budget.
    val n = 512
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1))
      .toDF("doc_a", "doc_b")
    val (labels, rounds) =
      ClusterOps.connectedComponentsWithRounds(pairs, maxIter = 64)
    val rows = labels.collect()
    assert(rows.length == n, "every chain node must be labeled")
    assert(rows.forall(_.getLong(1) == 0L), "single component, rep = 0")
    val logBudget = 2 * (math.log(n.toDouble) / math.log(2)).ceil.toInt + 4
    assert(rounds <= logBudget,
      s"$rounds rounds for a $n-chain — pointer jumping is not engaging " +
        s"(budget $logBudget, plain propagation would need ${n - 1})")
    // extra hops per round (the chain-stress configuration) must buy
    // strictly fewer rounds on a long chain
    val (labels3, rounds3) =
      ClusterOps.connectedComponentsWithRounds(pairs, maxIter = 64, hops = 3)
    assert(labels3.collect().forall(_.getLong(1) == 0L))
    assert(rounds3 < rounds, s"3 hops ($rounds3) should beat 1 hop ($rounds)")
  }

  test("chain-cluster stress closes each per-source chain completely") {
    val rows = ClusterOps.qStressChainClusters(spark, dir).collect()
    val expected = graft.Tables.t(spark, dir, "documents")
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.min("doc_id").as("rep"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.max("doc_id").as("mx"))
      .collect()
      .filter(_.getLong(2) > 1)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == expected,
      "every source's chain must close to exactly one cluster")
  }

  test("cross dedup reports only train sources, flagged <= docs") {
    val rows = ClusterOps.qCrossDedup(spark, dir).collect()
    val refs = (0 until 4).map(i => s"src$i").toSet
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!refs.contains(r.getString(0)))
      assert(r.getLong(2) <= r.getLong(1))
    }
  }

  test("ivf search: k ranked hits per query, no self-hit, probed cells only") {
    val hits = Similarity.qIvfSearch(spark, dir).collect()
    assert(hits.nonEmpty)
    hits.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val rks = rows.map(_.getLong(3)).sorted.toSeq
      assert(rks == (1L to rows.length.toLong).toSeq, s"query $q ranks $rks")
      assert(!rows.exists(_.getLong(1) == q), s"query $q matched itself")
      // ranked descending by similarity
      val sims = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("kmeans step partitions the corpus across the seed centroids") {
    val rows = Similarity.qKmeansStep(spark, dir).collect()
    val total = graft.Tables.t(spark, dir, "embeddings").count() - 8
    assert(rows.map(_.getLong(1)).sum == total)
  }

  test("global shuffle is a deterministic partition of the corpus") {
    val rows = CorpusOps.qGlobalShuffle(spark, dir).collect()
    val total = graft.Tables.t(spark, dir, "documents").count()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(rows.map(_.getLong(0)).toSet.subsetOf((0L until 8L).toSet))
    val again = CorpusOps.qGlobalShuffle(spark, dir).collect()
    assert(rows.map(_.mkString("|")).toSeq == again.map(_.mkString("|")).toSeq)
  }

  test("quality funnel counts are monotone non-increasing") {
    val rows = CorpusOps.qQualityFunnel(spark, dir).collect()
    assert(rows.length == 6)
    val counts = rows.sortBy(_.getString(0)).map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("ngram doc-freq: top-20, ordered, bounded by doc count") {
    val rows = graft.operators.TextOps.qNgramFreq(spark, dir).collect()
    assert(rows.length == 20)
    val total = graft.Tables.t(spark, dir, "documents").count()
    val freqs = rows.map(_.getLong(1))
    assert(freqs.forall(_ <= total))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
  }

  test("entity resolution links every dirty record back to its clean twin") {
    val rows = ClusterOps.qErClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // the dirty-replica offset is data-derived (smallest power of ten
    // above max custkey) — recompute it the same way the query does
    val maxKey = graft.Tables.t(spark, dir, "customer")
      .agg(org.apache.spark.sql.functions.max("c_custkey"))
      .head.getAs[Number](0).longValue
    val offset = math.pow(10, maxKey.toString.length).toLong
    rows.foreach { case (rep, n, maxRec) =>
      assert(n == 2, s"entity $rep: expected exactly clean+dirty, got $n")
      assert(maxRec == rep + offset,
        s"entity $rep: dirty twin id should be rep + $offset, got $maxRec")
    }
    val nCustomers = graft.Tables.t(spark, dir, "customer").count()
    assert(rows.length == nCustomers, "one resolved entity per customer")
  }

  test("keep-best audit: deterministic stratum, internally consistent counts") {
    val rows = ClusterOps.qKeepBestAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty, "the 1% band stratum must be non-empty even at sf0.001")
    rows.foreach { case (band, nBuckets, nRows, nCand, nVerified, nKeepA, sumDist) =>
      assert(band >= 0 && band < 3)
      assert(nBuckets > 0 && nRows >= nBuckets,
        s"band $band: rows $nRows must cover buckets $nBuckets")
      assert(nVerified <= nCand, s"band $band: verified beyond candidates")
      assert(nKeepA <= nVerified, s"band $band: keep-a beyond verified")
      assert(sumDist <= nVerified * 8, s"band $band: hamming mass beyond cap")
    }
    // the stratum is arithmetic on the band key — re-running must give
    // the identical report (no RNG anywhere in the path)
    val again = ClusterOps.qKeepBestAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.toSeq == again.toSeq)
  }

  test("blocking audit: completeness counts exactly the undamaged twins") {
    val r = ClusterOps.qErBlockingAudit(spark, dir).collect().head
    val (nRecords, nCand, nTrue, nBlockedTrue) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val nCustomers = graft.Tables.t(spark, dir, "customer").count()
    assert(nRecords == 2 * nCustomers)
    assert(nTrue == nCustomers)
    // custkey % 4 == 3 gets the block-BREAKING mutation (last digit
    // dropped), so exactly the other three classes survive blocking
    val undamaged = graft.Tables.t(spark, dir, "customer")
      .filter(org.apache.spark.sql.functions.col("c_custkey") % 4 =!= 3).count()
    assert(nBlockedTrue == undamaged,
      s"blocked-true $nBlockedTrue != undamaged twin count $undamaged")
    assert(nCand >= nBlockedTrue, "candidates include all blocked truths")
    val (rr, pc, pq) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(rr > 0.99, s"reduction ratio $rr — blocking must prune ~all of n²/2")
    assert(pc > 0.7 && pc < 0.8, s"pairs completeness $pc off the 3/4 design")
    assert(pq > 0.0 && pq <= 1.0, s"pairs quality $pq outside (0, 1]")
  }

  test("pagerank mass is conserved and ranks stay positive") {
    val rows = ClusterOps.qPagerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val n = rows.length
    assert(n > 0)
    rows.foreach { case (id, pr) => assert(pr > 0.0, s"node $id: rank must be positive") }
    // scaled ranks average 1 when no rank leaks to dangling nodes (every
    // node has out-degree k by construction, so mass is conserved up to
    // the per-round rounding applied only at output)
    val mean = rows.map(_._2).sum / n
    assert(math.abs(mean - 1.0) < 0.01, s"scaled rank mean $mean drifted from 1")
  }

  test("label propagation only labels non-seeds and never exceeds its vote surface") {
    val rows = ClusterOps.qLabelProp(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum == 50, "seed budget is exactly vec_id < 50")
    val total = graft.Tables.t(spark, dir, "embeddings").count()
    assert(rows.map(_._3).sum <= total - 50, "predictions cannot exceed non-seeds")
    rows.foreach { case (lbl, _, pred, correct, bp) =>
      assert(correct <= pred, s"class $lbl: correct exceeds predicted")
      assert(bp == (if (pred > 0) correct * 10000 / pred else 0L),
        s"class $lbl: accuracy arithmetic")
    }
  }

  test("triangle counts match a brute-force check on the collected graph") {
    import org.apache.spark.sql.functions.col
    val reported = ClusterOps.qDupTriangles(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val edges = graft.operators.Similarity.qEmbeddingNearDup(spark, dir)
      .select(col("label"), col("id_a"), col("id_b")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val byLabel = edges.groupBy(_._1)
    assert(reported.keySet == byLabel.keySet)
    byLabel.foreach { case (lbl, es) =>
      val eset = es.map(e => (e._2, e._3)).toSet
      val nodes = eset.flatMap(e => Seq(e._1, e._2))
      val deg = nodes.toSeq.map(n => eset.count(e => e._1 == n || e._2 == n))
      val wedges = deg.map(d => d.toLong * (d - 1) / 2).sum
      val tris = (for {
        (a, b) <- eset; (b2, c) <- eset if b2 == b && eset((a, c))
      } yield (a, b, c)).size.toLong
      val (nE, nW, nT, bp) = reported(lbl)
      assert(nE == eset.size, s"label $lbl: edge count")
      assert(nW == wedges, s"label $lbl: wedge count")
      assert(nT == tris, s"label $lbl: triangle count")
      assert(bp == (if (wedges > 0) 3 * tris * 10000 / wedges else 0L),
        s"label $lbl: transitivity")
      assert(3 * nT <= nW, s"label $lbl: closed wedges exceed wedges")
    }
  }
}
