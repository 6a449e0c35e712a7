package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Corpus mixing: temperature scaling must renormalize to 1 and flatten
  * the source distribution (boost rare sources, damp dominant ones).
  */
class CorpusOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("domain cap keeps min(cap, n_docs) per source, deterministically") {
    val rows = CorpusOps.qDomainCap(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, kept) =>
      assert(kept == math.min(15L, n), s"$src: kept $kept of $n under cap 15")
    }
    val again = CorpusOps.qDomainCap(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq, "hash-ranked cap must be reproducible")
  }

  test("bm25 top-k is score-descending with positive fixed-point scores") {
    val rows = TextOps.qBm25TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length <= 10 && rows.nonEmpty)
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq, "not score-sorted")
    assert(rows.forall(_._2 > 0), "BM25 of a matching doc is positive")
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate doc in top-k")
  }

  test("zipf fit: negative slope, valid r2, real fit per language") {
    val rows = TextOps.qZipfSlope(spark, dir).collect()
    assert(rows.nonEmpty)
    val langs = graft.Tables.t(spark, dir, "documents")
      .select("lang").distinct().count()
    assert(rows.length == langs, "one fit row per language")
    rows.foreach { r =>
      val (lang, n, slope, r2) =
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(4))
      assert(n >= 3, s"$lang: spectrum too small to fit ($n points)")
      assert(slope != -99.0 && slope < 0.0,
        s"$lang: rank-frequency slope $slope must be negative (power law)")
      assert(r2 > 0.0 && r2 <= 1.0, s"$lang: r2 $r2 outside (0, 1]")
    }
  }

  test("filter attribution outcomes partition the corpus") {
    val rows = TextOps.qFilterAttribution(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows.keySet.subsetOf(
      Set("kept", "r1_short", "r2_low_ttr", "r3_no_stopwords")))
    val nDocs = graft.Tables.t(spark, dir, "documents").count()
    assert(rows.values.sum == nDocs, "first-failure outcomes must sum to N")
    assert(rows.getOrElse("kept", 0L) > 0, "cascade must keep something")
  }

  test("shard manifest partitions the corpus with basis-point shares") {
    val rows = CorpusOps.qShardManifest(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 16)
    assert(rows.forall(r => "0123456789abcdef".contains(r._1)), "shard key not a hex digit")
    val nDocs = graft.Tables.t(spark, dir, "documents").count()
    assert(rows.map(_._2).sum == nDocs, "shards must partition the corpus")
    val bp = rows.map(_._4).sum
    assert(bp > 9900 && bp <= 10000, s"share_bp sums to $bp (div truncation allowed)")
  }

  test("reservoir sample returns exactly k rows per stratum, reproducibly") {
    val a = CorpusOps.qReservoirSample(spark, dir, k = 5).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    val byLang = a.groupBy(_._1)
    byLang.foreach { case (lang, g) =>
      assert(g.length == 5, s"$lang: expected exactly 5 samples")
      assert(g.map(_._2).sorted.toSeq == (1 to 5), s"$lang: ranks not 1..5")
    }
    val b = CorpusOps.qReservoirSample(spark, dir, k = 5).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(a == b, "sample must be deterministic across runs")
  }

  test("pareto skyline is mutually non-dominated and dominates everything else") {
    import org.apache.spark.sql.functions._
    val sky = CorpusOps.qParetoDocs(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(sky.nonEmpty)
    val pts = graft.Tables.t(spark, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .select(col("lang"),
        expr("(size(array_distinct(ws)) * 10000L) div size(ws)").as("q"),
        size(col("ws")).cast("long").as("len"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def dominates(a: (String, Long, Long), b: (String, Long, Long)): Boolean =
      a._1 == b._1 && a._2 >= b._2 && a._3 <= b._3 && (a._2 > b._2 || a._3 < b._3)
    sky.foreach { s1 =>
      assert(!sky.exists(s2 => dominates(s2, s1)),
        s"skyline point $s1 is dominated inside the skyline")
    }
    pts.filterNot(sky).foreach { p =>
      assert(sky.exists(s1 => dominates(s1, p)),
        s"non-skyline point $p is not dominated by any skyline point")
    }
  }

  test("url canonicalization strips chrome and only ever collapses") {
    val rows = CorpusOps.qUrlCanon(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, canon, collapsed) =>
      assert(canon <= n, s"$src: canonical forms exceed raw urls")
      assert(collapsed == n - canon, s"$src: collapse arithmetic")
      assert(canon > 0, s"$src: no canonical forms")
    }
    // at least one source must actually collapse something, else the
    // canonicalizer is a no-op on this corpus
    assert(rows.exists(_._4 > 0), "no URL ever collapsed")
  }

  test("weighted sample matches the window form and favors heavy docs") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val agg = CorpusOps.qWeightedSample(spark, dir, k = 4).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    agg.groupBy(_._1).foreach { case (lang, g) =>
      assert(g.map(_._2).sorted.toSeq == (1 to 4), s"$lang: ranks not 1..4")
    }
    // the bounded-aggregator selection must equal the full window sort
    // over the same integer priority (the q_grouped_topk proof pattern)
    val windowed = graft.Tables.t(spark, dir, "documents")
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("w"),
        expr("conv(substring(md5(concat(cast(doc_id AS string), ':', text)), 1, 6), 16, 10)")
          .cast("long").as("h"))
      .select(col("lang"), col("doc_id"),
        lpad(expr("(h * 100000L) div w").cast("string"), 16, "0").as("priority"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("priority"), col("doc_id"))))
      .filter(col("rk") <= 4)
      .select(col("lang"), col("rk"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(agg.sorted == windowed.sorted,
      "bounded min-k selection diverged from the window-sort form")
  }

  test("temperature mix weights sum to 1 and flatten toward uniform") {
    val rows = CorpusOps.qTemperatureMix(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val pSum = rows.map(_._2).sum
    val wSum = rows.map(_._3).sum
    assert(math.abs(pSum - 1.0) < 0.01, s"p sums to $pSum")
    assert(math.abs(wSum - 1.0) < 0.01, s"w sums to $wSum")
    // α < 1 compresses: sources above uniform share get damped, below get
    // boosted — w must be strictly between p and uniform on both sides
    val uniform = 1.0 / rows.length
    rows.foreach { case (src, p, w, epochs) =>
      if (p > uniform + 1e-3) assert(w < p, s"$src: dominant source not damped")
      if (p < uniform - 1e-3) assert(w > p, s"$src: rare source not boosted")
      assert(epochs > 0, s"$src: non-positive epoch count")
    }
  }

  test("token budget keeps at most half of each source's tokens, best-first") {
    val rows = CorpusOps.qTokenBudget(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, nKept, srcTokens, keptTokens, shareBp) =>
      assert(nKept <= nDocs, s"$src: kept more docs than exist")
      assert(keptTokens * 2 <= srcTokens,
        s"$src: budget breached ($keptTokens of $srcTokens)")
      assert(shareBp == keptTokens * 10000 / srcTokens, s"$src: share mismatch")
      assert(shareBp <= 5000, s"$src: share $shareBp above the 50% budget")
    }
    // the budget must actually select somewhere (not degenerate to empty)
    assert(rows.exists(_._3 > 0), "no source kept any document")
  }
}
