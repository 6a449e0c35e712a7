package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Curation operators: semantic-dedup accounting, DSIR weight direction,
  * cross-entropy scoring, and containment bounds.
  */
class CurationOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("semdedup partitions every vector and keeps+removes add up") {
    val rows = CurationOps.qSemDedup(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = graft.Tables.t(spark, dir, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == total, "cells must cover all vectors")
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        s"cell ${r.getLong(0)}: kept + removed != occupancy")
      assert(r.getLong(3) >= 1, "a nonempty cell keeps at least one representative")
    }
  }

  test("importance weights favor the target language") {
    val rows = CurationOps.qImportanceWeights(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.contains("en"))
    val docTotal = graft.Tables.t(spark, dir, "documents").count()
    assert(rows.values.map(_._1).sum == docTotal)
    // the target split must score higher on its own likelihood ratio than
    // the weighted rest: per-doc average weight, en vs non-en
    val (enN, _, enSum) = rows("en")
    val others = rows.view.filterKeys(_ != "en").values
    val othersAvg = others.map(_._3).sum.toDouble / others.map(_._1).sum
    assert(enSum.toDouble / enN > othersAvg,
      s"en avg weight ${enSum.toDouble / enN} not above rest $othersAvg")
  }

  test("unigram cross-entropy covers all docs with positive scores") {
    val rows = CurationOps.qUnigramCe(spark, dir).collect()
    val docTotal = graft.Tables.t(spark, dir, "documents").count()
    assert(rows.map(_.getLong(1)).sum == docTotal)
    rows.foreach { r =>
      assert(r.getLong(3) > 0, s"${r.getString(0)}: CE must be positive")
      assert(r.getLong(2) <= r.getLong(1), "flagged docs bounded by doc count")
    }
  }

  test("bigram CE covers all docs and the held-out split scores higher") {
    val rows = CurationOps.qBigramCe(spark, dir).collect()
    val docTotal = graft.Tables.t(spark, dir, "documents").count()
    assert(rows.map(_.getLong(2)).sum == docTotal, "splits×langs must cover the corpus")
    rows.foreach { r =>
      assert(r.getLong(4) > 0, s"${r.getString(0)}/${r.getString(1)}: CE must be positive")
      assert(r.getLong(3) <= r.getLong(2), "flagged docs bounded by doc count")
    }
    // the generalization gap: the model trained on doc_id % 10 != 0 must
    // assign HIGHER average CE to held-out docs than to its own training
    // slice (it has seen the train transitions verbatim) — aggregated
    // over langs so per-lang noise at sf0.001 cannot flip the sign
    val bySplit = rows.groupBy(_.getString(1)).view.mapValues { rs =>
      rs.map(_.getLong(4)).sum.toDouble / rs.map(_.getLong(2)).sum
    }.toMap
    assert(bySplit("held") > bySplit("train"),
      s"held avg CE ${bySplit("held")} not above train ${bySplit("train")}")
  }

  test("bigram CE keeps sub-2-word docs in coverage via the unigram floor") {
    // a fixture with single-word docs in BOTH splits: before the
    // unigram-floor arm these had no transition rows and silently
    // vanished from the per-(lang, split) n_docs
    import spark.implicits._
    val fixDir = graft.core.TempDirs.create("bigram_fix_").toString
    Seq(
      (0L, "alpha beta gamma", "en"),
      (1L, "alpha", "en"), // train split, no transitions
      (2L, "beta gamma alpha beta", "en"),
      (10L, "gamma", "en"), // held split, no transitions
      (11L, "alpha beta alpha", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$fixDir/documents.parquet")
    val rows = CurationOps.qBigramCe(spark, fixDir).collect()
    assert(rows.map(_.getLong(2)).sum == 5,
      "single-word docs must not vanish from the coverage counts")
    rows.foreach(r => assert(r.getLong(4) > 0,
      s"${r.getString(0)}/${r.getString(1)}: CE must stay positive"))
  }

  test("containment scores are asymmetric-Jaccard bounded and eval-keyed") {
    // the loan-pattern handle releases ONLY containment's gram table —
    // suites share the session in parallel, so a clearCache() here would
    // race other suites' pinned caches
    val (df, release) = CurationOps.containment(spark, dir)
    val rows = try df.collect() finally release()
    rows.foreach { r =>
      assert(r.getLong(0) % 10 == 0, "left side must be an eval doc")
      assert(r.getLong(1) % 10 != 0, "right side must be a train doc")
      val c = r.getDouble(2)
      assert(c >= 0.3 && c <= 1.0, s"containment $c outside [0.3, 1]")
    }
  }

  test("containment df cap pins min(n/20, 512): the 512 branch binds above 10,240 docs") {
    // The round-15 cap law's ABSOLUTE branch activates only when
    // n/20 > dfCap (n > 10,240 at the default 512) — below that, the
    // sf0.01 gate and sf0.1 bench exercise only the 5%-fraction branch,
    // so this corpus is built to make the two branches produce DIFFERENT
    // answers and asserts both against hand-derived expectations
    // (round-16 verdict item 1c).
    //
    // 12,000 docs (n/20 = 600 > 512): one boilerplate 4-gram shared by
    // eval doc 0 and 559 train docs (df = 560 — above 512, below 600),
    // one true contamination pair (eval 20 / train 3, df = 2), and
    // 11,438 unique-gram fillers.
    import spark.implicits._
    val boilTrain = (1 to 559).map(k => 10 * k + 1) // ≡1 mod 10 → all train
    val taken = boilTrain.map(_.toLong).toSet ++ Set(0L, 20L, 3L)
    val docs =
      Seq((0L, "b1 b2 b3 b4"), (20L, "c1 c2 c3 c4"), (3L, "c1 c2 c3 c4")) ++
        boilTrain.map(i => (i.toLong, "b1 b2 b3 b4")) ++
        (0 until 12000).map(_.toLong).filterNot(taken)
          .map(i => (i, s"u${i}a u${i}b u${i}c u${i}d"))
    assert(docs.size == 12000)
    val tmp = graft.core.TempDirs.create("graft-containment-cap")
    docs.toDF("doc_id", "text").repartition(4)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    // default cap (512): the df-560 boilerplate gram is excluded, so the
    // ONLY surviving pair is the true contamination pair
    val (capped, rel1) = CurationOps.containment(spark, tmp.toString)
    val gotCapped = try capped.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq finally rel1()
    assert(gotCapped == Seq((20L, 3L, 1.0)),
      s"512 branch must drop the df-560 boilerplate pairs, got: $gotCapped")

    // same corpus at dfCapAbs=600 (the pre-cap n/20 law): the boilerplate
    // gram survives and manufactures 559 spurious pairs — the df² surface
    // the absolute cap exists to bound
    val (uncapped, rel2) = CurationOps.containment(spark, tmp.toString, dfCapAbs = 600L)
    val gotUncapped = try uncapped.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq finally rel2()
    assert(gotUncapped.size == 560, s"n/20 law must keep df-560 gram: ${gotUncapped.size}")
    assert(gotUncapped.contains((20L, 3L, 1.0)))
    boilTrain.foreach(t => assert(gotUncapped.contains((0L, t.toLong, 1.0))))

    // the knob and the mirrored oracle can never disagree: the oracle SQL
    // interpolates the same class-init value the Spark plan defaults to,
    // and a per-call cap override has a matching oracle builder so the
    // pairing survives parameterized use too (round-16 review)
    assert(CurationOps.qContainmentOracle.contains(
      s"least(count(*) // 20, ${CurationOps.containmentDfCap})"))
    assert(CurationOps.qContainmentOracle ==
      CurationOps.containmentOracleSql())
    assert(CurationOps.containmentOracleSql(600L).contains(
      "least(count(*) // 20, 600)"))
  }

  test("leakage split covers the corpus, proves zero split-crossing clusters") {
    val rows = CurationOps.qLeakageSplit(spark, dir).collect()
    val total = graft.Tables.t(spark, dir, "documents").count()
    assert(rows.map(_.getString(0)).toSet == Set("test", "train"))
    assert(rows.map(_.getLong(1)).sum == total, "splits must partition the corpus")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "clusters cannot outnumber docs")
      assert(r.getLong(4) == 0L,
        "split is a function of the cluster rep, so no cluster may cross")
    }
    // ~75/25 by construction (12 of 16 hex digits): at 600 docs the
    // train share should land well inside [0.55, 0.9]
    val m = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val share = m("train").toDouble / total
    assert(share > 0.55 && share < 0.9, s"train share $share off the 75% design")
  }

  test("leakage split assignment is stable under corpus growth") {
    // The claimed property, tested on the actual per-doc assignments:
    // run the split on a SUBSET corpus and on the full corpus; every doc
    // whose cluster MEMBERSHIP is identical in both runs must keep its
    // side. (Docs whose cluster gained members may legitimately move —
    // their representative can change — so they are excluded, but the
    // unchanged clusters are the overwhelming majority and must be
    // non-trivially many for the test to mean anything.)
    import org.apache.spark.sql.functions.col
    val full = graft.Tables.t(spark, dir, "documents")
    val cutoff = full.agg(org.apache.spark.sql.functions
      .expr("percentile_approx(doc_id, 0.6)")).head().getLong(0)
    val subsetDir = graft.core.TempDirs.create("leakage_subset")
    full.filter(col("doc_id") <= cutoff)
      .write.mode("overwrite").parquet(subsetDir.resolve("documents.parquet").toString)

    def byCluster(d: String): Map[Long, (Set[Long], String)] =
      CurationOps.leakageAssignments(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
        .groupBy(_._2)
        .map { case (c, ms) => c -> (ms.map(_._1).toSet, ms.head._3) }

    val sub = byCluster(subsetDir.toString)
    val fullRun = byCluster(dir)
    val unchanged = sub.keys.filter(c =>
      fullRun.get(c).exists(_._1 == sub(c)._1)).toSeq
    assert(unchanged.size > sub.size / 2,
      s"too few unchanged clusters (${unchanged.size}/${sub.size}) to prove anything")
    unchanged.foreach { c =>
      assert(sub(c)._2 == fullRun(c)._2,
        s"cluster $c kept its membership but flipped side " +
          s"${sub(c)._2} -> ${fullRun(c)._2} when the corpus grew")
    }
  }
}
