package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.Tables.t

/** Duplicate-cluster operators — the step AFTER pairwise near-dup
  * detection in a real training-data pipeline: near-dup pairs form a
  * graph, and what the pipeline actually deletes is "every doc in a
  * connected component except one representative". Pairs alone
  * under-delete (A~B, B~C but A,C never compared) — component closure is
  * what makes dedup transitive.
  *
  * Reference scope: the reference engine has no graph step (it delegated
  * set logic to the warehouse); this is part of the LLM-pipeline surface
  * the builder prompt adds on top (SURVEY §6).
  */
object ClusterOps {

  /** Connected components over MinHash-LSH verified near-dup edges
    * (jaccard ≥ 0.8, same kernel as [[Dedup.qMinhashLsh]]), by iterative
    * min-label propagation: every node starts labeled with its own id and
    * repeatedly takes the min label over itself and its neighbors until a
    * fixpoint. Converges in O(component diameter) rounds — near-dup
    * clusters are dense and shallow, so a handful of rounds in practice;
    * `maxIter` is a guard, and falling out of it early would only split a
    * giant chain, never merge two components (labels only move DOWN along
    * existing edges), so results stay a refinement — the fixpoint check
    * makes the output exact.
    *
    * Scale shape: the label frame is one row per NON-SINGLETON doc (docs
    * with no near-dup never enter the graph — at 100 TB that is the vast
    * majority, filtered out before any iteration). Each round is one
    * key-equality shuffle of (id, label) pairs — never the corpus, never
    * doc × doc. `localCheckpoint` truncates the growing lineage each
    * round (on a real cluster, `sparkContext.setCheckpointDir` + reliable
    * checkpoint); the convergence probe is a scalar count, not a collect.
    * For adversarial graphs (long chains) the doubling variant
    * (large-star/small-star) bounds rounds at O(log n); near-dup graphs
    * don't need it.
    *
    * Output: one row per duplicate cluster (representative = min doc_id,
    * member count, max member) — the "keep one, drop n-1" manifest.
    */
  def qDedupClusters(s: SparkSession, dir: String, maxIter: Int = 20): DataFrame = {
    val grams = Dedup.gramsOf(t(s, dir, "documents")).persist()
    val bands = Dedup.bandsOf(Dedup.sigOf(grams))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_sig") === col("b.band_sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val pairs = Dedup.verifyPairs(cand, grams, 0.8).select("doc_a", "doc_b")
    // undirected edge list, materialized once (reused every round)
    val edges = pairs
      .union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
      .persist()

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(true)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val prop = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
      val next = labels.select("id", "lbl").union(prop)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint(true) // materialize + truncate lineage per round
      val changed = next.as("n").join(labels.as("p"), col("n.id") === col("p.id"))
        .filter(col("n.lbl") =!= col("p.lbl"))
        .limit(1).count() // scalar fixpoint probe (any-change, not full count)
      labels = next
      converged = changed == 0
      it += 1
    }
    grams.unpersist()
    edges.unpersist() // labels is checkpointed — safe to release upstream
    labels.groupBy(col("lbl").as("cluster_rep"))
      .agg(count(lit(1)).as("n_docs"), max("id").as("max_doc"))
      .orderBy("cluster_rep")
  }

  val qDedupClustersOracle: String =
    s"""WITH RECURSIVE ${Dedup.lshCtesDuck()},
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands2 a JOIN bands2 b
      |    ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
      |pairs AS (SELECT doc_a, doc_b FROM (${Dedup.lshVerifySelectDuck("0.8")}) v),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach AS (
      |  SELECT src AS id, src AS lbl FROM edges
      |  UNION
      |  SELECT e.dst AS id, reach.lbl FROM reach JOIN edges e ON e.src = reach.id),
      |comp AS (SELECT id, min(lbl) AS cluster_rep FROM reach GROUP BY id)
      |SELECT cluster_rep, count(*) AS n_docs, max(id) AS max_doc
      |FROM comp GROUP BY cluster_rep ORDER BY cluster_rep""".stripMargin

  /** Cross-corpus near-duplicate dedup (decontamination at the DOCUMENT
    * level, complementing [[CorpusOps.qContamination]]'s n-gram overlap):
    * flag every train-corpus doc whose MinHash signature band-collides
    * with any reference-corpus doc AND verifies at Jaccard ≥ 0.8. The
    * reference corpus here is sources src0..src3 (a held-out eval set);
    * everything else is train.
    *
    * Scale shape: one banded signature pass over the union, then a
    * train×ref join restricted to equal (band_idx, band_sig) — candidate
    * generation is key-equality, never train × ref. The ref side of the
    * band join is the small side (eval sets are tiny next to a 100 TB
    * train corpus) and broadcastable; flagged-doc distinct is one narrow
    * shuffle of doc ids.
    */
  def qCrossDedup(s: SparkSession, dir: String): DataFrame = {
    val refSrcs = (0 until 4).map(i => s"src$i")
    val docs = t(s, dir, "documents")
    val grams = Dedup.gramsOf(docs, "source").persist()
    val bands = Dedup.bandsOf(Dedup.sigOf(grams, "source"), "source").persist()
    val cand = bands.filter(!col("source").isInCollection(refSrcs)).as("a")
      .join(bands.filter(col("source").isInCollection(refSrcs)).as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_sig") === col("b.band_sig"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val flagged = Dedup.verifyPairs(cand, grams, 0.8)
      .select(col("doc_a").as("doc_id")).distinct()
      .withColumn("flag", lit(1L))
    docs.filter(!col("source").isInCollection(refSrcs))
      .select("doc_id", "source")
      .join(flagged, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("flag"), lit(0L))).as("n_flagged"))
      .orderBy("source")
  }

  val qCrossDedupOracle: String = {
    val refs = (0 until 4).map(i => s"'src$i'").mkString(", ")
    s"""WITH ${Dedup.lshCtesDuck(Seq("source"))},
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands2 a JOIN bands2 b
      |    ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
      |  WHERE a.source NOT IN ($refs) AND b.source IN ($refs)),
      |flagged AS (
      |  SELECT DISTINCT doc_a AS doc_id FROM (${Dedup.lshVerifySelectDuck("0.8")}) v)
      |SELECT d.source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
      |FROM documents d LEFT JOIN flagged f ON f.doc_id = d.doc_id
      |WHERE d.source NOT IN ($refs)
      |GROUP BY d.source ORDER BY d.source""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_dedup_clusters", (s, d) => qDedupClusters(s, d), Some(qDedupClustersOracle)),
    QueryDef("q_cross_dedup", qCrossDedup, Some(qCrossDedupOracle)),
  )
}
