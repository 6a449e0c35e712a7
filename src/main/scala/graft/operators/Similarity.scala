package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.Tables.t

/** Similarity search over the `embeddings` table (`Array[Float]`, dim 64).
  *
  * Brute-force cosine top-k is the exact baseline: broadcast the (small)
  * query set against the corpus — a map-side-only join, no shuffle of the
  * corpus. The scale path is the LSH-bucketed variant: deterministic
  * random-hyperplane signatures bucket the corpus so only same-bucket
  * pairs are compared (candidate generation is a key-equality shuffle,
  * never an O(n²) cross join).
  *
  * All float math is promoted to double before accumulation so results are
  * reproducible against the DuckDB oracle after 4dp rounding.
  */
object Similarity {

  /** cosine numerator/denominator via the native codegen'd expressions in
    * [[graft.functions.VectorFunctions]] (double promotion, index-order
    * accumulation — bit-identical to the DuckDB oracle's fold). Norms are
    * separate so they can be precomputed per row (once) instead of per
    * candidate pair.
    */
  private val dotExpr = "vec_dot(qv, embedding)"
  private val normExpr = "vec_norm(embedding)"

  /** Brute-force cosine top-10 for each of 3 query vectors (vec_id 0..2)
    * against the rest of the corpus. The query side is broadcast (map-side
    * scoring, no corpus shuffle); ranking uses the bounded
    * [[graft.functions.TopKAggregator]] so only k candidates per query per
    * partition ever shuffle.
    */
  def qCosineTopK(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    import s.implicits._
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), expr(normExpr).as("nrm"))
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nrm").as("qnrm"))
    val scored = e.filter(col("vec_id") >= 3)
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        round(expr(dotExpr) / (col("qnrm") * col("nrm")), 4).as("cos_sim"))
    // ranking via the bounded top-k Aggregator: each map partition keeps
    // only k pairs per query, so the shuffle carries k rows per (query,
    // partition) instead of every scored row — the 100 TB shape (a window
    // row_number would shuffle + sort the full scored set). Tie-breaks
    // match row_number() OVER (ORDER BY cos_sim DESC, vec_id).
    scored.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._3, r._2))
      .agg(graft.functions.TopKAggregator.topK(10))
      .toDF("query_id", "top")
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "item")))
      .select(col("query_id"), col("item._2").as("vec_id"),
        col("item._1").as("cos_sim"), (col("pos") + 1).cast("long").as("rk"))
      .orderBy("query_id", "rk")
  }

  val qCosineTopKOracle: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
      |pairs AS (
      |  SELECT q.query_id, e.vec_id, unnest(q.qv)::DOUBLE AS x, unnest(e.embedding)::DOUBLE AS y
      |  FROM embeddings e CROSS JOIN q WHERE e.vec_id >= 3),
      |scored AS (
      |  SELECT query_id, vec_id,
      |    round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4) AS cos_sim
      |  FROM pairs GROUP BY query_id, vec_id),
      |ranked AS (
      |  SELECT query_id, vec_id, cos_sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rk
      |  FROM scored)
      |SELECT query_id, vec_id, cos_sim, rk FROM ranked WHERE rk <= 10
      |ORDER BY query_id, rk""".stripMargin

  /** Near-duplicate embedding pairs within each label partition (IVF-style
    * coarse partitioning: `label` plays the centroid-assignment role).
    *
    * Pair generation is a TRIANGLE-BLOCKED same-label self-join: each
    * vector hashes into one of `blocks` sub-cells, and every unordered
    * block pair (lo, hi) is its own join key, so one hot label at 100 TB
    * decomposes into B(B+1)/2 bounded tasks of ~(cell/B)² work instead of
    * one O(cell²) task — the exact-output form of the SkewUtils salting
    * idiom (each side replicates B times; a pair meets at exactly one key,
    * enforced by the (block_a, block_b) = (lo, hi) filter). Unlike an
    * LSH-bucket candidate join this is lossless: the pair set is identical
    * to the naive self-join, so the oracle match is exact. B is derived
    * per label from the observed cell size (ceil(cell / blockTarget)), so
    * a block pair's work is bounded by ~blockTarget² regardless of how
    * skewed the labels are; recall stays 100% at any B.
    */
  def qEmbeddingNearDup(s: SparkSession, dir: String, blockTarget: Long = 4096L): DataFrame = {
    // Norms are precomputed per vector BEFORE the pair join: per-pair work
    // drops from three array folds to one (the dot product). Same double
    // arithmetic, so the oracle match is unaffected.
    graft.functions.VectorFunctions.register(s)
    val base = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"), expr(normExpr).as("nrm"))
    nearDupPairs(base, blockTarget)
  }

  /** The triangle-blocked pair kernel over any (vec_id, label, embedding,
    * nrm) frame — shared by the standard query and the hot-label bench
    * stress (which remaps labels to manufacture a pathological cell).
    */
  private[graft] def nearDupPairs(base: DataFrame, blockTarget: Long): DataFrame = {
    // Block count adapts to the observed cell: one row-per-label pre-agg
    // (tiny — it is the distinct-label surface) broadcast back, so a hot
    // label gets ceil(cell / blockTarget) blocks while cold labels stay at
    // B=1 and pay zero replication. The lossless-meet proof only needs B
    // constant WITHIN a label, which a per-label count guarantees.
    val cells = base.groupBy("label").agg(count(lit(1)).as("cell_n"))
    val e = base.join(broadcast(cells), Seq("label"))
      .withColumn("nblk",
        greatest(lit(1L), ceil(col("cell_n").cast("double") / lit(blockTarget.toDouble))).cast("int"))
      .withColumn("blk", pmod(hash(col("vec_id")), col("nblk")))
      // replicate each row once per peer block k; the key is the unordered
      // block pair so (x in i, y in j) meets exactly at key (min(i,j), max(i,j))
      .withColumn("k", explode(sequence(lit(0), col("nblk") - 1)))
      .withColumn("lo", least(col("blk"), col("k")))
      .withColumn("hi", greatest(col("blk"), col("k")))
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("qv"),
      col("label"), col("nrm").as("nrm_a"), col("blk").as("blk_a"), col("lo"), col("hi"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding"),
      col("label"), col("nrm").as("nrm_b"), col("blk").as("blk_b"), col("lo"), col("hi"))
    a.join(b, Seq("label", "lo", "hi"))
      // keep each pair exactly once: the two blocks must BE the key pair
      .filter((col("blk_a") === col("lo") && col("blk_b") === col("hi")) ||
              (col("blk_a") === col("hi") && col("blk_b") === col("lo")))
      .filter(col("id_a") < col("id_b"))
      .select(col("label"), col("id_a"), col("id_b"),
        round(expr(dotExpr) / (col("nrm_a") * col("nrm_b")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= 0.3)
      .orderBy("id_a", "id_b")
  }

  val qEmbeddingNearDupOracle: String =
    """WITH pairs AS (
      |  SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
      |    unnest(a.embedding)::DOUBLE AS x, unnest(b.embedding)::DOUBLE AS y
      |  FROM embeddings a JOIN embeddings b
      |    ON a.label = b.label AND a.vec_id < b.vec_id),
      |scored AS (
      |  SELECT label, id_a, id_b,
      |    round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4) AS cos_sim
      |  FROM pairs GROUP BY label, id_a, id_b)
      |SELECT label, id_a, id_b, cos_sim FROM scored WHERE cos_sim >= 0.3
      |ORDER BY id_a, id_b""".stripMargin

  /** Random-hyperplane LSH bucketing: 8 deterministic pseudo-random
    * hyperplanes (components derived from index arithmetic, no RNG) hash
    * each vector to an 8-bit bucket; the query reports bucket occupancy —
    * the candidate-generation structure of approximate NN at scale.
    */
  // plane p, component j: ((p*131 + j*37) % 19) - 9 (deterministic,
  // zero-mean-ish). Planes are materialized as float-array literals and
  // dotted with the codegen'd vec_dot — the nested-HOF formulation paid
  // 8×64 interpreted lambda calls per row. Same index-order double
  // accumulation, so bucket assignment is reproducible in the DuckDB
  // oracle's CASE-sum form. Shared by qLshBuckets (occupancy report) and
  // qAnnNearDup (candidate generation).
  private def hyperplaneBucket: Column = {
    def planeSql(p: Int): String =
      (0 until 64).map(j => s"CAST(${(p * 131 + j * 37) % 19 - 9} AS FLOAT)")
        .mkString("array(", ", ", ")")
    (0 until 8).map { p =>
      expr(s"CASE WHEN vec_dot(embedding, ${planeSql(p)}) > 0 " +
        s"THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
    }.reduce(_ + _)
  }

  def qLshBuckets(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = t(s, dir, "embeddings")
    e.select(col("vec_id"), col("label"), hyperplaneBucket.as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vecs"), countDistinct("label").as("n_labels"))
      .orderBy("bucket")
  }

  val qLshBucketsOracle: String =
    """WITH comp AS (
      |  SELECT vec_id, label, p.p AS p,
      |    sum((e.emb[j.j + 1])::DOUBLE * ((p.p * 131 + j.j * 37) % 19 - 9)) AS dot
      |  FROM (SELECT vec_id, label, embedding AS emb FROM embeddings) e,
      |       range(8) AS p(p), range(64) AS j(j)
      |  GROUP BY vec_id, label, p.p),
      |buckets AS (
      |  SELECT vec_id, label,
      |    CAST(sum(CASE WHEN dot > 0 THEN CAST(2 ** p AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM comp GROUP BY vec_id, label)
      |SELECT bucket, count(*) AS n_vecs, count(DISTINCT label) AS n_labels
      |FROM buckets GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Approximate-NN near-dup: candidate pairs are generated by equality on
    * (label, hyperplane-bucket) — the sub-quadratic path the exact
    * triangle-block can't be. Where qEmbeddingNearDup bounds the *task*
    * size but still pays O(cell²) compute inside a label, this join only
    * scores pairs whose 8-bit random-hyperplane signatures collide, so the
    * compute surface is Σ bucket², a ~256× reduction under a uniform hash.
    * Recall is approximate by design (near pairs may straddle buckets; more
    * bands would raise it); because the planes are deterministic the exact
    * same candidate set is expressible in DuckDB, so this is oracle-checked
    * rather than rows-only.
    */
  def qAnnNearDup(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"), expr(normExpr).as("nrm"),
        hyperplaneBucket.as("bucket"))
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("qv"),
      col("label"), col("bucket"), col("nrm").as("nrm_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding"),
      col("label"), col("bucket"), col("nrm").as("nrm_b"))
    a.join(b, Seq("label", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("label"), col("id_a"), col("id_b"),
        round(expr(dotExpr) / (col("nrm_a") * col("nrm_b")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= 0.3)
      .orderBy("id_a", "id_b")
  }

  val qAnnNearDupOracle: String =
    """WITH comp AS (
      |  SELECT vec_id, label, p.p AS p,
      |    sum((e.emb[j.j + 1])::DOUBLE * ((p.p * 131 + j.j * 37) % 19 - 9)) AS dot
      |  FROM (SELECT vec_id, label, embedding AS emb FROM embeddings) e,
      |       range(8) AS p(p), range(64) AS j(j)
      |  GROUP BY vec_id, label, p.p),
      |buckets AS (
      |  SELECT vec_id, label,
      |    CAST(sum(CASE WHEN dot > 0 THEN CAST(2 ** p AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM comp GROUP BY vec_id, label),
      |cand AS (
      |  SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM buckets a JOIN buckets b
      |    ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
      |pairs AS (
      |  SELECT c.label, c.id_a, c.id_b,
      |    unnest(ea.embedding)::DOUBLE AS x, unnest(eb.embedding)::DOUBLE AS y
      |  FROM cand c
      |  JOIN embeddings ea ON ea.vec_id = c.id_a
      |  JOIN embeddings eb ON eb.vec_id = c.id_b),
      |scored AS (
      |  SELECT label, id_a, id_b,
      |    round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4) AS cos_sim
      |  FROM pairs GROUP BY label, id_a, id_b)
      |SELECT label, id_a, id_b, cos_sim FROM scored WHERE cos_sim >= 0.3
      |ORDER BY id_a, id_b""".stripMargin

  /** IVF coarse-quantizer assignment: each corpus vector is assigned to
    * its nearest of K=8 deterministic seed centroids (the first 8 vectors)
    * by cosine argmax — the k-means-assignment step that builds a real IVF
    * index (where qEmbeddingNearDup uses `label` as a stand-in cell key).
    * Centroids broadcast (map-side scoring, the corpus never shuffles for
    * scoring); the argmax is a per-vector window over K rows. Per-cell
    * occupancy plus an EXACT integer checksum of assigned similarities
    * (4dp-scaled sum — order-independent, unlike a float avg).
    */
  def qIvfAssign(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), expr(normExpr).as("nrm"))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("embedding").as("qv"),
        col("nrm").as("cnrm"))
    val scored = e.filter(col("vec_id") >= 8)
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cent_id"),
        (expr(dotExpr) / (col("cnrm") * col("nrm"))).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cos").desc, col("cent_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .groupBy("cent_id")
      .agg(count(lit(1)).as("n_vecs"),
        sum(round(col("cos") * 10000).cast("long")).as("sum_cos4"))
      .orderBy("cent_id")
  }

  val qIvfAssignOracle: String =
    """WITH cent AS (
      |  SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id < 8),
      |pairs AS (
      |  SELECT e.vec_id, c.cent_id,
      |    unnest(e.embedding)::DOUBLE AS x, unnest(c.cv)::DOUBLE AS y
      |  FROM embeddings e CROSS JOIN cent c WHERE e.vec_id >= 8),
      |scored AS (
      |  SELECT vec_id, cent_id,
      |    sum(x * y) / (sqrt(sum(y * y)) * sqrt(sum(x * x))) AS cos
      |  FROM pairs GROUP BY vec_id, cent_id),
      |assigned AS (
      |  SELECT vec_id, cent_id, cos,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rk
      |  FROM scored)
      |SELECT cent_id, count(*) AS n_vecs,
      |  CAST(sum(CAST(round(cos * 10000) AS BIGINT)) AS BIGINT) AS sum_cos4
      |FROM assigned WHERE rk = 1
      |GROUP BY cent_id ORDER BY cent_id""".stripMargin

  /** IVF top-k SEARCH — the query-time half of the IVF index whose build
    * step is [[qIvfAssign]]: each query ranks the K=8 coarse centroids,
    * probes its `nprobe`=2 nearest cells, and exact-scores ONLY the
    * corpus vectors assigned to those cells. Scale shape: the centroid
    * table and the query set broadcast (corpus never shuffles to score);
    * the probe is a key-equality join on cent_id — the fraction of the
    * corpus touched is nprobe/K regardless of corpus size, which is the
    * entire point of IVF at 100 TB. Ranking uses the bounded
    * [[graft.functions.TopKAggregator]] (k rows per query per partition
    * shuffle, same as [[qCosineTopK]]).
    */
  def qIvfSearch(s: SparkSession, dir: String, nprobe: Int = 2, k: Int = 5): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    import s.implicits._
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), expr(normExpr).as("nrm"))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("embedding").as("qv"), col("nrm").as("cnrm"))
    // corpus→cell assignment (argmax cosine over the broadcast centroids —
    // identical arithmetic + tie-break to qIvfAssign, so the index agrees)
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cos").desc, col("cent_id").asc)
    val assigned = e.filter(col("vec_id") >= 8)
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"),
        (expr(dotExpr) / (col("cnrm") * col("nrm"))).as("cos"))
      .withColumn("rk", row_number().over(wAssign)).filter(col("rk") === 1)
      .select("vec_id", "embedding", "nrm", "cent_id")
    // query→probe-cell list: same centroid scoring, keep top nprobe cells
    val queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 11)
      .select(col("vec_id").as("query_id"), col("embedding").as("qemb"), col("nrm").as("qnrm"))
    val probes = queries
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("qemb"), col("qnrm"), col("cent_id"),
        expr("vec_dot(qv, qemb)").divide(col("cnrm") * col("qnrm")).as("cos"))
      .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("cos").desc, col("cent_id").asc)))
      .filter(col("rk") <= nprobe)
      .select(col("query_id"), col("qemb").as("qv"), col("qnrm"), col("cent_id"))
    // probe join: corpus side keyed by its assigned cell; query side is
    // tiny (queries × nprobe) and broadcast — only nprobe/K of the corpus
    // is ever scored
    val scored = assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(expr(dotExpr) / (col("qnrm") * col("nrm")), 4).as("cos_sim"))
    scored.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._3, r._2))
      .agg(graft.functions.TopKAggregator.topK(k))
      .toDF("query_id", "top")
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "item")))
      .select(col("query_id"), col("item._2").as("vec_id"),
        col("item._1").as("cos_sim"), (col("pos") + 1).cast("long").as("rk"))
      .orderBy("query_id", "rk")
  }

  val qIvfSearchOracle: String =
    """WITH cent AS (
      |  SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id < 8),
      |cpairs AS (
      |  SELECT e.vec_id, c.cent_id,
      |    unnest(e.embedding)::DOUBLE AS x, unnest(c.cv)::DOUBLE AS y
      |  FROM embeddings e CROSS JOIN cent c WHERE e.vec_id >= 8),
      |cscored AS (
      |  SELECT vec_id, cent_id, sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS cos
      |  FROM cpairs GROUP BY vec_id, cent_id),
      |assigned AS (
      |  SELECT vec_id, cent_id FROM (
      |    SELECT vec_id, cent_id,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rk
      |    FROM cscored) a WHERE rk = 1),
      |probes AS (
      |  SELECT vec_id AS query_id, cent_id FROM (
      |    SELECT vec_id, cent_id,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rk
      |    FROM cscored WHERE vec_id BETWEEN 8 AND 10) p WHERE rk <= 2),
      |cand AS (
      |  SELECT p.query_id, a.vec_id
      |  FROM probes p JOIN assigned a ON a.cent_id = p.cent_id AND a.vec_id <> p.query_id),
      |qpairs AS (
      |  SELECT c.query_id, c.vec_id,
      |    unnest(eq.embedding)::DOUBLE AS x, unnest(ev.embedding)::DOUBLE AS y
      |  FROM cand c
      |  JOIN embeddings eq ON eq.vec_id = c.query_id
      |  JOIN embeddings ev ON ev.vec_id = c.vec_id),
      |qscored AS (
      |  SELECT query_id, vec_id,
      |    round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4) AS cos_sim
      |  FROM qpairs GROUP BY query_id, vec_id),
      |ranked AS (
      |  SELECT query_id, vec_id, cos_sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rk
      |  FROM qscored)
      |SELECT query_id, vec_id, cos_sim, rk FROM ranked WHERE rk <= 5
      |ORDER BY query_id, rk""".stripMargin

  /** One Lloyd (k-means) iteration over the IVF coarse quantizer: assign
    * every corpus vector to its nearest seed centroid (identical to
    * [[qIvfAssign]]) and re-accumulate the centroid sums. Accumulation is
    * FIXED-POINT (each float component is exactly widened to double,
    * scaled ×10000 and rounded to an integer BEFORE summing) so the
    * update is order-independent — a float sum over a shuffled 100 TB
    * partitioning is not reproducible, an integer sum is. This is the
    * deterministic-distributed-k-means trick, and what makes the step
    * oracle-checkable bit-for-bit. Output: per-centroid member count and
    * the fixed-point sums of the first 3 dimensions (the new centroid is
    * sum/n in 1e-4 units).
    */
  def qKmeansStep(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), expr(normExpr).as("nrm"))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("embedding").as("qv"), col("nrm").as("cnrm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cos").desc, col("cent_id").asc)
    e.filter(col("vec_id") >= 8)
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        (expr(dotExpr) / (col("cnrm") * col("nrm"))).as("cos"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .groupBy("cent_id")
      .agg(count(lit(1)).as("n_vecs"),
        sum(round(element_at(col("embedding"), 1).cast("double") * 10000).cast("long")).as("sum_d1"),
        sum(round(element_at(col("embedding"), 2).cast("double") * 10000).cast("long")).as("sum_d2"),
        sum(round(element_at(col("embedding"), 3).cast("double") * 10000).cast("long")).as("sum_d3"))
      .orderBy("cent_id")
  }

  val qKmeansStepOracle: String =
    """WITH cent AS (
      |  SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id < 8),
      |pairs AS (
      |  SELECT e.vec_id, c.cent_id,
      |    unnest(e.embedding)::DOUBLE AS x, unnest(c.cv)::DOUBLE AS y
      |  FROM embeddings e CROSS JOIN cent c WHERE e.vec_id >= 8),
      |scored AS (
      |  SELECT vec_id, cent_id, sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS cos
      |  FROM pairs GROUP BY vec_id, cent_id),
      |assigned AS (
      |  SELECT vec_id, cent_id FROM (
      |    SELECT vec_id, cent_id,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rk
      |    FROM scored) a WHERE rk = 1)
      |SELECT a.cent_id, count(*) AS n_vecs,
      |  CAST(sum(CAST(round(e.embedding[1]::DOUBLE * 10000) AS BIGINT)) AS BIGINT) AS sum_d1,
      |  CAST(sum(CAST(round(e.embedding[2]::DOUBLE * 10000) AS BIGINT)) AS BIGINT) AS sum_d2,
      |  CAST(sum(CAST(round(e.embedding[3]::DOUBLE * 10000) AS BIGINT)) AS BIGINT) AS sum_d3
      |FROM assigned a JOIN embeddings e ON e.vec_id = a.vec_id
      |GROUP BY a.cent_id ORDER BY a.cent_id""".stripMargin

  /** Per-vector int8 quantization (min/max affine, 0..255): the storage
    * transform that shrinks a 100 TB float corpus 4×. Output keeps the
    * exact per-vector range and the INTEGER sum of quantized codes —
    * integer arithmetic, so the check is order-independent and exact.
    */
  def qQuantize(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"),
        expr("array_min(transform(embedding, x -> CAST(x AS DOUBLE)))").as("mn"),
        expr("array_max(transform(embedding, x -> CAST(x AS DOUBLE)))").as("mx"),
        col("embedding"))
      .select(col("vec_id"), col("mn"), col("mx"),
        expr("""CASE WHEN mx = mn THEN 0L ELSE
          | aggregate(embedding, 0L,
          |   (acc, x) -> acc + floor((CAST(x AS DOUBLE) - mn) / ((mx - mn) / 255.0D) + 0.5D))
          |END""".stripMargin).as("q_sum"))
      .orderBy("vec_id")

  val qQuantizeOracle: String =
    """SELECT vec_id,
      | list_min(list_transform(embedding, x -> x::DOUBLE)) AS mn,
      | list_max(list_transform(embedding, x -> x::DOUBLE)) AS mx,
      | CASE WHEN list_max(list_transform(embedding, x -> x::DOUBLE)) = list_min(list_transform(embedding, x -> x::DOUBLE)) THEN 0
      |  ELSE CAST(list_sum(list_transform(embedding, x ->
      |    floor((x::DOUBLE - list_min(list_transform(embedding, y -> y::DOUBLE)))
      |      / ((list_max(list_transform(embedding, y -> y::DOUBLE)) - list_min(list_transform(embedding, y -> y::DOUBLE))) / 255.0) + 0.5))) AS BIGINT)
      | END AS q_sum
      |FROM embeddings ORDER BY vec_id""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_cosine_topk", qCosineTopK, Some(qCosineTopKOracle)),
    QueryDef("q_embedding_near_dup", (s, d) => qEmbeddingNearDup(s, d),
      Some(qEmbeddingNearDupOracle)),
    QueryDef("q_ann_near_dup", qAnnNearDup, Some(qAnnNearDupOracle)),
    QueryDef("q_lsh_buckets", qLshBuckets, Some(qLshBucketsOracle)),
    QueryDef("q_ivf_assign", qIvfAssign, Some(qIvfAssignOracle)),
    QueryDef("q_ivf_search", (s, d) => qIvfSearch(s, d), Some(qIvfSearchOracle)),
    QueryDef("q_kmeans_step", qKmeansStep, Some(qKmeansStepOracle)),
    QueryDef("q_quantize", qQuantize, Some(qQuantizeOracle)),
  )
}
