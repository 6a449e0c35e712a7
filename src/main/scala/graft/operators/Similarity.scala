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
  private[operators] val dotExpr = "vec_dot(qv, embedding)"
  private[operators] val normExpr = "vec_norm(embedding)"

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
    // Block counts adapt to the OBSERVED cells. The per-label count
    // surface is bounded by label cardinality — the IVF-cell count, a
    // model-sized quantity like the driver-held centroids, never
    // data-scale — so it is collected and folded into the plan as
    // literals instead of a pre-agg + broadcast join: the corpus is
    // scanned once for counting (a pruned label-only parquet scan) and
    // once for pairing, with zero join to attach block counts.
    val cellRows = base.groupBy("label").agg(count(lit(1)).as("cell_n")).collect()
    val needsBlocking = cellRows.exists(_.getLong(1) > blockTarget)
    val scored =
      if (!needsBlocking) {
        // fast path — every cell already fits a task: plain same-label
        // self-join, no replication columns, no meet filter
        val a = base.select(col("vec_id").as("id_a"), col("embedding").as("qv"),
          col("label"), col("nrm").as("nrm_a"))
        val b = base.select(col("vec_id").as("id_b"), col("embedding"),
          col("label"), col("nrm").as("nrm_b"))
        a.join(b, Seq("label")).filter(col("id_a") < col("id_b"))
      } else {
        // skewed path: a hot label gets ceil(cell / blockTarget) blocks
        // (cold labels stay at B=1, paying zero replication); every
        // unordered block pair (lo, hi) is its own join key, so the hot
        // cell decomposes into B(B+1)/2 bounded tasks. The lossless-meet
        // proof only needs B constant WITHIN a label, which the per-label
        // literal map guarantees.
        val nblkByLabel = cellRows.map { r =>
          r.getInt(0) -> math.max(1L, math.ceil(r.getLong(1).toDouble / blockTarget).toLong).toInt
        }.toMap
        val e = base
          .withColumn("nblk", coalesce(
            element_at(typedLit(nblkByLabel), col("label")), lit(1)))
          .withColumn("blk", pmod(hash(col("vec_id")), col("nblk")))
          // replicate each row once per peer block k; a pair (x in i, y in j)
          // meets exactly at key (min(i,j), max(i,j))
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
      }
    scored
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

  /** The K=8 seed centroids (first 8 vectors) pulled to the driver — the
    * bounded-row shape every distributed k-means uses between Lloyd
    * iterations (MLlib holds centroids on the driver too): K is a model
    * hyperparameter, never data-scale. The norm replicates vec_norm's
    * left-to-right double accumulation exactly, so literal-side arithmetic
    * is bit-identical to the expression path (and the DuckDB oracle).
    */
  private[operators] def seedCentroids(e: DataFrame): Seq[(Long, Seq[Float], Double)] =
    e.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding"))
      .collect().toSeq
      .map { r =>
        val cs = r.getSeq[Float](1)
        var acc = 0.0
        cs.foreach(x => acc += x.toDouble * x.toDouble)
        (r.getLong(0), cs, math.sqrt(acc))
      }.sortBy(_._1)

  /** Per-row centroid scores as an array<struct(cos, nc, cent_id)> over
    * LITERAL centroids: assignment/probing is a narrow per-row expression —
    * zero corpus shuffle, no K× row replication, no window sort (the
    * previous formulation window-ranked corpus×K rows, a needless
    * corpus-wide exchange at scale). Struct max order = (cos desc, then
    * nc = -cent_id desc ⇒ smallest cent_id), matching the oracle's
    * `ORDER BY cos DESC, cent_id` tie-break. Needs `embedding`, `nrm`.
    */
  private[operators] def centScores(cents: Seq[(Long, Seq[Float], Double)]): Column =
    array(cents.map { case (id, cs, cnrm) =>
      struct(
        call_function("vec_dot", col("embedding"), typedLit(cs))
          .divide(lit(cnrm) * col("nrm")).as("cos"),
        lit(-id).as("nc"), lit(id).as("cent_id"))
    }: _*)

  /** IVF coarse-quantizer assignment: each corpus vector is assigned to
    * its nearest of K=8 deterministic seed centroids (the first 8 vectors)
    * by cosine argmax — the k-means-assignment step that builds a real IVF
    * index (where qEmbeddingNearDup uses `label` as a stand-in cell key).
    * Centroids are driver-held literals ([[seedCentroids]]), so scoring +
    * argmax is one narrow codegen'd projection; the only shuffle is the
    * 8-group final aggregate. Per-cell occupancy plus an EXACT integer
    * checksum of assigned similarities (4dp-scaled sum —
    * order-independent, unlike a float avg).
    */
  def qIvfAssign(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), expr(normExpr).as("nrm"))
    val best = array_max(centScores(seedCentroids(e)))
    e.filter(col("vec_id") >= 8)
      .select(col("vec_id"), best.getField("cent_id").as("cent_id"),
        best.getField("cos").as("cos"))
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
    * corpus vectors assigned to those cells. Scale shape: centroids are
    * driver-held literals ([[seedCentroids]]) so assignment and probe
    * selection are narrow per-row expressions; the probe is a broadcast
    * key-equality join on cent_id — the fraction of the corpus touched is
    * nprobe/K regardless of corpus size, which is the entire point of IVF
    * at 100 TB. Ranking uses the bounded
    * [[graft.functions.TopKAggregator]] (k rows per query per partition
    * shuffle, same as [[qCosineTopK]]).
    */
  def qIvfSearch(s: SparkSession, dir: String, nprobe: Int = 2, k: Int = 5): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    import s.implicits._
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), expr(normExpr).as("nrm"))
    val scores = centScores(seedCentroids(e))
    // corpus→cell assignment: narrow argmax over literal centroids —
    // identical arithmetic + tie-break to qIvfAssign, so the index agrees
    val assigned = e.filter(col("vec_id") >= 8)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        array_max(scores).getField("cent_id").as("cent_id"))
    // query→probe-cell list: sort the same score array desc, take the top
    // nprobe cells — still narrow, one row per (query, probed cell)
    val probes = e.filter(col("vec_id") >= 8 && col("vec_id") < 11)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"),
        explode(transform(slice(sort_array(scores, asc = false), 1, nprobe),
          x => x.getField("cent_id"))).as("cent_id"))
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
    val best = array_max(centScores(seedCentroids(e)))
    e.filter(col("vec_id") >= 8)
      .select(col("embedding"), best.getField("cent_id").as("cent_id"))
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

  /** One distributed power-iteration step toward the embedding corpus's
    * top principal direction: with v₀ = 1 (uniform), compute
    * s_i = Σ_d x_{id} per vector and y = Σ_i s_i·x_i per dimension —
    * i.e. y = (XᵀX)·v₀ without ever materializing XᵀX — then normalize.
    * The PCA/spectral analogue of [[qKmeansStep]]: the Lloyd/power loop
    * both reduce to "one narrow pass + a model-sized aggregate per
    * round", which is why they scale to any corpus.
    *
    * All accumulation is fixed-point: each element rounds to round(x·10⁴)
    * BEFORE any sum, so the per-vector fold and the per-dimension sums
    * are exact integer arithmetic — order-independent and bit-identical
    * in the oracle; sqrt/divide touch only the final 64-row vector.
    * |y_d| ≤ n·d·(10⁴·max|x|)² keeps longs safe through ~10⁹ vectors;
    * a production variant drops the rounding and accepts float drift.
    *
    * Scale shape: one posexplode (narrow), a vec-keyed window sum (the
    * single data-sized shuffle), a 64-group map-side-combined aggregate.
    * No vector ever pairs with another vector.
    */
  def qPowerIteration(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val x4 = t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
        round(col("x").cast("double") * 10000).cast("long").as("x4"))
    val withS = x4.withColumn("s", sum("x4").over(Window.partitionBy("vec_id")))
    val y = withS.groupBy("dim").agg(sum(col("s") * col("x4")).as("y"))
    y.withColumn("nrm",
        sqrt(sum(col("y").cast("double") * col("y").cast("double"))
          .over(Window.partitionBy())))
      .select(col("dim"), col("y"), round(col("y") / col("nrm"), 4).as("v1"))
      .orderBy("dim")
  }

  val qPowerIterationOracle: String =
    """WITH x4 AS (
      |  SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS dim,
      |    CAST(round(unnest(embedding)::DOUBLE * 10000) AS BIGINT) AS x4
      |  FROM embeddings),
      |ws AS (SELECT dim, x4, sum(x4) OVER (PARTITION BY vec_id) AS s FROM x4),
      |y AS (SELECT dim, CAST(sum(s * x4) AS BIGINT) AS y FROM ws GROUP BY dim)
      |SELECT dim, y, round(y / sqrt(sum(y::DOUBLE * y::DOUBLE) OVER ()), 4) AS v1
      |FROM y ORDER BY dim""".stripMargin

  /** Per-dimension feature standardization stats: mean and sample stddev
    * of every embedding dimension (rounded 4dp), plus how many vectors
    * sit beyond |z| > 3 in that dimension — the z-score normalization /
    * outlier screen that precedes training on a feature column. Outliers
    * are counted against the ROUNDED moments on both engines, so the
    * boundary is deterministic; a (near-)constant dimension whose rounded
    * std is 0 counts zero outliers on BOTH engines (the z-score is gated
    * on std4 > 0 — without the gate Spark's Divide yields NULL while
    * DuckDB's IEEE division yields inf, a silent engine divergence).
    *
    * Scale shape: one posexplode feeding a 64-group aggregate (map-side
    * combined), the 64-row moment table broadcast back over a second
    * narrow pass. The element surface shuffles only as 64 partial-agg
    * rows per task.
    */
  def qFeatureNorm(s: SparkSession, dir: String): DataFrame = {
    val x = t(s, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .select((col("pos") + 1).cast("long").as("dim"), col("x").cast("double").as("x"))
    val moments = x.groupBy("dim").agg(
      round(avg("x"), 4).as("mean4"), round(stddev_samp("x"), 4).as("std4"))
    x.join(broadcast(moments), Seq("dim"))
      .groupBy("dim").agg(
        first("mean4").as("mean4"), first("std4").as("std4"),
        sum(when(col("std4") > 0 &&
            abs(col("x") - col("mean4")) / col("std4") > 3.0, 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy("dim")
  }

  val qFeatureNormOracle: String =
    """WITH x AS (
      |  SELECT unnest(range(1, len(embedding) + 1)) AS dim,
      |    unnest(embedding)::DOUBLE AS x
      |  FROM embeddings),
      |m AS (
      |  SELECT dim, round(avg(x), 4) AS mean4, round(stddev_samp(x), 4) AS std4
      |  FROM x GROUP BY dim)
      |SELECT x.dim, m.mean4, m.std4,
      |  CAST(sum(CASE WHEN std4 > 0 AND abs(x - mean4) / std4 > 3.0
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM x JOIN m ON m.dim = x.dim
      |GROUP BY x.dim, m.mean4, m.std4 ORDER BY x.dim""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_cosine_topk", qCosineTopK, Some(qCosineTopKOracle)),
    QueryDef("q_feature_norm", qFeatureNorm, Some(qFeatureNormOracle)),
    QueryDef("q_embedding_near_dup", (s, d) => qEmbeddingNearDup(s, d),
      Some(qEmbeddingNearDupOracle)),
    QueryDef("q_ann_near_dup", qAnnNearDup, Some(qAnnNearDupOracle)),
    QueryDef("q_lsh_buckets", qLshBuckets, Some(qLshBucketsOracle)),
    QueryDef("q_ivf_assign", qIvfAssign, Some(qIvfAssignOracle)),
    QueryDef("q_ivf_search", (s, d) => qIvfSearch(s, d), Some(qIvfSearchOracle)),
    QueryDef("q_kmeans_step", qKmeansStep, Some(qKmeansStepOracle)),
    QueryDef("q_power_iteration", qPowerIteration, Some(qPowerIterationOracle)),
    QueryDef("q_quantize", qQuantize, Some(qQuantizeOracle)),
  )
}
