package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew-mitigation primitives for the cases AQE's runtime skew-join
  * splitting doesn't cover (e.g. a broadcast-ineligible dimension joined on
  * a hot key, or a groupBy where one key holds a double-digit percentage of
  * all rows). At 100 TB a single hot key otherwise pins one task per stage
  * at hours while the rest of the cluster idles.
  */
object SkewUtils {

  /** Salted equi-join: the (large, skewed) `big` side gets a deterministic
    * salt in [0, salt); the `small` side is replicated `salt` times so
    * every (key, salt) bucket finds its match. A hot key's rows thus spread
    * over `salt` tasks instead of one. The small side grows ×salt — use
    * only when it is modest but above the broadcast threshold.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltedBig = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salt)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(replicatedSmall,
        saltedBig(key) === replicatedSmall(key) &&
          saltedBig("__salt") === replicatedSmall("__salt"),
        joinType)
      .drop(replicatedSmall(key)).drop(saltedBig("__salt")).drop(replicatedSmall("__salt"))
  }

  /** Two-phase (salted) aggregation for algebraic aggregates: a salted
    * partial groupBy spreads a hot key over `salt` reducers, then a final
    * groupBy over the (tiny) partial results merges them. `partials` maps
    * output column -> partial aggregate; `finals` maps the same column ->
    * merge aggregate over the partial column.
    */
  def twoPhaseAgg(df: DataFrame, key: String, salt: Int,
      partials: Map[String, Column], finals: Map[String, Column]): DataFrame = {
    require(salt > 0, "salt must be positive")
    val partialCols = partials.map { case (n, c) => c.as(n) }.toSeq
    val finalCols = finals.map { case (n, c) => c.as(n) }.toSeq
    df.withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(partialCols.head, partialCols.tail: _*)
      .groupBy(col(key))
      .agg(finalCols.head, finalCols.tail: _*)
  }
}
