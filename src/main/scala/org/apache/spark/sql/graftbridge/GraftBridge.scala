package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway a custom `LogicalPlan` operator needs:
  * wrapping a hand-built logical node back into a `DataFrame`. Lives under
  * `org.apache.spark.sql` for package-private access — the standard
  * pattern of Spark-extension libraries (Delta, Iceberg, spark-rapids all
  * ship an identical shim); everything else in this repo stays on public
  * APIs.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Release the storage blocks behind a `localCheckpoint`ed DataFrame.
    *
    * `Dataset.unpersist` only consults the CacheManager, which never
    * sees checkpoint RDDs — so an iterative kernel that checkpoints per
    * round (connected components, PageRank, label propagation) leaks
    * every superseded round's blocks until the whole job ends. On a
    * big-graph run that debt is real memory pressure (each round's
    * frame is node-count-sized). This reaches through the plan to the
    * checkpointed RDD and unpersists it directly; silently a no-op for
    * any other plan shape, so callers can use it unconditionally.
    */
  /** Clone the session (shared SparkContext + SharedState, so caches and
    * checkpoints stay visible) with a copy of the caller's ENTIRE runtime
    * SQL conf — `newSession()` would silently drop session tuning like
    * the ObjectHashAggregate fallback threshold — then apply per-scope
    * overrides. This is how an iterative kernel gets its own shuffle
    * width without mutating the shared session's conf out from under
    * concurrently-planning queries (test suites share one session).
    */
  def cloneSessionWithConf(spark: SparkSession, overrides: (String, String)*): SparkSession = {
    val cloned = spark.asInstanceOf[classic.SparkSession].cloneSession()
    overrides.foreach { case (k, v) => cloned.conf.set(k, v) }
    cloned
  }

  def unpersistLocalCheckpoint(df: DataFrame, blocking: Boolean = false): Unit =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed.collectLeaves().foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking)
      case _ => ()
    }
}
