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
}
