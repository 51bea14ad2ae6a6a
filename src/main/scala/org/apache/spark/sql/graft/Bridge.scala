package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these conversions
  * `private[sql]`; third-party native expressions (see
  * `graft.functions.ArrayMath`) still need them, so this one-file
  * shim lives in the sql namespace — the standard extension-library
  * pattern, no Spark internals are modified. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Flush the async listener bus — lets a metrics probe read
    * listener-accumulated totals deterministically after a job.
    * (`LiveListenerBus.waitUntilEmpty` is `private[spark]`; this shim
    * lives in the spark namespace like the Column bridge above.) */
  def waitForListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(60000L)

  /** Register a scalar expression builder under `name` for
    * `spark.sql(...)` use in this session. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
