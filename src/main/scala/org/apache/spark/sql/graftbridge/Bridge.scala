package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ↔ Column bridge. Spark 4 made the converters
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`);
  * exposing them from a subpackage of `org.apache.spark.sql` is the
  * sanctioned pattern for libraries shipping native Catalyst
  * expressions (same technique as spark-connectors in the wild).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Non-blocking read of an [[org.apache.spark.sql.Observation]]'s
    * metrics (`getOrEmpty` is `private[sql]`; the public `get` BLOCKS
    * until an action fires the listener — unusable when the caller
    * must fall back to an explicit job if the metric never lands).
    */
  def observationSnapshot(o: org.apache.spark.sql.Observation): Map[String, Any] =
    o.getOrEmpty
}
