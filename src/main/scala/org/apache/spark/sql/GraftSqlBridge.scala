package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the Column <-> Expression conversions that Spark 4 moved
  * behind `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils)
  * during the Spark Connect Column refactor. This is the one place the
  * library reaches into Spark's package-private API; everything else
  * uses public surfaces.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

/** `ExpectsInputTypes.inputTypes` returns `Seq[AbstractDataType]`, and
  * `AbstractDataType` is `private[sql]` — so a custom expression outside
  * Spark's namespace cannot declare its input types directly. This trait
  * declares them from inside the namespace; extending it gives graft
  * expressions analysis-time type checking + implicit input casts
  * instead of runtime ClassCastExceptions.
  */
trait ExpectsLongInput
    extends org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.LongType)
}

/** String twin of [[ExpectsLongInput]]. */
trait ExpectsStringInput
    extends org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
}
