package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor (Column is now
  * a ColumnNode facade shared with Connect); the classic converter is
  * private[sql]. This bridge — placed in an org.apache.spark.sql subpackage,
  * the standard pattern for Catalyst extensions — re-exports just the two
  * conversions custom Expressions need.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** External Row → InternalRow converter for a DataSourceV2 reader
    * (CatalystTypeConverters is private[sql] in Spark 4).
    */
  def rowToInternal(schema: org.apache.spark.sql.types.StructType):
      org.apache.spark.sql.Row => org.apache.spark.sql.catalyst.InternalRow = {
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(schema)
    r => conv(r).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
  }
}

/** Serializable Hadoop-configuration carrier for executor-side readers —
  * delegates to Spark's own `org.apache.spark.util.SerializableConfiguration`
  * (private[spark], hence re-exported here) instead of a second hand-rolled
  * serialization of Configuration.
  */
class SerializableHadoopConf(conf: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private val inner = new org.apache.spark.util.SerializableConfiguration(conf)
  def value: org.apache.hadoop.conf.Configuration = inner.value
}

/** Input-type contract for (score DOUBLE, id BIGINT) aggregates.
  * `AbstractDataType` is private[sql], so an expression living outside
  * org.apache.spark.sql cannot override `inputTypes` directly — this trait
  * (in the bridge package, like the converters above) pins the signature
  * and lets graft.plans aggregates inherit analyzer-driven implicit casts.
  */
trait DoubleLongInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.DoubleType, org.apache.spark.sql.types.LongType)
}
