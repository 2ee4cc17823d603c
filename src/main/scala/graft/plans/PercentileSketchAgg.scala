package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.aggregate.ApproximatePercentile.PercentileDigest
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Mergeable QUANTILE sketch state — the percentile twin of the HLL
  * sketch-state pair ([[HllSketchAgg]]/[[HllMergeAgg]]): the same
  * Greenwald-Khanna summary `percentile_approx` uses internally
  * (Spark's own `PercentileDigest`), but with the SKETCH as the stored
  * aggregate value, so per-shard/per-day digests persist as a bounded
  * binary column and any later window re-aggregates by digest merge
  * instead of rescanning the measure column.
  *
  * [[PercentileSketchAgg]] folds doubles into a digest and emits its
  * serialized form; [[PercentileMergeAgg]] merges stored digests and
  * emits the requested percentiles. Digest merge is the GK summary
  * merge — order-insensitive for the RANK GUARANTEE (any merge order
  * yields a summary whose rank error stays within the accuracy bound),
  * though unlike the HLL register max it is not byte-idempotent:
  * re-merging the SAME cell twice double-counts its rows. Replay safety
  * therefore comes from the cell table's keys (one cell per (group,
  * day), the a2c layout), not from the algebra — the scaladoc contract
  * the gate and spec pin.
  */
case class PercentileSketchAgg(
    child: Expression,
    accuracy: Int = 10000,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PercentileDigest] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "percentile_sketch"

  override def createAggregationBuffer(): PercentileDigest =
    new PercentileDigest(1.0 / accuracy)

  override def update(buf: PercentileDigest, input: InternalRow): PercentileDigest = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: PercentileDigest, b: PercentileDigest): PercentileDigest = {
    a.merge(b); a
  }

  override def eval(buf: PercentileDigest): Any =
    ApproximatePercentile.serializer.serialize(buf)

  override def serialize(buf: PercentileDigest): Array[Byte] =
    ApproximatePercentile.serializer.serialize(buf)
  override def deserialize(bytes: Array[Byte]): PercentileDigest =
    ApproximatePercentile.serializer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): PercentileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PercentileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PercentileSketchAgg =
    copy(child = newChildren.head)
}

/** Re-aggregation over stored percentile digests: GK-merge the binary
  * cells, emit `percentages` as an array of doubles (empty digest → all
  * nulls is avoided by returning an empty array, which callers guard).
  */
case class PercentileMergeAgg(
    child: Expression,
    percentages: Seq[Double],
    accuracy: Int = 10000,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PercentileDigest] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "percentile_sketch_merge"

  override def createAggregationBuffer(): PercentileDigest =
    new PercentileDigest(1.0 / accuracy)

  override def update(buf: PercentileDigest, input: InternalRow): PercentileDigest = {
    val v = child.eval(input)
    if (v != null) {
      val cell = ApproximatePercentile.serializer.deserialize(v.asInstanceOf[Array[Byte]])
      // the serialized cell carries its relativeError — fail fast on a
      // cell built at a different accuracy (the HllMergeAgg register-
      // length check's twin): silently merging it would weaken the rank
      // bound the band flags assert
      val got = cell.quantileSummaries.relativeError
      require(math.abs(got - 1.0 / accuracy) < 1e-12,
        s"percentile cell built at relativeError $got, merge expects ${1.0 / accuracy}")
      buf.merge(cell)
    }
    buf
  }

  override def merge(a: PercentileDigest, b: PercentileDigest): PercentileDigest = {
    a.merge(b); a
  }

  override def eval(buf: PercentileDigest): Any =
    new GenericArrayData(buf.getPercentiles(percentages.toArray).toArray)

  override def serialize(buf: PercentileDigest): Array[Byte] =
    ApproximatePercentile.serializer.serialize(buf)
  override def deserialize(bytes: Array[Byte]): PercentileDigest =
    ApproximatePercentile.serializer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): PercentileMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PercentileMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PercentileMergeAgg =
    copy(child = newChildren.head)
}

object PercentileSketchAgg {
  /** Column API: the serialized GK digest of a double column. */
  def percentileSketch(c: Column, accuracy: Int = 10000): Column =
    Bridge.column(PercentileSketchAgg(Bridge.expression(c), accuracy)
      .toAggregateExpression())

  /** Column API: merge stored digests, emit the given percentiles. */
  def percentileMerge(c: Column, percentages: Seq[Double]): Column =
    Bridge.column(PercentileMergeAgg(Bridge.expression(c), percentages)
      .toAggregateExpression())
}
