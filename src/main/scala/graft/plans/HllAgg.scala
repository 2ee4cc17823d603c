package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch as a TypedImperativeAggregate — the
  * mutable-buffer aggregation surface (SURVEY §2.9; the engine's scale
  * answer to A2's COUNT(DISTINCT) when exactness isn't required: the
  * shuffle carries a fixed 2^p-byte register array per group instead of
  * every distinct value).
  *
  * Standard HLL (Flajolet et al.): register j = max leading-zero rank of
  * hashed values routed to j; estimate = alpha_m * m^2 / Σ 2^-M[j], with
  * linear counting below 2.5m. Hashing is 64-bit FNV-1a over the value's
  * string form — self-contained, deterministic, no engine dependency.
  * Spark's own approx_count_distinct (HLL++) remains the default choice;
  * this demonstrates the extension API end to end.
  */
case class HllAgg(
    child: Expression,
    precision: Int = 11,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val m = 1 << precision

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_distinct"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  private def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    // FNV barely mixes the HIGH bits on short inputs (sequential keys hit a
    // handful of registers) — finish with a murmur-style avalanche
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  override def update(buf: Array[Byte], input: org.apache.spark.sql.catalyst.InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v match {
        case u: UTF8String => u.toString
        case other => other.toString
      }
      val h = fnv1a64(s)
      val j = (h >>> (64 - precision)).toInt
      val rest = h << precision
      // rank = leading zeros of the remaining bits + 1 (capped)
      val rank = (if (rest == 0) (64 - precision) else java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rank > buf(j)) buf(j) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any = HllAgg.estimate(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)
}

object HllAgg {
  /** Column API: approximate COUNT(DISTINCT c) via the sketch. */
  def hllDistinct(c: Column, precision: Int = 11): Column =
    Bridge.column(HllAgg(Bridge.expression(c), precision).toAggregateExpression())

  /** Column API: the SKETCH itself (binary registers) as the aggregate
    * value — the persisted sketch-state surface ([[HllSketchAgg]]).
    */
  def hllSketch(c: Column, precision: Int = 11): Column =
    Bridge.column(HllSketchAgg(Bridge.expression(c), precision).toAggregateExpression())

  /** Column API: merge stored sketches back into an estimate
    * ([[HllMergeAgg]]).
    */
  def hllMerge(c: Column): Column =
    Bridge.column(HllMergeAgg(Bridge.expression(c)).toAggregateExpression())

  /** Standard HLL estimate over a register array (shared by the one-pass
    * aggregate and the stored-sketch merge).
    */
  def estimate(buf: Array[Byte]): Long = {
    val m = buf.length
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += math.pow(2.0, -buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / sum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else raw
    math.round(est)
  }
}

/** [[HllAgg]]'s update/merge with the SKETCH as the result (BinaryType):
  * the aggregate that builds a persisted sketch-state table. Register
  * arrays are the serialized form — fixed 2^p bytes per group — so a
  * stored cell is directly mergeable later by [[HllMergeAgg]]. The
  * warehouse "sketch column" pattern: aggregate once per shard/day, then
  * answer any rollup window by merging stored cells instead of
  * rescanning the fact stream.
  */
case class HllSketchAgg(
    child: Expression,
    precision: Int = 11,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val inner = HllAgg(child, precision)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): Array[Byte] = inner.createAggregationBuffer()
  override def update(buf: Array[Byte], input: org.apache.spark.sql.catalyst.InternalRow): Array[Byte] =
    inner.update(buf, input)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = inner.merge(a, b)
  // defensive copy: the buffer is mutable and eval must not alias it
  override def eval(buf: Array[Byte]): Any = buf.clone()
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = newChildren.head)
}

/** Re-aggregation over STORED sketches: bytewise-max-merge the binary
  * register arrays and emit the estimate. Merge is associative,
  * commutative and idempotent, so any partitioning of the fact stream
  * into stored cells — daily, per shard, replayed twice — merges to the
  * register-identical sketch of the whole stream (spec-proven).
  */
case class HllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_merge"

  // sized lazily from the first sketch seen (precision travels with the
  // stored cell, not the query)
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def maxInto(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b.clone()
    else {
      require(a.length == b.length,
        s"sketch precision mismatch: ${a.length} vs ${b.length} registers")
      var i = 0
      while (i < a.length) {
        if (b(i) > a(i)) a(i) = b(i)
        i += 1
      }
      a
    }

  override def update(buf: Array[Byte], input: org.apache.spark.sql.catalyst.InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf else maxInto(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (b.isEmpty) a else maxInto(a, b)

  override def eval(buf: Array[Byte]): Any =
    if (buf.isEmpty) 0L else HllAgg.estimate(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllMergeAgg =
    copy(child = newChildren.head)
}
