package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable SpaceSaving buffer: the count map plus an ordered index by
  * (count, item) so the eviction victim (the deterministic minimum) is
  * `order.head` in O(log capacity) instead of an O(capacity) minBy scan
  * per evicted row — a high-cardinality stream evicts on nearly every row,
  * so the scan made update O(rows × capacity) per partition.
  */
final class SpaceSavingBuf {
  val counts: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty
  val order: mutable.TreeSet[(Long, String)] = mutable.TreeSet.empty
  def put(item: String, c: Long, e: Long): Unit = {
    counts.update(item, (c, e))
    order.add((c, item))
  }
}

/** SpaceSaving (Metwally et al.) frequent-items sketch as a
  * TypedImperativeAggregate — the bounded-state answer to "top tokens by
  * count" (t10's exact word count) the same way HllAgg answers
  * COUNT(DISTINCT): the shuffle carries at most `capacity` (item, count,
  * err) entries per group per partition, never the full token histogram.
  *
  * Single-stream guarantees (err_total = n/capacity for n observed rows):
  *   - overestimate only: true(k) <= est(k) <= true(k) + err_total;
  *   - containment: every k with true(k) > err_total is in the summary.
  * Merging (union estimates; an item absent from a FULL side is charged
  * that side's minimum count — keeps the overestimate property; then trim
  * to the top `capacity` by (count, item) — the key tie-break makes the
  * trim deterministic) keeps both bounds with err_total summed across the
  * merged streams, i.e. still n/capacity overall (mergeable-summaries
  * analysis, Agarwal et al. 2012). The gate query (t15) only asserts the
  * DOUBLED threshold 2n/capacity so the containment claim holds with
  * margin under any merge tree.
  *
  * When the group's distinct-item count never exceeds `capacity` the
  * sketch is exact (no eviction ever fires) — true of the sf token
  * streams; the eviction and merge-trim paths are exercised by the
  * planted-Zipf spec instead.
  */
case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuf] {

  require(capacity > 0, "spacesaving capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "spacesaving_topk"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): SpaceSavingBuf = new SpaceSavingBuf

  /** Smallest count in a FULL buffer; 0 while below capacity (an absent
    * item then truly has count 0).
    */
  private def minCount(buf: SpaceSavingBuf): Long =
    if (buf.counts.size < capacity) 0L else buf.order.head._1

  override def update(buf: SpaceSavingBuf, input: InternalRow): SpaceSavingBuf = {
    val v = child.eval(input)
    if (v != null) {
      val s = v match {
        case u: UTF8String => u.toString
        case other => other.toString
      }
      buf.counts.get(s) match {
        case Some((c, e)) =>
          buf.order.remove((c, s))
          buf.put(s, c + 1, e)
        case None if buf.counts.size < capacity =>
          buf.put(s, 1L, 0L)
        case None =>
          // classic SpaceSaving step: the new item inherits (and may
          // overestimate by) the evicted minimum; deterministic victim via
          // (count, item) ordering = the TreeSet head
          val victim @ (mc, vk) = buf.order.head
          buf.order.remove(victim)
          buf.counts.remove(vk)
          buf.put(s, mc + 1, mc)
      }
    }
    buf
  }

  override def merge(a: SpaceSavingBuf, b: SpaceSavingBuf): SpaceSavingBuf = {
    if (b.counts.isEmpty) return a
    if (a.counts.isEmpty) {
      b.counts.foreach { case (k, (c, e)) => a.put(k, c, e) }
      return a
    }
    val minA = minCount(a)
    val minB = minCount(b)
    val keys = a.counts.keySet ++ b.counts.keySet
    val merged = keys.iterator.map { k =>
      val (ca, ea) = a.counts.getOrElse(k, (minA, minA))
      val (cb, eb) = b.counts.getOrElse(k, (minB, minB))
      k -> (ca + cb, ea + eb)
    }.toSeq
    val kept =
      if (merged.size <= capacity) merged
      else merged.sortBy { case (k, (c, _)) => (-c, k) }.take(capacity)
    a.counts.clear()
    a.order.clear()
    kept.foreach { case (k, (c, e)) => a.put(k, c, e) }
    a
  }

  override def eval(buf: SpaceSavingBuf): Any = {
    // deterministic rendering: count desc, then item
    val rows = buf.counts.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.map {
      case (k, (c, e)) =>
        InternalRow(UTF8String.fromString(k), c, e)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: SpaceSavingBuf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (k, (c, e)) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      buf.put(new String(kb, "UTF-8"), in.readLong(), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingAgg =
    copy(child = newChildren.head)
}

object SpaceSavingAgg {
  /** Column API: frequent-items summary of `c`, at most `capacity`
    * entries, as array<struct<item, est, err>> ordered (est desc, item).
    */
  def spaceSavingTopK(c: Column, capacity: Int): Column =
    Bridge.column(SpaceSavingAgg(Bridge.expression(c), capacity).toAggregateExpression())
}
