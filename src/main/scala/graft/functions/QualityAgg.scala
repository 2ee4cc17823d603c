package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.9): the reference's `Grouping` accumulator
  * (itdb2html.py:74-110) — a 6-bucket star histogram with a derived, gated
  * weighted-mean "quality" — as an `Aggregator[Long, Array[Long], Double]`.
  *
  * The buffer is a fixed 6-slot count array, so partial aggregation
  * (map-side combine) works exactly like any builtin: merge is element-wise
  * add, and the shuffle carries 48 bytes per group regardless of input size.
  *
  * The production queries use the equivalent builtin composition
  * (Library.pivotStars + Exprs.quality, codegen'd); this Aggregator exists
  * to cover the typed-UDAF extension surface and is asserted equal to the
  * builtin path in QualitySpec.
  */
object QualityAgg extends Aggregator[Long, Array[Long], Double] {
  override def zero: Array[Long] = new Array[Long](6)

  override def reduce(buf: Array[Long], stars: Long): Array[Long] = {
    val s = if (stars < 0) 0 else if (stars > 5) 5 else stars.toInt
    buf(s) += 1
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 6) { a(i) += b(i); i += 1 }
    a
  }

  /** itdb2html.py:95: zero iff `rated < 1 or rated*5 < total` — exact
    * integer gate (>= 20% rated, boundary inclusive); else Σ(s·n_s)/Σn_s.
    */
  override def finish(buf: Array[Long]): Double = {
    val rated = buf(1) + buf(2) + buf(3) + buf(4) + buf(5)
    val total = buf(0) + rated
    if (rated < 1 || rated * 5 < total) 0.0
    else (buf(1) + 2L * buf(2) + 3L * buf(3) + 4L * buf(4) + 5L * buf(5)).toDouble / rated
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.longArray
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

private object ExpressionEncoderHelper {
  val longArray: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
