package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature: for a shingle array, compute all k
  * min-over-shingles of md5("mh{i}:" ++ shingle) in ONE traversal.
  *
  * Value-identical to the builtin formulation
  * `array_min(transform(sh, s => md5(concat("mh{i}:", s))))` repeated k
  * times (hex of md5 compares identically to the raw 16 digest bytes
  * unsigned, and the same bytes are hashed), so the DuckDB oracles are
  * unchanged. The speedup is algorithmic: one pass instead of k, a reused
  * MessageDigest, and no per-hash UTF8String concat/hex allocations —
  * only the k winning digests are hex-encoded at the end.
  *
  * Eval-only (CodegenFallback): the cost is inside MD5, not in expression
  * dispatch, so generated code would not help.
  */
case class MinHashSigsExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // empty shingle array -> NULL
  override def prettyName: String = "minhash_sigs"

  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(k)(i => s"mh$i:".getBytes("UTF-8"))

  // one digest per thread: in local mode the SAME expression instance can
  // evaluate concurrently across tasks
  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  override def nullSafeEval(input: Any): Any = {
    val md = mdLocal.get()
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // builtin array_min over an empty array is NULL — match it
    if (n == 0) return null
    val mins = new Array[Array[Byte]](k)
    var s = 0
    while (s < n) {
      val shingle = arr.getUTF8String(s).getBytes
      var i = 0
      while (i < k) {
        md.reset()
        md.update(prefixes(i))
        md.update(shingle)
        val d = md.digest()
        if (mins(i) == null || lessThan(d, mins(i))) mins(i) = d
        i += 1
      }
      s += 1
    }
    val hex = new Array[AnyRef](k)
    var i = 0
    while (i < k) {
      val sb = new java.lang.StringBuilder(32)
      val m = mins(i)
      var j = 0
      while (j < 16) {
        sb.append(Character.forDigit((m(j) >> 4) & 0xf, 16))
        sb.append(Character.forDigit(m(j) & 0xf, 16))
        j += 1
      }
      hex(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(hex)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigsExpr =
    copy(child = newChild)
}

object MinHashExpr {
  /** All k minhashes of a string-array column in one pass. */
  def minhashSigs(sh: Column, k: Int): Column =
    Bridge.column(MinHashSigsExpr(Bridge.expression(sh), k))
}
