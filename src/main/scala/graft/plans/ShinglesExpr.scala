package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word k-shingles straight from the text column in one pass.
  *
  * Value-identical to the builtin chain
  * `transform(sequence(...), i => array_join(slice(split(trim(text),'\s+'), i, k), ' '))`
  * (Exprs.shingles ∘ Exprs.tokens — both split trimmed text on `\s+` runs
  * and join windows with single spaces; short docs yield one whole-doc
  * shingle), but without materializing the token array or running k
  * interpreted slice/join lambdas per window.
  */
case class WordShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  /** Analysis-time validation for the SQL surface (plan-time error instead
    * of a mid-task ClassCastException on a non-string argument).
    */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles requires a string column, got ${other.simpleString}")
    }

  // precompiled (String.split would recompile per row); split with limit -1
  // keeps leading/trailing empty tokens exactly like Spark's 2-arg split
  @transient private lazy val WS = java.util.regex.Pattern.compile("\\s+")

  /** Spark's trim(col) strips ASCII SPACES ONLY (not tabs/newlines) — must
    * match, or documents with tab/newline edges diverge from the oracle's
    * regexp_split_to_array(trim(text), '\s+').
    */
  private def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  override def nullSafeEval(input: Any): Any = {
    val s = trimSpaces(input.asInstanceOf[UTF8String].toString)
    val toks = WS.split(s, -1)
    val out: Array[AnyRef] =
      if (toks.length < k) Array(UTF8String.fromString(toks.mkString(" ")))
      else {
        val n = toks.length - k + 1
        val arr = new Array[AnyRef](n)
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i < n) {
          sb.setLength(0)
          var j = 0
          while (j < k) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          arr(i) = UTF8String.fromString(sb.toString)
          i += 1
        }
        arr
      }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {
  /** Word k-shingles of a text column (native single pass). */
  def wordShingles(text: Column, k: Int): Column =
    Bridge.column(WordShinglesExpr(Bridge.expression(text), k))

  /** SQL builder (`word_shingles(text, k)`): k must be a literal positive
    * integer — validated with clear AnalysisExceptions at plan time, the
    * TopKAgg.build pattern.
    */
  def build(exprs: Seq[Expression]): WordShinglesExpr = {
    def fail(msg: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        s"word_shingles(text, k): $msg", Map.empty[String, String])
    if (exprs.size != 2) fail(s"takes 2 arguments, got ${exprs.size}")
    if (!exprs(1).foldable) fail("k must be a literal")
    val k = exprs(1).eval() match {
      case i: Int => i
      case l: Long =>
        // toInt would wrap (word_shingles(text, 8589934593) → 1) and slip
        // past the k<=0 guard — range-check before narrowing
        if (l < Int.MinValue || l > Int.MaxValue)
          fail(s"k out of int range, got $l")
        l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => fail(s"k must be an integer literal, got $other")
    }
    if (k <= 0) fail(s"k must be positive, got $k")
    WordShinglesExpr(exprs.head, k)
  }
}
