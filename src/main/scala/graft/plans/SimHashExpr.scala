package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Single-pass 64-bit SimHash over a token array.
  *
  * Value-identical to the builtin formulation in `Dedup.simhash64Builtin`
  * (each bit p votes ±1 per token by bit (p mod 4) of hex digit (p div 4)
  * of the token's md5; a positive vote sum sets the bit): the same UTF-8
  * bytes are hashed and the nibble/bit extraction is the same arithmetic,
  * so the DuckDB oracle (SparkEntry.simhash64Cte) is unchanged.
  *
  * The speedup is dispatch-cost removal, not algorithmic: the builtin form
  * materializes an md5-HEX STRING per token and then runs 64 interpreted
  * `aggregate` lambdas, each traversing the whole array with per-element
  * Catalyst eval (64 traversals × ~6 nodes per element). Here each token is
  * hashed ONCE with a reused MessageDigest and all 64 vote counters update
  * in a single primitive loop over the digest's first 8 bytes.
  *
  * Eval-only (CodegenFallback): the cost is inside MD5 and the 64-counter
  * loop, both already primitive — generated code would not help (the same
  * judgment as [[MinHashSigsExpr]]).
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true // null token array -> NULL (caller coalesces)
  override def prettyName: String = "simhash64"

  /** Analysis-time validation for the SQL surface: a non-string-array
    * argument fails with a typed plan-time error, not a mid-task
    * ClassCastException. (ExpectsInputTypes is off-limits — its
    * AbstractDataType went private[sql] in Spark 4.)
    */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.simpleString}")
  }

  // one digest per thread: in local mode the SAME expression instance can
  // evaluate concurrently across tasks
  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val md = mdLocal.get()
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var t = 0
    while (t < n) {
      // a null TOKEN poisons the builtin formulation's whole fold (acc +
      // vote(null) = null per bit -> when(null > 0).otherwise(0) -> all
      // bits 0) — match it exactly rather than NPE
      if (arr.isNullAt(t)) return 0L
      md.reset()
      md.update(arr.getUTF8String(t).getBytes)
      val d = md.digest()
      // bit p reads hex digit p/4 (0-based) of the hex rendering = nibble
      // p/4 of the digest: even digit index -> high nibble of byte idx/2
      var p = 0
      while (p < 64) {
        val digitIdx = p >> 2
        val b = d(digitIdx >> 1) & 0xff
        val nib = if ((digitIdx & 1) == 0) (b >> 4) & 0xf else b & 0xf
        if (((nib >> (p & 3)) & 1) == 1) counts(p) += 1 else counts(p) -= 1
        p += 1
      }
      t += 1
    }
    var sig = 0L
    var p = 0
    while (p < 64) {
      if (counts(p) > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHashExpr {
  /** 64-bit SimHash of a string-array column in one pass. */
  def simhash64(toks: Column): Column =
    Bridge.column(SimHash64Expr(Bridge.expression(toks)))

  /** SQL builder (`simhash64(tokens)`): arity validated with a clear
    * plan-time error — ONE definition serving both the injectFunction and
    * the late-registration paths.
    */
  def build(exprs: Seq[Expression]): SimHash64Expr = {
    if (exprs.size != 1)
      throw new org.apache.spark.sql.AnalysisException(
        s"simhash64(tokens) takes 1 argument, got ${exprs.size}",
        Map.empty[String, String])
    SimHash64Expr(exprs.head)
  }
}
