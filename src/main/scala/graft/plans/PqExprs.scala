package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the product-quantization hot paths
  * (s11/s11b and the PQ plane of the serving index).
  *
  * The builtin composition unrolls PqM × PqK integer-distance argmins into
  * one ~6k-node expression tree: correct, but the generated Java blows past
  * whole-stage codegen's method limits, so the stage falls back to
  * INTERPRETED per-node eval — measured 11.7 s cold / 2.15 s steady for
  * s11 at sf0.1 vs s7's 0.33 s steady on a wider plane. These expressions
  * emit the same arithmetic as tight loops with the codebook hoisted into
  * ONE reference array: tiny generated methods, primitive access, no
  * allocation. Value-identity with the builtin forms is spec-proven
  * (DedupSimilaritySpec), so the DuckDB oracle is unchanged — the same
  * §2.9a contract as [[DotProductExpr]]/[[SimHash64Expr]].
  */
object PqExprs {

  /** Flatten book[m][c][i] → flat[(m*k + c)*d + i] for primitive access in
    * both eval and generated code.
    */
  private[plans] def flatten(book: Array[Array[Array[Long]]]): Array[Long] = {
    val m = book.length; val k = book(0).length; val d = book(0)(0).length
    val flat = new Array[Long](m * k * d)
    var idx = 0
    for (sm <- 0 until m; c <- 0 until k; i <- 0 until d) {
      flat(idx) = book(sm)(c)(i); idx += 1
    }
    flat
  }

  /** Packed PQ codes of an int8-quantized vector: for each of the
    * `nSub` subspaces, the 4-bit argmin code under integer squared
    * distance (first occurrence on ties — the strict `<` in the loop IS
    * list_position's rule), shifted into nibble m of one long.
    */
  def pqEncode(qv: Column, book: Array[Array[Array[Long]]]): Column =
    Bridge.column(PqEncodeExpr(Bridge.expression(qv),
      flatten(book), book.length, book(0).length, book(0)(0).length))

  /** ADC score: Σ_m tt[m][(pcode >> 4m) & 15] — the probe's lookup-table
    * dot product against a code-compressed neighbor.
    */
  def adcScore(tt: Column, pcode: Column): Column =
    Bridge.column(PqAdcScoreExpr(Bridge.expression(tt), Bridge.expression(pcode)))

  /** The probe's ADC tables T[m][c] = qv_sub_m · book[m][c]. */
  def adcTables(qv: Column, book: Array[Array[Array[Long]]]): Column =
    Bridge.column(PqAdcTablesExpr(Bridge.expression(qv),
      flatten(book), book.length, book(0).length, book(0)(0).length))
}

/** See [[PqExprs]]. `flatBook` is a plan literal (same session-memoized
  * array instance per corpus, so expression equality — reference-based on
  * the array — behaves deterministically within a query).
  */
case class PqEncodeExpr(child: Expression, flatBook: Array[Long],
    nSub: Int, nCodes: Int, dSub: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val qv = input.asInstanceOf[ArrayData]
    var packed = 0L
    var m = 0
    while (m < nSub) {
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < nCodes) {
        val base = (m * nCodes + c) * dSub
        var dist = 0L
        var i = 0
        while (i < dSub) {
          val diff = qv.getLong(m * dSub + i) - flatBook(base + i)
          dist += diff * diff
          i += 1
        }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      packed |= best.toLong << (4 * m)
      m += 1
    }
    packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, qv => {
      val book = ctx.addReferenceObj("pqFlatBook", flatBook, "long[]")
      val m = ctx.freshName("m"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val base = ctx.freshName("base")
      val dist = ctx.freshName("dist"); val diff = ctx.freshName("diff")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val packed = ctx.freshName("packed")
      s"""
         |long $packed = 0L;
         |for (int $m = 0; $m < $nSub; $m++) {
         |  int $best = 0;
         |  long $bestD = Long.MAX_VALUE;
         |  for (int $c = 0; $c < $nCodes; $c++) {
         |    int $base = ($m * $nCodes + $c) * $dSub;
         |    long $dist = 0L;
         |    for (int $i = 0; $i < $dSub; $i++) {
         |      long $diff = $qv.getLong($m * $dSub + $i) - $book[$base + $i];
         |      $dist += $diff * $diff;
         |    }
         |    if ($dist < $bestD) { $bestD = $dist; $best = $c; }
         |  }
         |  $packed |= ((long) $best) << (4 * $m);
         |}
         |${ev.value} = $packed;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** See [[PqExprs]]. Builds the probe's PqM × PqK ADC lookup tables in one
  * eval loop. Eval-only (CodegenFallback): it runs on the ≤nProbes-row
  * broadcast side, where the win over the builtin composition is not
  * execution speed but TREE SIZE — the unrolled 16×16×4 dot-product tree
  * cost Catalyst a measurable re-analysis on every execution.
  */
case class PqAdcTablesExpr(child: Expression, flatBook: Array[Long],
    nSub: Int, nCodes: Int, dSub: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(ArrayType(LongType))
  override def prettyName: String = "pq_adc_tables"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val qv = input.asInstanceOf[ArrayData]
    val outer = new Array[Any](nSub)
    var m = 0
    while (m < nSub) {
      val inner = new Array[Any](nCodes)
      var c = 0
      while (c < nCodes) {
        val base = (m * nCodes + c) * dSub
        var s = 0L
        var i = 0
        while (i < dSub) {
          s += qv.getLong(m * dSub + i) * flatBook(base + i)
          i += 1
        }
        inner(c) = s
        c += 1
      }
      outer(m) = new org.apache.spark.sql.catalyst.util.GenericArrayData(inner)
      m += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(outer)
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcTablesExpr =
    copy(child = newChild)
}

/** See [[PqExprs]]. `left` = the probe's ADC tables (array<array<bigint>>,
  * one inner array per subspace), `right` = the neighbor's packed codes.
  */
case class PqAdcScoreExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc_score"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(LongType, _), _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<array<bigint>>, bigint), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(ttAny: Any, pcodeAny: Any): Any = {
    val tt = ttAny.asInstanceOf[ArrayData]
    val pcode = pcodeAny.asInstanceOf[Long]
    val n = tt.numElements()
    var s = 0L
    var m = 0
    while (m < n) {
      s += tt.getArray(m).getLong(((pcode >> (4 * m)) & 15L).toInt)
      m += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tt, pcode) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      s"""
         |int $n = $tt.numElements();
         |long $s = 0L;
         |for (int $m = 0; $m < $n; $m++) {
         |  $s += $tt.getArray($m).getLong((int) (($pcode >> (4 * $m)) & 15L));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScoreExpr =
    copy(left = newLeft, right = newRight)
}
