package graft.plans

import org.apache.spark.sql.{AnalysisException, Column}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded TOP-K aggregate — the scale form of "top N per group"
  * (SURVEY §2.6/§2.7). The window form (`row_number` ≤ n) must SORT every
  * group's full row set after the shuffle; this aggregate keeps only the
  * current best k (score, id) pairs in its buffer, so the map-side partial
  * aggregation reduces each group to ≤ k pairs per input partition BEFORE
  * the exchange — the shuffle carries O(groups × k × partitions), never
  * O(rows), and no sort larger than k ever happens. At 100 TB with a
  * handful of groups this is the difference between shuffling the table
  * and shuffling kilobytes.
  *
  * Ordering: score DESC, id ASC on ties — identical to the w2 window
  * ordering, so the two forms are row-for-row equal (proven in
  * TopKAggSpec). Null scores/ids are skipped (a window over non-null
  * ordering keys does the same after a null filter). Buffer is a sorted
  * bounded array: insert is O(k) with k small by construction; serialize
  * is a fixed 16-byte record per held pair.
  *
  * Score comparison uses `java.lang.Double.compare` (a TOTAL order: NaN
  * sorts above +Inf, matching Spark's window `ORDER BY score DESC` which
  * puts NaN first) — raw `>`/`==` would make NaN rows unevictable once
  * held and diverge from the window form.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buffer]
  with org.apache.spark.sql.graftbridge.DoubleLongInputTypes {
  // inputTypes = (DOUBLE, BIGINT) via the bridge trait: the analyzer
  // coerces (or rejects with a clear error) mistyped arguments up front —
  // update() may then cast blindly

  require(k > 0, "top_k requires k > 0")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKAgg.pairType, containsNull = false)
  override def prettyName: String = "top_k"

  override def createAggregationBuffer(): TopKAgg.Buffer = new TopKAgg.Buffer(k)

  override def update(buf: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKAgg.Buffer, b: TopKAgg.Buffer): TopKAgg.Buffer = {
    var i = 0
    while (i < b.size) { a.insert(b.scoreAt(i), b.idAt(i)); i += 1 }
    a
  }

  override def eval(buf: TopKAgg.Buffer): Any =
    new GenericArrayData((0 until buf.size).map { i =>
      InternalRow(buf.scoreAt(i), buf.idAt(i))
    }.toArray[Any])

  override def serialize(buf: TopKAgg.Buffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer =
    TopKAgg.Buffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren.head, id = newChildren(1))
}

object TopKAgg {

  val pairType: StructType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  /** Sorted bounded buffer: pairs held best-first (score DESC, id ASC).
    * Parallel primitive arrays — no boxing in the hot path.
    */
  final class Buffer(k: Int) {
    private val scores = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    def size: Int = n
    def scoreAt(i: Int): Double = scores(i)
    def idAt(i: Int): Long = ids(i)

    /** true when (s1, i1) outranks (s2, i2). Double.compare gives a total
      * order over NaN/±0.0 identical to Spark's descending sort order.
      */
    private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && i1 < i2)
    }

    def insert(s: Double, i: Long): Unit = {
      if (n == k && !beats(s, i, scores(n - 1), ids(n - 1))) return
      // position = first held pair this one outranks
      var pos = 0
      while (pos < n && !beats(s, i, scores(pos), ids(pos))) pos += 1
      val last = math.min(n, k - 1)
      var j = last
      while (j > pos) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
      scores(pos) = s
      ids(pos) = i
      if (n < k) n += 1
    }

    def toBytes: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 16 * n)
      bb.putInt(n)
      var i = 0
      while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
      bb.array()
    }
  }

  object Buffer {
    def fromBytes(k: Int, bytes: Array[Byte]): Buffer = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new Buffer(k)
      var i = 0
      while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
      buf
    }
  }

  /** Column API: array of the k best (score, id) structs, best first. */
  def topK(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKAgg(Bridge.expression(score), Bridge.expression(id), k).toAggregateExpression())

  /** SQL-path builder shared by GraftExtensions and `register`: validates
    * arity and that `k` is a foldable integer LITERAL before planning, so a
    * malformed `top_k(...)` raises a standard AnalysisException
    * (WRONG_NUM_ARGS / NON_FOLDABLE_ARGUMENT) instead of an obscure
    * planner NPE/ClassCastException.
    */
  def build(exprs: Seq[Expression]): TopKAgg = {
    if (exprs.length != 3)
      throw new AnalysisException("WRONG_NUM_ARGS.WITHOUT_SUGGESTION", Map(
        "functionName" -> "`top_k`", "expectedNum" -> "3",
        "actualNum" -> exprs.length.toString, "docroot" -> "https://spark.apache.org/docs/latest"))
    val kExpr = exprs(2)
    val integral = kExpr.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!kExpr.foldable || !integral)
      throw new AnalysisException("NON_FOLDABLE_ARGUMENT", Map(
        "funcName" -> "`top_k`", "paramName" -> "`k`", "paramType" -> "\"INT\""))
    val k = kExpr.eval() match {
      case null => throw new AnalysisException("NON_FOLDABLE_ARGUMENT", Map(
        "funcName" -> "`top_k`", "paramName" -> "`k`", "paramType" -> "\"INT\""))
      case n: java.lang.Number => n.longValue
    }
    if (k < 1 || k > Int.MaxValue)
      throw new AnalysisException("INVALID_PARAMETER_VALUE.INTEGER", Map(
        "parameter" -> "`k`", "functionName" -> "`top_k`",
        "invalidValue" -> s"$k (must be in [1, ${Int.MaxValue}])"))
    TopKAgg(exprs.head, exprs(1), k.toInt)
  }

  /** Register `top_k(score, id, k)` on an existing session (the
    * GraftExtensions builder, for sessions created without extensions).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("top_k"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TopKAgg].getName, "top_k"),
      (exprs: Seq[Expression]) => build(exprs))
}
