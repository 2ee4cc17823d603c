package graft

import graft.functions.Exprs
import org.apache.spark.sql.functions._

class ExprsSpec extends SparkSuite {
  import spark.implicits._

  test("X1 stars: floor(rating/20), null -> 0, all six buckets") {
    val ratings = Seq[Option[Int]](None, Some(0), Some(19), Some(20), Some(40),
      Some(60), Some(80), Some(99), Some(100))
    val got = ratings.toDF("rating")
      .select(Exprs.stars($"rating").as("s")).as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 0L, 1L, 2L, 3L, 4L, 4L, 5L))
  }

  test("X2 inverse: rating = stars*20 (itdbloader.py:292)") {
    val got = Seq(0L, 3L, 5L).toDF("s")
      .select(Exprs.ratingFromStars($"s").as("r")).as[Long].collect().toSeq
    assert(got == Seq(0L, 60L, 100L))
  }

  test("X3 formatTime: h:mm:ss with zero-hour stripped (itdb2html.py:124-131)") {
    val cases = Seq(
      0L -> "0:00", 59000L -> "0:59", 61000L -> "1:01",
      3600000L -> "1:00:00", 3661000L -> "1:01:01", 86399000L -> "23:59:59")
    val got = cases.map(_._1).toDF("ms")
      .select(Exprs.formatTime($"ms").as("t")).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("X4 sanitize: non-alnum -> _, empty -> _NONE_ (itdb2html.py:63-71)") {
    val got = Seq("AC/DC & Friends!", "ok-1.2_x", "").toDF("n")
      .select(Exprs.sanitizeFilename($"n").as("f")).as[String].collect().toSeq
    assert(got == Seq("AC_DC___Friends_", "ok-1.2_x", "_NONE_"))
  }

  test("X20 basename/dirname") {
    val got = Seq("a/b/c.mp3").toDF("p")
      .select(Exprs.basename($"p"), Exprs.dirname($"p")).as[(String, String)]
      .collect().head
    assert(got == ("c.mp3", "a/b"))
  }

  test("shingles: k-gram generation incl. short docs") {
    val got = Seq("a b c d", "a b").toDF("t")
      .select(Exprs.shingles(Exprs.tokens($"t"), 3).as("sh")).as[Seq[String]]
      .collect().toSeq
    assert(got.head == Seq("a b c", "b c d"))
    assert(got(1) == Seq("a b")) // shorter than k -> whole doc
  }

  test("native word_shingles == builtin chain on edge cases") {
    // tab/newline EDGES are the hard cases: Spark trim strips spaces only,
    // and Spark split keeps leading/trailing empty tokens
    val inputs = Seq("", "a", "a b", "a  b\tc d", " x y z w ", "a b c",
      "a b c d\n", "\tx y", "a b \t", "  ")
    val df = inputs.toDF("t").select(
      Exprs.shingles(Exprs.tokens($"t"), 3).as("a"),
      graft.plans.ShinglesExpr.wordShingles($"t", 3).as("b"))
    val rows = df.as[(Seq[String], Seq[String])].collect()
    rows.zip(inputs).foreach { case ((a, b), in) =>
      assert(a == b, s"input=${in.map(c => if (c < ' ') f"\\x${c.toInt}%02x" else c)}")
    }
  }

  test("native minhash_sigs == builtin k-column formulation (via seededHash)") {
    val df = Seq("a b c d e", "one two three").toDF("t")
      .select(graft.plans.ShinglesExpr.wordShingles($"t", 3).as("sh"))
    // builtin side MUST go through Exprs.seededHash — the production seed
    // format — so this test tracks the real contract, not a copy of it
    val builtin = df.select((0 until 4).map(i =>
      array_min(transform($"sh", s => Exprs.seededHash(s"mh$i", s))).as(s"m$i")): _*)
    val native = df.select(graft.plans.MinHashExpr.minhashSigs($"sh", 4).as("sigs"))
      .select((0 until 4).map(i => element_at($"sigs", i + 1).as(s"m$i")): _*)
    assert(builtin.collect().toSeq == native.collect().toSeq)
  }

  test("native minhash_sigs of an empty shingle array is NULL like the builtin") {
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(Seq.empty[String])),
      StructType(Seq(StructField("sh", ArrayType(StringType)))))
    val got = df.select(graft.plans.MinHashExpr.minhashSigs(col("sh"), 3).as("sigs")).collect().head
    assert(got.isNullAt(0))
  }

  test("tokens: any whitespace run is one separator (oracle parity contract)") {
    // oracles use regexp_split_to_array('\s+') — Spark must agree on tabs,
    // newlines, and runs of spaces
    val got = Seq("a  b\tc\nd", " x y ").toDF("t")
      .select(Exprs.tokens($"t").as("w")).as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a", "b", "c", "d"), Seq("x", "y")))
  }

  test("hexVal maps all 16 hex digits") {
    val digits = "0123456789abcdef".map(_.toString)
    val got = digits.toDF("c").select(Exprs.hexVal($"c").as("v")).as[Int].collect().toSeq
    assert(got == (0 until 16))
  }

  test("A10 quality gate: open at exactly 20% rated, closed below (itdb2html.py:95)") {
    // reference gate: zero iff rated < 1 or rated*5 < total — exact integers
    def q(s0: Long, s3: Long) = Seq((s0, s3)).toDF("s0", "s3")
      .select(Exprs.quality(lit(s0), lit(0L), lit(0L), lit(s3), lit(0L), lit(0L)).as("q"))
      .as[Double].collect().head
    assert(q(8, 2) == 3.0)   // 2/10 = exactly 20% -> gate OPEN (2*5 >= 10)
    assert(q(9, 2) == 0.0)   // 2/11 < 20% -> closed (2*5 < 11)
    assert(q(7, 3) == 3.0)   // 3/10 = 30% -> all 3-star -> 3.0
    assert(q(0, 0) == 0.0)   // empty group
  }

  test("W1 identity: distributed count(value)-count(DISTINCT) == lag-window scan") {
    val dir = "/root/testdata/sf0.001"
    val dist = graft.operators.Library.adjacentDuplicates(spark, dir)
      .as[Long].collect().head
    val window = graft.operators.Library.adjacentDuplicatesWindow(spark, dir)
      .as[Long].collect().head
    assert(dist == window)
    assert(dist > 0)  // sf0.001 events has duplicate values — nontrivial check
  }

  test("dot product: dimension mismatch -> null, never a truncated number") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)),
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val got = df.select(Exprs.dotProduct($"a", $"b").as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(14.0), None))
  }

  test("cosine: identical vectors -> 1, orthogonal -> 0") {
    val df = Seq(
      (Seq(1f, 0f, 2f), Seq(1f, 0f, 2f)),
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f))).toDF("a", "b")
    val got = df.select(round(Exprs.cosine($"a", $"b"), 6).as("c")).as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.0))
  }
}
