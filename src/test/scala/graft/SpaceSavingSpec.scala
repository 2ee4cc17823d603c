package graft

import graft.plans.SpaceSavingAgg
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** SpaceSaving frequent-items sketch: guarantee tests on a planted Zipf
  * stream where eviction and merge-trim genuinely fire (unlike the sf
  * token streams, whose 31 distinct tokens fit any reasonable capacity).
  */
class SpaceSavingSpec extends SparkSuite {
  import spark.implicits._

  /** ~5k-row Zipf-ish stream over 200 distinct items: item i appears
    * ceil(2000/i) times for i in 1..200 — a long tail with genuine heavy
    * hitters. Deterministic, shuffled deterministically (md5 sort) so
    * partitions see interleaved items, then spread over 8 partitions to
    * force partial-buffer merges.
    */
  private lazy val stream = {
    val rows = (1 to 200).flatMap(i => Seq.fill(2000 / i)(s"item$i"))
    val sortedByHash = rows.zipWithIndex.sortBy { case (s, ix) =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$s:$ix".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.map(_._1)
    sortedByHash.toDF("tk").repartition(8)
  }

  private lazy val exact: Map[String, Long] =
    (1 to 200).map(i => s"item$i" -> (2000 / i).toLong).toMap
  private lazy val n: Long = exact.values.sum

  private def summary(capacity: Int): Map[String, (Long, Long)] = {
    val sk = stream.agg(SpaceSavingAgg.spaceSavingTopK(col("tk"), capacity).as("sk"))
      .collect().head.getSeq[Row](0)
    assert(sk.size <= capacity)
    sk.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("spacesaving: overestimate-only and bounded error under real eviction") {
    val cap = 16
    val sk = summary(cap)
    // eviction fired: the summary cannot hold all 200 distinct items
    assert(sk.size == cap)
    sk.foreach { case (item, (est, err)) =>
      val t = exact(item)
      assert(est >= t, s"$item underestimated: est=$est true=$t")
      assert(est <= t + n / cap, s"$item error above n/cap: est=$est true=$t")
      assert(err <= n / cap)
    }
  }

  test("spacesaving: containment of heavy hitters at the gate threshold") {
    val cap = 16
    val sk = summary(cap)
    val heavy = exact.filter { case (_, t) => t * cap > 2 * n }
    assert(heavy.nonEmpty, "fixture must plant true heavy hitters")
    heavy.foreach { case (item, t) =>
      assert(sk.contains(item), s"heavy hitter $item (n=$t) missing from summary")
    }
  }

  test("spacesaving: exact when distinct items fit the capacity") {
    val sk = summary(256)
    assert(sk.size == 200)
    sk.foreach { case (item, (est, err)) =>
      assert(est == exact(item) && err == 0L)
    }
  }

  test("t15 heavy hitters gate shape: flags are TRUE on sf data") {
    val got = graft.operators.TextAnalysis.heavyHitters(spark, sf("sf0.001"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getBoolean(3) && r.getBoolean(4),
        s"guarantee flag false for ${r.getString(1)}")
    }
  }
}
