package graft

import graft.operators.{Dedup, Library, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-4 curation operators (w7 sessionize, w8 ntile, t11 rebalance
  * sample, d10 decontamination) checked against full DRIVER-SIDE
  * recomputations at sf0.001 — an in-test oracle independent of both the
  * Spark plan and the DuckDB gate.
  */
class CurationOpsSpec extends SparkSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket256(key: String): Int = {
    val h = md5hex(key)
    def hv(c: Char): Int = if (c >= 'a') c - 87 else c - '0'
    hv(h.charAt(0)) * 16 + hv(h.charAt(1))
  }

  /** Spark round(x, n) semantics: HALF_UP over the toString decimal form. */
  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue

  test("w7 sessionize: driver-side replay reproduces every session") {
    val dir = sf("sf0.001")
    val gap = 30L * 60 * 1000 * 1000
    val got = Library.sessionize(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSet

    val evs = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getLong(1), (r.getLong(0), r.getLong(2), r.getDouble(3))))
    val expected = evs.groupBy(_._1).flatMap { case (uid, rows) =>
      val sorted = rows.map(_._2).sortBy(e => (e._2, e._1))
      val sessions = scala.collection.mutable.Buffer.empty[scala.collection.mutable.Buffer[(Long, Long, Double)]]
      sorted.foreach { e =>
        if (sessions.nonEmpty && e._2 - sessions.last.last._2 <= gap) sessions.last += e
        else sessions += scala.collection.mutable.Buffer(e)
      }
      sessions.zipWithIndex.map { case (s, i) =>
        // mirror the engine fold: each double -> decimal(18,6), exact sum
        val sum = s.map(e => java.math.BigDecimal.valueOf(e._3)
          .setScale(6, java.math.RoundingMode.HALF_UP)).reduce(_.add(_))
        (uid, (i + 1).toLong, s.head._2, s.last._2, s.last._2 - s.head._2,
          s.size.toLong, round4(sum.doubleValue))
      }
    }.toSet
    assert(got == expected && got.size > 100)
  }

  test("w7b chunked sessionize == w7 on a planted skew gallery and real data") {
    import spark.implicits._
    val gap = 30L * 60 * 1000 * 1000    // 30 min
    val hour = 3600L * 1000 * 1000
    val base = 1704067200000000L        // 2024-01-01T00:00:00Z micros
    // the gallery plants every stitch shape: user 1 = the BOT (an event
    // every 10 min for 48h — ONE session spanning 24 two-hour chunks);
    // user 2 = a gap of EXACTLY gapUs straddling a chunk boundary (must
    // merge: the rule is strictly >) and a gap just OVER gapUs inside a
    // chunk (must split); user 3 = a session bridging an EMPTY chunk
    // (chunkUs < gapUs run); user 4 = a single event
    val bot = (0 until 288).map(i => (1000L + i, base + i * 10L * 60 * 1000000, 1L, 0.25 * (i % 7)))
    val u2 = Seq(
      (2001L, base + 2 * hour - 1000000L, 2L, 1.5), // 1s before the chunk edge
      (2002L, base + 2 * hour - 1000000L + gap, 2L, 2.5), // exactly gap later, next chunk
      (2003L, base + 3 * hour, 2L, 3.5),
      (2004L, base + 3 * hour + gap + 1L, 2L, 4.5)) // 1 µs over the gap: split
    val u3 = Seq(
      (3001L, base + 55L * 60 * 1000000, 3L, 0.5),
      (3002L, base + 80L * 60 * 1000000, 3L, 0.7)) // 25 min later: one session
    val u4 = Seq((4001L, base + 7 * hour, 4L, 9.0))
    val root = java.nio.file.Files.createTempDirectory("w7b_gallery").toString
    val tmpOut = s"$root/out"
    (bot ++ u2 ++ u3 ++ u4).toDF("event_id", "ts", "user_id", "value")
      .withColumn("ts", timestamp_micros(col("ts")))
      .withColumn("event_type", lit("click"))
      .withColumn("props", lit("{}"))
      .coalesce(1).write.parquet(tmpOut)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmpOut)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(part, java.nio.file.Paths.get(s"$root/events.parquet"))

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    val w7 = rows(Library.sessionize(spark, root))
    // identity must hold with chunks ABOVE the gap (default 2h), BELOW it
    // (10 min — sessions routinely bridge empty chunks), and comically
    // small (1 min — every event its own local session)
    for (chunk <- Seq(2 * hour, 10L * 60 * 1000000, 60L * 1000000))
      assert(rows(Library.chunkedSessionize(spark, root, chunkUs = chunk)) == w7,
        s"chunked != w7 at chunkUs=$chunk")
    // structure sanity: the bot is one 48h session over 24+ chunks; user
    // 2 merged across the boundary (3 sessions total), user 3 bridged the
    // empty chunk (1), user 4 singleton (1)
    val byUser = w7.groupBy(_.head.asInstanceOf[Long])
    assert(byUser(1L).size == 1 && byUser(2L).size == 3 &&
      byUser(3L).size == 1 && byUser(4L).size == 1)
    // and on real data at both small SFs
    for (sfd <- Seq("sf0.001", "sf0.01"))
      assert(rows(Library.chunkedSessionize(spark, sf(sfd))) ==
        rows(Library.sessionize(spark, sf(sfd))), s"chunked != w7 at $sfd")
  }

  test("w6b/w10b chunked twins == w6/w10 on a planted skew gallery and real data") {
    import spark.implicits._
    val hour = 3600L * 1000 * 1000
    val base = 1704067200000000L        // 2024-01-01T00:00:00Z micros
    // gallery: user 1 = the BOT (every 70s for 48h — chunk-spanning dense
    // stream; its 1h trailing windows straddle every chunk edge); user 2
    // plants exact-boundary arithmetic: events at chunk_edge - (W-1),
    // chunk_edge - 1, chunk_edge, chunk_edge + W - 1 (the last one's
    // frame must include the edge event and nothing earlier); user 3 =
    // sparse events far apart (every frame is a singleton); user 4 = one
    // event. Values exercise the decimal stitch (negative + 6-decimal).
    val bot = (0 until 2468).map(i =>
      (1000L + i, base + i * 70L * 1000000, 1L, (if (i % 3 == 0) -1 else 1) * 0.123456 * (i % 11)))
    val edge = 6 * hour                 // the w10b default chunk boundary
    val u2 = Seq(
      (2001L, base + edge - (hour - 1), 2L, 1.5),
      (2002L, base + edge - 1, 2L, -2.25),
      (2003L, base + edge, 2L, 3.125),
      (2004L, base + edge + hour - 1, 2L, 0.000001))
    val u3 = Seq((3001L, base + hour, 3L, 7.5), (3002L, base + 30 * hour, 3L, -0.5))
    val u4 = Seq((4001L, base + 7 * hour, 4L, 9.0))
    val root = java.nio.file.Files.createTempDirectory("w6b_gallery").toString
    val tmpOut = s"$root/out"
    (bot ++ u2 ++ u3 ++ u4).toDF("event_id", "ts", "user_id", "value")
      .withColumn("ts", timestamp_micros(col("ts")))
      .withColumn("event_type", lit("click"))
      .withColumn("props", lit("{}"))
      .coalesce(1).write.parquet(tmpOut)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmpOut)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(part, java.nio.file.Paths.get(s"$root/events.parquet"))

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    // w6b at chunks above, at, and comically below the default — the
    // decimal stitch must be exact at every granularity
    val w6 = rows(Library.runningSum(spark, root))
    for (chunk <- Seq(2 * hour, 30L * 60 * 1000000, 60L * 1000000))
      assert(rows(Library.chunkedRunningSum(spark, root, chunkUs = chunk)) == w6,
        s"chunked running sum != w6 at chunkUs=$chunk")
    // w10b at the default 6h chunk and at the minimum legal chunk (== the
    // window itself, where the ghost region is the WHOLE previous chunk)
    val w10 = rows(Library.burstDetection(spark, root))
    for (chunk <- Seq(6 * hour, hour))
      assert(rows(Library.chunkedBurstDetection(spark, root, chunkUs = chunk)) == w10,
        s"chunked burst != w10 at chunkUs=$chunk")
    // structure sanity: the bot's peak is the full 1h window density
    // (3600s / 70s + 1 = 52 events); user 2's peak counts the three
    // events within [edge - (W-1), edge] plus nothing earlier
    val w10Map = w10.map(s => s.head.asInstanceOf[Long] -> s(1).asInstanceOf[Long]).toMap
    assert(w10Map(1L) == 52L, s"bot peak ${w10Map(1L)}")
    assert(w10Map(2L) == 3L, s"u2 peak ${w10Map(2L)}")
    assert(w10Map(3L) == 1L && w10Map(4L) == 1L)
    // below the window, the chunk invariant must refuse loudly
    intercept[IllegalArgumentException](
      Library.chunkedBurstDetection(spark, root, chunkUs = 30L * 60 * 1000000))
    // and on real data at both small SFs
    for (sfd <- Seq("sf0.001", "sf0.01")) {
      assert(rows(Library.chunkedRunningSum(spark, sf(sfd))) ==
        rows(Library.runningSum(spark, sf(sfd))), s"w6b != w6 at $sfd")
      assert(rows(Library.chunkedBurstDetection(spark, sf(sfd))) ==
        rows(Library.burstDetection(spark, sf(sfd))), s"w10b != w10 at $sfd")
    }
  }

  test("w6b carries NULL-user events through the stitch (r11 ADVICE)") {
    import spark.implicits._
    val hour = 3600L * 1000 * 1000
    val base = 1704067200000000L
    // NULL user_ids form ONE window partition in w6 (and its oracle);
    // the chunked twin's stitch join must be null-safe or every
    // NULL-user event silently vanishes. Spread the NULL rows across
    // chunks so the offset join (not just the local prefix) is exercised.
    val rows0 = Seq(
      (1L, base, Some(1L), 1.0),
      (2L, base + 1, None, 2.5),
      (3L, base + 7 * hour, None, -1.25),
      (4L, base + 13 * hour, None, 0.000001),
      (5L, base + hour, Some(1L), 3.0),
      (6L, base + 13 * hour + 1, None, 4.75))
    val root = java.nio.file.Files.createTempDirectory("w6b_null").toString
    val tmpOut = s"$root/out"
    rows0.toDF("event_id", "ts", "user_id", "value")
      .withColumn("ts", timestamp_micros(col("ts")))
      .withColumn("event_type", lit("click"))
      .withColumn("props", lit("{}"))
      .coalesce(1).write.parquet(tmpOut)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmpOut)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(part, java.nio.file.Paths.get(s"$root/events.parquet"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    val w6 = rows(Library.runningSum(spark, root))
    assert(w6.count(_(1) == null) == 4, "gallery lost its NULL-user rows in w6")
    for (chunk <- Seq(2 * hour, 6 * hour, 60L * 1000000))
      assert(rows(Library.chunkedRunningSum(spark, root, chunkUs = chunk)) == w6,
        s"chunked running sum != w6 with NULL users at chunkUs=$chunk")
  }

  test("w4b chunked as-of == w4 on a planted carry gallery and real data") {
    import spark.implicits._
    val hour = 3600L * 1000 * 1000
    val base = 1704067200000000L
    // the gallery plants every carry shape: user 1 = views only in chunk
    // 0, clicks spread over chunks 1..5 (multi-chunk carry-in, incl.
    // empty chunks between); user 2 = a view EXACTLY at the 6h chunk edge
    // and a click 1µs later in the same chunk, plus a click at the edge
    // of the NEXT chunk (carry across); user 3 = click and view at the
    // SAME ts (ASOF <= must match it) and a click BEFORE any view (null
    // attrs); user 4 = duplicate-ts views (highest event_id wins); the
    // BOT user 5 = a click every 70s for 36h with one view per 12h
    val u1 = Seq((101L, base + hour, 1L, "view", 1.5)) ++
      (1 to 5).map(c => (110L + c, base + c * 6 * hour + hour, 1L, "click", 0.0))
    val u2 = Seq(
      (201L, base + 6 * hour, 2L, "view", 2.5),
      (202L, base + 6 * hour + 1, 2L, "click", 0.0),
      (203L, base + 12 * hour, 2L, "click", 0.0))
    val u3 = Seq(
      (301L, base + hour, 3L, "click", 0.0),
      (302L, base + 2 * hour, 3L, "view", 3.5),
      (303L, base + 2 * hour, 3L, "click", 0.0))
    val u4 = Seq(
      (401L, base + hour, 4L, "view", 4.0),
      (402L, base + hour, 4L, "view", 4.5),
      (403L, base + 3 * hour, 4L, "click", 0.0))
    val bot = (0 until 1851).map(i =>
      (1000L + i, base + i * 70L * 1000000, 5L, "click", 0.0)) ++
      (0 until 3).map(i => (9000L + i, base + i * 12 * hour, 5L, "view", 0.5 + i))
    val root = java.nio.file.Files.createTempDirectory("w4b_gallery").toString
    val tmpOut = s"$root/out"
    (u1 ++ u2 ++ u3 ++ u4 ++ bot).toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts")))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(tmpOut)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmpOut)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(part, java.nio.file.Paths.get(s"$root/events.parquet"))

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    val w4 = rows(Library.clickAsofView(spark, root))
    for (chunk <- Seq(6 * hour, hour, 10L * 60 * 1000000))
      assert(rows(Library.asofJoinChunked(Tables.events(spark, root), "click", "view",
          chunkUs = chunk)
        .select(col("event_id").as("click_id"), col("user_id"),
          unix_micros(col("ts")).as("click_us"),
          unix_micros(col("right_ts")).as("view_us"),
          col("right_value").as("view_value"))) == w4,
        s"chunked asof != w4 at chunkUs=$chunk")
    // structure sanity: u1's far clicks all carry the chunk-0 view; u3's
    // first click has NULL attrs, its same-ts click matches; u4's dup-ts
    // carry is the higher event_id's value
    val m = w4.map(s => s.head.asInstanceOf[Long] -> s).toMap
    (1 to 5).foreach(c => assert(m(110L + c)(4) == 1.5, s"u1 click $c"))
    assert(m(301L)(3) == null && m(301L)(4) == null)
    assert(m(303L)(4) == 3.5)
    assert(m(403L)(4) == 4.5)
    // and on real data at both small SFs
    for (sfd <- Seq("sf0.001", "sf0.01"))
      assert(rows(Library.clickAsofViewChunked(spark, sf(sfd))) ==
        rows(Library.clickAsofView(spark, sf(sfd))), s"w4b != w4 at $sfd")
  }

  test("w8 ntile quartiles: driver-side bucketing reproduces counts and bounds") {
    val dir = sf("sf0.001")
    val got = Library.priorityQuartiles(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet

    val orders = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expected = orders.groupBy(_._1).flatMap { case (prio, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val n = sorted.length
      val base = n / 4
      val extra = n % 4
      // ntile: first (n mod b) buckets get one extra row
      val bounds = (0 until 4).scanLeft(0)((acc, i) => acc + base + (if (i < extra) 1 else 0))
      (0 until 4).filter(i => bounds(i + 1) > bounds(i)).map { i =>
        val slice = sorted.slice(bounds(i), bounds(i + 1))
        (prio, (i + 1).toLong, slice.size.toLong, slice.map(_._3).min, slice.map(_._3).max)
      }
    }.toSet
    assert(got == expected && got.nonEmpty)
  }

  test("t19 token packing: driver-side replay reproduces the layout") {
    val dir = sf("sf0.001")
    val got = TextAnalysis.tokenPacking(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSet
    val docs = Tables.documents(spark, dir).select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      var off = 0L
      rows.sortBy(_._1).toSeq.map { case (id, _, text) =>
        val n = text.trim.split("\\s+").length.toLong
        val o = off
        off += n
        (id, lang, n, o / 256, o % 256, o % 256 + n > 256)
      }
    }.toSet
    assert(got == expected && got.nonEmpty)
    // the layout is non-degenerate: some doc straddles a pack boundary,
    // and every lang's first doc starts at offset 0 of pack 0
    assert(got.exists(_._6))
    docs.groupBy(_._2).foreach { case (lang, rows) =>
      val first = rows.map(_._1).min
      assert(got.exists(t => t._1 == first && t._4 == 0L && t._5 == 0L))
    }
  }

  test("t11 rebalance sample: integer coin matches driver recompute, minority kept whole") {
    val dir = sf("sf0.001")
    val got = TextAnalysis.rebalanceSample(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val counts = docs.groupBy(_._2).map { case (l, d) => l -> d.size.toLong }
    val minDocs = counts.values.min
    val expected = docs.groupBy(_._2).map { case (l, d) =>
      val kept = d.count { case (id, _) => bucket256(s"samp:$id") * counts(l) < minDocs * 256 }
      (l, d.size.toLong, kept.toLong)
    }.toSet
    assert(got == expected)
    // the minority language's rate is 1: every bucket (<=255) passes 255*n < n*256
    val minorityLang = counts.minBy(_._2)._1
    val minority = got.find(_._1 == minorityLang).get
    assert(minority._2 == minority._3)
    // majority languages genuinely downsample
    assert(got.exists(r => r._3 < r._2))
  }

  test("t17 mixture sample: sqrt-rate integer coin matches driver recompute") {
    val dir = sf("sf0.001")
    val got = TextAnalysis.mixtureWeightedSample(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getString(2))))
    val counts = docs.groupBy(_._2).map { case (g, d) => g -> d.size.toLong }
    val minDocs = counts.values.min
    val expected = docs.groupBy(_._2).map { case (g, d) =>
      val kept = d.count { case (id, _) =>
        val b = bucket256(s"mix:$id"); b * b * counts(g) < minDocs * 65536
      }
      (g._1, g._2, d.size.toLong, kept.toLong)
    }.toSet
    assert(got == expected)
    // the minority group keeps everything: b^2 <= 65025 < 65536
    val minority = counts.minBy(_._2)._1
    val m = got.find(r => (r._1, r._2) == minority).get
    assert(m._3 == m._4)
    // large groups genuinely downsample (the corpus-dependent claim) ...
    assert(got.exists(r => r._4 < r._3))
    // ... and the coin's RATE is exactly the sqrt temperature, shown on
    // the coin arithmetic itself (corpus-independent): a group 4x/100x
    // the minority passes 128/256 ≈ sqrt(1/4) and 26/256 ≈ sqrt(1/100)
    // of the buckets
    def passing(n: Long, min: Long) = (0 until 256).count(b => b.toLong * b * n < min * 65536)
    assert(passing(4, 1) == 128)
    assert(passing(100, 1) == 26)
    assert(passing(1, 1) == 256)
  }

  test("d10 decontamination: driver-side 8-gram overlap reproduces the report") {
    val dir = sf("sf0.001")
    val got = Dedup.crossSplitContamination(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    def shingle8(text: String): Set[String] = {
      val w = text.trim.split("\\s+").toSeq
      if (w.length < 8) Set(w.mkString(" "))
      else w.sliding(8).map(_.mkString(" ")).toSet
    }
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .flatMap(r => Option(r.getString(1)).map(t => (r.getLong(0), t)))
      .map { case (id, t) => (id, bucket256(id.toString), shingle8(t)) }
    val testGrams = docs.filter(_._2 >= 253).flatMap(_._3).toSet
    val expected = docs.filter(_._2 < 250).flatMap { case (id, _, g8) =>
      val shared = g8.count(testGrams.contains)
      if (shared > 0)
        Some((id, shared.toLong, g8.size.toLong, round4(shared.toDouble / g8.size)))
      else None
    }.toSet
    assert(got == expected)
    // both splits are nonempty at sf0.001 — the check exercises real data
    assert(docs.exists(_._2 >= 253) && docs.count(_._2 < 250) > 10)
  }

  test("d10 decontamination: planted cross-split overlap hits the join path") {
    // the sf tables contain no genuine contamination (0 rows both engines),
    // so this fixture is the only exercise of the join-hit path: n_shared
    // counting, shared_frac rounding, partial-overlap arithmetic
    import spark.implicits._
    // ids whose t9 split bucket is train (<250) / test (>=253), found by
    // the same md5-byte rule both engines share
    val trainIds = (1L to 2000L).filter(id => bucket256(id.toString) < 250)
    val testId = (1L to 2000L).find(id => bucket256(id.toString) >= 253).get
    val Seq(full, partial, clean) = trainIds.take(3)
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    // 10 words -> 3 8-grams, all shared with the test doc
    val fullText = shared
    // first 9 shared words + a distinct 3-word tail: 12 words -> 5 8-grams,
    // of which exactly 2 (w1..w8, w2..w9) appear in the test doc
    val partialText = shared.split(" ").take(9).mkString(" ") + " xray yankee zulu"
    val cleanText = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (full, fullText), (partial, partialText), (clean, cleanText),
      (testId, shared)
    ).toDF("doc_id", "text")
    val got = Dedup.crossSplitContaminationOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == Set(
      (full, 3L, 3L, 1.0),
      (partial, 2L, 5L, 0.4)))
  }

  test("t12 PII scrub: planted PII is counted, redacted, and ordering-correct") {
    // the sf documents carry no PII (all-zero counts on the gate), so the
    // hit path — counting, chained replacement, email-before-digits order —
    // is exercised here
    import spark.implicits._
    val docs = Seq(
      (1L, "contact alice.smith+x@example.co.uk or bob@host.org today"),
      (2L, "server 192.168.0.1 and card 4111111111111111 leaked"),
      (3L, "clean text with the number 42 and ip-free prose"),
      (4L, "mail id9876543210@digits.example then 123456789")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrubOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).sortBy(_._1)

    def sha(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(0) == ((1L, 2L, 0L, 0L,
      sha("contact <EMAIL> or <EMAIL> today"))))
    assert(got(1) == ((2L, 0L, 1L, 1L,
      sha("server <IP> and card <NUM> leaked"))))
    assert(got(2) == ((3L, 0L, 0L, 0L,
      sha("clean text with the number 42 and ip-free prose"))))
    // doc 4: counts scan the ORIGINAL text (2 digit runs — one inside the
    // address), while redaction is ordered: the email pass swallows its
    // embedded digits first, so only the standalone run becomes <NUM>
    assert(got(3) == ((4L, 1L, 0L, 2L,
      sha("mail <EMAIL> then <NUM>"))))
  }

  test("d12 boilerplate: planted shared chunk removed, unique docs untouched") {
    import spark.implicits._
    def sha(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // chunk boundaries fall every 4 tokens: the shared license header
    // occupies chunk 0 of docs 1-3 exactly; doc 4 shares nothing; doc 5
    // repeats a chunk INTERNALLY (df counts distinct docs, so not boiler)
    val docs = Seq(
      (1L, "lic a b c u1 u2 u3 u4"),
      (2L, "lic a b c v1 v2 v3 v4"),
      (3L, "lic a b c w1 w2 w3 w4"),
      (4L, "x1 x2 x3 x4 y1 y2"),
      (5L, "r1 r2 r3 r4 r1 r2 r3 r4")
    ).toDF("doc_id", "text")
    val got = Dedup.boilerplateChunksOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4))).sortBy(_._1)
    assert(got(0) == ((1L, 2L, 1L, 0.5, sha("u1 u2 u3 u4"))))
    assert(got(1) == ((2L, 2L, 1L, 0.5, sha("v1 v2 v3 v4"))))
    assert(got(2) == ((3L, 2L, 1L, 0.5, sha("w1 w2 w3 w4"))))
    assert(got(3) == ((4L, 2L, 0L, 0.0, sha("x1 x2 x3 x4 y1 y2"))))
    assert(got(4) == ((5L, 2L, 0L, 0.0, sha("r1 r2 r3 r4 r1 r2 r3 r4"))))
  }

  test("t16 quality sample: integer tier coin matches driver recompute, rate rises with tier") {
    val dir = sf("sf0.001")
    val got = TextAnalysis.qualityWeightedSample(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stopwords = Set("the", "a", "of", "and", "to", "in", "is")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect().flatMap(r => Option(r.getString(1)).map(t => (r.getLong(0), t)))
    val expected = docs.map { case (id, t) =>
      val tier = t.trim.split("\\s+").toSet.count(stopwords).toLong
      val kept = bucket256(s"qsamp:$id") * 7 < tier * 256
      (tier, kept)
    }.groupBy(_._1).map { case (tier, rows) =>
      (tier, rows.size.toLong, rows.count(_._2).toLong)
    }.toSet
    assert(got == expected && got.nonEmpty)
    // the coin genuinely discriminates: some tier keeps strictly fewer
    // docs than it has, and tier 7 (if present) keeps everything
    assert(got.exists(r => r._3 < r._2))
    got.find(_._1 == 7L).foreach(r => assert(r._3 == r._2))
  }

  test("w10 burst detection: driver-side trailing-window replay reproduces peaks") {
    val dir = sf("sf0.001")
    val windowUs = 3600L * 1000 * 1000
    val got = Library.burstDetection(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val evs = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = evs.groupBy(_._1).map { case (uid, rows) =>
      val ts = rows.map(_._2).sorted
      // RANGE frame: at each event, peers included — count by VALUE bounds
      val peak = ts.map(t => ts.count(u => u > t - windowUs && u <= t)).max
      (uid, peak.toLong, ts.size.toLong)
    }.toSet
    assert(got == expected && got.nonEmpty)
    // the fixture genuinely bursts: some user's peak exceeds 1
    assert(got.exists(_._2 > 1))
  }

  test("t18 unigram surprisal: driver-side integer floor-log2 reproduces every doc") {
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .flatMap(r => Option(r.getString(1)).map(t => r.getLong(0) -> t))
    def toks(t: String): Seq[String] = t.trim.split("\\s+").toSeq
    val tf: Map[(Long, String), Long] = docs.flatMap { case (id, t) =>
      toks(t).groupBy(identity).map { case (w, g) => (id, w) -> g.size.toLong }
    }.toMap
    val wtf: Map[String, Long] =
      tf.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum }
    val total = wtf.values.sum
    def floorLog2(n: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(n)
    val expected = tf.groupBy(_._1._1).map { case (id, m) =>
      id -> ((m.values.sum,
        m.map { case ((_, w), c) => c * floorLog2(total / wtf(w)) }.sum))
    }
    val got = TextAnalysis.unigramSurprisal(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    // non-degenerate: some document actually carries rare-token surprisal
    assert(got.values.exists(_._2 > 0))
  }

  test("t21 NB probe: driver-side replay reproduces every score; classes separate") {
    val dir = sf("sf0.001")
    val raw = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "lang").collect()
      .flatMap(r => Option(r.getString(1)).map(t =>
        (r.getLong(0), t, r.getString(2))))
    def toks(t: String): Seq[String] = t.trim.split("\\s+").toSeq
    // the target-language weak label (the CCNet formulation)
    val label: Map[Long, Boolean] = raw.map { case (id, _, l) => id -> (l == "en") }.toMap
    val docs = raw.map { case (id, t, _) => id -> t }
    val tf: Map[(Long, String), Long] = docs.flatMap { case (id, t) =>
      toks(t).groupBy(identity).map { case (w, g) => (id, w) -> g.size.toLong }
    }.toMap
    val ck = tf.groupBy(_._1._2).map { case (w, m) =>
      w -> m.collect { case ((id, _), c) if label(id) => c }.sum }
    val cd = tf.groupBy(_._1._2).map { case (w, m) =>
      w -> m.collect { case ((id, _), c) if !label(id) => c }.sum }
    val (nk, nd, v) = (ck.values.sum, cd.values.sum, ck.size.toLong)
    val w: Map[String, Long] = ck.keys.map(t =>
      t -> (((ck(t) + 1) * (nd + v) * 1024) / ((cd(t) + 1) * (nk + v)) - 1024)).toMap
    val expected = tf.groupBy(_._1._1).map { case (id, m) =>
      id -> m.map { case ((_, t), c) => c * w(t) }.sum
    }
    val got = TextAnalysis.nbQualityProbe(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getBoolean(3))))
      .toMap
    assert(got.view.mapValues(_._1).toMap == expected)
    assert(got.forall { case (id, (s, l, p)) => l == label(id) && p == (s >= 0) })
    // the probe genuinely separates its training classes: mean score of
    // keeps above mean score of drops, strictly
    val keeps = got.values.collect { case (s, true, _) => s.toDouble }
    val drops = got.values.collect { case (s, false, _) => s.toDouble }
    assert(keeps.nonEmpty && drops.nonEmpty)
    assert(keeps.sum / keeps.size > drops.sum / drops.size,
      s"no separation: keep mean ${keeps.sum / keeps.size} vs drop mean ${drops.sum / drops.size}")
  }

  test("t22 mixture allocation: driver-side Hamilton apportionment, sums to budget exactly") {
    val dir = sf("sf0.001")
    val budget = 100000L
    val got = TextAnalysis.mixtureAllocation(spark, dir, budget)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._4).sum == budget, "allocations must sum to the budget exactly")
    // driver replay
    val strata = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "source", "text").collect()
      .flatMap(r => Option(r.getString(2)).map(t =>
        (r.getString(0), r.getString(1)) -> t.trim.split("\\s+").length.toLong))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val total = strata.values.sum
    val based = strata.map { case (k, t) =>
      (k, t, budget * t / total, budget * t % total) }.toSeq
    val shortfall = budget - based.map(_._3).sum
    val topped = based.sortBy { case ((l, s), _, _, rem) => (-rem, l, s) }
      .zipWithIndex.map { case ((k, t, b, _), i) =>
        (k._1, k._2, t, b + (if (i < shortfall) 1L else 0L)) }.toSet
    assert(got.toSet == topped)
    // proportionality: every allocation within 1 of the exact quota
    got.foreach { case (l, s, t, a) =>
      val quota = budget.toDouble * t / total
      assert(math.abs(a - quota) < 1.0 + 1e-9, s"($l,$s) alloc $a quota $quota")
    }
  }

  test("t14 sequence pack: driver-side greedy packing reproduces every bin") {
    val dir = sf("sf0.001")
    val got = TextAnalysis.sequencePack(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().flatMap(r => Option(r.getString(2)).map(t =>
        (r.getLong(0), r.getString(1), t.trim.split("\\s+").length.toLong)))
    def split(id: Long): String = {
      val b = bucket256(id.toString)
      if (b < 250) "train" else if (b < 253) "val" else "test"
    }
    val expected = docs.map { case (id, lang, n) => ((split(id), lang), (id, n)) }
      .groupBy(_._1).flatMap { case ((sp, lang), rows) =>
        var cum = 0L
        rows.map(_._2).sortBy(_._1).map { case (_, n) =>
          val bin = cum / 1024; cum += n; (sp, lang, bin, n)
        }.groupBy(_._3).map { case (bin, members) =>
          (sp, lang, bin, members.size.toLong, members.map(_._4).sum)
        }
      }.toSet
    assert(got == expected && got.size > 3)
    // bins genuinely chain: some (split, lang) stream fills more than one bin
    assert(got.groupBy(r => (r._1, r._2)).exists(_._2.size > 1))
  }

  test("d10b bloom decontamination == exact tier: planted hits, heavy-FP sketch, empty eval split") {
    import spark.implicits._
    // the d10 planted-overlap fixture — the bloom tier must agree with the
    // exact tier row-for-row wherever the exact tier has hits
    val trainIds = (1L to 2000L).filter(id => bucket256(id.toString) < 250)
    val testId = (1L to 2000L).find(id => bucket256(id.toString) >= 253).get
    val Seq(full, partial, clean) = trainIds.take(3)
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    val partialText = shared.split(" ").take(9).mkString(" ") + " xray yankee zulu"
    val cleanText = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (full, shared), (partial, partialText), (clean, cleanText),
      (testId, shared)
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val exact = rows(Dedup.crossSplitContaminationOf(docs))
    assert(exact.size == 2)
    assert(rows(Dedup.crossSplitContaminationBloomOf(docs)) == exact)
    // a deliberately starved 64-bit sketch makes almost every train gram a
    // false positive — the exact verify join must still discard them all
    // (the sketch sizes THROUGHPUT, never the answer)
    assert(rows(Dedup.crossSplitContaminationBloomOf(docs, numBits = 64L)) == exact)
    // no eval-split docs → BloomFilterAggregate yields a NULL sketch →
    // empty result with the schema intact (nothing can be contaminated)
    val trainOnly = Seq((full, shared), (clean, cleanText)).toDF("doc_id", "text")
    val emptySplit = Dedup.crossSplitContaminationBloomOf(trainOnly)
    assert(emptySplit.columns.toSeq ==
      Seq("doc_id", "n_shared", "n_shingles", "shared_frac"))
    assert(emptySplit.count() == 0)
    // real data: both tiers agree (zero genuine contamination at sf0.001)
    assert(Dedup.crossSplitContaminationBloom(spark, sf("sf0.001")).count() ==
      Dedup.crossSplitContamination(spark, sf("sf0.001")).count())
  }

  test("eval gram state round-trips through disk; loaded screen == direct screen") {
    import spark.implicits._
    val evalText = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    val evalDocs = Seq((900L, evalText)).toDF("doc_id", "text")
    val train = Seq((1L, evalText + " extra tail words here"),
      (2L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val direct = Dedup.evalGramState(evalDocs)
    try {
      Dedup.saveEvalGramState(spark, "evst_test", direct)
      val loaded = Dedup.loadEvalGramState(spark, "evst_test")
      assert(java.util.Arrays.equals(loaded.bloom.get, direct.bloom.get))
      val want = rows(Dedup.screenContamination(train, direct.bloom, direct.grams))
      assert(want.nonEmpty)
      assert(rows(Dedup.screenContamination(train, loaded.bloom, loaded.grams)) == want)
      // the NULL-sketch (empty eval split) state also survives the disk
      val emptySt = Dedup.evalGramState(Seq.empty[(Long, String)].toDF("doc_id", "text"))
      Dedup.saveEvalGramState(spark, "evst_test2", emptySt)
      val emptyLoaded = Dedup.loadEvalGramState(spark, "evst_test2")
      assert(emptyLoaded.bloom.isEmpty)
      assert(Dedup.screenContamination(train, emptyLoaded.bloom, emptyLoaded.grams)
        .count() == 0)
    } finally Seq("evst_test_grams", "evst_test_meta", "evst_test2_grams",
      "evst_test2_meta").foreach(Dedup.dropTableAndLocation(spark, _))
  }

  test("w11 retention: driver-side replay reproduces every cohort cell") {
    val dir = sf("sf0.001")
    val got = Library.retentionCohorts(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    val userDays = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), Math.floorDiv(r.getLong(1), 86400000000L)))
      .toSet
    val cells = userDays.groupBy(_._1).toSeq.flatMap { case (_, ds) =>
      val cohort = ds.map(_._2).min
      ds.map(d => (cohort, d._2 - cohort))
    }
    val nActive = cells.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val expected = nActive.map { case ((c, off), n) =>
      val size = nActive((c, 0L))
      (c, off, n, size, round4(n.toDouble / size))
    }.toSet
    assert(got == expected && got.size > 10)
    // the data genuinely spans multiple day offsets
    assert(got.exists(_._2 > 0))
  }

  test("w12 funnel: driver-side replay reproduces the step counts") {
    val dir = sf("sf0.001")
    val win = 7L * 86400 * 1000 * 1000
    val got = Library.funnelSteps(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val byUser = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val t0 = byUser.flatMap { case (u, rs) =>
      rs.filter(_._2 == "view").map(_._3).minOption.map(u -> _)
    }
    val t1 = t0.flatMap { case (u, t) =>
      byUser(u).filter(r => r._2 == "click" && r._3 >= t && r._3 <= t + win)
        .map(_._3).minOption.map(m => u -> ((t, m)))
    }
    val t2 = t1.flatMap { case (u, tm) =>
      byUser(u).filter(r => r._2 == "purchase" && r._3 >= tm._2 && r._3 <= tm._1 + win)
        .map(_._3).minOption.map(_ => u)
    }
    val (n0, n1, n2) = (t0.size.toLong, t1.size.toLong, t2.size.toLong)
    val expected = Set(
      (0L, "view", n0, round4(1.0)),
      (1L, "click", n1, round4(n1.toDouble / n0)),
      (2L, "purchase", n2, round4(n2.toDouble / n0)))
    assert(got == expected)
    // the funnel is genuinely ordered and non-degenerate (at sf0.001
    // every clicker happens to purchase; strict narrowing holds at sf0.01)
    assert(n0 >= n1 && n1 >= n2 && n2 > 0)
  }

  test("w11/w12 boundary gallery: day edges and window edges resolve exactly") {
    import spark.implicits._
    val dayUs = 86400L * 1000 * 1000
    val week = 7 * dayUs
    val base = 1704067200000000L // 2024-01-01T00:00:00Z — day-aligned
    // user 1: same-day pair 1 µs apart across the day boundary — pins the
    // integer-div day bucketing; no 'view' events so it stays out of the
    // funnel. user 2: click at EXACTLY t0 + window (the <= edge — must
    // count) and purchase at exactly t1 (the >= edge — must count).
    // user 3: click 1 µs past the window — must NOT count.
    val rows = Seq(
      (1L, base, 1L, "error", 1.0, "{}"),
      (2L, base + dayUs - 1, 1L, "error", 1.0, "{}"),
      (3L, base + dayUs, 1L, "error", 1.0, "{}"),
      (10L, base, 2L, "view", 1.0, "{}"),
      (11L, base + week, 2L, "click", 1.0, "{}"),
      (12L, base + week, 2L, "purchase", 1.0, "{}"),
      (20L, base, 3L, "view", 1.0, "{}"),
      (21L, base + week + 1, 3L, "click", 1.0, "{}"))
    val root = java.nio.file.Files.createTempDirectory("w11_gallery").toString
    val tmpOut = s"$root/out"
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")))
      .coalesce(1).write.parquet(tmpOut)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmpOut)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(part, java.nio.file.Paths.get(s"$root/events.parquet"))
    val d0 = base / dayUs
    val ret = Library.retentionCohorts(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(ret == Set(
      (d0, 0L, 3L, 3L, 1.0),       // all three users active on day 0
      (d0, 1L, 1L, 3L, round4(1.0 / 3)), // only user 1 crossed the day edge
      (d0, 7L, 2L, 3L, round4(2.0 / 3))))  // users 2 and 3 a week later
    val fun = Library.funnelSteps(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(fun == Set(
      (0L, "view", 2L, 1.0),
      (1L, "click", 1L, 0.5),      // user 2's exactly-at-window click only
      (2L, "purchase", 1L, 0.5)))  // user 2's exactly-at-t1 purchase
  }

  test("t20 per-source cap: driver-side replay reproduces ranks and keep flags") {
    val dir = sf("sf0.001")
    val got = TextAnalysis.perSourceCap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3))).toSet
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      rows.map(_._1).sortBy(id => (md5hex(id.toString), id)).zipWithIndex.map {
        case (id, i) => (id, src, (i + 1).toLong, i + 1 <= 20)
      }
    }.toSet
    assert(got == expected && got.size == 500)
    // the cap genuinely bites: some source has more than 40 documents
    assert(got.exists(!_._4))
  }
}
