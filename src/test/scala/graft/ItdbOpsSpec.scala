package graft

import graft.ingest.{ItdbSchema, Upsert}
import graft.operators.ItdbOps
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Literal itdb semantics over FIXTURES.md §A-shaped fixtures. */
class ItdbOpsSpec extends SparkSuite {
  import scala.jdk.CollectionConverters._

  private def df(schema: org.apache.spark.sql.types.StructType, rows: Row*): DataFrame =
    spark.createDataFrame(rows.asJava, schema)

  // tracks: (User_ID, Track_ID, Name, Artist, Album, Genre, Kind, Rating, ...)
  private def track(tid: Int, name: String, genre: String, rating: Integer,
      pid: String = null, tv: Boolean = false): Row =
    Row(1, tid, name, s"artist$tid", s"album$tid", genre, "MPEG audio file",
      rating, 200000, 1, 1, 1000L, 3, false, tv, false,
      Option(pid).getOrElse(f"PID$tid%016X"), s"file://localhost/m/$name.mp3",
      null, 2020, 256, 44100, 0)

  lazy val tracks: DataFrame = df(ItdbSchema.tracks,
    track(1, "one", "Rock", 100), track(2, "two", "Rock", 80),
    track(3, "three", "Jazz", null), track(4, "four", null, 60),
    track(5, "five", "Rock", null), track(6, "six", "Jazz", 20, tv = true))

  lazy val playlistTracks: DataFrame = df(ItdbSchema.playlistTracks,
    Row(1, 10, 1), Row(1, 10, 2), Row(1, 10, 3), Row(1, 11, 1), Row(1, 11, 6),
    Row(1, 11, 99)) // 99 dangles (restore_playlist.py:136)

  lazy val playlists: DataFrame = df(ItdbSchema.playlists,
    Row(1, 10, "Mix", "P010", null),
    Row(1, 11, "Oldies", "P011", "F001"),
    Row(1, 12, "Folder", "F001", null),
    Row(1, 13, "Inside", "P013", "F001"))

  test("A6 playlist stats: single-pass agg == reference per-playlist loop") {
    val got = ItdbOps.playlistStats(tracks, playlistTracks)
      .orderBy("Playlist_ID", "Rating")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getLong(3))).toSeq
    // playlist 10: t1(stars5) t2(stars4) t3(null->0); playlist 11: t1(5), t6(1)
    assert(got == Seq((10, 0, 1L), (10, 80, 1L), (10, 100, 1L), (11, 20, 1L), (11, 100, 1L)))

    // equality against the reference's N+1 shape (one query per playlist)
    val perPlaylist = playlistTracks.select("Playlist_ID").distinct().collect()
      .map(_.getInt(0)).flatMap { pid =>
        ItdbOps.playlistStats(tracks,
          playlistTracks.filter(col("Playlist_ID") === pid)).collect()
      }.map(r => (r.getInt(1), r.getInt(2), r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq
    assert(perPlaylist == got)
  }

  test("A3/A4 histograms: null rating -> 0 stars, null genre -> ''") {
    val hist = ItdbOps.starsHistogram(tracks, 1).orderBy("Stars")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hist == Seq((0L, 2L), (1L, 1L), (3L, 1L), (4L, 1L), (5L, 1L)))
    val byGenre = ItdbOps.groupedHistogram(tracks, 1, "Genre")
      .filter(col("grp") === "").collect()
    assert(byGenre.map(_.getLong(2)).sum == 1L) // track 4 null genre
  }

  test("O4 shrink: truncation order is total-asc then quality-desc (itdb2html.py:445-458)") {
    val q = ItdbOps.qualityByGroup(tracks, 1, "Genre")
    // k=1: first phase keeps the 2 SMALLEST groups ('' total 1, Jazz total 2),
    // so Rock (best quality 4.5 but biggest) is excluded — exactly the
    // reference's bias toward small groups; then best quality of those wins.
    val top1 = ItdbOps.shrink(q, 1).collect()
    assert(top1.length == 1)
    assert(top1.head.getAs[String]("grp") == "")
    assert(top1.head.getAs[Double]("quality") == 3.0)
    // k large enough to keep all groups: global best quality (Rock) surfaces
    val top3 = ItdbOps.shrink(q, 3).collect()
    assert(top3.head.getAs[String]("grp") == "Rock")
    assert(top3.head.getAs[Double]("quality") == 4.5)
  }

  test("J5 folder expansion: one-level children (playlistlinks.py:153-162)") {
    val kids = ItdbOps.folderChildren(playlists, 1, "Folder")
      .orderBy("Playlist_ID").collect().map(_.getString(1)).toSeq
    assert(kids == Seq("Oldies", "Inside"))
  }

  test("J4 anti join: video tracks lacking ffprobe rows (itdbmetadata.py:128-133)") {
    val ffprobe = df(ItdbSchema.ffprobe, Row("X", """{"streams":[]}"""))
    val got = ItdbOps.tracksWithoutFfprobe(tracks, ffprobe).collect()
    assert(got.map(_.getAs[Int]("Track_ID")).toSeq == Seq(6))
  }

  test("S7/X16/A13 json: stream explode, wildcard codec types, low-res report") {
    val doc = """{"streams":[{"index":0,"codec_type":"video","height":480,"width":640},
                 {"index":1,"codec_type":"audio"}]}""".replaceAll("\n\\s*", "")
    val ffprobe = df(ItdbSchema.ffprobe, Row("V1", doc))
    val streams = ItdbOps.explodeStreams(ffprobe)
    assert(streams.count() == 2)
    assert(streams.orderBy("stream_index").collect()(0).getAs[Int]("stream_index") == 0)

    val codecs = ItdbOps.codecTypes(ffprobe).collect().head.getSeq[String](1)
    assert(codecs == Seq("video", "audio"))

    val lowres = ItdbOps.lowResVideos(streams, 720).collect()
    assert(lowres.map(r => (r.getString(0), r.getInt(1))).toSeq == Seq(("V1", 480)))
  }

  test("J7/U1 orphans + missing with url-decode and case folding (orphaned_files:66-121)") {
    import spark.implicits._
    val lib = Seq("file://localhost/Music/A%20Song.mp3", "file:///Music/gone.mp3")
      .toDF("location")
    val fs = Seq("/music/a song.mp3", "/music/extra.mp3").toDF("path")
    val got = ItdbOps.orphansAndMissing(lib, fs)
      .orderBy("side", "path").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("missing", "/music/gone.mp3"), ("orphan", "/music/extra.mp3")))
  }

  test("REPLACE keeps last / IGNORE keeps first per PK (itdbloader.py:202,230)") {
    import spark.implicits._
    val arrivals = Seq((1, "v1", 1L), (1, "v2", 2L), (2, "only", 1L)).toDF("pk", "v", "seq")
    val last = Upsert.replaceLastWins(arrivals, Seq("pk"), col("seq"))
      .orderBy("pk").collect().map(_.getString(1)).toSeq
    val first = Upsert.ignoreFirstWins(arrivals, Seq("pk"), col("seq"))
      .orderBy("pk").collect().map(_.getString(1)).toSeq
    assert(last == Seq("v2", "only"))
    assert(first == Seq("v1", "only"))
  }

  test("F11 ad-hoc SQL over registered views incl. MySQL RLIKE translation (§2.11)") {
    ItdbOps.registerItdbViews(tracks, playlists, playlistTracks)
    // the reference example: REGEXP BINARY '^[^a-z]+$' -> RLIKE (sql_to_playlist, README.md:144-147)
    val got = spark.sql(
      "SELECT Name, Persistent_ID FROM tracks WHERE Kind = 'MPEG audio file' AND Name RLIKE '^[a-z]+$' ORDER BY Name")
    assert(got.count() == 6)
    val joined = spark.sql(
      """SELECT p.Name, count(*) AS n FROM playlists p
        |JOIN playlist_tracks pt ON p.Playlist_ID = pt.Playlist_ID AND p.User_ID = pt.User_ID
        |GROUP BY p.Name ORDER BY p.Name""".stripMargin).collect()
    assert(joined.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("Mix", 3L), ("Oldies", 3L)))
  }

  test("registerViews re-registers when the dir changes within one session") {
    // temp views are session-global: after switching to another dir, a
    // return to the first dir must NOT be served by stale views
    val a = sf("sf0.001")
    val b = sf("sf0.01")
    def n(dir: String): Long =
      graft.operators.Library.adhocSql(spark, dir, "SELECT count(*) AS n FROM orders")
        .collect().head.getLong(0)
    val nA = n(a)
    val nB = n(b)
    assert(nA != nB, "scale factors should differ")
    assert(n(a) == nA) // back to dir A: must see A's data again
  }

  test("S10 m3u parse: descriptions attach to the NEXT location, gaps stay None") {
    val parsed = graft.emit.M3u.parse(Seq(
      "#EXTM3U", "/m/first.mp3", "#ITDBDESC:B", "#ITDBFILE:/m/b.mp3", "/m/b.mp3"))
    assert(parsed == Seq((None, "/m/first.mp3"), (Some("B"), "/m/b.mp3")))
  }

  test("O5/O6/X19 numbered link paths: deterministic shuffle + sequence + sanitize") {
    val got1 = ItdbOps.numberedLinkPaths(tracks, "seed1").collect().map(_.getString(1)).toSeq
    val got2 = ItdbOps.numberedLinkPaths(tracks, "seed1").collect().map(_.getString(1)).toSeq
    assert(got1 == got2) // reproducible
    assert(got1.exists(_.matches("""\d{3}-Rock/artist\d+-\w+""")))
    assert(got1.map(_.take(4)).sorted == Seq("001-", "002-", "003-", "004-", "005-", "006-"))
  }

  test("as-of join: <= semantics, duplicate-ts tiebreak, NULL value/key handling") {
    import spark.implicits._
    def t(ms: Long) = new java.sql.Timestamp(ms)
    // (event_id, ts, user_id, event_type, value)
    val events = Seq(
      (1L, t(50L), Some(7L), "click", Some(0.0)),  // before any view -> nulls
      (2L, t(100L), Some(7L), "view", Some(10.0)),
      (3L, t(100L), Some(7L), "click", Some(0.0)), // simultaneous view IS eligible (<=)
      (4L, t(200L), Some(7L), "view", Some(20.0)),
      (5L, t(200L), Some(7L), "view", Some(30.0)), // duplicate ts: highest event_id wins
      (6L, t(300L), Some(7L), "click", Some(0.0)),
      (7L, t(250L), Some(8L), "click", Some(0.0)), // other user: no view at all
      (8L, t(100L), Some(9L), "view", Some(5.0)),
      (9L, t(200L), Some(9L), "view", None),       // matched row has NULL value:
      (10L, t(300L), Some(9L), "click", Some(0.0)), //  ts/value must come from ONE row
      (11L, t(100L), None, "view", Some(99.0)),
      (12L, t(200L), None, "click", Some(0.0))     // NULL key never matches (join equality)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.Library.asofJoin(events, "click", "view")
      .select("event_id", "right_ts", "right_value")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(got(1L) == ((None, None)))
    assert(got(3L) == ((Some(t(100L)), Some(10.0))))
    assert(got(6L) == ((Some(t(200L)), Some(30.0))))
    assert(got(7L) == ((None, None)))
    // the NULL-valued ts=200 view is the match: its ts with its NULL value,
    // never ts=200 stitched to the older row's 5.0
    assert(got(10L) == ((Some(t(200L)), None)))
    assert(got(12L) == ((None, None)))
  }

  test("folder closure: BFS fixpoint equals the walked-up ancestor chains") {
    val dir = sf("sf0.001")
    val got = graft.operators.Library.folderClosure(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // independent model: every node's ancestor chain by repeated k/4,
    // depth counting up — the closure of a tree is exactly these chains
    val keys = spark.read.parquet(s"$dir/part.parquet")
      .select("p_partkey").collect().map(_.getLong(0)).filter(_ >= 1)
    val expected = keys.flatMap { k =>
      val chain = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var a = k / 4
      var d = 1L
      chain += ((a, k, d))
      while (a > 0) { a /= 4; d += 1; chain += ((a, k, d)) }
      chain
    }.toSet
    assert(got == expected)
    // spot structure: deepest node at sf0.001 (max key 199) has the full
    // chain 199 -> 49 -> 12 -> 3 -> 0
    assert(got.filter(_._2 == 199L) ==
      Set((49L, 199L, 1L), (12L, 199L, 2L), (3L, 199L, 3L), (0L, 199L, 4L)))
    // pointer-doubling variant: identical closure in O(log depth) rounds
    val doubled = graft.operators.Library.folderClosureDoubling(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(doubled == got)
  }

  test("i6 incremental aggregate: base-merge-delta == full recompute; cells straddle the split") {
    val dir = sf("sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val full = rows(graft.operators.Library.playlistStats(spark, dir))
    assert(rows(graft.operators.Library.incrementalPlaylistStats(spark, dir)) == full)
    // the maintenance is genuinely incremental: the persisted base table
    // exists on disk, covers a strict subset of the rows, and REAL cells
    // straddle the split (both sides contribute to one (priority, stars))
    val baseTables = spark.catalog.listTables()
      .filter(col("name").startsWith("stats_base_")).collect()
    assert(baseTables.nonEmpty)
    val base = rows(spark.table(baseTables.head.name))
    assert(base.map(_._3).sum < full.map(_._3).sum)
    assert(base.exists { case (p, st, n) =>
      full.exists { case (p2, s2, n2) => p2 == p && s2 == st && n2 > n }
    })
  }

  test("j8b hamming join: segment blocking is pigeonhole-exact vs brute force") {
    val dir = sf("sf0.001")
    val got = graft.operators.Library.hammingJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet
    val names = spark.read.parquet(s"$dir/part.parquet")
      .select("p_partkey", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).filter(_._1 < 500)
    val expected = (for {
      (ka, na) <- names; (kb, nb) <- names
      if ka < kb && na.length == nb.length
      h = na.zip(nb).count { case (x, y) => x != y }
      if h <= 2
    } yield (ka, kb, na, nb, h.toLong)).toSet
    assert(got == expected && got.nonEmpty)
    // genuinely-differing pairs exist (not just identical names), and
    // some differing pair's mismatch positions are NOT a trailing-digit
    // edit — the shape j8's normalized-key join cannot see
    assert(got.exists(_._5 > 0L))
    assert(got.exists { case (_, _, na, nb, h) =>
      h > 0L && na.zip(nb).zipWithIndex.exists {
        case ((x, y), i) => x != y && i < na.length - 2
      }
    })
  }

  test("j8c edit-distance join: PassJoin blocking is exact vs brute force, indels included") {
    val dir = sf("sf0.001")
    val got = graft.operators.Library.editDistanceJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = spark.read.parquet(s"$dir/part.parquet")
      .select("p_partkey", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).filter(_._1 < 500)
    val expected = (for {
      (ka, na) <- names; (kb, nb) <- names
      if ka < kb && math.abs(na.length - nb.length) <= 2
      d = lev(na, nb)
      if d <= 2
    } yield (ka, kb, na, nb, d.toLong)).toSet
    assert(got == expected && got.nonEmpty)
    // the indel shape j8b's equal-length restriction cannot see: some
    // pair with DIFFERENT lengths
    assert(got.exists { case (_, _, na, nb, _) => na.length != nb.length })
  }

  test("g1b delta pagerank: warm-start replay reproduces every rank; base ranks genuinely move") {
    val dir = sf("sf0.001")
    val got = graft.operators.Library.deltaPagerank(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket256(key: Long): Int = {
      val h = md5hex(key.toString)
      def hv(c: Char): Int = if (c >= 'a') c - 87 else c - '0'
      hv(h.charAt(0)) * 16 + hv(h.charAt(1))
    }
    val scaleL = 1000000000000L
    val keys = spark.read.parquet(s"$dir/part.parquet")
      .select("p_partkey").collect().map(_.getLong(0)).filter(_ >= 1)
    def ranks(edges: Seq[(Long, Long)], init: Long => Long, iters: Int): Map[Long, Long] = {
      val outdeg = edges.groupBy(_._1).map { case (p, es) => (p, es.size.toLong) }
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSet
      var pr: Map[Long, Long] = nodes.map(n => n -> init(n)).toMap
      (1 to iters).foreach { _ =>
        val inflow = edges.groupBy(_._2).map { case (c, es) =>
          c -> es.map { case (p, _) => pr(p) * 85L / (outdeg(p) * 100L) }.sum
        }
        pr = nodes.map(n => n -> (15L * scaleL / 100 + inflow.getOrElse(n, 0L))).toMap
      }
      pr
    }
    val allEdges = keys.toSeq.map(k => (k / 4, k))
    val baseEdges = allEdges.filter { case (_, c) => bucket256(c) < 200 }
    val base = ranks(baseEdges, _ => scaleL, 3)
    val expected = ranks(allEdges, n => base.getOrElse(n, scaleL), 3)
    assert(got == expected && got.nonEmpty)
    // the delta genuinely differs from the base state: the graph grew, so
    // some base node's rank moved, and new nodes appeared
    assert(base.keySet.subsetOf(got.keySet) && got.size > base.size)
    assert(base.exists { case (n, p) => got(n) != p })
    // ...and from a cold full run at the same round count? NOT necessarily
    // different in value everywhere, but the warm start must carry base
    // mass: some node's warm rank exceeds its cold-3-round rank
    val cold = ranks(allEdges, _ => scaleL, 3)
    assert(got.exists { case (n, p) => p != cold(n) })
  }

  test("g1 pagerank: driver-side integer replay reproduces every rank") {
    val dir = sf("sf0.001")
    val got = graft.operators.Library.pagerank(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // independent integer model over the same div-4 tree edges
    val keys = spark.read.parquet(s"$dir/part.parquet")
      .select("p_partkey").collect().map(_.getLong(0)).filter(_ >= 1)
    val edges = keys.map(k => (k / 4, k))
    val outdeg = edges.groupBy(_._1).map { case (p, es) => (p, es.size.toLong) }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSet
    val scaleL = 1000000000000L
    var pr: Map[Long, Long] = nodes.map(_ -> scaleL).toMap
    (1 to 3).foreach { _ =>
      val inflow = edges.groupBy(_._2).map { case (c, es) =>
        c -> es.map { case (p, _) => pr(p) * 85L / (outdeg(p) * 100L) }.sum
      }
      pr = nodes.map(n => n -> (15L * scaleL / 100 + inflow.getOrElse(n, 0L))).toMap
    }
    assert(got == pr && got.size == nodes.size)
    // structure: the root (node 0, in-degree 0) keeps exactly its teleport
    // share; ranks are positive and bounded by the fixed-point scale
    assert(got(0L) == 15L * scaleL / 100)
    assert(got.values.forall(v => v > 0 && v <= scaleL))
    // the propagation genuinely differentiates nodes (not all equal)
    assert(got.values.toSet.size > 3)
  }
}
