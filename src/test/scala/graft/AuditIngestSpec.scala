package graft

import graft.functions.Exprs
import graft.ingest.{CsvInterchange, Freshness, ItdbSchema}
import graft.operators.Audit
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class AuditIngestSpec extends SparkSuite {
  import spark.implicits._

  test("S2/S3/X18 csv interchange roundtrip with 1/0 and NULL booleans") {
    val dir = Files.createTempDirectory("graft_csv").toString
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1, 10, "A, with comma", "P\"quoted\"", null, true),
      org.apache.spark.sql.Row(1, 11, "B", "Q", null, false),
      org.apache.spark.sql.Row(1, 12, "C", "R", null, null)).asJava,
      ItdbSchema.playlists
        .add("Compilation", org.apache.spark.sql.types.BooleanType))
    CsvInterchange.write(df, s"$dir/out")
    val back = CsvInterchange.read(spark, s"$dir/out", df.schema)
    val a = df.orderBy("Playlist_ID").collect().toSeq
    val b = back.orderBy("Playlist_ID").collect().toSeq
    assert(a == b) // null boolean must roundtrip as null, not false
  }

  test("I1/I2 freshness gate: runs once, skips when fresh, forces on demand") {
    val dir = Files.createTempDirectory("graft_fresh")
    val src = dir.resolve("library.xml")
    Files.writeString(src, "<plist/>")
    var runs = 0
    assert(Freshness.withLoadGate(src, dir) { runs += 1; "done" } == Some("done"))
    assert(Freshness.withLoadGate(src, dir) { runs += 1; "again" } == None)
    assert(runs == 1)
    assert(Freshness.withLoadGate(src, dir, force = true) { runs += 1; "forced" } == Some("forced"))
    assert(runs == 2)
    assert(Files.exists(dir.resolve(".loaded")) && !Files.exists(dir.resolve(".loading")))
  }

  test("S8/X13 binaryFile walk + tail checksum equate identical tails") {
    val dir = Files.createTempDirectory("graft_walk")
    Files.createDirectories(dir.resolve("sub"))
    // same 100-byte tails, different headers (the dedup.py premise)
    Files.write(dir.resolve("a.mp3"), ("HEADER1" + "x" * 200).getBytes)
    Files.write(dir.resolve("sub/b.mp3"), ("DIFFERENT_HEADER" + "x" * 200).getBytes)
    Files.write(dir.resolve("c.mp3"), ("HEADER1" + "y" * 200).getBytes)
    val walk = Audit.fileWalk(spark, dir.toString, "*.mp3")
    assert(walk.count() == 3)
    val sums = Audit.fileChecksums(spark, dir.toString, tailBytes = 100)
      .select("path", "checksum").collect()
      .map(r => (r.getString(0).split('/').last, r.getString(1))).toMap
    assert(sums("a.mp3") == sums("b.mp3"))
    assert(sums("a.mp3") != sums("c.mp3"))
  }

  test("F10 per-row existence via fs-walk membership join (playlistlinks.py:223-252)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_exists")
    Files.write(dir.resolve("have.mp3"), "x".getBytes)
    val walk = Audit.fileWalk(spark, dir.toString, "*.mp3")
    val tracks = Seq(
      (1, s"$dir/have.mp3"),
      (2, s"$dir/MISSING.mp3"),
      (3, s"$dir/HAVE.MP3")). // case-folded match, like the reference compare
      toDF("id", "loc")
    val got = Audit.withExists(tracks, "loc", walk.withColumn("path",
        org.apache.spark.sql.functions.regexp_replace($"path", "^file:", "")))
      .collect().map(r => r.getAs[Int]("id") -> r.getAs[Boolean]("exists")).toMap
    assert(got == Map(1 -> true, 2 -> false, 3 -> true))
  }

  test("S9/X15 regex-scrape locations from xml text") {
    val dir = Files.createTempDirectory("graft_scrape")
    val xml = dir.resolve("lib.xml")
    Files.writeString(xml,
      """<key>Location</key><string>file://localhost/m/a.mp3</string>
        |<key>Name</key><string>not a location</string>
        |<key>Location</key><string>file:///m/b%20c.mp3</string>""".stripMargin)
    val got = Audit.scrapeLocations(spark, xml.toString)
      .as[String].collect().sorted.toSeq
    assert(got == Seq("file:///m/b%20c.mp3", "file://localhost/m/a.mp3"))
  }

  test("F9 blacklist chain drops prefix/suffix matches") {
    val paths = Seq("./Music/ok.mp3", "./tones/ring.mp3", "./Music/.DS_Store").toDF("path")
    val kept = Audit.applyBlacklist(paths, "path").as[String].collect().toSeq
    assert(kept == Seq("./Music/ok.mp3"))
  }

  test("I3 checksum delta: only changed (path, mtime) re-hashed") {
    val prior = Seq(("/a", 1.0, "h1"), ("/b", 2.0, "h2")).toDF("path", "mtime", "checksum")
    val current = Seq(("/a", 1.0), ("/b", 9.0), ("/c", 3.0)).toDF("path", "mtime")
    val (unchanged, toHash) = Audit.checksumDelta(prior, current)
    assert(unchanged.select("path").as[String].collect().toSeq == Seq("/a"))
    assert(toHash.select("path").as[String].collect().sorted.toSeq == Seq("/b", "/c"))
  }

  test("X7/X22 render helpers: html escape and star display") {
    val got = Seq(("""<a href="x">R&B</a>""", 3)).toDF("s", "stars")
      .select(Exprs.escapeHtml($"s").as("e"), Exprs.starsDisplay($"stars").as("d"))
      .as[(String, String)].collect().head
    assert(got._1 == "&lt;a href=&quot;x&quot;&gt;R&amp;B&lt;/a&gt;")
    assert(got._2 == "★★★☆☆")
  }
}
