package graft.ingest

import java.io.{ByteArrayInputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import javax.xml.parsers.DocumentBuilderFactory
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.w3c.dom.{Element, Node}
import scala.collection.mutable

/** S1 (SURVEY §2.1): Apple-plist library source. The reference parses the
  * whole `iTunes Music Library.xml` into driver memory with plistlib
  * (itdbloader.py:306-310) and flattens Tracks / Playlists / Playlist Items
  * (itdbloader.py:146-223). Same topology here, Spark-first: a driver-side
  * DOM parse (JDK javax.xml — the library XML is a single document; the
  * reference establishes it fits in driver memory) producing three
  * DataFrames via createDataFrame, after which everything is distributed.
  *
  * Schema tolerance mirrors itdbloader.py:159-178: only keys matching the
  * declared schema are loaded; unmatched keys are counted and reported
  * (missingKeyReport ≅ "Perhaps you should update your itdb.sql?",
  * itdbloader.py:239-247).
  */
object PlistReader {

  /** Parsed plist value: String | Long | Boolean | Timestamp | Seq | Map. */
  private def parseValue(e: Element): Any = e.getTagName match {
    case "string" | "data" => e.getTextContent
    case "integer" => e.getTextContent.trim.toLong
    case "real" => e.getTextContent.trim.toDouble
    case "true" => true
    case "false" => false
    case "date" => // ISO-8601 Zulu, e.g. 2016-01-01T12:00:00Z
      Timestamp.from(java.time.Instant.parse(e.getTextContent.trim))
    case "dict" => parseDict(e)
    case "array" => childElements(e).map(parseValue)
    case other => sys.error(s"unsupported plist tag <$other>")
  }

  private def childElements(e: Element): Seq[Element] = {
    val nl = e.getChildNodes
    (0 until nl.getLength).map(nl.item).collect {
      case el: Element => el
    }
  }

  private def parseDict(e: Element): Map[String, Any] = {
    val kids = childElements(e)
    kids.grouped(2).collect {
      case Seq(k, v) if k.getTagName == "key" => k.getTextContent -> parseValue(v)
    }.toMap
  }

  /** Parse a plist document from an InputStream into the root dict. */
  def parse(in: InputStream): Map[String, Any] = {
    val dbf = DocumentBuilderFactory.newInstance()
    // Untrusted input hardening. Real plists carry a DOCTYPE (the Apple DTD
    // reference), so doctype declarations can't be disallowed outright;
    // instead: never fetch the external DTD, never resolve external general/
    // parameter entities (file:// disclosure), and enable secure processing
    // (caps recursive entity expansion — billion laughs).
    dbf.setFeature("http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
    dbf.setFeature("http://xml.org/sax/features/external-general-entities", false)
    dbf.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    dbf.setFeature(javax.xml.XMLConstants.FEATURE_SECURE_PROCESSING, true)
    dbf.setXIncludeAware(false)
    val doc = dbf.newDocumentBuilder().parse(in)
    val root = childElements(doc.getDocumentElement).head
    parseDict(root)
  }

  def parse(xml: String): Map[String, Any] =
    parse(new ByteArrayInputStream(xml.getBytes(StandardCharsets.UTF_8)))

  /** Keys seen in the plist but absent from the declared schema, with
    * occurrence counts — the reference's missing-column report.
    */
  val lastUnknownKeys: mutable.Map[String, Long] = mutable.Map.empty

  private def coerce(v: Any, dt: org.apache.spark.sql.types.DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: Long, org.apache.spark.sql.types.IntegerType) => l.toInt
    case (l: Long, org.apache.spark.sql.types.LongType) => l
    case (l: Long, org.apache.spark.sql.types.DoubleType) => l.toDouble
    // plist <real> into an integral column (schema tolerance: coerce, don't crash)
    case (d: Double, org.apache.spark.sql.types.IntegerType) => d.toInt
    case (d: Double, org.apache.spark.sql.types.LongType) => d.toLong
    case (d: Double, org.apache.spark.sql.types.DoubleType) => d
    case (b: Boolean, org.apache.spark.sql.types.BooleanType) => b
    case (s: String, org.apache.spark.sql.types.StringType) => s
    case (t: Timestamp, org.apache.spark.sql.types.TimestampType) => t
    case (other, org.apache.spark.sql.types.StringType) => other.toString
    case (other, _) => other
  }

  private def dictToRow(d: Map[String, Any], schema: org.apache.spark.sql.types.StructType,
      overrides: Map[String, Any] = Map.empty,
      consumedElsewhere: Set[String] = Set.empty,
      trackUnknown: Boolean = true): Row = {
    if (trackUnknown)
      d.keys.filterNot(k =>
        schema.fieldNames.contains(k.replace(' ', '_')) || consumedElsewhere(k))
        .foreach { k =>
          lastUnknownKeys.synchronized {
            lastUnknownKeys(k) = lastUnknownKeys.getOrElse(k, 0L) + 1
          }
        }
    Row.fromSeq(schema.fields.map { f =>
      val plistKey = f.name.replace('_', ' ')
      overrides.get(f.name)
        .orElse(d.get(plistKey)).orElse(d.get(f.name))
        .map(coerce(_, f.dataType)).orNull
    }.toSeq)
  }

  /** Rows of one logical element ("tracks" | "playlists" | "playlist_tracks")
    * from a parsed root dict, shaped to `schema` — which may be a PRUNED
    * subset of the full ItdbSchema (the DataSourceV2 column-pruning path:
    * unrequested fields are never materialized). `trackUnknown=false` keeps
    * executor-side reads from polluting the driver's unknown-key report.
    */
  private[graft] def elementRows(root: Map[String, Any], element: String,
      schema: org.apache.spark.sql.types.StructType, userId: Int,
      trackUnknown: Boolean = false): Seq[Row] = {
    val uid = Map("User_ID" -> userId)
    element match {
      case "tracks" =>
        root.getOrElse("Tracks", Map.empty[String, Any])
          .asInstanceOf[Map[String, Any]].values.toSeq
          .map(t => dictToRow(t.asInstanceOf[Map[String, Any]], schema, uid,
            trackUnknown = trackUnknown))
      case "playlists" =>
        // "Playlist Items" is consumed by the bridge flatten, not a lost key
        root.getOrElse("Playlists", Seq.empty[Any]).asInstanceOf[Seq[Any]]
          .map(p => dictToRow(p.asInstanceOf[Map[String, Any]], schema, uid,
            consumedElsewhere = Set("Playlist Items"), trackUnknown = trackUnknown))
      case "playlist_tracks" =>
        root.getOrElse("Playlists", Seq.empty[Any]).asInstanceOf[Seq[Any]]
          .map(_.asInstanceOf[Map[String, Any]]).flatMap { p =>
            val pid = p("Playlist ID").asInstanceOf[Long].toInt
            p.getOrElse("Playlist Items", Seq.empty[Any]).asInstanceOf[Seq[Any]]
              .map(_.asInstanceOf[Map[String, Any]])
              .map { item =>
                val vals = Map[String, Any]("User_ID" -> userId, "Playlist_ID" -> pid,
                  "Track_ID" -> item("Track ID").asInstanceOf[Long].toInt)
                Row.fromSeq(schema.fieldNames.toIndexedSeq.map(vals(_)))
              }
          }
      case other => throw new IllegalArgumentException(
        s"unknown plist element '$other' (expected tracks|playlists|playlist_tracks)")
    }
  }

  /** Full library load: plist XML → (tracks, playlists, playlist_tracks).
    * The reference's per-playlist items loop (itdbloader.py:215-220) is the
    * playlist_tracks flatten.
    */
  def load(spark: SparkSession, xml: String, userId: Int = 1):
      (DataFrame, DataFrame, DataFrame) = {
    lastUnknownKeys.clear()
    val root = parse(xml)
    import scala.jdk.CollectionConverters._
    def df(element: String, schema: org.apache.spark.sql.types.StructType) =
      spark.createDataFrame(
        elementRows(root, element, schema, userId, trackUnknown = true).asJava, schema)
    (df("tracks", ItdbSchema.tracks),
      df("playlists", ItdbSchema.playlists),
      df("playlist_tracks", ItdbSchema.playlistTracks))
  }

  /** A12 companion (itdbloader.py:239-247): the unknown-key report of the
    * most recent load, as a DataFrame.
    */
  def missingKeyReport(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType)))
    val rows = lastUnknownKeys.toSeq.sortBy(_._1).map { case (k, n) => Row(k, n) }
    spark.createDataFrame(rows.asJava, schema)
  }

  /** Ingest-side width profiler (A12, itdbloader.py:170-178): max observed
    * string length per column — one aggregation pass over all columns.
    */
  def profileWidths(df: DataFrame): DataFrame = {
    val stringCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType).map(_.name)
    val aggs = stringCols.map(c => max(length(col(c))).cast("long").as(s"len_$c"))
    df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }
}
