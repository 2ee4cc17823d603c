package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import graft.ingest.{ItdbSchema, PlistReader}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.graftbridge.{Bridge, SerializableHadoopConf}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 plist source (SURVEY §7.3; reference load surface
  * itdbloader.py:96-130): `spark.read.format("plist")` over iTunes Library
  * XML files, one file per input partition — a library is one XML document,
  * so the file is the natural unit of parallelism and N users' libraries
  * load as N parallel tasks with no driver-side parse.
  *
  * Options:
  *   - `element`: tracks (default) | playlists | playlist_tracks
  *   - `userId`:  User_ID stamped on every row (default 1)
  *
  * Column pruning is real: the reader materializes ONLY the required
  * fields (the pruned schema flows into PlistReader.elementRows), so
  * `select(Name)` never coerces the other ~25 track attributes.
  */
class PlistDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "plist"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PlistDataSource.schemaFor(options.getOrDefault("element", "tracks"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PlistTable(schema)

  override def supportsExternalMetadata(): Boolean = true
}

object PlistDataSource {
  def schemaFor(element: String): StructType = element match {
    case "tracks" => ItdbSchema.tracks
    case "playlists" => ItdbSchema.playlists
    case "playlist_tracks" => ItdbSchema.playlistTracks
    case other => throw new IllegalArgumentException(
      s"unknown plist element '$other' (expected tracks|playlists|playlist_tracks)")
  }

  /** `.load(p)` lands in `path`; `.load(p1, p2, …)` lands in `paths` as a
    * JSON string array — parsed leniently here (quoted segments).
    */
  def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).toSeq.flatMap { js =>
      "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(js)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
    }
    val single = Option(options.get("path")).toSeq
    val all = multi ++ single
    require(all.nonEmpty, "plist source requires a path")
    all
  }
}

class PlistTable(schema: StructType) extends Table with SupportsRead {
  override def name(): String = "plist"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PlistScanBuilder(schema, options)
}

class PlistScanBuilder(fullSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep source field order; drop unrequested fields
    required = StructType(fullSchema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = PlistScan(
    required,
    PlistDataSource.paths(options),
    options.getOrDefault("element", "tracks"),
    options.getOrDefault("userId", "1").toInt,
    new SerializableHadoopConf(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
}

case class PlistScan(required: StructType, files: Seq[String],
    element: String, userId: Int, conf: SerializableHadoopConf)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map(PlistFilePartition.apply).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    PlistReaderFactory(required, element, userId, conf)
}

case class PlistFilePartition(path: String) extends InputPartition

case class PlistReaderFactory(required: StructType, element: String,
    userId: Int, conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PlistPartitionReader(
      partition.asInstanceOf[PlistFilePartition].path, required, element, userId, conf)
}

class PlistPartitionReader(path: String, required: StructType,
    element: String, userId: Int, conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private lazy val rows: Iterator[InternalRow] = {
    val p = new Path(path)
    val in = p.getFileSystem(conf.value).open(p)
    val root = try PlistReader.parse(in: java.io.InputStream) finally in.close()
    val toInternal = Bridge.rowToInternal(required)
    PlistReader.elementRows(root, element, required, userId).iterator.map(toInternal)
  }
  private var current: InternalRow = _

  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
