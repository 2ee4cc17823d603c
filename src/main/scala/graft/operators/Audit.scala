package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-audit operators (SURVEY §2: S8/S9 sources, F9 blacklist, I3
  * incremental memo) — the dedup.py / orphaned_files dataflows, Spark-first.
  */
object Audit {

  /** S8 (dedup.py:101-113): filesystem walk as a distributed source —
    * Spark's binaryFile format yields (path, modificationTime, length,
    * content) rows; recursive lookup replaces os.walk. Content stays out of
    * any shuffle: downstream ops project metadata or hash immediately.
    */
  def fileWalk(spark: SparkSession, rootDir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(rootDir)
      .select(col("path"), col("modificationTime").as("mtime"),
        col("length").as("size"))

  /** X13 over S8: content fingerprint = sha-256 of the LAST 100,000 bytes
    * (dedup.py:42,133-143 — ignores id3 header edits). Distributed read,
    * hash computed per partition, only (path, digest) survives.
    */
  def fileChecksums(spark: SparkSession, rootDir: String, tailBytes: Int = 100000): DataFrame =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(rootDir)
      .select(col("path"), col("modificationTime").as("mtime"), col("length").as("size"),
        sha2(expr(s"substring(content, -$tailBytes, $tailBytes)"), 256).as("checksum"))

  /** S9 (orphaned_files:55-78): regex-scrape source — extract `file://...`
    * locations straight out of raw XML text lines, the reference's
    * `egrep -o` equivalent (X15).
    */
  def scrapeLocations(spark: SparkSession, xmlPath: String): DataFrame =
    spark.read.text(xmlPath)
      .select(regexp_extract(col("value"), "file://([^<]+)", 0).as("location"))
      .filter(length(col("location")) > 0)

  /** F9 (orphaned_files:92-100): prefix/suffix blacklist filter chain. */
  def applyBlacklist(paths: DataFrame, pathCol: String,
      prefixes: Seq[String] = Seq("./tones/", "./ringtones/"),
      suffixes: Seq[String] = Seq(".ds_store", ".plist")): DataFrame = {
    val p = lower(col(pathCol))
    val keep = prefixes.map(b => !p.startsWith(b)) ++ suffixes.map(b => !p.endsWith(b))
    paths.filter(keep.reduce(_ && _))
  }

  /** F10 (playlistlinks.py:223-252 `os.path.exists` per track): per-row
    * existence flag, engine-side — the walked filesystem (S8) becomes the
    * membership set and each row gets `exists` via a left join on the
    * normalized path. The reference's per-row stat() call is a driver-side
    * loop; this form is one key-only join with no driver involvement, and
    * the same plan answers "which rows DON'T exist" (J7) by filtering.
    * Join strategy is left to Catalyst/AQE: the membership side is
    * (path)-only so it broadcasts when it fits and shuffles when the walked
    * filesystem itself is huge.
    */
  def withExists(rows: DataFrame, pathCol: String, fsPaths: DataFrame,
      fsPathCol: String = "path"): DataFrame = {
    val fs = fsPaths.select(lower(col(fsPathCol)).as("__fs_path")).distinct()
      .withColumn("__present", lit(true))
    rows.join(fs, lower(col(pathCol)) === col("__fs_path"), "left")
      .withColumn("exists", coalesce(col("__present"), lit(false)))
      .drop("__fs_path", "__present")
  }

  /** I3 (dedup.py:115-131): incremental checksum memo — re-hash ONLY files
    * whose (path, mtime) changed since the prior state; carry forward the
    * rest. A delta anti-join replaces the reference's per-file dict lookup;
    * `checksum` in `current` may be null for unhashed rows (filled by the
    * caller for the returned `toHash` set).
    */
  def checksumDelta(prior: DataFrame, current: DataFrame): (DataFrame, DataFrame) = {
    val unchanged = current.select(col("path"), col("mtime"))
      .join(prior, Seq("path", "mtime"), "inner")
    val toHash = current.select(col("path"), col("mtime"))
      .join(prior.select(col("path"), col("mtime")), Seq("path", "mtime"), "left_anti")
    (unchanged, toHash)
  }
}
