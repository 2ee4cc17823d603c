package graft.ingest

import org.apache.spark.sql.types._

/** Declared schemas for the reference's four tables (itdb.sql:14-114) plus
  * the ffprobe JSON sidecars (itdbmetadata.py:107-125).
  *
  * The reference's 68-column tracks DDL is reproduced here for the columns
  * its queries actually touch (FIXTURES.md §A lists the musts); ingest is
  * schema-TOLERANT like the reference (itdbloader.py:249-258 loads the
  * intersection of plist keys and declared columns and reports the rest) —
  * see PlistReader.missingKeyReport.
  *
  * MySQL's `'0000-00-00'` invalid-date defaults (itdb.sql:9,63-66) have no
  * Spark representation: all timestamps are nullable and sentinel dates map
  * to null (SURVEY §7.4 documented deviation).
  */
object ItdbSchema {

  val tracks: StructType = StructType(Seq(
    StructField("User_ID", IntegerType, nullable = false),
    StructField("Track_ID", IntegerType, nullable = false),
    StructField("Name", StringType),
    StructField("Artist", StringType),
    StructField("Album", StringType),
    StructField("Genre", StringType),
    StructField("Kind", StringType),
    StructField("Rating", IntegerType),
    StructField("Total_Time", IntegerType),
    StructField("Track_Number", IntegerType),
    StructField("Disc_Number", IntegerType),
    StructField("Size", LongType),
    StructField("Play_Count", IntegerType),
    StructField("Compilation", BooleanType),
    StructField("TV_Show", BooleanType),
    StructField("Movie", BooleanType),
    StructField("Persistent_ID", StringType),
    StructField("Location", StringType),
    StructField("Date_Added", TimestampType),
    StructField("Year", IntegerType),
    StructField("Bit_Rate", IntegerType),
    StructField("Sample_Rate", IntegerType),
    StructField("Skip_Count", IntegerType)))

  val playlists: StructType = StructType(Seq(
    StructField("User_ID", IntegerType, nullable = false),
    StructField("Playlist_ID", IntegerType, nullable = false),
    StructField("Name", StringType),
    StructField("Playlist_Persistent_ID", StringType),
    StructField("Parent_Persistent_ID", StringType)))

  val playlistTracks: StructType = StructType(Seq(
    StructField("User_ID", IntegerType, nullable = false),
    StructField("Playlist_ID", IntegerType, nullable = false),
    StructField("Track_ID", IntegerType, nullable = false)))

  /** Materialized aggregate (itdb.sql:107-114): per (playlist, rating). */
  val playlistStats: StructType = StructType(Seq(
    StructField("User_ID", IntegerType, nullable = false),
    StructField("Playlist_ID", IntegerType, nullable = false),
    StructField("Rating", IntegerType, nullable = false),
    StructField("Count", LongType, nullable = false)))

  val ffprobe: StructType = StructType(Seq(
    StructField("Persistent_ID", StringType, nullable = false),
    StructField("ffprobe", StringType)))

  val ffprobeStreams: StructType = StructType(Seq(
    StructField("Persistent_ID", StringType, nullable = false),
    StructField("stream_index", IntegerType, nullable = false),
    StructField("stream", StringType)))
}
