package graft

import graft.emit.M3u
import graft.ingest.PlistReader
import graft.operators.ItdbOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end lifecycle facade — the reference's three entry points
  * (SURVEY §3) composed from the operator library:
  *
  *   1. load (itdbloader.py): plist → tracks/playlists/playlist_tracks +
  *      the materialized playlist_stats aggregate, computed in ONE pass and
  *      persisted (vs the reference's N+1 loop + REPLACE INTO);
  *   2. stats (itdb2html.py WriteStats): the library/genre/histogram
  *      rollups each page renders;
  *   3. export (playlistlinks.py): playlist → ordered, numbered link rows →
  *      m3u.
  */
object ItdbPipeline {

  final case class Library(
      tracks: DataFrame,
      playlists: DataFrame,
      playlistTracks: DataFrame,
      playlistStats: DataFrame)

  /** §3.1: full-refresh load. playlist_stats is materialized (I5) exactly
    * like the reference pre-fills it ("somewhat expensive so we pre fill it
    * out", itdbloader.py:270-272) — persisted so every page query reuses it.
    */
  def load(spark: SparkSession, xml: String, userId: Int = 1): Library = {
    val (tracks, playlists, bridge) = PlistReader.load(spark, xml, userId)
    assemble(tracks, playlists, bridge)
  }

  /** §3.1 via the distributed source: load library FILES through the
    * DataSourceV2 plist source — one task per file, no driver-side parse.
    * Same downstream assembly as `load` (proven row-identical for a single
    * file in PipelineSpec).
    */
  def loadFiles(spark: SparkSession, paths: Seq[String], userId: Int = 1): Library = {
    def rd(element: String) = spark.read.format("plist")
      .option("element", element).option("userId", userId)
      .load(paths: _*)
    assemble(rd("tracks"), rd("playlists"), rd("playlist_tracks"))
  }

  private def assemble(tracks: DataFrame, playlists: DataFrame,
      bridge: DataFrame): Library = {
    val stats = ItdbOps.playlistStats(tracks, bridge).persist()
    ItdbOps.registerItdbViews(tracks, playlists, bridge)
    stats.createOrReplaceTempView("playlist_stats")
    Library(tracks, playlists, bridge, stats)
  }

  /** §3.2: the stats-index numbers (A1/A2/A3 in one pass each). */
  def libraryStats(lib: Library, userId: Int): DataFrame =
    lib.tracks.filter(col("User_ID") === userId).agg(
      count(lit(1)).as("num_tracks"),
      countDistinct(col("Album")).as("num_albums"),
      countDistinct(col("Artist")).as("num_artists"))

  /** §3.2: per-playlist star histogram straight off the materialized
    * aggregate (A7 re-aggregation, itdb2html.py:478-493).
    */
  def playlistPage(lib: Library, userId: Int, playlistName: String): DataFrame = {
    val ids = lib.playlists
      .filter(col("User_ID") === userId && col("Name") === playlistName)
      .select(col("Playlist_ID"))
    lib.playlistStats.join(ids, Seq("Playlist_ID"))
      .groupBy((col("Rating") / 20).cast("long").as("Stars"))
      .agg(sum(col("Count")).cast("long").as("n"))
  }

  /** §3.3: playlist export — J2 join, deterministic shuffle + numbering,
    * sanitize-formatted link paths, m3u lines.
    */
  def exportPlaylist(lib: Library, userId: Int, playlistName: String,
      m3uPath: String, seed: String = "itdb"): Unit = {
    val numbered = playlistTracksFor(lib, userId, playlistName, seed)
    M3u.write(numbered, m3uPath, "Name", "Location")
  }

  /** §3.3 page render (S11, itdb2html.py:324-350): the same selection as
    * the m3u export, written as the HTML track-list page.
    */
  def exportPlaylistPage(lib: Library, userId: Int, playlistName: String,
      htmlPath: String): Unit = {
    val rows = playlistTracksFor(lib, userId, playlistName)
      .withColumnRenamed("Name", "name")
      .withColumn("rating", coalesce(col("Rating"), lit(0)))
    graft.emit.Html.write(playlistName, rows, htmlPath,
      extraCols = Seq("Location"))
  }

  /** §3.3 Music.app sink (S12, sql_to_playlist:42-55): the same selection
    * emitted as the AppleScript playlist-builder artifact.
    */
  def exportPlaylistScript(lib: Library, userId: Int, playlistName: String,
      scriptPath: String): Unit =
    graft.emit.MusicAppPlaylist.write(playlistName,
      playlistTracksFor(lib, userId, playlistName), scriptPath)

  /** Shared §3.3 selection: playlist members joined to tracks, numbered,
    * ordered by link path (the export order every sink preserves).
    */
  private def playlistTracksFor(lib: Library, userId: Int,
      playlistName: String, seed: String = "itdb"): DataFrame = {
    val ids = lib.playlists
      .filter(col("User_ID") === userId && col("Name") === playlistName)
      .select(col("Playlist_ID"))
    val members = lib.playlistTracks.join(ids, Seq("Playlist_ID"))
      .select(col("User_ID"), col("Track_ID"))
    val tracks = lib.tracks.join(members, Seq("User_ID", "Track_ID"))
    ItdbOps.numberedLinkPaths(tracks, seed)
      .join(tracks.select(col("Track_ID"), col("Name"), col("Location"),
        col("Rating"), col("Persistent_ID")), Seq("Track_ID"))
      .orderBy(col("link_path"))
  }
}
