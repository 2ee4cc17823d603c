package graft.emit

import org.apache.spark.sql.DataFrame

/** S12 (SURVEY §2.1): Music.app playlist sink — the reference drives
  * iTunes live over appscript (sql_to_playlist:42-55: make a playlist,
  * duplicate each track located by persistent ID). This engine cannot hold
  * an Apple-events session, so the sink emits the equivalent AppleScript
  * as a deterministic text artifact: run it with `osascript` on the Mac
  * that owns the library and the same playlist appears.
  *
  * Driver-side emit over a collected column, like the m3u sink — a
  * playlist is a small ordered artifact; the query that SELECTS the
  * persistent IDs is the distributed part.
  */
object MusicAppPlaylist {

  private[emit] def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** AppleScript that creates `playlistName` and adds the tracks in row
    * order (sql_to_playlist preserves the query's ORDER BY the same way).
    */
  def script(playlistName: String, persistentIds: Seq[String]): String = {
    val adds = persistentIds.map { pid =>
      s"""  duplicate (first track of library playlist 1 whose persistent ID is ${quote(pid)}) to newPlaylist"""
    }.mkString("\n")
    s"""tell application "Music"
       |  set newPlaylist to make new user playlist with properties {name:${quote(playlistName)}}
       |$adds
       |end tell
       |""".stripMargin
  }

  /** Render from a query result: collect the (ordered) persistent-ID
    * column and emit the script text.
    */
  def fromQuery(playlistName: String, df: DataFrame,
      persistentIdCol: String = "Persistent_ID"): String =
    script(playlistName,
      df.select(persistentIdCol).collect().toSeq
        .collect { case r if !r.isNullAt(0) => r.getString(0) })

  def write(playlistName: String, df: DataFrame, path: String,
      persistentIdCol: String = "Persistent_ID"): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      fromQuery(playlistName, df, persistentIdCol))
}
