package graft.emit

import org.apache.spark.sql.{DataFrame, Row}

/** S10 (SURVEY §2.1): m3u playlist emit — ordered, single-file, with the
  * reference's `#ITDBDESC`/`#ITDBFILE` header convention
  * (playlistlinks.py:254-262; templates/filelist.tmpl.m3u:1-4).
  *
  * An m3u is inherently a small, ordered, driver-side artifact (one playlist
  * per file), so this is a deliberate collect-at-the-edge sink: the QUERY
  * producing the rows is distributed; only the final ordered lines land on
  * the driver. For bulk export, `lines` can instead be written with
  * `df.coalesce(1).write.text`.
  */
object M3u {

  /** Render rows (already ordered by the caller's query) to m3u lines.
    * `description` and `location` name the columns to emit.
    */
  def lines(df: DataFrame, description: String, location: String,
      header: Boolean = true): Seq[String] = {
    val rows = df.select(description, location).collect()
    // rows with no location cannot be played — skip them, like the
    // reference skips tracks whose file is missing (playlistlinks.py:223-252)
    val body = rows.toSeq.collect {
      case r: Row if !r.isNullAt(1) =>
        val desc = if (r.isNullAt(0)) "" else r.getString(0)
        val loc = r.getString(1)
        Seq(s"#ITDBDESC:$desc", s"#ITDBFILE:$loc", loc)
    }.flatten
    (if (header) Seq("#EXTM3U") else Nil) ++ body
  }

  def write(df: DataFrame, path: String, description: String, location: String): Unit = {
    val out = lines(df, description, location).mkString("", "\n", "\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), out)
  }

  /** Parse m3u lines back to (description, location) pairs — the read side
    * (moveplaylist.py:232-253). A #ITDBDESC header describes the NEXT
    * location line; entries without a header get None (index-pairing would
    * shift every later description onto the wrong track).
    */
  def parse(ls: Seq[String]): Seq[(Option[String], String)] = {
    val out = Seq.newBuilder[(Option[String], String)]
    var pending: Option[String] = None
    ls.foreach {
      case d if d.startsWith("#ITDBDESC:") => pending = Some(d.stripPrefix("#ITDBDESC:"))
      case c if c.startsWith("#") => () // other headers don't clear a pending desc
      case loc if loc.nonEmpty => out += ((pending, loc)); pending = None
      case _ => ()
    }
    out.result()
  }
}
