package graft.emit

import org.apache.spark.sql.DataFrame

/** S11 (SURVEY §2.1): HTML track-list page emit — the reference's Cheetah
  * render (itdb2html.py:324-350; templates/filelist.tmpl.html): page title,
  * star-histogram summary table, then the sortable track table.
  *
  * Like the m3u sink, the page is a small ordered presentation artifact:
  * the QUERY that selects/sorts/aggregates tracks is distributed, only the
  * final rows are collected and rendered driver-side. HTML escaping matches
  * Exprs.escapeHtml (X7) so both surfaces render identically.
  */
object Html {

  private[emit] def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def stars(rating: Any): Int = rating match {
    case null => 0
    case n: Number => math.min(5, math.max(0, n.intValue / 20))
    case _ => 0
  }

  /** Render a track-list page. Expected columns: `name` plus any extra
    * display columns, and `rating` (0..100) for the star summary — the
    * reference's filelist shape with the db round-trip replaced by the
    * caller's DataFrame.
    */
  def trackListPage(title: String, df: DataFrame,
      nameCol: String = "name", ratingCol: String = "rating",
      extraCols: Seq[String] = Seq.empty): String = {
    val cols = (nameCol +: extraCols) :+ ratingCol
    val rows = df.select(cols.head, cols.tail: _*).collect()
    val hist = new Array[Int](6)
    rows.foreach(r => hist(stars(r.get(cols.length - 1))) += 1)

    val summary = (0 to 5).map(s =>
      s"<th>${"★" * s}${"☆" * (5 - s)}</th><td>${hist(s)}</td>").mkString
    val headCells = cols.dropRight(1).map(c => s"<th>${escape(c)}</th>").mkString
    val body = rows.map { r =>
      val cells = (0 until cols.length - 1).map { i =>
        val v = if (r.isNullAt(i)) "" else r.get(i).toString
        s"<td>${escape(v)}</td>"
      }.mkString
      val s = stars(r.get(cols.length - 1))
      s"<tr>$cells<td>${"★" * s}${"☆" * (5 - s)}</td></tr>"
    }.mkString("\n")

    s"""<html><head><title>${escape(title)}</title></head><body>
       |<h2 align=center>${escape(title)}</h2>
       |<table class="otherpl"><tr><th>All Tracks</th><td>${rows.length}</td>$summary</tr></table>
       |<table class="alist">
       |<tr>$headCells<th>Stars</th></tr>
       |$body
       |</table>
       |</body></html>
       |""".stripMargin
  }

  def write(title: String, df: DataFrame, path: String,
      nameCol: String = "name", ratingCol: String = "rating",
      extraCols: Seq[String] = Seq.empty): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      trackListPage(title, df, nameCol, ratingCol, extraCols))
}
