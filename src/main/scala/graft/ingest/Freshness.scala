package graft.ingest

import java.nio.file.{Files, Path, Paths}

/** I1/I2 (SURVEY §2.12): the reference's incremental-load gates —
  *
  *   - the load is skipped unless the source XML's mtime is newer than the
  *     `.loaded` marker's (itdbloader.py:85-103, `-f` forces);
  *   - a `.loading` sentinel exists while a reload runs so the serving layer
  *     can switch to a maintenance page (itdb2html.py:594-596), and outputs
  *     swap atomically at the end.
  */
object Freshness {

  def needsReload(source: Path, loadedMarker: Path, force: Boolean = false): Boolean =
    force || !Files.exists(loadedMarker) ||
      Files.getLastModifiedTime(source).compareTo(
        Files.getLastModifiedTime(loadedMarker)) > 0

  /** Run `load` under a `.loading` sentinel; on success touch the `.loaded`
    * marker (the reference's rename of .loading -> .loaded). Returns true if
    * the load ran, false if it was fresh and skipped.
    */
  def withLoadGate[T](source: Path, markerDir: Path, force: Boolean = false)
      (load: => T): Option[T] = {
    val loaded = markerDir.resolve(".loaded")
    val loading = markerDir.resolve(".loading")
    if (!needsReload(source, loaded, force)) None
    else {
      Files.createDirectories(markerDir)
      Files.write(loading, Array.empty[Byte])
      try {
        val r = load
        Files.deleteIfExists(loaded)
        Files.move(loading, loaded) // atomic swap: serving resumes
        Some(r)
      } finally Files.deleteIfExists(loading)
    }
  }
}
