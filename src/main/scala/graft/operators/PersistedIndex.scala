package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Shared machinery for PERSISTED serving indexes (ss2b's IVF cells, ir6b's
  * posting lists): a build-if-absent protocol under a corpus-fingerprinted
  * staging directory with crash-safe atomic publication.
  *
  * The serving contract: an index build is an amortized MAINTENANCE job; the
  * query path reads ONLY the published artifacts. The identity of an index is
  * therefore the identity of its SOURCE — `home` keys on (sanitized source
  * dir, caller-supplied fingerprint), and [[tableFingerprint]] supplies a
  * content-sensitive component (total bytes + newest mtime of the source
  * parquet) so regenerating testdata IN PLACE invalidates the index even when
  * the row count happens to match (ADVICE r12: a (dir, rowcount) key silently
  * reused a stale index across an in-place refresh).
  *
  * Crash safety (the PaperXmlGen convention): builders write into a
  * `.build_<home>_<pid>_<nanos>` sibling and publish with one atomic rename —
  * readers either see a COMPLETE index (`_INDEX_COMPLETE` marker inside) or
  * none. Losing the publish race to a concurrent COMPLETE winner just drops
  * the duplicate staging copy. Crashed builders leave orphaned `.build_*`
  * dirs; [[sweepStale]] removes any whose recorded pid is no longer alive
  * before each new build, so staging space is bounded by live builders.
  */
object PersistedIndex {

  private def sanitize(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9.]+", "_").stripPrefix("_")

  /** Content fingerprint of `dir/table.parquet` without scanning data: file
    * count + total bytes + newest mtime (hex-packed). Any in-place rewrite
    * bumps the mtime; appends and row-count-preserving regens change bytes
    * or mtime. Cheap (pure filesystem metadata), stable across processes. */
  def tableFingerprint(dir: String, table: String): String = {
    val p = Paths.get(dir, s"$table.parquet")
    if (!Files.exists(p)) "absent"
    else {
      var files = 0L; var bytes = 0L; var mtime = 0L
      val it = Files.walk(p)
      try it.forEach { f =>
        if (Files.isRegularFile(f)) {
          files += 1
          bytes += Files.size(f)
          mtime = math.max(mtime, Files.getLastModifiedTime(f).toMillis)
        }
      } finally it.close()
      java.lang.Long.toHexString(files) + "x" +
        java.lang.Long.toHexString(bytes) + "x" +
        java.lang.Long.toHexString(mtime)
    }
  }

  /** Deterministic on-disk home for an index of `kind` over source `dir`. */
  def home(kind: String, dir: String, fingerprint: String): Path =
    Paths.get("staging", kind, sanitize(dir) + "_" + fingerprint)

  def isBuilt(home: Path): Boolean =
    Files.exists(home.resolve("_INDEX_COMPLETE"))

  /** Run `build` against a staging dir and atomically publish it as `home`,
    * unless a COMPLETE index is already published. The builder must treat
    * its argument as the future `home` (same relative artifact layout). */
  def buildIfAbsent(home: Path)(build: Path => Unit): Unit = {
    if (isBuilt(home)) return
    Files.createDirectories(home.getParent)
    sweepStale(home.getParent)
    val tmp = home.getParent.resolve(
      s".build_${home.getFileName}_${ProcessHandle.current().pid()}_${System.nanoTime()}")
    Files.createDirectories(tmp)
    build(tmp)
    Files.createFile(tmp.resolve("_INDEX_COMPLETE"))
    try Files.move(tmp, home, StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileSystemException =>
      // lost the publish race to a COMPLETE winner — drop the staging copy
      deleteTree(tmp)
    }
  }

  /** Remove orphaned `.build_*` staging dirs whose builder pid is dead
    * (crashed mid-build — ADVICE r12: these were never cleaned). A live
    * pid's staging dir is left alone; name format is
    * `.build_<home>_<pid>_<nanos>`, parsed from the tail so underscores in
    * the home segment never confuse the split. */
  private[operators] def sweepStale(parent: Path): Unit = {
    if (!Files.exists(parent)) return
    val it = Files.list(parent)
    try it.forEach { p =>
      val name = p.getFileName.toString
      if (name.startsWith(".build_")) {
        val segs = name.split('_')
        val alive = (segs.length >= 3) && {
          try ProcessHandle.of(segs(segs.length - 2).toLong)
            .map[Boolean](_.isAlive).orElse(false)
          catch { case _: NumberFormatException => false }
        }
        if (!alive) deleteTree(p)
      }
    } finally it.close()
  }

  def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      val it = Files.walk(p).sorted(java.util.Comparator.reverseOrder())
      try it.forEach(f => Files.deleteIfExists(f)) finally it.close()
    }
}
