package graft.core

import java.nio.file.{FileVisitResult, Files, Path, Paths, SimpleFileVisitor}
import java.nio.file.attribute.BasicFileAttributes

/** Scratch-directory helpers shared by the bench/probe harnesses (one
  * implementation instead of a per-file twin — a tolerance fix applied to
  * one copy must not leave another broken).
  */
object Scratch {

  /** Total bytes of regular files under `dir`; 0 if absent.
    *
    * Tolerant of CONCURRENT DELETION by design: the bench boundary drain
    * polls this while Spark's ContextCleaner is removing shuffle files, so
    * entries routinely vanish between directory listing and stat. A plain
    * `Files.walk` throws `UncheckedIOException(NoSuchFileException)` in
    * exactly that window (and would abort a whole bench run from inside
    * its own cleanup poll); `walkFileTree` with a CONTINUE-on-failure
    * visitor returns the partial sum instead, which is the right answer
    * for a "has it stopped shrinking yet" poll.
    */
  def duBytes(dir: String): Long = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) return 0L
    var total = 0L
    try {
      Files.walkFileTree(root, new SimpleFileVisitor[Path] {
        override def visitFile(f: Path, attrs: BasicFileAttributes): FileVisitResult = {
          if (attrs.isRegularFile) total += attrs.size()
          FileVisitResult.CONTINUE
        }
        override def visitFileFailed(f: Path, e: java.io.IOException): FileVisitResult =
          FileVisitResult.CONTINUE
      })
    } catch { case _: Throwable => /* partial sum is fine for a poll */ }
    total
  }

  /** Recursive delete, tolerant of entries already gone. */
  def rmTree(f: java.io.File): Unit = {
    val kids = f.listFiles(); if (kids != null) kids.foreach(rmTree)
    f.delete()
  }
}
