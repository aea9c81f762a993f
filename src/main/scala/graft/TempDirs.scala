package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Session-scoped scratch directories for stored-index probes
  * (BM25 postings, PQ/IVF-PQ codes): every dir lives under ONE root
  * that a JVM shutdown hook deletes recursively, so repeated
  * correctness/fuzz runs stop accumulating orphaned parquet trees in
  * /tmp (review catch). Dirs stay unique per call — two concurrent
  * runs (parallel fuzz seeds) never clobber each other's index
  * mid-read.
  */
object TempDirs {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(r)))
    r
  }

  /** A fresh unique scratch dir, reaped at JVM exit. */
  def scratch(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
      finally walk.close()
    }
}
