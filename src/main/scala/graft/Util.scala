package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Small shared helpers (no Spark dependencies). */
object Fs {

  /** Best-effort recursive delete (deepest-first); failures are
    * swallowed — used only for temp-dir reclamation where a leftover
    * file is preferable to a failed query. */
  def deleteRecursively(dir: String): Unit =
    try {
      Files.walk(Paths.get(dir)).iterator().asScala.toSeq
        .sortBy((p: Path) => -p.getNameCount)
        .foreach(p => Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
}
