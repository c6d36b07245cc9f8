package graft

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

/** JVM-scoped scratch directories for the self-landing demo queries
  * (q50–q55, st06) and the d06 checkpoint fallback. Every directory
  * created here is recursively deleted at JVM exit, so repeated
  * bench/verify runs cannot leak full-table copies into the temp
  * filesystem. (Deliberately exit-scoped, not call-scoped: a query's
  * landed data must outlive its DataFrame — the caller's action reads
  * it lazily.)
  */
object TempDirs {

  private val created = new ConcurrentLinkedQueue[Path]()

  @volatile private var hooked = false
  private def ensureHook(): Unit = if (!hooked) synchronized {
    if (!hooked) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => cleanup(), "graft-tempdirs"))
      hooked = true
    }
  }

  /** Create a tracked scratch directory. */
  def scratch(prefix: String): String = {
    ensureHook()
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }

  /** Delete every tracked directory (idempotent; also the exit hook). */
  def cleanup(): Unit = {
    var p = created.poll()
    while (p != null) {
      try {
        if (Files.exists(p)) {
          val walk = Files.walk(p)
          try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
          finally walk.close()
        }
      } catch { case _: Throwable => () }
      p = created.poll()
    }
  }
}
