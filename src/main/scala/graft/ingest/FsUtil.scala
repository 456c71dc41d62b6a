package graft.ingest

import java.nio.file.{Files, Path}

/** Local-filesystem helpers shared by the write path (UpsertWriter swap)
  * and Storage.delete. */
object FsUtil {

  /** Recursive delete with eagerly-closed directory streams — an unclosed
    * `Files.list` leaks one OS handle per directory for the life of the
    * JVM, and the write path deletes a tree on EVERY table swap. */
  def deleteTree(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteTree(_))
      finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
