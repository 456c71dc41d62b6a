package graft.ingest

import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** [[TableFs]] with OBJECT-STORE semantics emulated over a local tree —
  * the executable form of the S3/GCS mapping documented on the trait.
  * The publish + lease protocol must converge under THESE semantics, not
  * POSIX's, for the 100 TB deployment story to hold, so the fault-injection
  * suite runs over this implementation as well as [[LocalTableFs]]:
  *
  *  - keys, not directories: `mkdirs` is a NO-OP (object stores have no
  *    directories); writers create parent paths lazily, exactly like a
  *    key write materializes its prefix. An empty "directory" therefore
  *    does not exist until a key lands under it.
  *  - `put` — single-key atomic replace (S3 PUT read-after-write): staged
  *    to a hidden sibling, then one ATOMIC_MOVE. A reader never observes a
  *    torn body, but there is no cross-key atomicity.
  *  - `createNew` — conditional PUT (`If-None-Match: *`): atomic
  *    CREATE_NEW, the protocol's compare-and-set.
  *  - `move` — server-side COPY then DELETE: NOT atomic (`atomicMove =
  *    false`). A single-file move is two key-ops; a directory move is
  *    LIST + per-key COPY + per-key DELETE, interruptible between every
  *    key. This is precisely where S3 differs from a filesystem and why
  *    the publish protocol phase-marks directory swaps instead of relying
  *    on rename.
  *  - `moveReplace` — unconditional COPY (overwrite) + DELETE, same
  *    non-atomicity.
  *  - `deleteIfExists` / `deleteTree` — idempotent DELETE / LIST + per-key
  *    DELETE, resumable.
  *
  * Every KEY-LEVEL mutation (one PUT, one COPY, one DELETE) first invokes
  * [[stepHook]] — the fault-injection suite swaps in a hook that throws at
  * the k-th op, simulating a writer death between any two object-store
  * requests, a strictly finer crash grid than the [[TableFs]] seam itself.
  * A real S3 deployment swaps this object for one speaking the SDK; the
  * semantics the protocol was fault-tested against are the same. */
object S3SimTableFs extends TableFs {
  /** Invoked before every key-level mutation; tests inject crashes here. */
  @volatile var stepHook: () => Unit = () => ()
  /** Key-level mutation count (observability). */
  val ops = new java.util.concurrent.atomic.AtomicLong(0L)

  private def step(): Unit = { ops.incrementAndGet(); stepHook() }

  private def parentOf(p: Path): Unit = {
    val par = p.toAbsolutePath.getParent
    if (par != null) { Files.createDirectories(par); () }
  }

  def put(p: Path, content: Array[Byte]): Unit = {
    step()
    parentOf(p)
    val tmp = p.resolveSibling("." + p.getFileName.toString + ".s3put." +
      java.util.UUID.randomUUID())
    Files.write(tmp, content)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Conditional PUT (`If-None-Match: *`): atomic both in CLAIM and in
    * CONTENT, like real S3 — a conditional PUT either lands the whole
    * body or nothing. A plain `Files.write(CREATE_NEW)` claims the key
    * atomically but writes the body after, so a concurrent reader could
    * observe an empty/torn lease; instead the body is staged to a hidden
    * sibling and the key is claimed via an atomic hard LINK to the staged
    * bytes (createLink fails with FileAlreadyExistsException iff the key
    * exists — the same compare-and-set, now carrying full content). */
  def createNew(p: Path, content: Array[Byte]): Unit = {
    step()
    parentOf(p)
    val tmp = p.resolveSibling("." + p.getFileName.toString + ".s3cput." +
      java.util.UUID.randomUUID())
    Files.write(tmp, content)
    try Files.createLink(p, tmp)
    finally Files.deleteIfExists(tmp)
    ()
  }

  private def copyKey(src: Path, dst: Path, overwrite: Boolean): Unit = {
    step()
    parentOf(dst)
    if (overwrite) Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    else Files.copy(src, dst)
    ()
  }

  private def deleteKey(p: Path): Unit = { step(); Files.deleteIfExists(p); () }

  /** COPY + DELETE, per key — every intermediate state is reachable by a
    * crash: copied-but-not-deleted (both exist), half a directory copied,
    * half the sources deleted. */
  def move(src: Path, dst: Path): Unit = {
    if (Files.exists(dst) && !Files.isDirectory(dst))
      throw new java.nio.file.FileAlreadyExistsException(dst.toString)
    if (Files.isDirectory(src)) {
      val keys = listTree(src)
      keys.foreach(k => copyKey(k, dst.resolve(src.relativize(k)), overwrite = true))
      keys.foreach(deleteKey)
      dropEmptyDirs(src)
    } else {
      copyKey(src, dst, overwrite = false)
      deleteKey(src)
    }
  }

  def moveReplace(src: Path, dst: Path): Unit = {
    copyKey(src, dst, overwrite = true)
    deleteKey(src)
  }

  def deleteIfExists(p: Path): Unit =
    if (Files.isDirectory(p)) deleteTreeKeys(p) else deleteKey(p)

  def deleteTree(p: Path): Unit = deleteTreeKeys(p)

  /** Object stores have no directories: creating one is a no-op (no
    * remote request, no crash point). */
  def mkdirs(p: Path): Unit = ()

  /** Directory moves here are LIST + COPY + DELETE — NOT atomic. */
  override def atomicMove: Boolean = false

  def copyTree(src: Path, dst: Path): Unit =
    listTree(src).foreach(k => copyKey(k, dst.resolve(src.relativize(k)), overwrite = true))

  private def listTree(p: Path): List[Path] = {
    if (!Files.exists(p)) return Nil
    val s = Files.walk(p)
    try s.iterator().asScala.filter(Files.isRegularFile(_)).toList.sorted
    finally s.close()
  }

  private def deleteTreeKeys(p: Path): Unit = {
    if (!Files.exists(p)) return
    listTree(p).foreach(deleteKey)
    dropEmptyDirs(p)
  }

  /** Local-tree hygiene only: object stores would have nothing left once
    * the keys are gone; locally the empty directory skeleton must go too,
    * or `Files.exists(dir)` probes would see ghosts no object store has. */
  private def dropEmptyDirs(p: Path): Unit = {
    if (!Files.exists(p)) return
    val s = Files.walk(p)
    val dirs =
      try s.iterator().asScala.filter(Files.isDirectory(_)).toList
      finally s.close()
    dirs.sortBy(-_.getNameCount).foreach { d =>
      val l = Files.list(d)
      val empty = try !l.iterator().hasNext finally l.close()
      if (empty) Files.deleteIfExists(d)
    }
  }
}
