package graft.ingest

import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}

/** The minimal filesystem contract behind UpsertWriter's crash-atomic
  * publish and write-lease protocol. The default ([[LocalTableFs]]) is
  * plain NIO; every operation documents the object-store primitive it maps
  * to, so an S3/GCS deployment swaps ONE object — the protocol call sites
  * are unchanged. Read-side probes (exists/read/list) stay direct NIO in
  * UpsertWriter: only the MUTATIONS participate in the protocol, and they
  * are exactly the fault-injection points UpsertBucketSpec's
  * kill-between-every-step case exercises.
  *
  * Object-store mapping (S3 semantics):
  *  - put            → plain PUT (single-key atomic replace)
  *  - createNew      → conditional PUT with `If-None-Match: *` (the
  *                     compare-and-set that lease acquisition needs;
  *                     supported natively by S3 since 2024, GCS
  *                     `ifGenerationMatch=0`, Azure `If-None-Match: *`)
  *  - move           → server-side COPY + DELETE of the source; for
  *                     directories, LIST + per-key COPY + batch DELETE.
  *                     S3 has no rename, so this is NOT atomic there —
  *                     which is precisely why the publish protocol never
  *                     relies on move atomicity for multi-file state: the
  *                     pending-marker roll-forward makes an interrupted
  *                     copy+delete finish idempotently, and single-file
  *                     moves that need exclusivity (the lease tombstone)
  *                     target unique keys
  *  - moveReplace    → COPY (unconditional) + DELETE — single-key
  *                     last-writer-wins replace (lease renewal)
  *  - deleteIfExists → DELETE (idempotent by object-store contract)
  *  - deleteTree     → LIST + batch DELETE (idempotent, resumable)
  *  - mkdirs         → no-op (object stores have no directories)
  */
trait TableFs {
  /** Create or atomically replace one file. */
  def put(p: Path, content: Array[Byte]): Unit
  /** Create one file, failing with [[java.nio.file.FileAlreadyExistsException]]
    * if it exists — the compare-and-set primitive. */
  def createNew(p: Path, content: Array[Byte]): Unit
  /** Rename a file or directory; the caller guarantees the target is
    * absent (throws if not). */
  def move(src: Path, dst: Path): Unit
  /** Atomically replace the target file with the source file. */
  def moveReplace(src: Path, dst: Path): Unit
  def deleteIfExists(p: Path): Unit
  def deleteTree(p: Path): Unit
  def mkdirs(p: Path): Unit
  /** Whether [[move]] of a DIRECTORY is a single atomic step (POSIX
    * rename) or a LIST + per-key COPY + per-key DELETE (object stores).
    * Publishers branch on this: a non-atomic move of a bucket dir needs a
    * copy-complete phase marker so a crash mid-source-delete can never be
    * "repaired" by clearing the only complete copy. */
  def atomicMove: Boolean = true
  /** Copy a directory tree per key, overwriting — idempotent on re-run
    * (re-copying an already-copied key rewrites identical staged bytes).
    * Object stores: LIST + server-side COPY per key. */
  def copyTree(src: Path, dst: Path): Unit

  /** Share a directory tree of IMMUTABLE data files into a fresh target —
    * the snapshot primitive. Default: [[copyTree]] (object stores:
    * server-side COPY per key — no client data movement; the copied keys
    * are independent objects, untouchable by later writes to the source
    * keys). POSIX overrides with hard links: O(files) metadata ops, zero
    * bytes moved, and the target owns the inodes — a later rename-replace
    * or delete of the live file cannot reach the snapshot (the publish
    * protocol only ever replaces whole files, never writes into one, so
    * link sharing is safe). */
  def linkOrCopyTree(src: Path, dst: Path): Unit = copyTree(src, dst)
}

/** NIO implementation — the local/POSIX default. */
object LocalTableFs extends TableFs {
  def put(p: Path, content: Array[Byte]): Unit = { Files.write(p, content); () }
  def createNew(p: Path, content: Array[Byte]): Unit = {
    Files.write(p, content, StandardOpenOption.CREATE_NEW); ()
  }
  def move(src: Path, dst: Path): Unit = { Files.move(src, dst); () }
  def moveReplace(src: Path, dst: Path): Unit = {
    Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    ()
  }
  def deleteIfExists(p: Path): Unit = { Files.deleteIfExists(p); () }
  def deleteTree(p: Path): Unit = FsUtil.deleteTree(p)
  def mkdirs(p: Path): Unit = { Files.createDirectories(p); () }
  def copyTree(src: Path, dst: Path): Unit = {
    val s = Files.walk(src)
    val keys =
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(Files.isRegularFile(_)).toList
      } finally s.close()
    keys.foreach { k =>
      val to = dst.resolve(src.relativize(k))
      Files.createDirectories(to.getParent)
      Files.copy(k, to, StandardCopyOption.REPLACE_EXISTING)
    }
  }
  override def linkOrCopyTree(src: Path, dst: Path): Unit = {
    val s = Files.walk(src)
    val keys =
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(Files.isRegularFile(_)).toList
      } finally s.close()
    keys.foreach { k =>
      val to = dst.resolve(src.relativize(k))
      Files.createDirectories(to.getParent)
      Files.deleteIfExists(to)
      try { Files.createLink(to, k); () }
      catch { // filesystems without hard links: fall back per file
        case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
          Files.copy(k, to, StandardCopyOption.REPLACE_EXISTING); ()
      }
    }
  }
}
