package graft.core

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFs, DelegateToFileSystem, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem without the per-file `chmod` fork.
  *
  * Without the Hadoop native library (absent in this environment — pure-JVM
  * Spark distribution), `RawLocalFileSystem.setPermission` falls back to
  * `Shell.execCommand(chmod ...)`: a full process fork per created file or
  * directory. Every structured-streaming micro-batch creates several such
  * files (offset log, commit log, one state-store delta per state
  * partition), and every parquet write creates task-attempt dirs + part
  * files — stack-sampled at up to ~half the wall of the streaming
  * certification queries (executor task threads RUNNABLE inside
  * `ProcessImpl.forkAndExec`, `plans/r18` profile notes).
  *
  * These subclasses make `setPermission` a no-op. That is semantically safe
  * here: everything written through them is single-tenant scratch (RAM-backed
  * stream checkpoints/drops/sinks, bench/verify outputs) where POSIX
  * permission bits carry no information — files are created with the
  * process umask either way, and nothing ever reads the permission bits
  * back. A production deployment on HDFS/S3 does not take this path at all
  * (those filesystems implement setPermission natively, without forking);
  * on a local cluster with the native library, NativeIO.chmod is used and
  * is equally cheap. The override removes ONLY the fork, not any observable
  * filesystem state the engine consumes.
  *
  * Wiring (both APIs, because Spark uses both):
  *  - `spark.hadoop.fs.file.impl` → [[NoChmodLocalFileSystem]]
  *    (the `FileSystem` API: parquet scans/writes, state-store providers);
  *  - `spark.hadoop.fs.AbstractFileSystem.file.impl` → [[NoChmodLocalFs]]
  *    (the `FileContext` API: `FileContextBasedCheckpointFileManager`, the
  *    default checkpoint manager for `file:` URIs).
  */
class NoChmodRawLocalFileSystem extends RawLocalFileSystem {
  import java.io.FileNotFoundException
  import java.nio.file.{Files, NoSuchFileException, LinkOption}
  import java.nio.file.attribute.{PosixFileAttributes, PosixFilePermission}
  import org.apache.hadoop.fs.FileStatus

  override def setPermission(p: Path, permission: FsPermission): Unit = ()

  /** `stat(2)` via java.nio instead of a forked `stat(1)` process.
    *
    * With `org.apache.hadoop.fs.Stat.isAvailable()` true (any Linux),
    * the stock `getFileStatus`/`listStatus` take the "native" branch that
    * shells out to the `stat` command — one process fork per status call,
    * and status calls are everywhere: every `exists()` on a checkpoint
    * log, every file-source directory listing per micro-batch trigger,
    * every parquet footer open. One `Files.readAttributes` syscall returns
    * the same (size, kind, mtime, atime, permission, owner, group) tuple
    * with no fork. Symlinks are followed, exactly like the stock
    * `getFileStatus`; the certification scratch contains none anyway.
    */
  override def getFileStatus(f: Path): FileStatus = {
    val file = pathToFile(f)
    val attrs =
      try Files.readAttributes(file.toPath, classOf[PosixFileAttributes])
      catch {
        case _: NoSuchFileException | _: FileNotFoundException =>
          throw new FileNotFoundException(s"File $f does not exist")
        case _: UnsupportedOperationException =>
          return super.getFileStatus(f) // non-POSIX store: stock path
      }
    val perms = attrs.permissions()
    def bit(p: PosixFilePermission, v: Int): Int =
      if (perms.contains(p)) v else 0
    val mode =
      bit(PosixFilePermission.OWNER_READ, 0x100) |
        bit(PosixFilePermission.OWNER_WRITE, 0x80) |
        bit(PosixFilePermission.OWNER_EXECUTE, 0x40) |
        bit(PosixFilePermission.GROUP_READ, 0x20) |
        bit(PosixFilePermission.GROUP_WRITE, 0x10) |
        bit(PosixFilePermission.GROUP_EXECUTE, 0x8) |
        bit(PosixFilePermission.OTHERS_READ, 0x4) |
        bit(PosixFilePermission.OTHERS_WRITE, 0x2) |
        bit(PosixFilePermission.OTHERS_EXECUTE, 0x1)
    new FileStatus(
      attrs.size(), attrs.isDirectory, 1, getDefaultBlockSize(f),
      attrs.lastModifiedTime().toMillis, attrs.lastAccessTime().toMillis,
      new FsPermission(mode.toShort), attrs.owner().getName,
      attrs.group().getName, null,
      f.makeQualified(getUri, getWorkingDirectory))
  }

  /** NOFOLLOW twin of [[getFileStatus]], same fork-free motivation. The
    * scratch trees contain no symlinks, so "status of the link itself"
    * and "status of the target" coincide; a genuine symlink (detectable
    * without forking) falls back to the stock implementation.
    */
  override def getFileLinkStatus(f: Path): FileStatus = {
    val file = pathToFile(f)
    if (Files.isSymbolicLink(file.toPath)) super.getFileLinkStatus(f)
    else getFileStatus(f)
  }
}

/** `FileSystem`-API local FS (checksummed, as the stock `LocalFileSystem`)
  * over the no-chmod raw FS. Needs the no-arg constructor — Hadoop
  * instantiates `fs.file.impl` reflectively.
  */
class NoChmodLocalFileSystem extends LocalFileSystem(new NoChmodRawLocalFileSystem)

/** `FileContext`-API twin of [[NoChmodLocalFileSystem]] (the stock
  * `LocalFs` is exactly `ChecksumFs(RawLocalFs)`; this swaps the delegate's
  * `FileSystem` for the no-chmod one). Hadoop instantiates
  * `fs.AbstractFileSystem.file.impl` via the (URI, Configuration)
  * constructor.
  */
class NoChmodLocalFs(uri: URI, conf: Configuration)
    extends ChecksumFs(new NoChmodRawLocalFs(uri, conf))

private class NoChmodRawLocalFs(uri: URI, conf: Configuration)
    extends DelegateToFileSystem(
      uri, new NoChmodRawLocalFileSystem, conf, "file", false)
