package graft.ops

import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file://` FileSystem without the per-file fork+exec.
  *
  * Hadoop's `RawLocalFileSystem`, when the native library is absent
  * (this sandbox, most laptops, many containers), implements
  * `setPermission` by FORKING A `chmod` PROCESS — and `create()` calls
  * `setPermission` on every file it makes, so every parquet part file,
  * every `.crc` sidecar, every streaming-checkpoint file costs a
  * fork+exec (~5 ms plus process-table contention at 32 concurrent
  * writer tasks). Profiling qcat_maintenance showed >30 s of its 220 s
  * executor time parked inside `HadoopOutputFile.create →
  * ProcessImpl.forkAndExec` (guide §1: measure first — the "write job"
  * cost was mostly process spawning, not I/O).
  *
  * This subclass routes `setPermission` through
  * `java.nio.file.Files.setPosixFilePermissions` — same effect, no
  * fork. Wired into the session builders via
  * `spark.hadoop.fs.file.impl = graft.ops.FastLocalFileSystem`; an
  * object-store deployment (s3a/abfs/gs) never hits this class and
  * needs nothing. [[LocalFsTuning.confs]] is the one-stop map the
  * mains share.
  */
class FastRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission == null) return
    // non-POSIX default stores (e.g. a Windows local run) would throw
    // UnsupportedOperationException from setPosixFilePermissions where
    // stock Hadoop fell back to chmod/native — keep that fallback
    if (!FastRawLocalFileSystem.posixSupported) {
      super.setPermission(p, permission)
      return
    }
    val bits = permission.toShort.toInt
    val set = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
    def add(mask: Int, perm: PosixFilePermission): Unit =
      if ((bits & mask) != 0) { set.add(perm); () }
    add(0x100, OWNER_READ); add(0x80, OWNER_WRITE); add(0x40, OWNER_EXECUTE)
    add(0x20, GROUP_READ); add(0x10, GROUP_WRITE); add(0x8, GROUP_EXECUTE)
    add(0x4, OTHERS_READ); add(0x2, OTHERS_WRITE); add(0x1, OTHERS_EXECUTE)
    java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, set)
    ()
  }
}

object FastRawLocalFileSystem {
  private val posixSupported: Boolean =
    java.nio.file.FileSystems.getDefault
      .supportedFileAttributeViews().contains("posix")
}

/** The checksummed local FS (what `file://` resolves to by default)
  * over the fork-free raw layer — behavior-identical to Hadoop's
  * `LocalFileSystem` except that permission changes never shell out.
  */
class FastLocalFileSystem extends LocalFileSystem(new FastRawLocalFileSystem)

/** The `file://` [[org.apache.hadoop.fs.AbstractFileSystem]] (the
  * FileContext API's resolution root) over the fork-free raw layer.
  * Structured Streaming's checkpoint/WAL/state-store writes go through
  * `CheckpointFileManager` → `FileContext`, which resolves
  * `fs.AbstractFileSystem.file.impl` — NOT `fs.file.impl` — so the
  * round-16 fork fix never reached them: every offsets/commits log
  * entry and every state-store delta file still paid a chmod
  * fork+exec on create (profiled on the stream execution thread as
  * `Shell.runCommand → ProcessImpl.forkAndExec`, serialized between
  * micro-batches). Mirrors stock Hadoop's `LocalFs` = ChecksumFs over
  * RawLocalFs exactly, swapping only the raw layer — same checksums,
  * same rename atomicity, no forks.
  */
class FastRawLocalFs(uri: java.net.URI,
    conf: org.apache.hadoop.conf.Configuration)
    extends org.apache.hadoop.fs.DelegateToFileSystem(
      uri, new FastRawLocalFileSystem, conf, "file", false)

class FastLocalFs(uri: java.net.URI,
    conf: org.apache.hadoop.conf.Configuration)
    extends org.apache.hadoop.fs.ChecksumFs(
      new FastRawLocalFs(uri, conf))

object LocalFsTuning {
  /** Session confs every local-mode entry point (Bench / Verify /
    * tools / specs) applies. Keyed as `spark.hadoop.*` so the conf
    * reaches executors and every `Path.getFileSystem` /
    * `FileContext.getFileContext` call.
    */
  val confs: Map[String, String] = Map(
    "spark.hadoop.fs.file.impl" -> classOf[FastLocalFileSystem].getName,
    "spark.hadoop.fs.AbstractFileSystem.file.impl" ->
      classOf[FastLocalFs].getName)
}
