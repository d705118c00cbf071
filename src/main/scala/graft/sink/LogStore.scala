package graft.sink

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE store-specific primitive [[TxTable]]'s commit protocol
  * needs: an atomic put-if-absent of one complete, fully-materialized
  * log file — exactly Delta's LogStore split. Everything else in the
  * protocol (staging, replay, checkpoints, vacuum) is plain reads and
  * writes of immutable files and needs no store cooperation.
  *
  * [[HadoopLogStore]] is the default and covers stores whose
  * `create(overwrite = false)` is atomic (HDFS via the namenode) plus
  * local POSIX via link(2). An object-store deployment registers a
  * conditional-PUT implementation for its scheme with
  * [[TxTable.registerLogStore]]: S3 `If-None-Match: *`, GCS
  * `x-goog-if-generation-match: 0`, ABFS ETag-if-absent — each store's
  * native compare-and-set, wrapped to this two-outcome contract.
  * The reference sidesteps the problem entirely because ClickHouse owns
  * its storage (/root/reference/test/network_flows_0.sql:39-44).
  */
trait LogStore {
  /** Atomically create `f` with complete `payload` iff it does not
    * exist. Returns false iff the file already exists (a lost race —
    * the OTHER writer's content is complete and visible); any other
    * failure must throw. After a true return the file is durable and
    * readable with exactly `payload`; no reader may ever observe a
    * partial write.
    */
  def putIfAbsent(fs: FileSystem, f: Path, payload: Array[Byte]): Boolean
}

/** Default [[LogStore]]: HDFS-style atomic create, with a link(2)
  * publish on the local filesystem (RawLocalFileSystem's
  * `create(false)` is check-THEN-create — two racing JVMs/threads can
  * both pass the check and both "win", which TxTable's exactly-once
  * spec caught as a real double-commit; link(2)'s EEXIST is the
  * kernel-atomic lost-race signal, and the file appears with complete
  * content because the temp source was fully written first).
  */
object HadoopLogStore extends LogStore {
  override def putIfAbsent(fs: FileSystem, f: Path,
      payload: Array[Byte]): Boolean = {
    if (fs.exists(f)) return false
    if (fs.getScheme == "file") {
      import java.nio.file.{Files, Paths, FileAlreadyExistsException}
      val target = Paths.get(fs.makeQualified(f).toUri.getPath)
      val tmp = Files.createTempFile(target.getParent,
        s".claim${f.getName.takeWhile(_ != '.')}-", ".tmp")
      try {
        Files.write(tmp, payload)
        try { Files.createLink(target, tmp); true }
        catch { case _: FileAlreadyExistsException => false }
      } finally Files.deleteIfExists(tmp)
    } else {
      try {
        val out = fs.create(f, false)
        try out.write(payload) finally out.close()
        true
      } catch {
        case e: java.io.IOException =>
          if (fs.exists(f)) false else throw e
      }
    }
  }
}
