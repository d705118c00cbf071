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
/** [[LogStore]] with OBJECT-STORE commit semantics, for proving the
  * protocol under the posture a 100 TB table actually lives on
  * (S3/GCS/ABFS): no rename or link in the client API — an object
  * appears atomically or not at all, the conditional-put arbitration
  * happens SERVER-side — plus the failure modes object-store clients
  * actually see, injected on a deterministic schedule so specs are
  * reproducible:
  *
  *  - `latencyMs`: every call pays a round-trip (S3 PUT p50 is
  *    ~10-30 ms; commit cost becomes RTT-dominated — see SCALE.md);
  *  - `faultEvery`: every Nth call throws BEFORE anything lands (a
  *    lost request / 503 — retry-safe);
  *  - `ambiguousEvery`: every Nth SUCCESSFUL put throws AFTER the
  *    object landed (response lost in flight) — the classic
  *    conditional-PUT ambiguity: the client cannot know whether it
  *    won, and must read back and compare (TxTable.putIfAbsent does
  *    exactly that).
  *
  * The tmp+link inside the delegated local write is the SIMULATION of
  * the service's atomic visibility — not part of the modeled client
  * API; the modeled client only ever issues one conditional PUT of a
  * complete payload.
  */
final class ObjectStoreLogStore(latencyMs: Long = 0,
    faultEvery: Int = 0, ambiguousEvery: Int = 0) extends LogStore {
  private val calls = new java.util.concurrent.atomic.AtomicLong
  val puts = new java.util.concurrent.atomic.AtomicLong
  override def putIfAbsent(fs: FileSystem, f: Path,
      payload: Array[Byte]): Boolean = {
    val n = calls.incrementAndGet()
    puts.incrementAndGet()
    if (latencyMs > 0) Thread.sleep(latencyMs)
    if (faultEvery > 0 && n % faultEvery == 0)
      throw new java.io.IOException(
        s"simulated object-store 503: request lost before landing ($f)")
    val won = HadoopLogStore.putIfAbsent(fs, f, payload)
    if (won && ambiguousEvery > 0 && n % ambiguousEvery == 0)
      throw new java.io.IOException(
        s"simulated ambiguous PUT: object landed, response lost ($f)")
    won
  }
}

object ObjectStoreLogStore {
  /** Build from a spec string `objectstore:<latencyMs>:<faultEvery>:
    * <ambiguousEvery>` (the form RaceWriter accepts via env so the
    * cross-JVM race can run under this posture). */
  def parse(spec: String): Option[ObjectStoreLogStore] =
    spec.split(":") match {
      case Array("objectstore", l, f, a) =>
        Some(new ObjectStoreLogStore(l.toLong, f.toInt, a.toInt))
      case Array("objectstore") => Some(new ObjectStoreLogStore())
      case _ => None
    }
}

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
