package graft.sink

import org.apache.hadoop.fs.{FileSystem, Path}

import TxTable.ColStats

/** Sidecar storage for per-file Bloom/token filters. Inlining ~27 KB
  * of base64 per file into every commit `A` line made the log — and
  * every checkpoint, rewritten each 10 commits, and every replay parse
  * — grow with filter bytes at streaming-ingest file counts. Instead,
  * [[TxTable.stage]] writes ONE `_filters.tsv` sidecar per staged data
  * dir (immutable, like the data files) and the logged stats slot
  * holds a POINTER (`@<dataDir>/_filters.tsv`); the A line stays
  * ~100 bytes per indexed column. Delta draws the same line: stats in
  * the log stay scalar-small, bulky structures (deletion vectors) go
  * to referenced sidecar files.
  *
  * Consumers resolve pointers through [[resolveStats]]: sidecars load
  * once into an LRU cache (they are immutable, so the path is the
  * identity), and an unresolvable pointer DEGRADES TO NO FILTER —
  * skipping weakens, correctness never depends on it. Inline payloads
  * (pre-sidecar logs, test fixtures) pass through untouched, so both
  * log generations read with the same code.
  *
  * Sidecar line format: `fileKey \t colKey \t m,k \t base64` where
  * fileKey is the file's path relative to its data dir
  * (`date=<d>/<name>` — the same key [[TxTable.stage]]'s bloom job
  * groups by).
  */
object BloomStore {
  /** Pointer marker in a 'b' stats slot's min field. */
  val Ptr = '@'

  private val MaxCached = 512

  /** Failed reads are NOT cached as positive entries (a transient blip
    * must not pin no-skip until LRU eviction) — but an UNBOUNDED retry
    * would turn a permanently missing/corrupt sidecar into one failed
    * filesystem open per file probe on every planning pass, forever.
    * This TTL bounds both: a failure suppresses retries briefly, then
    * the next probe tries again.
    */
  private val NegativeTtlMs = 60000L

  private val cache =
    new java.util.LinkedHashMap[String, Map[(String, String), String]](
      64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Map[(String, String), String]])
          : Boolean = size() > MaxCached
    }
  private val failedAt =
    new java.util.LinkedHashMap[String, java.lang.Long](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.lang.Long]): Boolean =
        size() > MaxCached
    }

  private def load(fs: FileSystem, p: Path): Map[(String, String), String] = {
    val key = fs.makeQualified(p).toString
    cache.synchronized {
      val hit = cache.get(key)
      if (hit != null) return hit
      val f = failedAt.get(key)
      if (f != null) {
        if (System.currentTimeMillis() - f < NegativeTtlMs)
          return Map.empty
        failedAt.remove(key)
      }
    }
    try {
      val in = fs.open(p)
      val raw = try org.apache.commons.io.IOUtils.toString(in,
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val parsed: Map[(String, String), String] =
        raw.split("\n").iterator.filter(_.nonEmpty).flatMap { l =>
          l.split("\t", 4) match {
            case Array(fileKey, colKey, _, payload) =>
              Some((fileKey, colKey) -> payload)
            case _ => None
          }
        }.toMap
      // only a SUCCESSFUL read is cached positively: sidecars are
      // immutable so a parsed map is valid forever
      cache.synchronized {
        failedAt.remove(key)
        cache.put(key, parsed)
      }
      parsed
    } catch {
      // a missing/torn sidecar must read as "no filter", never fail
      // the scan; the failure is remembered only for NegativeTtlMs so
      // transient blips retry but a dead sidecar doesn't add one
      // failed open per probe forever
      case scala.util.control.NonFatal(_) =>
        cache.synchronized {
          failedAt.put(key, java.lang.Long.valueOf(
            System.currentTimeMillis()))
        }
        Map.empty[(String, String), String]
    }
  }

  /** The file's key within its data dir's sidecar: the last two path
    * segments (`date=<d>/<name>`) — identical to stripping the leading
    * `d-<uuid>` for table-relative paths, and still correct for the
    * ABSOLUTE paths a shallow clone's log carries.
    */
  private def fileKey(rel: String): String =
    rel.split('/').takeRight(2).mkString("/")

  /** Resolve every pointer-form 'b' entry of one file's stats to its
    * inline payload; unresolvable entries are DROPPED (conservative:
    * no filter = cannot skip). Inline entries pass through.
    */
  def resolveStats(fs: FileSystem, root: Path, rel: String,
      stats: Map[String, ColStats]): Map[String, ColStats] =
    if (!stats.values.exists(st => st.typ == 'b' && isPtr(st.min))) stats
    else stats.flatMap {
      case (c, st) if st.typ == 'b' && isPtr(st.min) =>
        load(fs, new Path(root, st.min.substring(1)))
          .get((fileKey(rel), c))
          .map(payload => c -> ColStats('b', payload, st.max))
      case other => Some(other)
    }

  def isPtr(min: String): Boolean =
    min.nonEmpty && min.charAt(0) == Ptr

  /** Every sidecar path referenced by any of `stats`' pointer entries,
    * table-relative — [[TxTable.vacuum]] must not reclaim these while
    * their files are live.
    */
  def referencedSidecars(
      files: Iterable[Map[String, ColStats]]): Set[String] =
    files.iterator.flatMap(_.values).collect {
      case st if st.typ == 'b' && isPtr(st.min) => st.min.substring(1)
    }.toSet

  private[graft] def clearCache(): Unit =
    cache.synchronized { cache.clear(); failedAt.clear() }
}
