package graft.sink

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}

import TxTable.ColStats

/** Deletion vectors — MERGE-ON-READ row deletion (Delta's DV feature,
  * the ClickHouse lightweight-DELETE analog). A copy-on-write DELETE
  * rewrites every touched file; at 100 TB a point delete ("drop these
  * 40 rows for a GDPR request") touching a thousand 1 GB files costs a
  * terabyte of write I/O. A deletion vector instead records the
  * DELETED ROW POSITIONS of each touched file in a small immutable
  * sidecar and publishes ONE metadata commit; scans subtract the
  * positions at read time. Write cost becomes O(matched rows), not
  * O(touched bytes); [[TxTable.purgeDeletes]] later folds the vectors
  * into a physical rewrite when convenient (Delta's REORG ... PURGE).
  *
  * Storage: the DV payload rides a per-commit sidecar file
  * (`d-<uuid>/_dv.tsv`, immutable like data files), and the commit
  * log's per-file stats slot carries a POINTER under the reserved
  * `#dv` key (`ColStats('d', "@<sidecarRel>", cardinality)`) — the
  * exact split [[BloomStore]] uses for Bloom payloads, so checkpoints
  * and log replay round-trip DVs with zero new log syntax, and
  * [[TxTable.vacuum]] protects live sidecars the same way. `#` cannot
  * appear in a column name, so the key can never collide with real
  * column stats; the stats skipper ignores unknown types by design
  * (min/max stay a conservative SUPERSET of the live rows — skipping
  * and Bloom pruning remain correct, just not tighter, until purge).
  *
  * Unlike Bloom filters, DV resolution is CORRECTNESS-critical: a
  * dropped Bloom filter weakens skipping, a dropped DV RESURRECTS
  * deleted rows. Loads here therefore FAIL LOUDLY — no degrade path.
  *
  * Payload encoding: sorted distinct row positions, delta-varint
  * packed, base64. Positions are the parquet reader's file-order row
  * indexes (`_metadata.row_index`), the same identity Delta's DVs
  * bind to.
  */
object DvStore {
  /** Reserved stats key carrying the DV pointer on an `A` line. */
  val Key = "#dv"
  /** Stats typ for DV pointer entries. */
  val Typ = 'd'

  /** Encode sorted distinct positions as delta-varint base64. */
  def encode(positions: Array[Long]): String = {
    val out = new java.io.ByteArrayOutputStream(positions.length * 2 + 8)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    varint(positions.length.toLong)
    var prev = 0L
    var i = 0
    while (i < positions.length) {
      val p = positions(i)
      require(p >= prev || i == 0, "positions must be sorted distinct")
      varint(if (i == 0) p else p - prev)
      prev = p
      i += 1
    }
    java.util.Base64.getEncoder.encodeToString(out.toByteArray)
  }

  /** Decode [[encode]]'s payload back to sorted positions. */
  def decode(b64: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(b64)
    var off = 0
    def varint(): Long = {
      var v = 0L; var shift = 0
      while (true) {
        val b = bytes(off); off += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      v
    }
    val n = varint().toInt
    val res = new Array[Long](n)
    var prev = 0L
    var i = 0
    while (i < n) {
      prev = (if (i == 0) 0L else prev) + varint()
      res(i) = prev
      i += 1
    }
    res
  }

  /** Sorted-merge union of two sorted position arrays. */
  def union(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length || j < b.length) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (k == 0 || out(k - 1) != v) { out(k) = v; k += 1 }
    }
    java.util.Arrays.copyOf(out, k)
  }

  /** Write one immutable DV sidecar holding `entries` (data-file rel →
    * sorted positions) and return its table-relative path. Staged under
    * a fresh uuid dir like data files: invisible until the pointer
    * commit publishes, reclaimed by vacuum if the commit never lands.
    */
  def writeSidecar(fs: FileSystem, root: Path,
      entries: Map[String, Array[Long]]): String = {
    val rel = s"d-${java.util.UUID.randomUUID().toString.take(12)}/_dv.tsv"
    val lines = entries.toSeq.sortBy(_._1).map { case (fileRel, pos) =>
      s"$fileRel\t${pos.length}\t${encode(pos)}"
    }
    val out = fs.create(new Path(root, rel), false)
    try out.write((lines.mkString("\n") + "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    rel
  }

  /** Pointer stats entry for a file whose DV lives in `sidecarRel`. */
  def pointerEntry(sidecarRel: String, cardinality: Long): (String, ColStats) =
    Key -> ColStats(Typ, s"${BloomStore.Ptr}$sidecarRel", cardinality.toString)

  /** The DV pointer min-field of a file's stats, if any — the CAS
    * identity [[TxTable]]'s read-modify-write commits validate.
    */
  def pointerOf(stats: Map[String, ColStats]): Option[String] =
    stats.get(Key).map(_.min)

  private val MaxCached = 256
  private val cache =
    new java.util.LinkedHashMap[String, Map[String, Array[Long]]](
      64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Map[String, Array[Long]]]): Boolean =
        size() > MaxCached
    }

  private def load(fs: FileSystem, p: Path): Map[String, Array[Long]] = {
    val key = fs.makeQualified(p).toString
    cache.synchronized {
      val hit = cache.get(key)
      if (hit != null) return hit
    }
    // STRICT: any failure here propagates — a missing DV sidecar must
    // fail the read, never silently resurrect deleted rows
    val in = fs.open(p)
    val raw = try org.apache.commons.io.IOUtils.toString(in,
      StandardCharsets.UTF_8) finally in.close()
    val parsed: Map[String, Array[Long]] =
      raw.split("\n").iterator.filter(_.nonEmpty).map { l =>
        l.split("\t", 3) match {
          case Array(fileRel, _, payload) => fileRel -> decode(payload)
          case _ => throw new IllegalStateException(
            s"corrupt deletion-vector sidecar $p: $l")
        }
      }.toMap
    cache.synchronized { cache.put(key, parsed) }
    parsed
  }

  /** The deleted positions of `rel` per its stats pointer — None when
    * the file has no DV. Throws on an unresolvable pointer (strict).
    */
  def positions(fs: FileSystem, root: Path, rel: String,
      stats: Map[String, ColStats]): Option[Array[Long]] =
    stats.get(Key).map { st =>
      require(BloomStore.isPtr(st.min),
        s"malformed deletion-vector pointer for $rel: ${st.min}")
      val sidecar = st.min.substring(1)
      load(fs, new Path(root, sidecar)).getOrElse(rel,
        throw new IllegalStateException(
          s"deletion-vector sidecar $sidecar has no entry for $rel"))
    }

  /** Every DV sidecar referenced by any of `files`' stats — protected
    * from [[TxTable.vacuum]] while their files are live.
    */
  def referencedSidecars(
      files: Iterable[Map[String, ColStats]]): Set[String] =
    files.iterator.flatMap(_.get(Key)).collect {
      case st if BloomStore.isPtr(st.min) => st.min.substring(1)
    }.toSet

  private[graft] def clearCache(): Unit =
    cache.synchronized(cache.clear())
}
