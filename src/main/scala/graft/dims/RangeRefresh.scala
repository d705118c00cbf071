package graft.dims

import java.io.InputStream
import java.nio.file.{Files, StandardCopyOption}
import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The cloud-range fetch→parse→validate→swap job
  * (/root/reference/pkg/labeler/remote.go:98-126, public_ranges.go:311-361),
  * re-expressed for Spark's execution model. The reference holds the
  * parsed table + trie behind an RWMutex and swaps both every 24 h; here
  * the "table" is a DataFrame reference published atomically via a
  * volatile field — each micro-batch / query plans against whatever
  * snapshot is current (broadcast is per-plan, so a swapped table is
  * picked up on the next batch without restarting anything, the W5/W6
  * refresh shape).
  *
  * The transport is injected (`fetch: String => InputStream`) so the
  * zero-egress build and the specs run the identical job against
  * fixture files; production passes an HTTP client. A refresh that
  * fails ANYWHERE — transport, JSON parse, merge, or the local-region
  * sanity check — leaves the previous table live (remote.go:104-115:
  * log, bump the failure counter, `continue`).
  */
final class RangeRefresh(
    spark: SparkSession,
    fetch: String => InputStream,
    localRegion: String,
    today: () => LocalDate = () => LocalDate.now(java.time.ZoneOffset.UTC)) {

  import RangeRefresh._

  @volatile private var current: Option[DataFrame] = None
  @volatile private var refreshes: (Long, Long) = (0L, 0L) // (ok, failed)

  /** The live prefix table (throws before the first successful load —
    * the reference also refuses to start unlabeled, remote.go:56-64). */
  def table: DataFrame =
    current.getOrElse(throw new IllegalStateException(
      "prefix table never loaded — call refresh() first"))

  /** publicIPRefreshCounter analog: (succeeded, failed). */
  def refreshCounts: (Long, Long) = refreshes

  /** Azure's feed URL embeds a date and is published "weekly" with no
    * permalink: probe from today back `AzureProbeDays` days, then fall
    * back to the last URL known good (public_ranges.go:311-338).
    */
  private[dims] def resolveAzureStream(): InputStream = {
    val probes = (0 to AzureProbeDays).iterator.map(i =>
      azureUrl(today().minusDays(i.toLong)))
    probes.flatMap(u => tryFetch(u)).nextOption()
      .orElse(tryFetch(AzureFallbackUrl))
      .getOrElse(throw new java.io.IOException(
        s"Azure ranges unavailable after ${AzureProbeDays + 1} probed dates" +
          " + fallback"))
  }

  private def tryFetch(url: String): Option[InputStream] =
    try Some(fetch(url)) catch { case _: Exception => None }

  /** One refresh cycle. Every stage completes — including an EAGER
    * materialization and the A7 region sanity check — before the swap;
    * on any failure the old table stays live and `false` is returned.
    * Serialized (`synchronized`) like the reference's mutex-guarded
    * refresh loop, so overlapping cycles cannot interleave their swaps
    * or lose counter updates. Staged feed files are deleted after the
    * cycle (the localCheckpoint severed the lineage); the replaced
    * snapshot's blocks are reclaimed by the ContextCleaner once
    * unreachable (see the swap comment) — a long-lived daemon leaks
    * neither tmp disk nor executor storage.
    */
  def refresh(): Boolean = synchronized {
    val staged = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
    try {
      val aws = CloudRanges.fromAwsJson(spark, stage(fetch(AwsUrl), staged))
      val gcp = CloudRanges.fromGcpJson(spark, stage(fetch(GcpUrl), staged))
      val google = CloudRanges.fromGoogleJson(
        spark, stage(fetch(GoogleUrl), staged))
      val azure = CloudRanges.fromAzureJson(
        spark, stage(resolveAzureStream(), staged))
      // localCheckpoint = the reference's built-map moment: parse/merge
      // errors surface HERE (Spark is lazy), lineage to the staged temp
      // files is severed, and the swapped-in table is a materialized
      // snapshot, not a recipe that re-reads files we delete
      val merged = CloudRanges
        .mergeFeeds(aws, gcp, google, azure).localCheckpoint(true)
      require(merged.count() > 0, "empty merged prefix table")
      CloudRanges.assertRegionPresent(merged, localRegion)
      // the replaced snapshot is NOT eagerly unpersisted: an in-flight
      // micro-batch may still be reading it, and a localCheckpoint's
      // truncated lineage makes eagerly-freed blocks unrecoverable
      // mid-job. Dropping the reference lets the ContextCleaner reclaim
      // the blocks once no reader can reach them — the GC-paced analog
      // of the reference's RWMutex read-side protection.
      current = Some(merged)
      refreshes = (refreshes._1 + 1, refreshes._2)
      true
    } catch {
      case _: Exception =>
        refreshes = (refreshes._1, refreshes._2 + 1)
        false
    } finally staged.foreach(p =>
      try Files.deleteIfExists(p) catch { case _: Exception => () })
  }

  /** Spool a feed stream to a staging file for the JSON readers; the
    * caller deletes it once the cycle's checkpoint is materialized. */
  private def stage(in: InputStream,
      tracked: scala.collection.mutable.ArrayBuffer[java.nio.file.Path]): String = {
    val f = Files.createTempFile("graft_ranges_", ".json")
    tracked += f
    try Files.copy(in, f, StandardCopyOption.REPLACE_EXISTING) finally in.close()
    f.toString
  }
}

object RangeRefresh {
  /** Public feed endpoints (remote.go:189-199, public_ranges.go:325-331). */
  val AwsUrl = "https://ip-ranges.amazonaws.com/ip-ranges.json"
  val GcpUrl = "https://www.gstatic.com/ipranges/cloud.json"
  val GoogleUrl = "https://www.gstatic.com/ipranges/goog.json"
  val AzureProbeDays = 90
  private val AzureUrlPrefix = "https://download.microsoft.com/download/7/1/D/" +
    "71D86715-5596-4529-9B13-DA13A5DE5B63/ServiceTags_Public_"
  val AzureFallbackUrl: String = AzureUrlPrefix + "20240805.json"

  def azureUrl(date: LocalDate): String =
    AzureUrlPrefix + date.format(DateTimeFormatter.BASIC_ISO_DATE) + ".json"
}
