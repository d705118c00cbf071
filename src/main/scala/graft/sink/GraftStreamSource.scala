package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit,
  SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

/** Composite offset for the CHUNKED initial snapshot: the first `idx`
  * files of the (deterministically sorted) snapshot at `version` have
  * been planned. Serialized as `s:<version>:<idx>` in the engine's
  * offset log; plain version offsets stay bare longs, so pre-round-8
  * checkpoints decode unchanged.
  *
  * The FINAL chunk is emitted with `idx = Long.MaxValue` — a terminal
  * sentinel meaning "snapshot complete". Completion is thereby encoded
  * in the offset itself: a restart whose committed offset is the
  * final chunk needs NO snapshot file list (which
  * [[TxTable.expireLog]] may have made irreproducible during the
  * downtime) to prove the snapshot finished before tailing versions.
  * Pre-round-9 checkpoints whose final chunk was `s:<v>:<total>`
  * still decode and take the list-checked path.
  *
  * DOWNGRADE caveat (forward-only compatibility, by design): code
  * predating the sentinel decoded `idx` with `.toInt`, which wraps
  * `Long.MaxValue` to -1 — an old build recovering a NEW checkpoint's
  * final chunk would slice an empty file list and silently drop the
  * snapshot tail. Checkpoints written by this build must not be
  * consumed by older builds; current decode paths reject out-of-range
  * idx values explicitly ([[GraftStreamSource]] uses
  * `math.toIntExact` everywhere a chunk index narrows).
  */
case class GraftSnapshotOffset(version: Long, idx: Long) extends Offset {
  override val json: String = s"s:$version:$idx"
}

/** The tx table as a STRUCTURED STREAMING SOURCE — Delta's streaming
  * read, ClickHouse's "another system tails the table" integration:
  *
  * {{{
  *   spark.readStream.format("graft")
  *     .option("maxVersionsPerTrigger", 10)   // tail rate limit
  *     .option("maxFilesPerTrigger", 1000)    // snapshot rate limit
  *     .option("skipChangeCommits", "true")   // tolerate rewrites
  *     .load("/lake/flows")
  * }}}
  *
  * Offsets ARE commit versions: `getOffset` polls the log head (one
  * metadata listing — no data I/O), and `getBatch(start, end]` returns
  * exactly the files added by PURE-APPEND commits in that version
  * range ([[TxTable.rangeDelta]] — the same incremental feed the
  * materialized view consumes). Offsets live in the engine's
  * checkpoint, and a replayed range re-reads the same immutable files
  * — downstream `foreachBatch` + [[TxTable.appendTxn]] therefore
  * composes into an exactly-once table-to-table pipeline.
  *
  * DELIVERY CONTRACT (Delta's posture, enforced — not silently
  * weakened — since round 8):
  *
  *  - A fresh stream (no checkpoint) whose history replays cleanly
  *    (every commit retained, none destructive) backfills COMMIT BY
  *    COMMIT, rate-limitable via `maxVersionsPerTrigger`. When part of
  *    the history was swept by [[TxTable.expireLog]] or rewritten
  *    (merge/compact/...), per-commit replay would silently lose those
  *    rows — the stream starts from the INITIAL SNAPSHOT of the table
  *    at the stream-start head version instead (exactly Delta's
  *    initial-snapshot semantics), and the tail is consumed
  *    incrementally from there. With `maxFilesPerTrigger` the snapshot
  *    is delivered in file-count-bounded chunks via
  *    [[GraftSnapshotOffset]] composite offsets (Delta's
  *    reservoir-index chunking) — a year-old 100 TB table backfills as
  *    many bounded micro-batches with mid-snapshot checkpoint recovery,
  *    not one planet-sized batch 0; without it the snapshot is one
  *    batch.
  *  - A RUNNING stream that encounters a data-changing rewrite commit
  *    (merge / delete / compact / retention / rollup / overwrite /
  *    restore) in its next range FAILS with an actionable error unless
  *    `skipChangeCommits=true` (Delta's option, same name, same
  *    meaning: rewrite commits deliver nothing; layout-only rewrites —
  *    optimize/z-order — are always transparent). The failure mode
  *    matters: a silent skip here is wrong OUTPUT, not degraded
  *    performance, because the rewrite changed rows the consumer
  *    already has.
  *  - A consumer lagging past [[TxTable.expireLog]] (its next range's
  *    commits no longer exist) or past the vacuum retention (its next
  *    range's files already reclaimed) fails loudly, naming the table,
  *    the range, and the knob — never a silent partial batch.
  *
  * Scale shape: each poll is one log replay (checkpoint + tail) and
  * each batch plans only the delta's files through the normal
  * FileSourceScan (column pruning + parquet pushdown intact). The
  * range-integrity check parses only the (start, end] commit files —
  * metadata bounded by `maxVersionsPerTrigger` — and the vacuum guard
  * is one existence probe per planned file, the same files the scan
  * opens immediately after. The MONOLITHIC initial-snapshot branch
  * skips the existence probe (snapshot files are LIVE at the head by
  * construction and [[TxTable.vacuum]] never reclaims live files);
  * chunked snapshots probe, because a slow chunked backfill can lag
  * behind subsequent rewrites.
  *
  * The read schema is FROZEN at stream start (the era's logged
  * schema): additive base evolution mid-stream keeps delivering the
  * frozen columns (new columns appear on restart), exactly Spark's
  * contract that a streaming query's schema is fixed.
  */
class GraftStreamSource(spark: SparkSession, table: String,
    maxVersionsPerTrigger: Option[Long],
    skipChangeCommits: Boolean,
    maxFilesPerTrigger: Option[Long] = None,
    readChangeFeed: Boolean = false)
    extends Source with SupportsTriggerAvailableNow {
  maxVersionsPerTrigger.foreach(n =>
    require(n > 0, s"maxVersionsPerTrigger must be positive, got $n"))
  maxFilesPerTrigger.foreach(n =>
    // the engine's ReadLimit.maxFiles and the snapshot slice bounds
    // are Ints — a larger value would wrap negative downstream while
    // passing a bare positivity check
    require(n > 0 && n <= Int.MaxValue,
      s"maxFilesPerTrigger must be in (0, ${Int.MaxValue}], got $n"))

  private val (fs, root) = TxTable.fsFor(spark, table)

  /** date partition column + the data schema of the newest version at
    * stream start, pinned for the stream's lifetime (CHANGE-FEED
    * streams append `_commit_version` + `_change_type`).
    */
  override val schema: StructType =
    GraftStreamSource.schemaFor(spark, table, readChangeFeed)
  private val frozenData: Option[StructType] =
    Some(StructType(schema.filterNot(f => f.name == "date" ||
      GraftStreamSource.CdfCols.contains(f.name))))

  /** Highest version already handed out by [[getOffset]]/[[getBatch]]
    * (recovery replays push it forward) — the base the rate limit
    * advances from.
    */
  @volatile private var planned: Long = -1L

  /** Chunked-snapshot progress: how many of the snapshot-at-`version`
    * files have been planned. Set on the first offset of a snapshot-
    * mode stream and restored by recovery replays of snapshot offsets.
    */
  private case class SnapState(version: Long, idx: Long)
  @volatile private var snap: Option[SnapState] = None

  /** The frozen snapshot file list for one version — DETERMINISTIC
    * (log replay at `v`, sorted by relative path), so recovery and the
    * original run slice identical lists.
    */
  @volatile private var snapCache
      : Option[(Long, Seq[(String, TxTable.FileMeta)])] = None
  private def snapFiles(v: Long): Seq[(String, TxTable.FileMeta)] =
    snapCache match {
      case Some((cv, cached)) if cv == v => cached
      case _ =>
        // GUARD before replaying: once expireLog sweeps the commits
        // below a newer checkpoint, replayState(asOf = v) silently
        // returns an EMPTY state — a paused mid-snapshot consumer
        // would read that as "0 files left" and silently lose the rest
        // of its backfill
        if (!TxTable.versionReproducible(fs, root, v)) fail(-1, v,
          s"(the initial snapshot at version $v) is no longer " +
            "reproducible from the commit log (expireLog swept its " +
            "commits while the snapshot backfill was paused)",
          "restart the stream from a fresh checkpoint (batch 0 " +
            "becomes the snapshot at the current head), or run " +
            "TxTable.expireLog less aggressively so paused consumers " +
            "can resume")
        val built = TxTable.snapshotFiles(fs, root, Some(v)).toSeq
          .sortBy(_._1)
        snapCache = Some((v, built))
        built
    }

  /** Advance the snapshot phase state and build the chunk offset —
    * the final chunk (ni == total) is published as the terminal
    * sentinel so completion is provable from the offset alone. */
  private def chunkOffset(v: Long, ni: Long, total: Long): Offset = {
    val pub = if (ni >= total) Long.MaxValue else ni
    snap = Some(SnapState(v, pub))
    GraftSnapshotOffset(v, pub)
  }

  private def decode(o: Offset): Either[SnapState, Long] = o match {
    case s: GraftSnapshotOffset => Left(SnapState(s.version, s.idx))
    case l: LongOffset          => Right(l.offset)
    case other =>
      // checkpoint-restored offsets arrive serialized: either a bare
      // version number (LongOffset, incl. pre-round-8 checkpoints) or
      // the snapshot form `s:<version>:<idx>`
      val j = other.json.trim
      if (j.startsWith("s:")) {
        val p = j.split(':')
        Left(SnapState(p(1).toLong, p(2).toLong))
      } else Right(j.toLong)
  }

  /** Restore planner state from an engine-provided restart offset —
    * the DSv2 path's explicit replacement for the v1 engine's
    * recovery-getBatch replay (which pushes [[planned]]/[[snap]]
    * forward as a side effect). Idempotent; only ever advances.
    */
  private[sink] def primeFrom(o: Offset): Unit = decode(o) match {
    case Right(v) => if (v > planned) planned = v
    case Left(s) =>
      if (s.version > planned) planned = s.version
      val restored = math.max(s.idx,
        snap.collect { case c if c.version == s.version => c.idx }
          .getOrElse(0L))
      snap = Some(SnapState(s.version, restored))
  }

  /** Trigger.AvailableNow drain target, pinned ONCE at query start.
    * The engine's generic v1 wrapper would capture one rate-limited
    * getOffset result as "all available" and stop after a single
    * trigger's worth of commits — implementing the interface directly
    * (FileStreamSource's own pattern) lets the rate limit keep
    * chunking while the run drains exactly to the pinned head.
    */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(TxTable.currentVersion(spark, table))

  /** The configured rate limits, surfaced as this source's default
    * ReadLimit. The VALUE is echoed back by the engine on normal and
    * AvailableNow triggers (rate limits apply); Trigger.Once instead
    * passes `ReadLimit.allAvailable()`, whose contract is "process
    * everything in one batch" — [[latestOffset]] must then IGNORE the
    * internal limits (exactly FileStreamSource's behavior, and the
    * reason Trigger.AvailableNow exists for limit-respecting drains).
    */
  override def getDefaultReadLimit: ReadLimit =
    (maxVersionsPerTrigger, maxFilesPerTrigger) match {
      case (None, None) => ReadLimit.allAvailable()
      case (v, f) => ReadLimit.compositeLimit(
        (v.map(ReadLimit.maxRows) ++
          f.map(n => ReadLimit.maxFiles(n.toInt))).toArray)
    }

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 =
    computeNextOffset(ignoreRateLimits = limit.isInstanceOf[
      org.apache.spark.sql.connector.read.streaming.ReadAllAvailable] &&
      (maxVersionsPerTrigger.isDefined || maxFilesPerTrigger.isDefined))
      .orNull

  override def getOffset: Option[Offset] = computeNextOffset(false)

  private def computeNextOffset(ignoreRateLimits: Boolean): Option[Offset] = {
    val head = TxTable.currentVersion(spark, table)
    // under AvailableNow, commits landing AFTER query start must not
    // extend the run — cap at the pinned target
    val cur = availableNowTarget.map(math.min(_, head)).getOrElse(head)
    if (cur < 0) return None
    // mid-snapshot: the next chunk takes precedence over version
    // tailing; terminates because idx strictly advances to total
    snap match {
      case Some(st) =>
        if (st.idx != Long.MaxValue) {
          val total = snapFiles(st.version).size.toLong
          if (st.idx < total) {
            val ni = maxFilesPerTrigger.filterNot(_ => ignoreRateLimits)
              .map(n => math.min(st.idx + n, total)).getOrElse(total)
            return Some(chunkOffset(st.version, ni, total))
          }
        }
        // snapshot complete. Emit ONE closing VERSION offset at the
        // snapshot version (when nothing has been tailed past it yet)
        // so the stream's RESTING committed offset after a full drain
        // is a plain version, not a snapshot chunk: a later restart
        // then recovers without the snapshot file list, which
        // expireLog may have made irreproducible during the downtime.
        // Only the narrow crash window between the final chunk's
        // commit and this closing commit still needs the list (and
        // fails loudly there, as before).
        snap = None
        if (planned <= st.version) return Some(LongOffset(st.version))
      case None => ()
    }
    val next = maxVersionsPerTrigger.filterNot(_ => ignoreRateLimits) match {
      case Some(n) if planned >= 0 => math.min(cur, planned + n)
      case None if planned >= 0    => cur
      case mvt =>
        // FIRST offset of a fresh stream (restored streams had planned
        // pushed forward by the engine's recovery getBatch): per-commit
        // backfill is only sound when the whole history replays
        // cleanly — otherwise the stream starts from the initial
        // snapshot at the head
        val (complete, _, destructive) =
          TxTable.rangeSummary(fs, root, -1L, cur)
        // CDF backfill represents rewrites as change rows, so only an
        // INCOMPLETE (log-expired) history forces snapshot mode there
        if (complete && (!destructive || readChangeFeed))
          mvt.map(n => math.min(cur, planned + n)).getOrElse(cur)
        else maxFilesPerTrigger.filterNot(_ => ignoreRateLimits) match {
          case Some(n) =>
            val total = snapFiles(cur).size.toLong
            val ni = math.min(n, total)
            planned = cur
            return Some(chunkOffset(cur, ni, total))
          case None => cur // monolithic snapshot batch
        }
    }
    if (next <= planned) None
    else {
      planned = next
      Some(LongOffset(next))
    }
  }

  /** Actionable failure: every message names the table, the version
    * range, and the knob that governs the loss.
    */
  private def fail(startV: Long, endV: Long, what: String,
      remedy: String): Nothing =
    throw new IllegalStateException(
      s"graft stream source on $table: commit range ($startV, $endV] " +
        s"$what — $remedy")

  /** Integrity-checked append delta for a (startV, endV] tail range —
    * ONE parse per commit file in range (classification + file delta
    * together), the recurring per-trigger metadata cost.
    */
  private def tailFiles(startV: Long,
      endV: Long): Seq[(String, TxTable.FileMeta)] = {
    val (complete, destructive, files) =
      TxTable.rangeDelta(fs, root, startV, endV)
    if (!complete) fail(startV, endV,
      "is no longer fully present in the commit log (expireLog " +
        "swept part of it): the consumer lagged past the log " +
        "retention and those appends cannot be reproduced",
      "restart the stream from a fresh checkpoint (batch 0 becomes " +
        "the initial snapshot), or run TxTable.expireLog less " +
        "aggressively so consumers can lag further")
    if (destructive && !skipChangeCommits) fail(startV, endV,
      "contains a data-changing rewrite commit (merge / delete / " +
        "compact / retention / rollup / overwrite / restore): " +
        "streaming reads deliver appends only, so rows changed by " +
        "the rewrite would silently diverge downstream",
      "set .option(\"skipChangeCommits\", \"true\") to skip rewrite " +
        "commits (Delta's posture), or restart from a fresh " +
        "checkpoint to pick up the rewritten state")
    files
  }

  /** The vacuum guard shared by both delivery paths: one existence
    * probe per planned file, failing with the lag-naming message.
    */
  private def probeMissing(files: Seq[(String, TxTable.FileMeta)],
      rangeDesc: (Long, Long)): Unit = {
    val missing = files.collect {
      case (rel, _) if !fs.exists(new Path(root, rel)) => rel
    }
    if (missing.nonEmpty) fail(rangeDesc._1, rangeDesc._2,
      s"references ${missing.size} data file(s) already reclaimed " +
        s"by vacuum (first: ${missing.head}): the consumer lagged " +
        "past the vacuum retention",
      "restart the stream from a fresh checkpoint to read the " +
        "current state, or raise the retention (TxTable.vacuum " +
        "minAgeMs, default 7 days) to cover the worst consumer lag")
  }

  /** Build the micro-batch frame from a file set (append deltas and
    * snapshot slices). CDF streams tag every row
    * (`_commit_version = snapV`, 'insert' — a snapshot IS its
    * version's insert set). The final select rebinds to the declared
    * schema order: the engine maps batch output to the source schema
    * BY POSITION (readFileSet leads with date; the relation schema
    * trails with it, the Spark partition-column convention).
    */
  private def filesFrame(files: Seq[(String, TxTable.FileMeta)],
      snapV: Long): DataFrame = {
    if (files.isEmpty)
      GraftSqlBridge.emptyStreamingFrame(spark, schema)
    else {
      val base = TxTable.readFileSet(spark, root, files, frozenData)
      val tagged =
        if (!readChangeFeed) base
        else base
          .withColumn("_commit_version",
            org.apache.spark.sql.functions.lit(snapV))
          .withColumn("_change_type",
            org.apache.spark.sql.functions.lit("insert"))
      GraftSqlBridge.toStreamingFrame(
        tagged.select(schema.fieldNames.map(
          org.apache.spark.sql.functions.col): _*))
    }
  }

  /** A (startV, endV] version-tail batch plan. CDF streams deliver
    * the DERIVED row-level changes ([[TxTable.changeFeed]]) — rewrite
    * commits are first-class rows (delete pre-image + insert
    * post-image), which is the whole point of subscribing to changes;
    * plain streams deliver append files only, with the
    * destructive-rewrite/skipChangeCommits contract enforced by
    * [[tailFiles]].
    */
  private def tailPlan(startV: Long, endV: Long): GraftStreamSource.BatchPlan =
    if (readChangeFeed) GraftStreamSource.ChangeRange(startV, endV)
    else {
      val files = tailFiles(startV, endV)
      probeMissing(files, (startV, endV))
      GraftStreamSource.FileSlice(files, endV)
    }

  /** Decode the (start, end] offsets, restore/advance recovery state,
    * run every integrity check (range completeness, rewrite contract,
    * snapshot reproducibility, vacuum existence probe), and return
    * WHAT the batch delivers — a file slice or a CDF version range.
    * This is the whole of getBatch except frame construction, shared
    * verbatim by the v1 `Source.getBatch` and the DataSourceV2
    * `MicroBatchStream.planInputPartitions` ([[GraftMicroBatchStream]]):
    * one state machine, two delivery contracts.
    *
    * A version start offset of -1 is normalized to "from the
    * beginning": the v1 engine passes `None` there, the v2 engine
    * passes the stream's `initialOffset`.
    */
  private[sink] def planBatch(start: Option[Offset],
      end: Offset): GraftStreamSource.BatchPlan = {
    val startE = start.map(decode).filter {
      case Right(v) => v >= 0
      case Left(_)  => true
    }
    decode(end) match {
      case Left(se) =>
        // snapshot chunk — restore/advance phase state (recovery
        // replays come through here before any getOffset call)
        val restoredIdx = math.max(se.idx,
          snap.collect { case s if s.version == se.version => s.idx }
            .getOrElse(0L))
        snap = Some(SnapState(se.version, restoredIdx))
        if (se.version > planned) planned = se.version
        val from = startE match {
          case None => 0L
          case Some(Left(s0)) =>
            require(s0.version == se.version,
              s"snapshot offsets span versions: $s0 then $se")
            s0.idx
          case Some(Right(v)) => throw new IllegalStateException(
            s"graft stream source on $table: version offset $v " +
              s"followed by snapshot offset s:${se.version}:${se.idx}" +
              " — corrupt offset sequence")
        }
        val fl = snapFiles(se.version)
        val endIdx =
          if (se.idx == Long.MaxValue) fl.size.toLong else se.idx
        val slice = fl.slice(math.toIntExact(from), math.toIntExact(endIdx))
        probeMissing(slice, (from - 1, endIdx))
        GraftStreamSource.FileSlice(slice, se.version)
      case Right(endV) =>
        if (endV > planned) planned = endV // checkpoint recovery replay
        startE match {
          case Some(Left(s0)) =>
            // version tail after a chunked snapshot: the snapshot
            // phase must have completed before version offsets start.
            // The terminal sentinel (idx == Long.MaxValue, round 9+)
            // proves completion from the offset alone — no snapshot
            // file list needed, so a restart here survives expireLog
            // having swept the snapshot version's commits. Pre-round-9
            // final chunks carry the real total and take the
            // list-checked path (which requires reproducibility).
            if (s0.idx != Long.MaxValue) {
              val total = snapFiles(s0.version).size.toLong
              require(s0.idx >= total,
                s"version offset $endV before snapshot " +
                  s"(${s0.idx}/$total files) completed")
            }
            // the snapshot phase is CLOSED — keeping SnapState around
            // would re-trigger the closing-offset emission and pin
            // getOffset at the snapshot version forever
            snap = None
            tailPlan(s0.version, endV)
          case Some(Right(startV)) =>
            tailPlan(startV, endV)
          case None =>
            // deterministic under checkpoint-recovery replay: the
            // decision depends only on the log's (−1, endV] state, and
            // expiry / rewrites only ever push a clean history towards
            // snapshot mode, where the delivered ROWS are identical
            // for a history that was clean at plan time
            val (complete, destructive, delta) =
              TxTable.rangeDelta(fs, root, -1L, endV)
            def snapshotSlice(): GraftStreamSource.FileSlice = {
              // the vacuum existence probe is skipped ONLY while endV
              // is still the head (live files cannot be vacuumed) — a
              // checkpoint-recovery replay of an older endV probes,
              // because rewrites+vacuum during the downtime may have
              // reclaimed what was live at plan time
              val files = snapFiles(endV)
              if (endV != TxTable.currentVersion(spark, table))
                probeMissing(files, (-1L, endV))
              GraftStreamSource.FileSlice(files, endV)
            }
            if (readChangeFeed) {
              // rewrites are representable as change rows, so CDF
              // backfills per-commit whenever the history is COMPLETE;
              // only expiry forces the snapshot-as-inserts path
              if (complete) tailPlan(-1L, endV)
              else snapshotSlice()
            } else if (complete && !destructive) {
              probeMissing(delta, (-1L, endV))
              GraftStreamSource.FileSlice(delta, endV)
            } else
              // MONOLITHIC INITIAL SNAPSHOT: the table as of endV.
              // Per-commit replay would silently drop appends swept by
              // expireLog and rows whose append commits were since
              // compacted/merged (rewrite commits deliver nothing).
              // snapFiles guards reproducibility.
              snapshotSlice()
        }
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame =
    planBatch(start, end) match {
      case GraftStreamSource.ChangeRange(startV, endV) =>
        // toStreamingFrameExec, not toStreamingFrame: the feed's
        // exceptAll diff must stay a BATCH operator executed per
        // micro-batch — leaf-flagging it streaming would plan a
        // STATEFUL streaming Except over the engine's state store
        GraftSqlBridge.toStreamingFrameExec(
          TxTable.changeFeed(spark, table, startV, endV)
            .select(schema.fieldNames.map(
              org.apache.spark.sql.functions.col): _*))
      case GraftStreamSource.FileSlice(files, snapV) =>
        filesFrame(files, snapV)
    }

  override def stop(): Unit = ()

  override def toString: String = s"GraftStreamSource[$table]"
}

object GraftStreamSource {
  /** What one micro-batch delivers — the output of [[planBatch]],
    * consumed by the v1 getBatch (frame construction) and by the DSv2
    * planInputPartitions (one [[InputPartition]] per file).
    */
  private[sink] sealed trait BatchPlan
  private[sink] final case class FileSlice(
      files: Seq[(String, TxTable.FileMeta)], snapV: Long) extends BatchPlan
  private[sink] final case class ChangeRange(startV: Long, endV: Long)
      extends BatchPlan

  /** The change-feed companion columns, trailing the data schema. */
  val CdfCols: Seq[String] = Seq("_commit_version", "_change_type")

  /** The stream schema for a table: `date` + its current logged data
    * schema (footer-sampled on pre-evolution logs — same resolution as
    * the batch relation), plus the CDF companion columns for
    * change-feed streams. The table must already exist: a stream needs
    * a schema before data arrives, and an empty path has neither.
    */
  def schemaFor(spark: SparkSession, table: String,
      readChangeFeed: Boolean = false): StructType = {
    require(TxTable.currentVersion(spark, table) >= 0,
      s"graft stream source needs an existing table at $table " +
        "(create it with one append/overwrite first — the stream " +
        "schema is resolved from the commit log)")
    val base = TxFileIndex.readV2(spark, table).schema
    if (!readChangeFeed) base
    else StructType(base.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType)))
  }
}
