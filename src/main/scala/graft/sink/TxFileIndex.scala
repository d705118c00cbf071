package graft.sink

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Contains, EndsWith, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, Predicate, StartsWith}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DateType, DataType, IntegerType, LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** [[TxTable]] plugged into Spark's REAL scan planner — the
  * Delta/TahoeFileIndex integration pattern: a custom [[FileIndex]]
  * whose file listing, partition values, AND per-file min/max column
  * stats come from the COMMIT LOG (zero filesystem listing or
  * getFileStatus calls), handed to `HadoopFsRelation` + the stock
  * parquet `FileFormat`. Everything downstream is the normal
  * `FileSourceScanExec` machinery: `WHERE date = ...` becomes a
  * PartitionFilters entry evaluated here in [[listFiles]] (whole files
  * skipped from log metadata), data predicates both SKIP whole files
  * via the log's footer stats (Delta-style data skipping — effective
  * because the writer range-clusters on the sort key) and still push
  * into the parquet row-group reader for the files that survive;
  * column pruning and whole-stage codegen apply unchanged. This is
  * what [[TxTable.read]]'s hand-built per-date union cannot give: one
  * relation, planner-owned pruning.
  */
class TxFileIndex(spark: SparkSession, table: String,
    asOf: Option[Long] = None,
    explicitFiles: Option[Seq[(String, TxTable.FileMeta)]] = None)
    extends FileIndex {
  import TxTable.ColStats

  private val root = new Path(table)
  private val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
  private val qroot = fs.makeQualified(root)

  /** Canonical table root — how [[graft.plans.Projections]] recognizes
    * a scan of a registered base table inside a logical plan. */
  def tableRoot: Path = qroot

  /** Pinned time-travel version, if any. Exposed so the projection
    * rewrite can refuse to route a HISTORICAL scan to the (current) MV
    * — `versionAsOf` queries must read the era they name, never
    * present-day partials.
    */
  def asOfVersion: Option[Long] = asOf

  /** (date string, files with log-recorded sizes + stats), one log replay. */
  @volatile private var byDate:
      Seq[(String, Seq[(FileStatus, Map[String, ColStats])])] = load()

  private def load(): Seq[(String, Seq[(FileStatus, Map[String, ColStats])])] =
    explicitFiles.getOrElse(TxTable.snapshotFiles(fs, root, asOf).toSeq)
      .groupBy(_._2.date).toSeq.sortBy(_._1)
      .map { case (d, files) =>
        d -> files.map { case (rel, m) =>
          (new FileStatus(m.bytes, false, 1, m.bytes, 0L, new Path(qroot, rel)),
            // pointer-form Bloom entries resolve from their sidecar
            // once per index build (LRU-cached across builds); the
            // skipper probes inline payloads exactly as before
            BloomStore.resolveStats(fs, root, rel, m.stats))
        }
      }

  /** Log-carried table properties for THIS snapshot (the ANALYZE full
    * arm's histogram stats ride here) — lazy so indexes that never
    * serve planner statistics pay nothing; honors the same asOf pin
    * as the file listing. Explicit-file indexes (log deltas, change
    * feeds) carry none.
    */
  lazy val tableProps: Map[String, String] =
    if (explicitFiles.isDefined) Map.empty
    else TxTable.tablePropsAt(fs, root, asOf)

  /** Exact live row count from log metadata alone — Σ`#rows` (footer-
    * derived, logged per file) minus deletion-vector cardinalities.
    * None if any live file predates row-count stats: an unknown beats
    * a lowball the optimizer would trust. Time-travel indexes count
    * the pinned snapshot. Zero data-file I/O either way.
    */
  def exactRowCount: Option[Long] = {
    val metas = byDate.iterator.flatMap(_._2.iterator.map(_._2))
    var sum = 0L
    for (m <- metas) m.get(TxTable.RowsKey) match {
      case None => return None
      case Some(st) => sum += st.min.toLong -
        m.get(DvStore.Key).map(_.max.toLong).getOrElse(0L)
    }
    Some(sum)
  }

  /** Per-column count stats from log metadata: column → (NDV upper
    * bound = Σ per-file `#ndv`, exact null count = Σ `#nulls`). Each
    * component is present only if EVERY live file carries it (a
    * partial sum would be a lowball the optimizer trusts). The NDV sum
    * over-counts values repeated across files — the safe direction for
    * aggregate-output estimates; [[graft.catalog.GraftCatalogTable]]
    * additionally clamps it to the table rowCount.
    */
  def columnCountStats: Map[String, (Option[Long], Option[Long])] = {
    val metas = byDate.flatMap(_._2.map(_._2))
    def sumIfAll(suffix: String): Map[String, Long] =
      if (metas.isEmpty) Map.empty
      else metas.map(_.collect {
          case (k, st) if k.endsWith(suffix) =>
            k.dropRight(suffix.length) -> st.min.toLong
        }.toMap)
        .reduce { (a, b) =>
          a.keySet.intersect(b.keySet)
            .map(k => k -> (a(k) + b(k))).toMap
        }
    val ndv = sumIfAll(TxTable.NdvSuffix)
    val nulls = sumIfAll(TxTable.NullsSuffix)
    (ndv.keySet ++ nulls.keySet).map(c =>
      c -> (ndv.get(c), nulls.get(c))).toMap
  }

  /** Table-level min/max ranges folded from the per-file bare range
    * stats (footer-derived for [[TxTable.statsColumns]], value-derived
    * for `CALL sys.analyze(..., columns => ...)` targets): column →
    * (typ, min, max). A column qualifies only when EVERY live file
    * carries its range — a partial fold would NARROW the range and
    * overstate out-of-range filter selectivity (the same
    * unknown-beats-lowball rule as [[exactRowCount]]). 'l' ranges fold
    * numerically, 's' lexicographically. Feeds the CBO's
    * filter-selectivity estimate via
    * [[graft.catalog.GraftCatalogTable.statsCatalogTable]].
    */
  def columnRangeStats: Map[String, (Char, String, String)] = {
    val metas = byDate.flatMap(_._2.map(_._2)).toSeq
    if (metas.isEmpty) return Map.empty
    val perFile = metas.map(_.collect {
      case (k, st) if !k.contains("#") && (st.typ == 'l' || st.typ == 's') =>
        k -> st
    }.toMap)
    perFile.reduce { (a, b) =>
      a.keySet.intersect(b.keySet).map { k =>
        val (x, y) = (a(k), b(k))
        k -> (if (x.typ == 'l')
          TxTable.ColStats('l',
            math.min(x.min.toLong, y.min.toLong).toString,
            math.max(x.max.toLong, y.max.toLong).toString)
        else TxTable.ColStats('s',
          if (x.min <= y.min) x.min else y.min,
          if (x.max >= y.max) x.max else y.max))
      }.toMap
    }.map { case (k, st) => k -> (st.typ, st.min, st.max) }
  }

  override val partitionSchema: StructType =
    StructType(Seq(StructField("date", DateType, nullable = false)))

  override def rootPaths: Seq[Path] = Seq(qroot)

  override def refresh(): Unit = { byDate = load() }

  /** The scan's [[ParquetFileFormat]]: plain parquet unless any file in
    * this snapshot carries a deletion-vector pointer, in which case the
    * DV-subtracting [[DvParquetFileFormat]] filters deleted positions
    * at read time (see Dv.scala). Derived from the SAME loaded state as
    * the listing, so a scan and its row filter can never disagree about
    * which era's deletes apply.
    */
  private[sink] def fileFormat: ParquetFileFormat = {
    val refs: Map[String, DvRef] = byDate.flatMap(_._2).flatMap {
      case (st, stats) =>
        DvStore.pointerOf(stats).collect {
          case ptr if BloomStore.isPtr(ptr) =>
            val rel = qroot.toUri.relativize(st.getPath.toUri).getPath
            st.getPath.toString -> DvRef(ptr.substring(1), rel)
        }
    }.toMap
    if (refs.isEmpty) new ParquetFileFormat
    else new DvParquetFileFormat(root.toString, refs)
  }

  override def inputFiles: Array[String] =
    byDate.flatMap(_._2.map(_._1.getPath.toString)).toArray

  override def sizeInBytes: Long =
    byDate.flatMap(_._2.map(_._1.getLen)).sum

  private def daysSinceEpoch(d: String): Int =
    java.time.LocalDate.parse(d).toEpochDay.toInt

  // ---- data skipping over log stats ------------------------------------

  /** A comparison literal reduced to the stats domain: Left = signed
    * long (covers long/int/timestamp-micros/date-days), Right = string.
    * None = a type we do not reason about → cannot skip.
    */
  private def statsValue(lit: Literal): Option[Either[Long, String]] =
    (lit.dataType, lit.value) match {
      case (_, null)              => None
      case (LongType, v: Long)    => Some(Left(v))
      case (IntegerType, v: Int)  => Some(Left(v.toLong))
      case (TimestampType, v: Long) => Some(Left(v)) // epoch micros, matches INT64 footer stats
      case (DateType, v: Int)     => Some(Left(v.toLong))
      case (StringType, v: UTF8String) => Some(Right(v.toString))
      case _ => None
    }

  private def isAscii(s: String): Boolean = s.forall(_ < 0x80)

  /** True iff `st` PROVES the file holds no row satisfying `op` against
    * `v` ('<' means col < v, etc.). Conservative everywhere: unknown
    * shapes keep the file; string ranges are only trusted when pure
    * ASCII (parquet orders unsigned bytes, Java orders UTF-16 units —
    * they agree on ASCII). Rows where the column is NULL fail these
    * comparison predicates anyway, so null-blind min/max stay sound.
    */
  private def provablyEmpty(st: ColStats, op: Char,
      v: Either[Long, String]): Boolean = (st.typ, v) match {
    case ('l', Left(x)) =>
      val (mn, mx) = (st.min.toLong, st.max.toLong)
      op match {
        case '=' => x < mn || x > mx
        case '>' => mx <= x
        case 'G' => mx < x  // >=
        case '<' => mn >= x
        case 'L' => mn > x  // <=
        case _   => false
      }
    case ('s', Right(x))
        if isAscii(x) && isAscii(st.min) && isAscii(st.max) =>
      op match {
        case '=' => x < st.min || x > st.max
        case '>' => st.max <= x
        case 'G' => st.max < x
        case '<' => st.min >= x
        case 'L' => st.min > x
        case _   => false
      }
    case _ => false
  }

  /** File-level predicate from one planner data filter: Some(fn) when
    * the filter shape is skippable, None otherwise. fn(stats) = keep?
    */
  private def skipper(f: Expression):
      Option[Map[String, ColStats] => Boolean] = {
    def mk(name: String, op: Char, lit: Literal):
        Option[Map[String, ColStats] => Boolean] =
      statsValue(lit).map { v =>
        // equality predicates additionally probe a logged Bloom filter
        // ('b' stats, see Bloom.scala). The literal is hashed by the
        // SAME Catalyst expression the filter was built with
        // (xxhash64, seed 42), so driver probe == executor build for
        // every data type.
        lazy val bloomHash: Long =
          new org.apache.spark.sql.catalyst.expressions.XxHash64(
            Seq(lit), 42L).eval(InternalRow.empty).asInstanceOf[Long]
        stats => stats.get(name) match {
          case Some(st) if st.typ == 'b' =>
            op != '=' || Bloom.mayContain(st.min, st.max, bloomHash)
          case Some(st) => !provablyEmpty(st, op, v)
          case None     => true
        }
      }
    def flip(op: Char): Char = op match {
      case '>' => '<'; case '<' => '>'; case 'G' => 'L'; case 'L' => 'G'
      case c => c
    }
    f match {
      case EqualTo(a: AttributeReference, l: Literal) => mk(a.name, '=', l)
      case EqualTo(l: Literal, a: AttributeReference) => mk(a.name, '=', l)
      case GreaterThan(a: AttributeReference, l: Literal) => mk(a.name, '>', l)
      case GreaterThan(l: Literal, a: AttributeReference) => mk(a.name, flip('>'), l)
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) => mk(a.name, 'G', l)
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) => mk(a.name, flip('G'), l)
      case LessThan(a: AttributeReference, l: Literal) => mk(a.name, '<', l)
      case LessThan(l: Literal, a: AttributeReference) => mk(a.name, flip('<'), l)
      case LessThanOrEqual(a: AttributeReference, l: Literal) => mk(a.name, 'L', l)
      case LessThanOrEqual(l: Literal, a: AttributeReference) => mk(a.name, flip('L'), l)
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        val fns = vs.map(v => mk(a.name, '=', v.asInstanceOf[Literal]))
        if (fns.forall(_.isDefined))
          // IN keeps the file iff ANY member might be present
          Some(stats => fns.exists(_.get(stats)))
        else None
      // hasToken probes the column's TOKEN filter ('<col>#tok',
      // tokenbf_v1 analog) — substring predicates (Contains/LIKE)
      // must NEVER consult it: matches cross token boundaries
      case graft.functions.HasToken(a: AttributeReference, l: Literal)
          if l.value != null && l.dataType == StringType =>
        val h = new org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(l), 42L).eval(InternalRow.empty).asInstanceOf[Long]
        Some(stats => stats.get(s"${a.name}#tok") match {
          case Some(st) if st.typ == 'b' => Bloom.mayContain(st.min, st.max, h)
          case _ => true
        })
      // substring predicates (LIKE '%..%' → Contains, prefix/suffix
      // LIKEs → StartsWith/EndsWith) probe the column's NGRAM filter
      // ('<col>#ng', ngrambf_v1 analog): a match contains the literal
      // as a substring, so EVERY 4-gram of the literal must be present
      // — one provably-absent gram drops the file. Literals shorter
      // than one gram cannot probe (scan everything, like CH).
      case Contains(a: AttributeReference, l: Literal)
          if ngramProbe(l).isDefined => ngramSkipper(a.name, l)
      case StartsWith(a: AttributeReference, l: Literal)
          if ngramProbe(l).isDefined => ngramSkipper(a.name, l)
      case EndsWith(a: AttributeReference, l: Literal)
          if ngramProbe(l).isDefined => ngramSkipper(a.name, l)
      case _ => None
    }
  }

  // Gram extraction MUST mirror the build side, which uses Spark's
  // substring/length (Unicode code points). String.sliding counts
  // UTF-16 units, so a literal with supplementary characters (emoji,
  // astral CJK) would probe grams the index never stored and wrongly
  // skip a matching file. Slide over code points instead.
  private def ngramProbe(l: Literal): Option[Seq[String]] =
    l.value match {
      case u: UTF8String =>
        val cps = u.toString.codePoints().toArray
        if (cps.length >= Bloom.NgramN)
          Some((0 to cps.length - Bloom.NgramN)
            .map(i => new String(cps, i, Bloom.NgramN)).distinct)
        else None
      case _ => None
    }

  private def ngramSkipper(name: String,
      l: Literal): Option[Map[String, ColStats] => Boolean] =
    ngramProbe(l).map { grams =>
      val hashes = grams.map { g =>
        new org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(Literal(UTF8String.fromString(g), StringType)), 42L)
          .eval(InternalRow.empty).asInstanceOf[Long]
      }
      stats => stats.get(s"$name#ng") match {
        case Some(st) if st.typ == 'b' =>
          hashes.forall(h => Bloom.mayContain(st.min, st.max, h))
        case _ => true
      }
    }

  /** Partition pruning + data skipping: rebind the planner's `date`
    * references to this index's single-column partition row and
    * evaluate per date group, then drop files whose log stats prove the
    * data filters unsatisfiable — neither class of skipped file ever
    * reaches the scan.
    */
  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val keep: String => Boolean =
      if (partitionFilters.isEmpty) _ => true
      else {
        val bound = partitionFilters.reduce(And).transform {
          case a: AttributeReference if a.name == "date" =>
            BoundReference(0, DateType, nullable = false)
        }
        val pred = Predicate.create(bound, Nil)
        pred.initialize(0)
        d => pred.eval(InternalRow(daysSinceEpoch(d)))
      }
    val skippers = dataFilters.flatMap(skipper)
    byDate.collect { case (d, files) if keep(d) =>
      val surviving = files.collect {
        case (st, stats) if skippers.forall(_(stats)) => st
      }
      (d, surviving)
    }.collect { case (d, surviving) if surviving.nonEmpty =>
      PartitionDirectory(InternalRow(daysSinceEpoch(d)), surviving.toArray)
    }
  }
}

object TxFileIndex {
  /** Snapshot read through the planner-integrated index. The data
    * schema comes from the commit log's metadata action (so additive
    * schema evolution works: pre-evolution files read the new columns
    * as NULL), falling back to one live file's footer for
    * pre-evolution logs; `date` rides as the partition column exactly
    * like a hive-layout parquet table.
    */
  def readV2(spark: SparkSession, table: String): DataFrame =
    spark.baseRelationToDataFrame(relation(spark, table, None))

  /** The planner relation behind [[readV2]] and the `graft` data
    * source — log-driven file index + the era's logged schema.
    */
  def relation(spark: SparkSession, table: String,
      asOf: Option[Long]): HadoopFsRelation = {
    val index = new TxFileIndex(spark, table, asOf)
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // a LOGGED schema makes an empty file set a legitimate EMPTY table
    // (freshly created / truncated); only a schema-less empty log is
    // unreadable
    val dataSchema = TxTable.logSchema(fs, root, asOf).getOrElse {
      require(index.inputFiles.nonEmpty,
        s"tx table $table has no live files" +
          asOf.map(v => s" at version $v").getOrElse(""))
      spark.read.parquet(index.inputFiles.head).schema
    }
    // declared bucketing becomes the relation's bucketSpec — joins and
    // aggregations on the bucket keys plan WITHOUT an exchange (the
    // 100 TB fact-fact join path). Claimed only when EVERY live file
    // carries a parseable bucket id: a pre-bucketing era (time travel
    // to before the property landed) degrades to a plain scan, never
    // to a wrong hash-placement claim.
    val bucketSpec = TxTable.bucketSpecOf(
      TxTable.tablePropertiesAt(spark, table, asOf)).collect {
      case (keys, n) if index.inputFiles.forall(f =>
        org.apache.spark.sql.execution.datasources.BucketingUtils
          .getBucketId(new Path(f).getName).isDefined) =>
        org.apache.spark.sql.catalyst.catalog.BucketSpec(n, keys, Nil)
    }
    HadoopFsRelation(
      location = index,
      partitionSchema = index.partitionSchema,
      dataSchema = dataSchema,
      bucketSpec = bucketSpec,
      fileFormat = index.fileFormat,
      options = Map.empty)(spark)
  }

  /** An EXPLICIT file subset of a tx table as the same planner-owned
    * relation — the scan behind [[TxTable.readFileSet]] (full reads,
    * MV refresh deltas, the streaming source, the change feed).
    * Partition values come from log metadata (a per-FILE constant the
    * scan injects — no per-row path parsing), and the stock parquet
    * `FileFormat` keeps vectorization, column pruning, and row-group
    * pushdown. File metas must carry real dates and byte sizes
    * ([[TxTable.readFileSet]] normalizes synthetic metas first) —
    * the scan trusts `bytes` for split planning, so a zero would
    * silently read nothing.
    */
  private[sink] def fileSetRelation(spark: SparkSession, root: Path,
      files: Seq[(String, TxTable.FileMeta)],
      schema: Option[org.apache.spark.sql.types.StructType])
      : HadoopFsRelation = {
    val index = new TxFileIndex(spark, root.toString, None, Some(files))
    val dataSchema = schema.getOrElse {
      require(files.nonEmpty,
        "readFileSet of an empty file set needs an explicit schema")
      spark.read.parquet(index.inputFiles.head).schema
    }
    HadoopFsRelation(
      location = index,
      partitionSchema = index.partitionSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = index.fileFormat,
      options = Map.empty)(spark)
  }
}
