package graft.dims

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ipfns._

/** Cloud-provider IP range dimension source (SURVEY.md S7/A6/P10):
  * parses the public AWS `ip-ranges.json` and Azure ServiceTags JSON
  * shapes (vendored fixtures in this zero-egress environment; the
  * production path points the same reader at the refreshed feed files,
  * re-broadcast on the reference's 24h cadence — remote.go:98-126),
  * normalizes strings, resolves duplicate prefixes by source priority,
  * and emits the `(p_start, p_end, p_len, p_cloud, p_region, p_service)`
  * interval table consumed by the LPM strategies.
  */
object CloudRanges {

  /** P10 normalization: lowercase + strip spaces (public_ranges.go:363-365). */
  private def norm(c: org.apache.spark.sql.Column) =
    lower(regexp_replace(c, " ", ""))

  /** cidr string -> [start,end] interval + prefix length. The start is
    * MASKED to the prefix boundary (Go netip / the reference trie only
    * consume the top `len` bits): an unaligned feed entry "1.2.3.5/24"
    * means the 1.2.3.0/24 block, not [1.2.3.5, 1.2.4.4].
    */
  private def withInterval(df: DataFrame): DataFrame =
    df
      .withColumn("p_start", ip_to_long(split(col("cidr"), "/").getItem(0)))
      .withColumn("p_len", split(col("cidr"), "/").getItem(1).cast("int"))
      .filter(col("p_start").isNotNull && col("p_len").between(0, 32))
      .withColumn("p_start", expr(
        "p_start - pmod(p_start, shiftleft(CAST(1 AS BIGINT), 32 - p_len))"))
      .withColumn("p_end",
        col("p_start") + expr("shiftleft(CAST(1 AS BIGINT), 32 - p_len)") - 1)

  /** AWS duplicate-prefix resolution: the same prefix is listed once per
    * service; keep the highest-priority one (S3 beats AMAZON beats EC2
    * beats the rest — public_ranges.go:163-168,185-210). Deterministic
    * service-name tiebreak where the reference is feed-order-dependent.
    */
  def dedupAws(intervals: DataFrame): DataFrame =
    dedupByPriority(intervals.withColumn("prio",
      when(col("p_service") === "s3", -1)
        .when(col("p_service") === "amazon", 1)
        .when(col("p_service") === "ec2", 2)
        .otherwise(0)))

  /** AWS ip-ranges.json: `{"prefixes":[{"ip_prefix":"a.b.c.d/n",
    * "region":"...","service":"..."}]}`.
    */
  def fromAwsJson(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", true).json(path)
    val flat = raw.select(explode(col("prefixes")).as("p"))
      .select(col("p.ip_prefix").as("cidr"),
        norm(col("p.region")).as("p_region"),
        norm(col("p.service")).as("p_service"))
      .withColumn("p_cloud", lit("aws"))
    dedupAws(withInterval(flat))
  }

  /** GCP cloud.json: `{"prefixes":[{"ipv4Prefix":"a.b.c.d/n",
    * "service":"Google Cloud","scope":"us-east1"} | {"ipv6Prefix":...}]}`
    * (public_ranges.go:104-117,213-231). v6 entries carry no ipv4Prefix
    * and are skipped; scope is the region.
    */
  def fromGcpJson(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", true).json(path)
    val flat = raw.select(explode(col("prefixes")).as("p"))
      .filter(col("p.ipv4Prefix").isNotNull)
      .select(col("p.ipv4Prefix").as("cidr"),
        norm(coalesce(col("p.scope"), lit(""))).as("p_region"),
        norm(coalesce(col("p.service"), lit(""))).as("p_service"))
      .withColumn("p_cloud", lit("gcp"))
    dedupByPriority(withInterval(flat).withColumn("prio", lit(0)))
  }

  /** Google goog.json: bare `{"prefixes":[{"ipv4Prefix":...}]}` — every
    * range Google advertises, attributed to cloud `gcp`, service
    * `googleservice`, region `global` (public_ranges.go:119-128,234-254:
    * GoogleService / GoogleGlobalRegion constants).
    */
  def fromGoogleJson(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", true).json(path)
    val flat = raw.select(explode(col("prefixes")).as("p"))
      .filter(col("p.ipv4Prefix").isNotNull)
      .select(col("p.ipv4Prefix").as("cidr"))
      .withColumn("p_cloud", lit("gcp"))
      .withColumn("p_region", lit("global"))
      .withColumn("p_service", lit("googleservice"))
    dedupByPriority(withInterval(flat).withColumn("prio", lit(0)))
  }

  /** Cross-feed merge for prefixes advertised by more than one feed,
    * mirroring the net effect of refreshRemoteIPs's sequential map
    * builds (public_ranges.go:159-311): the AWS map is built first, GCP
    * overwrites it unconditionally, Google overwrites GCP/AWS
    * unconditionally; then the Azure pass (`:283`) displaces the
    * standing entry when the Azure entry is AzureStorage OR when it has
    * a non-empty SystemService and the standing entry's service is
    * empty (fromGcpJson can emit `p_service = ''`, so that cross-feed
    * arm is reachable). Two ranking stages: the pre-Azure winner is
    * google(1) < gcp(2) < aws(3); the Azure pass then ranks
    * azurestorage(0) < standing-nonempty(1) < azure-nonempty(1.5) <
    * standing-empty(2) < azure-empty(3). Feeds must already be
    * internally deduped ([[dedupAws]] etc.).
    */
  def mergeFeeds(aws: DataFrame, gcp: DataFrame, google: DataFrame,
      azure: DataFrame): DataFrame = {
    val cols = Seq("p_start", "p_end", "p_len", "p_cloud", "p_region",
      "p_service").map(col)
    def ranked(df: DataFrame, prio: Column) =
      df.select(cols: _*).withColumn("prio", prio)
    val standing = dedupByPriority(
      ranked(google, lit(1.0))
        .unionByName(ranked(gcp, lit(2.0)))
        .unionByName(ranked(aws, lit(3.0))))
    dedupByPriority(
      ranked(standing,
        when(col("p_service") === "", lit(2.0)).otherwise(lit(1.0)))
        .unionByName(ranked(azure,
          when(col("p_service") === "azurestorage", lit(0.0))
            .when(col("p_service") =!= "", lit(1.5))
            .otherwise(lit(3.0)))))
  }

  /** Azure ServiceTags: `{"values":[{"properties":{"addressPrefixes":
    * [...],"systemService":"...","region":"..."}}]}`. Dedup rules
    * (public_ranges.go:256-306): non-empty systemService beats empty,
    * AzureStorage beats all, a specific region beats global/empty.
    */
  def fromAzureJson(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", true).json(path)
    val flat = raw.select(explode(col("values")).as("v"))
      .select(explode(col("v.properties.addressPrefixes")).as("cidr"),
        norm(coalesce(col("v.properties.systemService"), lit("")))
          .as("p_service"),
        norm(coalesce(col("v.properties.region"), lit(""))).as("p_region"))
      .withColumn("p_cloud", lit("azure"))
      .filter(!col("cidr").contains(":")) // v4 only (F5)
    val prioritized = withInterval(flat).withColumn("prio",
      when(col("p_service") === "azurestorage", -2)
        .when(col("p_service") =!= "", -1)
        .otherwise(0) +
        when(col("p_region") === "" || col("p_region") === "global", 0)
          .otherwise(-1) * lit(0.5))
    dedupByPriority(prioritized)
  }

  /** A6 dedup-by-ranking: one row per prefix, lowest priority value wins,
    * service name as the deterministic tiebreak.
    */
  def dedupByPriority(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("p_start", "p_end")
      .orderBy(col("prio"), col("p_service"))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("p_start", "p_end", "p_len", "p_cloud", "p_region", "p_service")
  }

  /** A7 startup sanity: the configured local region must exist in the
    * loaded table (remote.go:69-88) — fail fast, not mid-stream.
    */
  def assertRegionPresent(ranges: DataFrame, region: String): Unit = {
    val regions = ranges.select("p_region").distinct()
      .collect().map(_.getString(0)).toSet
    require(regions.contains(region),
      s"local region '$region' absent from prefix table " +
        s"(${regions.size} regions loaded)")
  }
}
