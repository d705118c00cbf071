package graft.flow

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic derivation of kubenetmon-shaped inputs from the driver's
  * testdata tables (TESTDATA.md). The same arithmetic is mirrored 1:1 in
  * [[FlowSql]] as DuckDB CTEs so every pipeline stage is oracle-checkable.
  *
  * Shapes follow FIXTURES.md / the reference proto
  * (/root/reference/pkg/grpc/flow_handler.proto:24-68):
  *  - flows: one conntrack delta observation per `events` row, with the
  *    NAT asymmetry encoded (even flow_id = Azure shape reply-dst=podIP,
  *    odd = AWS/GCP shape reply-dst=nodeIP; labeler_test.go:326-328,450-452)
  *  - pods (from customer), nodes (from supplier): informer cache snapshots
  *  - prefixes (from part): cloud-provider IP ranges incl. a coarse tier so
  *    longest-prefix-match is non-trivial
  */
object SyntheticFlows {
  val B10: Long = 167772160L        // 10.0.0.0 — pod CIDR base
  val PRIV: Long = B10 + 4194304L   // 10.64.0.0 — non-pod private space
  val NB: Long = 2886729728L        // 172.16.0.0 — node internal IPs
  val LOCALHOST: Long = 2130706433L // 127.0.0.1
  val PUB: Long = 16777216L         // 1.0.0.0 — public space under prefixes

  /** Raw flow observations: proto, orig/reply tuples, counters. */
  def flows(s: SparkSession, dir: String): DataFrame =
    flowsFromEvents(Tables.events(s, dir))

  /** Same derivation over any (event_id, user_id, ts) DataFrame — shared
    * by the batch path and the Structured Streaming source (the
    * projections are identical Catalyst expressions either way).
    */
  val SVC: Long = 174063616L // 10.96.0.0 — service VIP CIDR (DNAT)

  def flowsFromEvents(events: DataFrame): DataFrame = {
    val e = events
      .select(col("event_id").as("e"), col("user_id").as("u"), col("ts"))
    // local pod lives on the observing node (offset % 20 == node id), as
    // conntrack on a node only sees that node's pods
    val podIp = lit(B10) + ((col("e") % 100) * 20 + (col("u") % 20))
    val nodeIp = lit(NB) + (col("u") % 20)
    // every 31st pod-remote lives on a NEIGHBOR node, so when the src
    // side is an unknown IP the assume-local getFlowType fallback
    // (labeler.go:487-495) is exercised by real data, not just specs
    val remoteIp = when(col("e") % 5 < 2, lit(PUB) + ((col("e") * 2654435761L) % 4194304))
      .when(col("e") % 5 < 4, lit(PRIV) + (col("e") % 100000))
      .otherwise(lit(B10) + ((col("e") * 13) % 100) * 20 +
        when(col("e") % 31 === 0, (col("u") + 1) % 20).otherwise(col("u") % 20))
    val inbound = (col("e") % 19) === 0
    // DNAT shape (k8s service VIP): the original tuple's dst is the
    // pre-NAT VIP while the reply tuple's src is the real backend —
    // labeling must derive the dst endpoint from reply_src
    // (labeler.go getEndpointsForFlow: flow.GetReply().GetSource())
    val natted = !inbound && (col("e") % 13 === 0)
    val origSrc = when(col("e") % 23 === 0, nodeIp)
      .when(col("e") % 17 === 0, lit(LOCALHOST))
      .when(inbound, remoteIp)
      .otherwise(podIp)
    val zero = col("e") % 29 === 0
    // F5: every 41st observation is a pure-v6 connection, carrying the
    // proto's oneof {fixed32 v4 | bytes v6} endpoint shape
    // (flow_handler.proto:30-41): its four v4 columns are NULL and four
    // BinaryType *_ip6 columns hold 16-byte addresses (2001:db8::/32
    // doc space). The labeler drops these (ErrIPv6Flow,
    // labeler.go:243-247,379-405); they surface as `ignored_ipv6`
    // outcome rows in FlowPipeline.routeOutcomes.
    val is6 = col("e") % 41 === 0
    def v4(c: Column): Column = when(is6, lit(null).cast("long")).otherwise(c)
    def v6(k: Int): Column = when(is6,
      unhex(concat(lit("20010db8"), lpad(hex(col("e") * 4 + k), 24, "0"))))
      .otherwise(lit(null).cast("binary"))
    e.select(
      col("e").as("flow_id"),
      col("ts"),
      concat(lit("node-"), (col("u") % 20).cast("string")).as("node_name"),
      when(col("e") % 11 === 0, 1)
        .when(col("e") % 3 === 0, 17).otherwise(6).as("proto"),
      v4(origSrc).as("orig_src_ip"),
      v4(when(inbound, podIp)
        .when(natted, lit(SVC) + (col("e") % 25))
        .otherwise(remoteIp)).as("orig_dst_ip"),
      v6(0).as("orig_src_ip6"),
      v6(1).as("orig_dst_ip6"),
      (lit(1024) + (col("e") % 60000)).cast("int").as("orig_src_port"),
      (lit(1) + (col("e") % 65000)).cast("int").as("orig_dst_port"),
      v4(when(inbound, podIp).otherwise(remoteIp)).as("reply_src_ip"),
      v4(when(inbound, remoteIp)
        .when(col("e") % 2 === 0, origSrc)
        .otherwise(nodeIp)).as("reply_dst_ip"),
      v6(2).as("reply_src_ip6"),
      v6(3).as("reply_dst_ip6"),
      when(natted, lit(8080) + (col("e") % 1000))
        .otherwise(lit(1) + (col("e") % 65000)).cast("int").as("reply_src_port"),
      (lit(1024) + (col("e") % 60000)).cast("int").as("reply_dst_port"),
      // P9: per-flow connection flags (labeler.go:69-77 ConnectionFlags
      // map; TEST_FLAG is the reference's only defined flag)
      when(col("e") % 37 === 0, map(lit("TEST_FLAG"), lit(true)))
        .otherwise(typedLit(Map.empty[String, Boolean])).as("connection_flags"),
      when(zero, 0L).otherwise((col("e") * 3) % 1000).as("orig_pkts"),
      when(zero, 0L).otherwise((col("e") * 131) % 100000).as("orig_bytes"),
      when(zero, 0L).otherwise((col("e") * 7) % 1000).as("reply_pkts"),
      when(zero, 0L).otherwise((col("e") * 173) % 100000).as("reply_bytes"))
  }

  /** Pod informer snapshot (ref pkg/watcher/watcher.go:65-76). */
  def pods(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(
      concat(lit("pod-"), col("c_custkey").cast("string")).as("pod_name"),
      concat(lit("ns-"), (col("c_custkey") % 20).cast("string")).as("pod_namespace"),
      (lit(B10) + col("c_custkey")).as("pod_ip"),
      concat(lit("node-"), (col("c_custkey") % 20).cast("string")).as("pod_node"),
      lower(col("c_mktsegment")).as("pod_app"),
      concat(lit("inst-"), (col("c_custkey") % 5).cast("string")).as("pod_instance"))

  /** Node informer snapshot (watcher.go:79-92). */
  def nodes(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir).select(
      concat(lit("node-"), col("s_suppkey").cast("string")).as("node_id"),
      (lit(NB) + col("s_suppkey")).as("node_internal_ip"),
      concat(lit("az-"), (col("s_suppkey") % 3).cast("string")).as("node_zone"))

  /** Service informer snapshot (watcher.go:94-102; indexed but never
    * invoked by the reference pipeline — kept as queryable API surface,
    * SURVEY.md J4). clusterIPs live in the 10.96.0.0/12 service CIDR.
    */
  def services(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir).select(
      concat(lit("svc-"), col("n_nationkey").cast("string")).as("service_name"),
      concat(lit("ns-"), (col("n_nationkey") % 20).cast("string")).as("service_namespace"),
      (lit(174063616L) + col("n_nationkey")).as("cluster_ip"))

  /** J4 point lookup: GetServiceByClusterIP analog (watcher.go:189-208). */
  def serviceByClusterIp(services: DataFrame, ips: DataFrame): DataFrame =
    ips.join(org.apache.spark.sql.functions.broadcast(services),
      ips("ip") === services("cluster_ip"), "left_outer")

  /** Cloud-provider prefix table as [start,end] intervals + prefix length
    * (the range-join form of remote.go's trie; SURVEY.md J5 option b).
    * Fine /21-style tier for every part row plus a coarse /19-style tier
    * every 40th row so LPM has overlapping candidates.
    */
  def prefixes(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    val cloud = when(col("p_partkey") % 3 === 0, "aws")
      .when(col("p_partkey") % 3 === 1, "gcp").otherwise("azure")
    val fine = p.select(
      (lit(PUB) + col("p_partkey") * 2048).as("p_start"),
      (lit(PUB) + col("p_partkey") * 2048 + 2047).as("p_end"),
      lit(21).as("p_len"),
      cloud.as("p_cloud"),
      // every 53rd prefix publishes an EMPTY region — a same-cloud match
      // on one of these is the reference's intra_cloud_empty_region
      // labeling error (remote.go:151-155)
      when(col("p_partkey") % 53 === 0, "")
        .when(col("p_partkey") % 7 === 0, "global")
        .otherwise(concat(lit("region-"), (col("p_partkey") % 7).cast("string")))
        .as("p_region"),
      concat(lit("svc-"), (col("p_partkey") % 11).cast("string")).as("p_service"))
    val coarse = p.filter(col("p_partkey") % 40 === 0).select(
      (lit(PUB) + (col("p_partkey") - col("p_partkey") % 4) * 2048).as("p_start"),
      (lit(PUB) + (col("p_partkey") - col("p_partkey") % 4) * 2048 + 8191).as("p_end"),
      lit(19).as("p_len"),
      cloud.as("p_cloud"),
      lit("region-9").as("p_region"),
      lit("svc-coarse").as("p_service"))
    fine.unionByName(coarse)
  }

  /** Four cloud feeds shaped like the parsed AWS/GCP/Google/Azure range
    * tables (post-JSON-parse, pre-merge), derived from `part` with exact
    * cross-feed prefix collisions so [[graft.dims.CloudRanges.mergeFeeds]]
    * precedence (azurestorage > google > gcp > aws > azure) is
    * oracle-checkable. AWS includes duplicate same-prefix advertisements
    * under a second service for the S3>AMAZON>EC2 internal dedup.
    */
  def cloudFeeds(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val p = Tables.part(s, dir)
    val k = col("p_partkey")
    val start = lit(PUB) + k * 2048
    def feed(df: DataFrame, cloud: String, region: org.apache.spark.sql.Column,
        service: org.apache.spark.sql.Column): DataFrame =
      df.select(start.as("p_start"), (start + 2047).as("p_end"),
        lit(21).as("p_len"), lit(cloud).as("p_cloud"),
        region.as("p_region"), service.as("p_service"))
    def awsSvc(kk: org.apache.spark.sql.Column) =
      when(kk % 5 === 0, "s3").when(kk % 5 === 1, "amazon")
        .when(kk % 5 === 2, "ec2").when(kk % 5 === 3, "cloudfront")
        .otherwise("route53")
    val aws = feed(p, "aws",
      concat(lit("region-"), (k % 7).cast("string")), awsSvc(k))
      .unionByName(feed(p.filter(k % 9 === 0), "aws",
        concat(lit("region-"), (k % 7).cast("string")), awsSvc(k + 1)))
    // every 12th gcp entry publishes an EMPTY service (fromGcpJson can),
    // google skips those prefixes, and azure advertises them with a
    // non-empty service — exercising the public_ranges.go:283 arm where
    // a non-storage Azure entry displaces a standing empty-service one
    val gcp = feed(p.filter(k % 3 === 0), "gcp",
      concat(lit("region-"), (k % 5).cast("string")),
      when(k % 12 === 0, "").otherwise("googlecloud"))
    val google = feed(p.filter(k % 6 === 0 && k % 12 =!= 0), "gcp",
      lit("global"), lit("googleservice"))
    val azure = feed(p.filter(k % 4 === 0), "azure",
      when(k % 8 === 0, "global")
        .otherwise(concat(lit("region-"), (k % 3).cast("string"))),
      when(k % 8 === 0, "azurestorage").when(k % 20 === 0, "")
        .otherwise("azurecloud"))
    (aws, gcp, google, azure)
  }

  /** Prefix feed with duplicate entries + source priority, for the A6
    * dedup-by-ranking operator (public_ranges.go:163-168,256-306 —
    * s3-beats-amazon-beats-ec2 style). Every 13th prefix appears twice.
    */
  def prefixFeedWithDups(s: SparkSession, dir: String): DataFrame = {
    val base = prefixes(s, dir).withColumn("p_priority", lit(1))
    val dups = prefixes(s, dir)
      .filter(col("p_len") === 21 && (col("p_start") - lit(PUB)) % (2048 * 13) === 0)
      .withColumn("p_service", lit("svc-dup"))
      .withColumn("p_priority", lit(2))
    base.unionByName(dups)
  }
}
