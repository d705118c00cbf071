package graft.flow

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ipfns._

/** Deployment constants (ref pkg/inserter/inserter.go:20-25). */
case class FlowConfig(
    localCloud: String = "aws",
    localRegion: String = "region-1",
    localCluster: String = "cluster-a",
    environment: String = "production",
    ignoreUDP: Boolean = true,
    /** LPM strategy: broadcast binary trie (O(32)/probe, zero shuffle,
      * streaming-safe — the default, mirroring the reference's patricia
      * trie, remote.go:177-186) vs broadcast range-join + window top-1
      * (pure Catalyst ops, kept as the cross-check: the window
      * partitionBy(flow_id) costs a full fact shuffle). */
    lpmViaTrie: Boolean = true)

/** The kubenetmon labeling + aggregation pipeline, re-expressed as
  * composable Catalyst-friendly `DataFrame => DataFrame` stages
  * (SURVEY.md §3.2: source → filters → broadcast joins → case/when
  * direction → LPM classify → explode fan-out → windowed summing agg).
  *
  * Scale design (100 TB / 1000 executors):
  *  - dimension joins (pods/nodes/prefixes) are explicit `broadcast()`
  *    joins — dims are informer-cache-sized (≤ millions of rows), facts
  *    are the 100 TB side; no fact shuffle before aggregation;
  *  - the only shuffle in the whole pipeline is the final groupBy over
  *    the dimension key, which Catalyst executes as partial (map-side)
  *    aggregation → exchange → final aggregation, so the exchange
  *    carries pre-summed (key × 2 longs) rows, not raw flows;
  *  - longest-prefix-match is a broadcast range-join + per-flow top-1
  *    (max prefix length). With a broadcast build side the probe is a
  *    nested-loop over ~44k prefixes per partition; `LpmJoin.viaTrie`
  *    offers the O(32)-per-probe binary-trie variant for hot paths;
  *  - every filter is a pushable Catalyst predicate; no UDFs in the
  *    filter path.
  */
object FlowPipeline {

  // ---- F1-F3: agent-side junk filters (collector.go:227-247) ----
  def filterJunk(flows: DataFrame): DataFrame =
    flows
      .filter(col("orig_bytes") > 0 || col("orig_pkts") > 0 ||
        col("reply_bytes") > 0 || col("reply_pkts") > 0)
      .filter(col("proto").isin(6, 17))
      .filter(!col("orig_src_ip").isin(SyntheticFlows.LOCALHOST) &&
        !col("orig_dst_ip").isin(SyntheticFlows.LOCALHOST) &&
        !col("reply_src_ip").isin(SyntheticFlows.LOCALHOST) &&
        !col("reply_dst_ip").isin(SyntheticFlows.LOCALHOST))

  // ---- F4: configurable UDP drop (labeler.go:183-188) ----
  def dropUdp(cfg: FlowConfig)(flows: DataFrame): DataFrame =
    if (cfg.ignoreUDP) flows.filter(col("proto") =!= 17) else flows

  // ---- F5: IPv6 drop (labeler.go:243-247,379-405) ----
  /** The numeric-IP schema is v4 by construction; sources that carry v6
    * endpoints mark rows with an `is_ipv6` flag (the proto oneof's bytes
    * branch) and they are dropped here.
    */
  def dropIpv6(flows: DataFrame): DataFrame =
    if (flows.columns.contains("is_ipv6")) flows.filter(!col("is_ipv6"))
    else flows

  // ---- F6/J2: node-flow anti-join (labeler.go:407-427) ----
  def dropNodeFlows(nodes: DataFrame)(flows: DataFrame): DataFrame = {
    val ips = broadcast(nodes.select(col("node_internal_ip").as("nip")))
    flows
      .join(ips, col("orig_src_ip") === col("nip"), "left_anti")
      .join(ips, col("reply_src_ip") === col("nip"), "left_anti")
  }

  // ---- J1×2 + J3 + P4: pod enrichment and direction resolution ----
  /** Broadcast-joins src/dst endpoints against the pod snapshot, resolves
    * which endpoint is the local pod (on the observing node), swaps
    * orig/reply counters into out/in accordingly (labeler.go:271-331),
    * and attaches pod/node dims (P5/P6, labeler.go:334-373).
    * Unattributable flows get direction NULL and are dropped by F7.
    */
  def resolveDirection(pods: DataFrame, nodes: DataFrame)(flows: DataFrame): DataFrame = {
    val src = pods.toDF(pods.columns.map("src_" + _): _*)
    val dst = pods.toDF(pods.columns.map("dst_" + _): _*)
    val withPods = flows
      .join(broadcast(src), col("orig_src_ip") === col("src_pod_ip"), "left_outer")
      .join(broadcast(dst), col("orig_dst_ip") === col("dst_pod_ip"), "left_outer")
    val srcLocal = col("src_pod_name").isNotNull && col("src_pod_node") === col("node_name")
    val dstLocal = col("dst_pod_name").isNotNull && col("dst_pod_node") === col("node_name")
    val resolved = withPods.select(
      col("flow_id"), col("ts"), col("node_name"), col("proto"),
      when(srcLocal, lit("fromPod"))
        .when(dstLocal, lit("toPod"))
        .otherwise(lit(null).cast("string")).as("flow_type"),
      when(srcLocal, col("src_pod_name")).when(dstLocal, col("dst_pod_name")).as("local_pod"),
      when(srcLocal, col("src_pod_namespace")).when(dstLocal, col("dst_pod_namespace")).as("local_namespace"),
      when(srcLocal, col("src_pod_app")).when(dstLocal, col("dst_pod_app")).as("local_app"),
      when(srcLocal, col("src_pod_instance")).when(dstLocal, col("dst_pod_instance")).as("local_instance"),
      when(srcLocal, col("orig_src_ip")).when(dstLocal, col("orig_dst_ip")).as("local_ip"),
      when(srcLocal, col("orig_src_port")).when(dstLocal, col("orig_dst_port")).as("local_port"),
      when(srcLocal, col("orig_dst_ip")).when(dstLocal, col("orig_src_ip")).as("remote_ip"),
      when(srcLocal, col("orig_dst_port")).when(dstLocal, col("orig_src_port")).as("remote_port"),
      // remote pod enrichment (other endpoint may also be a known pod,
      // possibly on another node — labeler.go:352-373)
      when(srcLocal, col("dst_pod_app")).when(dstLocal, col("src_pod_app")).as("remote_app_raw"),
      coalesce(when(srcLocal, col("dst_pod_name"))
        .when(dstLocal, col("src_pod_name")), lit("")).as("remote_pod"),
      coalesce(when(srcLocal, col("dst_pod_namespace"))
        .when(dstLocal, col("src_pod_namespace")), lit("")).as("remote_namespace"),
      coalesce(when(srcLocal, col("dst_pod_instance"))
        .when(dstLocal, col("src_pod_instance")), lit("")).as("remote_instance"),
      coalesce(when(srcLocal, col("dst_pod_node"))
        .when(dstLocal, col("src_pod_node")), lit("")).as("remote_node"),
      // counter swap: out = traffic leaving the local pod
      when(srcLocal, col("orig_bytes")).otherwise(col("reply_bytes")).as("bytes_out"),
      when(srcLocal, col("orig_pkts")).otherwise(col("reply_pkts")).as("pkts_out"),
      when(srcLocal, col("reply_bytes")).otherwise(col("orig_bytes")).as("bytes_in"),
      when(srcLocal, col("reply_pkts")).otherwise(col("orig_pkts")).as("pkts_in"))
    // J3: local + remote node zones (topology.kubernetes.io/zone)
    val zones = nodes.select(col("node_id"), col("node_zone"))
    resolved
      .join(broadcast(zones), col("node_name") === col("node_id"), "left_outer")
      .drop("node_id")
      // unknown node -> empty zone, like the reference's missing label
      .withColumn("local_zone", coalesce(col("node_zone"), lit("")))
      .drop("node_zone")
      .join(broadcast(zones.toDF("r_node_id", "r_node_zone")),
        col("remote_node") === col("r_node_id"), "left_outer")
      .drop("r_node_id")
      .withColumn("remote_zone", coalesce(col("r_node_zone"), lit("")))
      .drop("r_node_zone")
  }

  // ---- F7: drop unlabelable flows (labeler.go:319-331,493-498) ----
  def dropUnlabeled(flows: DataFrame): DataFrame =
    flows.filter(col("flow_type").isNotNull)

  // ---- J5: longest-prefix-match classification + P3 proto naming ----
  /** Range-join variant: broadcast the interval table, keep the longest
    * matching prefix per flow (window top-1), classify per
    * remote.go:131-175 / remote_test.go:76-220 truth table.
    */
  def classify(prefixes: DataFrame, cfg: FlowConfig)(flows: DataFrame): DataFrame = {
    val matched =
      if (cfg.lpmViaTrie) LpmJoin.viaTrie(flows, prefixes, col("remote_ip"))
      else LpmJoin.viaRangeJoin(flows, prefixes, col("remote_ip"))
    matched.select(
      flows.columns.map(col) ++ Seq(
        when(ip_is_private(col("remote_ip")), lit("INTRA_VPC"))
          .when(col("p_cloud").isNull, lit("PUBLIC_INTERNET"))
          .when(col("p_cloud") === cfg.localCloud &&
            (col("p_region") === cfg.localRegion || col("p_region") === "global"),
            lit("INTRA_REGION"))
          .when(col("p_cloud") === cfg.localCloud, lit("INTER_REGION"))
          .otherwise(lit("PUBLIC_INTERNET")).as("connection_class"),
        when(ip_is_private(col("remote_ip")), lit(cfg.localCloud))
          .otherwise(coalesce(col("p_cloud"), lit(""))).as("remote_cloud"),
        when(ip_is_private(col("remote_ip")), lit(cfg.localRegion))
          .otherwise(coalesce(col("p_region"), lit(""))).as("remote_region"),
        when(ip_is_private(col("remote_ip")), lit(""))
          .otherwise(coalesce(col("p_service"), lit(""))).as("remote_service"),
        when(col("proto") === 6, "tcp").otherwise("udp").as("proto_name"),
        coalesce(col("remote_app_raw"), lit("")).as("remote_app"),
        col("p_len")): _*)
  }

  // ---- O3: directional fan-out (worker.go:143-222) ----
  def fanOut(flows: DataFrame): DataFrame = {
    val keep = flows.columns
      .filterNot(Set("bytes_out", "pkts_out", "bytes_in", "pkts_in"))
      .map(col)
    flows.select(keep :+ explode(array(
      struct(lit("out").as("direction"), col("bytes_out").as("bytes"),
        col("pkts_out").as("packets")),
      struct(lit("in").as("direction"), col("bytes_in").as("bytes"),
        col("pkts_in").as("packets")))).as("dd"): _*)
      .select(keep ++ Seq(col("dd.direction").as("direction"),
        col("dd.bytes").as("bytes"), col("dd.packets").as("packets")): _*)
  }

  /** Dimension key of the summing table — the full ORDER BY tuple of the
    * reference DDL (test/network_flows_0.sql:42) incl. endpoint IPs and
    * ports; localCell/remoteCell are intentionally absent (never
    * populated by the reference either, SURVEY.md §1.3).
    */
  val dimensionKey: Seq[String] = Seq(
    "date", "interval_start", "interval_seconds", "direction", "proto_name",
    "connection_class", "node_name", "local_zone", "local_namespace",
    "local_pod", "local_app", "local_instance", "local_ip", "local_port",
    "remote_cloud", "remote_region", "remote_service", "remote_app",
    "remote_pod", "remote_namespace", "remote_instance", "remote_node",
    "remote_zone", "remote_ip", "remote_port")

  // ---- P8 + W1 + A1: minute truncation + summing aggregation ----
  def summarize(flows: DataFrame): DataFrame =
    flows
      .withColumn("date", to_date(col("ts")))
      .withColumn("interval_start", date_trunc("minute", col("ts")))
      .withColumn("interval_seconds", lit(60))
      .groupBy(dimensionKey.map(col): _*)
      .agg(sum("bytes").as("bytes"), sum("packets").as("packets"),
        count(lit(1)).as("n_obs"))

  // ---- P7: per-deployment constant annotation (inserter.go:20-25,
  //      worker.go:147-158; remoteCluster always "UNKNOWN", cells "") ----
  /** Also carries P9's serialized connection-flags map (labeler.go:74-77):
    * the map is JSON-serialized so it can sit in the grouping key (Spark
    * cannot group by MapType); the synthetic source carries no conntrack
    * flags, so it is the empty map here.
    */
  def annotateConstants(cfg: FlowConfig)(summed: DataFrame): DataFrame =
    summed
      .withColumn("local_cloud", lit(cfg.localCloud))
      .withColumn("local_region", lit(cfg.localRegion))
      .withColumn("local_cluster", lit(cfg.localCluster))
      .withColumn("environment", lit(cfg.environment))
      .withColumn("remote_cluster", lit("UNKNOWN"))
      .withColumn("local_cell", lit(""))
      .withColumn("remote_cell", lit(""))
      .withColumn("connection_flags", to_json(map()))

  /** Full batch pipeline: raw flow observations → summing table rows. */
  def run(flows: DataFrame, pods: DataFrame, nodes: DataFrame,
      prefixes: DataFrame, cfg: FlowConfig = FlowConfig()): DataFrame = {
    val labeled = flows
      .transform(filterJunk)
      .transform(dropUdp(cfg))
      .transform(dropIpv6)
      .transform(dropNodeFlows(nodes))
      .transform(resolveDirection(pods, nodes))
      .transform(dropUnlabeled)
      .transform(classify(prefixes, cfg))
    annotateConstants(cfg)(summarize(fanOut(labeled)))
  }

  // ---- F8: error routing — the good/bad outcome taxonomy as data
  //      (server.go:100-117, labeler.go:21-44), not exceptions ----
  /** Classifies EVERY raw observation into the reference's outcome
    * taxonomy instead of silently dropping, so operational metrics
    * (`count by outcome`) fall out of the same plan. Precedence follows
    * the reference's check order.
    */
  def routeOutcomes(pods: DataFrame, nodes: DataFrame, cfg: FlowConfig)(
      flows: DataFrame): DataFrame = {
    val nodeIps = broadcast(nodes.select(col("node_internal_ip")))
    // >1 pod claiming one IP is a labeling ERROR ROW, not an exception
    // (labeler.go:449-469, server.go:100-117) — the stream must survive
    val podsByIp = pods.groupBy(col("pod_ip"))
      .agg(count(lit(1)).as("pod_ip_n"), max(col("pod_node")).as("one_node"))
    val src = broadcast(podsByIp.select(col("pod_ip").as("src_pod_ip"),
      col("one_node").as("src_pod_node"), col("pod_ip_n").as("src_n")))
    val dst = broadcast(podsByIp.select(col("pod_ip").as("dst_pod_ip"),
      col("one_node").as("dst_pod_node"), col("pod_ip_n").as("dst_n")))
    val withDims = flows
      .join(nodeIps.toDF("n1"), col("orig_src_ip") === col("n1"), "left_outer")
      .join(nodeIps.toDF("n2"), col("reply_src_ip") === col("n2"), "left_outer")
      .join(src, col("orig_src_ip") === col("src_pod_ip"), "left_outer")
      .join(dst, col("orig_dst_ip") === col("dst_pod_ip"), "left_outer")
    val localhost = lit(SyntheticFlows.LOCALHOST)
    val srcLocal = col("src_pod_ip").isNotNull && col("src_pod_node") === col("node_name")
    val dstLocal = col("dst_pod_ip").isNotNull && col("dst_pod_node") === col("node_name")
    withDims.withColumn("outcome",
      when(!(col("orig_bytes") > 0 || col("orig_pkts") > 0 ||
        col("reply_bytes") > 0 || col("reply_pkts") > 0), "ignored_zero")
        .when(!col("proto").isin(6, 17), "ignored_proto")
        .when(col("orig_src_ip") === localhost || col("orig_dst_ip") === localhost ||
          col("reply_src_ip") === localhost || col("reply_dst_ip") === localhost,
          "ignored_localhost")
        .when(lit(cfg.ignoreUDP) && col("proto") === 17, "ignored_udp")
        .when(col("n1").isNotNull || col("n2").isNotNull, "ignored_node_flow")
        .when(col("src_n") > 1 || col("dst_n") > 1, "error_ambiguous_pod_ip")
        .when(!(srcLocal || dstLocal), "unknown_direction")
        .otherwise("labeled"))
      .select(flows.columns.map(col) :+ col("outcome"): _*)
  }
}

/** Longest-prefix-match join strategies (SURVEY.md §2.4 J5). */
object LpmJoin {
  /** Bucketed broadcast range join + top-1 by prefix length, pure
    * Catalyst ops. A naive interval join is a BroadcastNestedLoopJoin —
    * O(|flows| x |prefixes|) probe work (measured 20x slowdown at
    * sf0.1). Instead each prefix is exploded into the /16 buckets it
    * covers, turning the join into a broadcast HASH join on bucket
    * equality with the range predicate as a residual filter: probe cost
    * drops to |flows| x (prefixes per /16). The per-flow top-1 (longest
    * p_len) runs as a window that Spark collapses via WindowGroupLimit
    * before the exchange. Null-extends when no prefix matches
    * (public-internet default, remote.go:177-186).
    */
  def viaRangeJoin(flows: DataFrame, prefixes: DataFrame, ip: Column): DataFrame = {
    val bucketed = prefixes.withColumn("__bkt",
      explode(expr("sequence(shiftright(p_start, 16), shiftright(p_end, 16))")))
    val joined = flows.join(broadcast(bucketed),
      shiftright(ip, 16) === col("__bkt") &&
        ip >= col("p_start") && ip <= col("p_end"), "left_outer")
    val w = Window.partitionBy(col("flow_id"))
      .orderBy(col("p_len").desc_nulls_last)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__bkt", "p_start", "p_end")
  }

  /** Broadcast-trie variant: collect the (small) prefix dim on the driver,
    * build an [[Ipv4Trie]], broadcast it, probe with a UDF returning the
    * payload index, then broadcast-hash-join the payload columns back on.
    * O(32) per probe, no shuffle, no window — THE strategy for 100 TB
    * facts and the only one usable under Structured Streaming (window
    * over flow_id is unsupported on streams). Mirrors the reference's
    * in-memory patricia trie under RWMutex (remote.go:22-26).
    */
  def viaTrie(flows: DataFrame, prefixes: DataFrame, ip: Column): DataFrame = {
    val spark = flows.sparkSession
    import spark.implicits._
    val rows = prefixes
      .select(col("p_start"), col("p_len"), col("p_cloud"), col("p_region"),
        col("p_service"))
      .collect()
    val trie = Ipv4Trie.build(rows.zipWithIndex.map { case (r, i) =>
      (r.getLong(0), r.getInt(1), i)
    })
    val bc = spark.sparkContext.broadcast(trie)
    val lpmIdx = udf((ip: Long) => {
      val r = bc.value.lookup(ip)
      if (r < 0) None else Some(r)
    })
    val payload = rows.zipWithIndex.map { case (r, i) =>
      (i, r.getInt(1), r.getString(2), r.getString(3), r.getString(4))
    }.toSeq.toDF("__pidx", "p_len", "p_cloud", "p_region", "p_service")
    flows.withColumn("__p", lpmIdx(ip))
      .join(broadcast(payload), col("__p") === col("__pidx"), "left_outer")
      .drop("__p", "__pidx")
  }
}
