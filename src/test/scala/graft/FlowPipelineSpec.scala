package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.flow.{FlowConfig, FlowPipeline, SyntheticFlows}

/** Truth tables from the reference's unit tests (FIXTURES.md §§1-3,
  * /root/reference/pkg/labeler/labeler_test.go:2012-2105 direction table,
  * remote_test.go:76-220 classification table, collector_test.go:152-257
  * ignore rules). Canonical counters: orig=(pkts 10, bytes 11),
  * reply=(pkts 12, bytes 13).
  */
class FlowPipelineSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val POD = SyntheticFlows.B10 + 5L       // 10.0.0.5, on node-1
  private val POD2 = SyntheticFlows.B10 + 6L      // 10.0.0.6, on node-1
  private val OTHERPOD = SyntheticFlows.B10 + 7L  // 10.0.0.7, on node-2
  private val NODE = SyntheticFlows.NB + 1L
  private val PUB_AWS_R1 = 16777216L + 100L       // inside aws/region-1 prefix
  private val PUB_AWS_R2 = 16777216L + 2048L + 100L
  private val PUB_AWS_GLOBAL = 16777216L + 4096L + 100L
  private val PUB_GCP = 16777216L + 6144L + 100L
  private val PUB_UNMATCHED = 16777216L + 999999L
  private val PUB_NESTED = 16777216L + 8192L + 10L // covered by /21 and /19
  private val PRIVATE_REMOTE = SyntheticFlows.PRIV + 9L

  private val ts0 = java.sql.Timestamp.valueOf("2024-01-05 10:30:45")

  private def mkFlow(id: Long, node: String, proto: Int,
      os: Long, od: Long, rs: Long, rd: Long,
      op: Long = 10, ob: Long = 11, rp: Long = 12, rb: Long = 13): (Long,
      java.sql.Timestamp, String, Int, Long, Long, Int, Int, Long, Long,
      Long, Long, Long, Long) =
    (id, ts0, node, proto, os, od, 1, 2, rs, rd, op, ob, rp, rb)

  private def flowDf(rows: Seq[(Long, java.sql.Timestamp, String, Int, Long,
      Long, Int, Int, Long, Long, Long, Long, Long, Long)]): DataFrame =
    rows.toDF("flow_id", "ts", "node_name", "proto", "orig_src_ip",
      "orig_dst_ip", "orig_src_port", "orig_dst_port", "reply_src_ip",
      "reply_dst_ip", "orig_pkts", "orig_bytes", "reply_pkts", "reply_bytes")

  private lazy val pods = Seq(
    ("pod-a", "ns-a", POD, "node-1", "appa", "inst-0"),
    ("pod-b", "ns-b", POD2, "node-1", "appb", "inst-1"),
    ("pod-c", "ns-c", OTHERPOD, "node-2", "appc", "inst-2"))
    .toDF("pod_name", "pod_namespace", "pod_ip", "pod_node", "pod_app",
      "pod_instance")
  private lazy val nodes = Seq(
    ("node-1", NODE, "az-1"), ("node-2", SyntheticFlows.NB + 2L, "az-2"))
    .toDF("node_id", "node_internal_ip", "node_zone")
  private lazy val prefixes = Seq(
    (16777216L, 16777216L + 2047L, 21, "aws", "region-1", "svc-a"),
    (16777216L + 2048L, 16777216L + 4095L, 21, "aws", "region-2", "svc-b"),
    (16777216L + 4096L, 16777216L + 6143L, 21, "aws", "global", "svc-c"),
    (16777216L + 6144L, 16777216L + 8191L, 21, "gcp", "region-1", "svc-d"),
    // nested: /19-style coarse covering PUB_NESTED plus a /21 inside it
    (16777216L + 8192L, 16777216L + 16383L, 19, "azure", "region-3", "svc-coarse"),
    (16777216L + 8192L, 16777216L + 10239L, 21, "azure", "region-4", "svc-fine"),
    // same-cloud prefix advertising NO region (remote.go:151-155 error)
    (16777216L + 16384L, 16777216L + 18431L, 21, "aws", "", "svc-e"))
    .toDF("p_start", "p_end", "p_len", "p_cloud", "p_region", "p_service")

  private val PUB_AWS_NOREGION = 16777216L + 16384L + 5L

  private def runPipeline(flows: DataFrame,
      cfg: FlowConfig = FlowConfig(localCloud = "aws", localRegion = "region-1")) =
    FlowPipeline.run(flows, pods, nodes, prefixes, cfg)

  private def labelOne(flows: DataFrame,
      cfg: FlowConfig = FlowConfig(localCloud = "aws", localRegion = "region-1")) =
    flows.transform(FlowPipeline.filterJunk)
      .transform(FlowPipeline.dropUdp(cfg))
      .transform(FlowPipeline.dropNodeFlows(nodes))
      .transform(FlowPipeline.resolveDirection(pods, nodes))
      .transform(FlowPipeline.dropUnlabeled)
      .transform(FlowPipeline.classify(prefixes, cfg))

  test("F1/F2/F3: zero-counter, bad-proto and localhost flows are dropped") {
    val flows = flowDf(Seq(
      mkFlow(1, "node-1", 6, POD, PUB_AWS_R1, PUB_AWS_R1, NODE,
        op = 0, ob = 0, rp = 0, rb = 0),                       // F1
      mkFlow(2, "node-1", 1, POD, PUB_AWS_R1, PUB_AWS_R1, NODE), // F2 ICMP
      mkFlow(3, "node-1", 6, SyntheticFlows.LOCALHOST, PUB_AWS_R1,
        PUB_AWS_R1, NODE),                                      // F3
      mkFlow(4, "node-1", 6, POD, PUB_AWS_R1, PUB_AWS_R1, NODE))) // keep
    val kept = FlowPipeline.filterJunk(flows).select("flow_id")
      .as[Long].collect().toSet
    assert(kept == Set(4L))
  }

  test("F4: UDP dropped by default, kept when ignoreUDP=false") {
    val flows = flowDf(Seq(
      mkFlow(1, "node-1", 17, POD, PUB_AWS_R1, PUB_AWS_R1, NODE),
      mkFlow(2, "node-1", 6, POD, PUB_AWS_R1, PUB_AWS_R1, NODE)))
    assert(labelOne(flows).select("flow_id").as[Long].collect().toSet == Set(2L))
    val keepUdp = labelOne(flows, FlowConfig(ignoreUDP = false))
      .select("flow_id").as[Long].collect().toSet
    assert(keepUdp == Set(1L, 2L))
  }

  test("F6: node/hostNetwork flows are dropped via anti-join") {
    val flows = flowDf(Seq(
      mkFlow(1, "node-1", 6, NODE, PUB_AWS_R1, PUB_AWS_R1, POD),
      mkFlow(2, "node-1", 6, POD, PUB_AWS_R1, PUB_AWS_R1, NODE)))
    val kept = FlowPipeline.dropNodeFlows(nodes)(flows)
      .select("flow_id").as[Long].collect().toSet
    assert(kept == Set(2L)) // flow 1 has node IP as orig src
  }

  test("P4 golden, AWS/GCP NAT shape (labeler_test.go:424-444): pod->public") {
    // orig=(pod, remote), reply=(remote, NODE) — reply dst is the node IP
    val flows = flowDf(Seq(
      mkFlow(1, "node-1", 6, POD, PUB_UNMATCHED, PUB_UNMATCHED, NODE)))
    val r = labelOne(flows).collect().head
    assert(r.getAs[String]("flow_type") == "fromPod")
    assert(r.getAs[String]("local_pod") == "pod-a")
    assert(r.getAs[String]("local_namespace") == "ns-a")
    assert(r.getAs[String]("local_app") == "appa")
    assert(r.getAs[String]("local_zone") == "az-1")
    assert(r.getAs[Long]("bytes_out") == 11 && r.getAs[Long]("pkts_out") == 10)
    assert(r.getAs[Long]("bytes_in") == 13 && r.getAs[Long]("pkts_in") == 12)
    assert(r.getAs[String]("connection_class") == "PUBLIC_INTERNET")
    assert(r.getAs[String]("remote_cloud") == "")
  }

  test("P4, Azure NAT shape (labeler_test.go:450-452): reply dst = pod IP") {
    val flows = flowDf(Seq(
      mkFlow(1, "node-1", 6, POD, PUB_UNMATCHED, PUB_UNMATCHED, POD)))
    val r = labelOne(flows).collect().head
    assert(r.getAs[String]("flow_type") == "fromPod")
    assert(r.getAs[Long]("bytes_out") == 11 && r.getAs[Long]("bytes_in") == 13)
  }

  test("P4, inbound to pod: orig counters become 'in'") {
    val flows = flowDf(Seq(
      mkFlow(1, "node-1", 6, PUB_UNMATCHED, POD, POD, PUB_UNMATCHED)))
    val r = labelOne(flows).collect().head
    assert(r.getAs[String]("flow_type") == "toPod")
    assert(r.getAs[String]("local_pod") == "pod-a")
    // swapped: out = reply counters, in = orig counters
    assert(r.getAs[Long]("bytes_out") == 13 && r.getAs[Long]("pkts_out") == 12)
    assert(r.getAs[Long]("bytes_in") == 11 && r.getAs[Long]("pkts_in") == 10)
  }

  test("P4, pod<->pod on same node: src pod wins, remote app enriched") {
    val flows = flowDf(Seq(
      mkFlow(1, "node-1", 6, POD, POD2, POD2, POD)))
    val r = labelOne(flows).collect().head
    assert(r.getAs[String]("flow_type") == "fromPod")
    assert(r.getAs[String]("local_pod") == "pod-a")
    assert(r.getAs[String]("remote_app") == "appb")
    assert(r.getAs[String]("connection_class") == "INTRA_VPC")
  }

  test("F7 + assume-local fallbacks (labeler.go:475-499 getFlowType)") {
    val flows = flowDf(Seq(
      // src is pod-c on ANOTHER node, dst unknown -> assume dst is local
      // (toPod); local pod fields stay empty, remote is pod-c
      mkFlow(1, "node-1", 6, OTHERPOD, PUB_UNMATCHED, PUB_UNMATCHED, NODE),
      // no pod on either side -> genuinely unknown, dropped
      mkFlow(2, "node-1", 6, PUB_UNMATCHED, PUB_AWS_R1, PUB_AWS_R1, NODE),
      // src unknown, dst (reply_src) is pod-c on another node -> assume
      // src is local (fromPod)
      mkFlow(3, "node-1", 6, PUB_UNMATCHED, OTHERPOD, OTHERPOD, NODE)))
    val got = labelOne(flows).collect().map(r =>
      r.getAs[Long]("flow_id") -> r).toMap
    assert(got.keySet == Set(1L, 3L), "only the no-pod flow is dropped")
    val r1 = got(1L)
    assert(r1.getAs[String]("flow_type") == "toPod")
    assert(r1.getAs[String]("local_pod") == "" &&
      r1.getAs[String]("node_name") == "" &&
      r1.getAs[String]("local_zone") == "")
    assert(r1.getAs[String]("remote_pod") == "pod-c" &&
      r1.getAs[String]("remote_zone") == "az-2")
    assert(r1.getAs[Long]("remote_ip") == OTHERPOD)
    // toPod counter swap: out = reply
    assert(r1.getAs[Long]("bytes_out") == 13 && r1.getAs[Long]("bytes_in") == 11)
    val r3 = got(3L)
    assert(r3.getAs[String]("flow_type") == "fromPod")
    assert(r3.getAs[String]("local_pod") == "" &&
      r3.getAs[String]("remote_pod") == "pod-c")
    assert(r3.getAs[Long]("bytes_out") == 11 && r3.getAs[Long]("bytes_in") == 13)
  }

  test("NAT/DNAT: dst identity follows reply_src, not the pre-NAT orig_dst") {
    // pod-a -> service VIP; conntrack reply comes from pod-c (the real
    // backend on node-2) on port 8080
    val VIP = 174063616L + 7L
    val flows = flowDf(Seq(
      mkFlow(1, "node-1", 6, POD, VIP, OTHERPOD, NODE)))
      .withColumn("reply_src_port", lit(8080))
    val r = labelOne(flows).collect().head
    assert(r.getAs[String]("flow_type") == "fromPod")
    assert(r.getAs[String]("remote_pod") == "pod-c",
      "remote pod resolved through the reply tuple")
    assert(r.getAs[Long]("remote_ip") == OTHERPOD, "LPM sees the real backend")
    assert(r.getAs[Int]("remote_port") == 8080, "backend port, not VIP port")
    assert(r.getAs[String]("connection_class") == "INTRA_VPC")
  }

  test("ambiguous pod IP: flow is excluded from labeling (error routing)") {
    val dupPods = pods.unionByName(Seq(
      ("pod-a2", "ns-x", POD, "node-1", "appx", "inst-9"))
      .toDF("pod_name", "pod_namespace", "pod_ip", "pod_node", "pod_app",
        "pod_instance"))
    val flows = flowDf(Seq(
      mkFlow(1, "node-1", 6, POD, PUB_UNMATCHED, PUB_UNMATCHED, NODE),
      mkFlow(2, "node-1", 6, POD2, PUB_UNMATCHED, PUB_UNMATCHED, NODE)))
    val labeled = flows.transform(FlowPipeline.filterJunk)
      .transform(FlowPipeline.dropNodeFlows(nodes))
      .transform(FlowPipeline.resolveDirection(dupPods, nodes))
      .transform(FlowPipeline.dropUnlabeled)
    assert(labeled.select("flow_id").as[Long].collect().toSet == Set(2L),
      "flow touching the duplicated IP never reaches the summing table")
  }

  test("intra-cloud empty region: classify errors, run() excludes the flow") {
    val flows = flowDf(Seq(
      mkFlow(1, "node-1", 6, POD, PUB_AWS_NOREGION, PUB_AWS_NOREGION, NODE),
      mkFlow(2, "node-1", 6, POD, PUB_AWS_R1, PUB_AWS_R1, NODE)))
    val classified = labelOne(flows)
    val byId = classified.select("flow_id", "connection_class")
      .as[(Long, String)].collect().toMap
    assert(byId(1L) == "ERROR_INTRA_CLOUD_EMPTY_REGION")
    assert(byId(2L) == "INTRA_REGION")
    val summed = runPipeline(flows)
    assert(summed.select("connection_class").distinct()
      .as[String].collect().toSet == Set("INTRA_REGION"),
      "error flows never inserted (remote.go:151-155)")
    val outcomes = FlowPipeline.routeOutcomes(pods, nodes, prefixes,
      FlowConfig(localCloud = "aws", localRegion = "region-1"))(flows)
      .select("flow_id", "outcome").as[(Long, String)].collect().toMap
    assert(outcomes(1L) == "error_intra_cloud_empty_region")
    assert(outcomes(2L) == "labeled")
  }

  test("P9: connection flags ride the grouping key as serialized JSON") {
    val flows = flowDf(Seq(
      mkFlow(1, "node-1", 6, POD, PUB_AWS_R1, PUB_AWS_R1, NODE),
      mkFlow(2, "node-1", 6, POD, PUB_AWS_R1, PUB_AWS_R1, NODE)))
      .withColumn("connection_flags",
        when(col("flow_id") === 1, typedLit(Map("TEST_FLAG" -> true)))
          .otherwise(typedLit(Map.empty[String, Boolean])))
    val summed = runPipeline(flows)
    val flags = summed.select("connection_flags").distinct()
      .as[String].collect().toSet
    assert(flags == Set("{}", """{"TEST_FLAG":true}"""),
      "distinct flag maps must not collapse into one summing row")
  }

  test("J5 classification truth table (remote_test.go:76-220)") {
    val cases = Seq(
      (1L, PRIVATE_REMOTE, "INTRA_VPC", "aws", "region-1", ""),
      (2L, PUB_AWS_R1, "INTRA_REGION", "aws", "region-1", "svc-a"),
      (3L, PUB_AWS_GLOBAL, "INTRA_REGION", "aws", "global", "svc-c"),
      (4L, PUB_AWS_R2, "INTER_REGION", "aws", "region-2", "svc-b"),
      (5L, PUB_GCP, "PUBLIC_INTERNET", "gcp", "region-1", "svc-d"),
      (6L, PUB_UNMATCHED, "PUBLIC_INTERNET", "", "", ""))
    val flows = flowDf(cases.map { case (id, remote, _, _, _, _) =>
      mkFlow(id, "node-1", 6, POD, remote, remote, NODE)
    })
    val got = labelOne(flows)
      .select("flow_id", "connection_class", "remote_cloud", "remote_region",
        "remote_service")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))).sortBy(_._1)
    assert(got.length == cases.length)
    cases.zip(got).foreach { case ((id, _, cls, cloud, region, svc), g) =>
      assert(g == ((id, cls, cloud, region, svc)), s"case $id")
    }
  }

  test("J5 picks the longest matching prefix") {
    val flows = flowDf(Seq(
      mkFlow(1, "node-1", 6, POD, PUB_NESTED, PUB_NESTED, NODE)))
    val r = labelOne(flows).collect().head
    // /21 (region-4) beats the enclosing /19 (region-3)
    assert(r.getAs[String]("remote_region") == "region-4")
    assert(r.getAs[String]("remote_service") == "svc-fine")
  }

  test("O3+A1: fan-out conservation — sum over out rows = sum bytes_out") {
    val flows = flowDf((1L to 50L).map(i =>
      mkFlow(i, "node-1", 6, POD, PUB_AWS_R1, PUB_AWS_R1, NODE,
        op = i, ob = i * 100, rp = i * 2, rb = i * 200)))
    val summed = runPipeline(flows)
    val out = summed.filter($"direction" === "out")
      .agg(sum("bytes")).as[Long].collect().head
    val in = summed.filter($"direction" === "in")
      .agg(sum("bytes")).as[Long].collect().head
    assert(out == (1L to 50L).map(_ * 100).sum)
    assert(in == (1L to 50L).map(_ * 200).sum)
    // all 50 observations share the minute + dims -> exactly 2 rows
    assert(summed.count() == 2)
    assert(summed.select("interval_seconds").distinct().as[Int].collect()
      .sameElements(Array(60)))
  }
}
