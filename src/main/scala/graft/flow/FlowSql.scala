package graft.flow

/** DuckDB mirror of [[SyntheticFlows]] + [[FlowPipeline]] stages, used as
  * the oracle for the flow query surface. Every CTE reproduces the Spark
  * arithmetic exactly (integer-only derivations → bit-identical results).
  */
object FlowSql {
  /** Shared derivation CTEs (flows / pods / nodes / prefixes). */
  val base: String =
    """WITH f0 AS (
      |  SELECT event_id AS e, user_id AS u, ts,
      |    'node-' || CAST(user_id % 20 AS VARCHAR) AS node_name,
      |    CASE WHEN event_id % 11 = 0 THEN 1
      |         WHEN event_id % 3 = 0 THEN 17 ELSE 6 END AS proto,
      |    167772160 + ((event_id % 100) * 20 + (user_id % 20)) AS pod_ip,
      |    2886729728 + (user_id % 20) AS node_ip,
      |    CASE WHEN event_id % 5 < 2 THEN 16777216 + ((event_id * 2654435761) % 4194304)
      |         WHEN event_id % 5 < 4 THEN 171966464 + (event_id % 100000)
      |         ELSE 167772160 + ((event_id * 13) % 100) * 20 +
      |           (CASE WHEN event_id % 31 = 0 THEN (user_id + 1) % 20
      |                 ELSE user_id % 20 END) END AS remote_ip0,
      |    (event_id % 19) = 0 AS inbound,
      |    (event_id % 29) = 0 AS zero,
      |    (event_id % 41) = 0 AS is6
      |  FROM events
      |), flows AS (
      |  SELECT e AS flow_id, ts, node_name, proto, is6,
      |    CASE WHEN is6 THEN NULL
      |         WHEN e % 23 = 0 THEN node_ip WHEN e % 17 = 0 THEN 2130706433
      |         WHEN inbound THEN remote_ip0 ELSE pod_ip END AS orig_src_ip,
      |    CASE WHEN is6 THEN NULL
      |         WHEN inbound THEN pod_ip
      |         WHEN e % 13 = 0 THEN 174063616 + (e % 25)
      |         ELSE remote_ip0 END AS orig_dst_ip,
      |    CAST(1024 + (e % 60000) AS INTEGER) AS orig_src_port,
      |    CAST(1 + (e % 65000) AS INTEGER) AS orig_dst_port,
      |    CASE WHEN is6 THEN NULL
      |         WHEN inbound THEN pod_ip ELSE remote_ip0 END AS reply_src_ip,
      |    CASE WHEN is6 THEN NULL
      |         WHEN inbound THEN remote_ip0
      |         WHEN e % 2 = 0 THEN (CASE WHEN e % 23 = 0 THEN node_ip
      |           WHEN e % 17 = 0 THEN 2130706433 ELSE pod_ip END)
      |         ELSE node_ip END AS reply_dst_ip,
      |    CAST(CASE WHEN NOT inbound AND e % 13 = 0 THEN 8080 + (e % 1000)
      |         ELSE 1 + (e % 65000) END AS INTEGER) AS reply_src_port,
      |    CAST(1024 + (e % 60000) AS INTEGER) AS reply_dst_port,
      |    CASE WHEN e % 37 = 0 THEN '{"TEST_FLAG":true}' ELSE '{}' END
      |      AS connection_flags,
      |    CASE WHEN zero THEN 0 ELSE (e * 3) % 1000 END AS orig_pkts,
      |    CASE WHEN zero THEN 0 ELSE (e * 131) % 100000 END AS orig_bytes,
      |    CASE WHEN zero THEN 0 ELSE (e * 7) % 1000 END AS reply_pkts,
      |    CASE WHEN zero THEN 0 ELSE (e * 173) % 100000 END AS reply_bytes
      |  FROM f0
      |), pods AS (
      |  SELECT 'pod-' || CAST(c_custkey AS VARCHAR) AS pod_name,
      |    'ns-' || CAST(c_custkey % 20 AS VARCHAR) AS pod_namespace,
      |    167772160 + c_custkey AS pod_ip,
      |    'node-' || CAST(c_custkey % 20 AS VARCHAR) AS pod_node,
      |    LOWER(c_mktsegment) AS pod_app,
      |    'inst-' || CAST(c_custkey % 5 AS VARCHAR) AS pod_instance
      |  FROM customer
      |), nodes AS (
      |  SELECT 'node-' || CAST(s_suppkey AS VARCHAR) AS node_id,
      |    2886729728 + s_suppkey AS node_internal_ip,
      |    'az-' || CAST(s_suppkey % 3 AS VARCHAR) AS node_zone
      |  FROM supplier
      |), prefixes AS (
      |  SELECT 16777216 + p_partkey * 2048 AS p_start,
      |    16777216 + p_partkey * 2048 + 2047 AS p_end,
      |    21 AS p_len,
      |    CASE p_partkey % 3 WHEN 0 THEN 'aws' WHEN 1 THEN 'gcp' ELSE 'azure' END AS p_cloud,
      |    CASE WHEN p_partkey % 53 = 0 THEN ''
      |         WHEN p_partkey % 7 = 0 THEN 'global'
      |         ELSE 'region-' || CAST(p_partkey % 7 AS VARCHAR) END AS p_region,
      |    'svc-' || CAST(p_partkey % 11 AS VARCHAR) AS p_service
      |  FROM part
      |  UNION ALL
      |  SELECT 16777216 + (p_partkey - (p_partkey % 4)) * 2048,
      |    16777216 + (p_partkey - (p_partkey % 4)) * 2048 + 8191,
      |    19,
      |    CASE p_partkey % 3 WHEN 0 THEN 'aws' WHEN 1 THEN 'gcp' ELSE 'azure' END,
      |    'region-9', 'svc-coarse'
      |  FROM part WHERE p_partkey % 40 = 0
      |)""".stripMargin

  /** F1-F3 junk filters (collector.go:227-247). IS DISTINCT FROM mirrors
    * the Spark side's null-safe `<=>`: pure-v6 flows (NULL v4 columns)
    * pass through to the IPv6 drop instead of being null-eliminated.
    */
  val junkFilter: String =
    """(orig_bytes > 0 OR orig_pkts > 0 OR reply_bytes > 0 OR reply_pkts > 0)
      |  AND proto IN (6, 17)
      |  AND orig_src_ip IS DISTINCT FROM 2130706433
      |  AND orig_dst_ip IS DISTINCT FROM 2130706433
      |  AND reply_src_ip IS DISTINCT FROM 2130706433
      |  AND reply_dst_ip IS DISTINCT FROM 2130706433""".stripMargin

  /** Stages F1-F6 + direction resolution + zone enrichment, up to the
    * labeled per-flow record (flow_type NULL = unlabelable, F7 pending).
    *
    * `appSfx` is a SQL fragment appended to the joined `pod_app` (both
    * sides) — "" for the static-dim surface; the qs_dim_refresh oracle
    * passes a flow-time-conditional `|| CASE ... END` so the pods
    * snapshot a flow sees depends on which micro-batch it belongs to
    * (`NULL || x` stays NULL, so unmatched pods still fall back to '').
    */
  private def labeledCteWith(appSfx: String): String =
    s"""$base, filtered AS (
      |  SELECT * FROM flows
      |  WHERE $junkFilter
      |    AND proto <> 17
      |    AND NOT is6
      |), nofnode AS (
      |  SELECT f.* FROM filtered f
      |  WHERE NOT EXISTS (SELECT 1 FROM nodes n WHERE f.orig_src_ip = n.node_internal_ip)
      |    AND NOT EXISTS (SELECT 1 FROM nodes n WHERE f.reply_src_ip = n.node_internal_ip)
      |), d0 AS (
      |  SELECT f.*,
      |    sp.pod_name AS sp_name, sp.pod_namespace AS sp_ns,
      |    sp.pod_app$appSfx AS sp_app, sp.pod_instance AS sp_inst, sp.pod_node AS sp_node,
      |    dp.pod_name AS dp_name, dp.pod_namespace AS dp_ns,
      |    dp.pod_app$appSfx AS dp_app, dp.pod_instance AS dp_inst, dp.pod_node AS dp_node,
      |    CASE WHEN sp.pod_name IS NOT NULL AND sp.pod_node = f.node_name THEN 'fromPod'
      |         WHEN dp.pod_name IS NOT NULL AND dp.pod_node = f.node_name THEN 'toPod'
      |         WHEN sp.pod_name IS NULL AND dp.pod_name IS NOT NULL AND dp.pod_node <> '' THEN 'fromPod'
      |         WHEN sp.pod_name IS NOT NULL AND sp.pod_node <> '' AND dp.pod_name IS NULL THEN 'toPod'
      |         END AS flow_type
      |  FROM nofnode f
      |  LEFT JOIN pods sp ON f.orig_src_ip = sp.pod_ip
      |  LEFT JOIN pods dp ON f.reply_src_ip = dp.pod_ip
      |), directed AS (
      |  SELECT flow_id, ts, proto, connection_flags, flow_type,
      |    COALESCE(CASE WHEN flow_type = 'fromPod' THEN sp_node ELSE dp_node END, '') AS node_name,
      |    COALESCE(CASE WHEN flow_type = 'fromPod' THEN sp_name ELSE dp_name END, '') AS local_pod,
      |    COALESCE(CASE WHEN flow_type = 'fromPod' THEN sp_ns ELSE dp_ns END, '') AS local_namespace,
      |    COALESCE(CASE WHEN flow_type = 'fromPod' THEN sp_app ELSE dp_app END, '') AS local_app,
      |    COALESCE(CASE WHEN flow_type = 'fromPod' THEN sp_inst ELSE dp_inst END, '') AS local_instance,
      |    CASE WHEN flow_type = 'fromPod' THEN orig_src_ip ELSE reply_src_ip END AS local_ip,
      |    CASE WHEN flow_type = 'fromPod' THEN orig_src_port ELSE reply_src_port END AS local_port,
      |    CASE WHEN flow_type = 'fromPod' THEN reply_src_ip ELSE orig_src_ip END AS remote_ip,
      |    CASE WHEN flow_type = 'fromPod' THEN reply_src_port ELSE orig_src_port END AS remote_port,
      |    CASE WHEN flow_type = 'fromPod' THEN dp_app ELSE sp_app END AS remote_app_raw,
      |    COALESCE(CASE WHEN flow_type = 'fromPod' THEN dp_name ELSE sp_name END, '') AS remote_pod,
      |    COALESCE(CASE WHEN flow_type = 'fromPod' THEN dp_ns ELSE sp_ns END, '') AS remote_namespace,
      |    COALESCE(CASE WHEN flow_type = 'fromPod' THEN dp_inst ELSE sp_inst END, '') AS remote_instance,
      |    COALESCE(CASE WHEN flow_type = 'fromPod' THEN dp_node ELSE sp_node END, '') AS remote_node,
      |    CASE WHEN flow_type = 'fromPod' THEN orig_bytes ELSE reply_bytes END AS bytes_out,
      |    CASE WHEN flow_type = 'fromPod' THEN orig_pkts ELSE reply_pkts END AS pkts_out,
      |    CASE WHEN flow_type = 'fromPod' THEN reply_bytes ELSE orig_bytes END AS bytes_in,
      |    CASE WHEN flow_type = 'fromPod' THEN reply_pkts ELSE orig_pkts END AS pkts_in
      |  FROM d0
      |), labeled AS (
      |  SELECT d.*, COALESCE(n.node_zone, '') AS local_zone,
      |    COALESCE(rn.node_zone, '') AS remote_zone
      |  FROM directed d
      |  LEFT JOIN nodes n ON d.node_name = n.node_id
      |  LEFT JOIN nodes rn ON d.remote_node = rn.node_id
      |  WHERE d.flow_type IS NOT NULL
      |)""".stripMargin

  val labeledCte: String = labeledCteWith("")

  /** + J5 LPM classification (remote.go:131-186 truth table). 10/8 is the
    * only private space reachable as a remote in the derivation, so the
    * is-private predicate mirrors to a single range check.
    */
  private def classifiedCteWith(appSfx: String): String =
    s"""${labeledCteWith(appSfx)}, lpm AS (
      |  SELECT l.*, p.p_cloud, p.p_region, p.p_service, p.p_len,
      |    ROW_NUMBER() OVER (PARTITION BY l.flow_id
      |      ORDER BY p.p_len DESC NULLS LAST) AS rn
      |  FROM labeled l
      |  LEFT JOIN prefixes p ON l.remote_ip BETWEEN p.p_start AND p.p_end
      |), classified AS (
      |  SELECT * EXCLUDE (rn),
      |    (remote_ip >= 167772160 AND remote_ip < 184549376) AS is_priv,
      |    CASE WHEN remote_ip >= 167772160 AND remote_ip < 184549376 THEN 'INTRA_VPC'
      |         WHEN p_cloud IS NULL THEN 'PUBLIC_INTERNET'
      |         WHEN p_cloud = 'aws' AND p_region = '' THEN 'ERROR_INTRA_CLOUD_EMPTY_REGION'
      |         WHEN p_cloud = 'aws' AND (p_region = 'region-1' OR p_region = 'global') THEN 'INTRA_REGION'
      |         WHEN p_cloud = 'aws' THEN 'INTER_REGION'
      |         ELSE 'PUBLIC_INTERNET' END AS connection_class,
      |    CASE WHEN remote_ip >= 167772160 AND remote_ip < 184549376 THEN 'aws'
      |         ELSE COALESCE(p_cloud, '') END AS remote_cloud,
      |    CASE WHEN remote_ip >= 167772160 AND remote_ip < 184549376 THEN 'region-1'
      |         ELSE COALESCE(p_region, '') END AS remote_region,
      |    CASE WHEN remote_ip >= 167772160 AND remote_ip < 184549376 THEN ''
      |         ELSE COALESCE(p_service, '') END AS remote_service,
      |    CASE WHEN proto = 6 THEN 'tcp' ELSE 'udp' END AS proto_name,
      |    COALESCE(remote_app_raw, '') AS remote_app
      |  FROM lpm WHERE rn = 1
      |)""".stripMargin

  val classifiedCte: String = classifiedCteWith("")

  /** + O3 fan-out and P8/W1/A1 minute-grain summing aggregation
    * (worker.go:132-222 + SummingMergeTree DDL).
    */
  def summedCteWith(appSfx: String): String =
    s"""${classifiedCteWith(appSfx)}, kept AS (
      |  SELECT * FROM classified
      |  WHERE connection_class NOT LIKE 'ERROR!_%' ESCAPE '!'
      |), fanned AS (
      |  SELECT *, 'out' AS direction, bytes_out AS bytes, pkts_out AS packets FROM kept
      |  UNION ALL
      |  SELECT *, 'in' AS direction, bytes_in AS bytes, pkts_in AS packets FROM kept
      |), summed AS (
      |  SELECT CAST(ts AS DATE) AS date, date_trunc('minute', ts) AS interval_start,
      |    60 AS interval_seconds, direction, proto_name, connection_class,
      |    node_name, local_zone, local_namespace, local_pod, local_app,
      |    local_instance, local_ip, local_port,
      |    remote_cloud, remote_region, remote_service, remote_app,
      |    remote_pod, remote_namespace, remote_instance, remote_node,
      |    remote_zone, remote_ip, remote_port, connection_flags,
      |    CAST(SUM(bytes) AS BIGINT) AS bytes,
      |    CAST(SUM(packets) AS BIGINT) AS packets,
      |    CAST(COUNT(*) AS BIGINT) AS n_obs,
      |    'aws' AS local_cloud, 'region-1' AS local_region,
      |    'cluster-a' AS local_cluster, 'production' AS environment,
      |    'UNKNOWN' AS remote_cluster, '' AS local_cell, '' AS remote_cell
      |  FROM fanned
      |  GROUP BY ALL
      |)""".stripMargin

  val summedCte: String = summedCteWith("")
}
