package graft.flow

/** Typed row models for the Dataset[T] surface (SURVEY.md §1.1/§7.1):
  * one source of truth for the schemas, usable with case-class Encoders
  * where compile-time field checks help, while the pipeline itself stays
  * DataFrame-based for Catalyst flexibility.
  */

/** A raw conntrack delta observation (flow_handler.proto:24-68 shape,
  * flattened; counters are deltas since the previous zeroing dump).
  */
case class RawFlow(
    flow_id: Long,
    ts: java.sql.Timestamp,
    node_name: String,
    proto: Int,
    orig_src_ip: Long, orig_dst_ip: Long,
    orig_src_port: Int, orig_dst_port: Int,
    reply_src_ip: Long, reply_dst_ip: Long,
    orig_pkts: Long, orig_bytes: Long,
    reply_pkts: Long, reply_bytes: Long,
    // reply-tuple ports (flow_handler.proto reply Tuple): under DNAT the
    // reply source differs from the original destination
    reply_src_port: Int = 0, reply_dst_port: Int = 0,
    // P9 per-flow connection flags (labeler.go:69-77)
    connection_flags: Map[String, Boolean] = Map.empty)

/** One row of the summing table — the reference's 35-column
  * network_flows_0 shape (test/network_flows_0.sql:1-44), with the
  * never-populated cells kept as empty strings like the reference.
  */
case class NetworkFlowRow(
    date: java.sql.Date,
    interval_start: java.sql.Timestamp,
    interval_seconds: Int,
    direction: String,
    proto_name: String,
    connection_class: String,
    node_name: String,
    local_zone: String,
    local_namespace: String,
    local_pod: String,
    local_app: String,
    local_instance: String,
    local_ip: Long,
    local_port: Int,
    remote_cloud: String,
    remote_region: String,
    remote_service: String,
    remote_app: String,
    remote_pod: String,
    remote_namespace: String,
    remote_instance: String,
    remote_node: String,
    remote_zone: String,
    remote_ip: Long,
    remote_port: Int,
    bytes: Long,
    packets: Long,
    n_obs: Long,
    local_cloud: String,
    local_region: String,
    local_cluster: String,
    environment: String,
    remote_cluster: String,
    local_cell: String,
    remote_cell: String,
    connection_flags: String)
