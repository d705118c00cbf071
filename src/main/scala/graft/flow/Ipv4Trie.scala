package graft.flow

import scala.collection.mutable.ArrayBuffer

/** Immutable binary trie over IPv4 CIDR prefixes with longest-prefix-match
  * lookup in O(32) per probe — the Spark-native analog of the reference's
  * in-memory trie (/root/reference/pkg/labeler/remote.go:22-26,177-186,
  * built on a patricia tree). Built once on the driver from the (small)
  * prefix dimension and broadcast to executors; each lookup returns the
  * payload index of the longest matching prefix or -1.
  *
  * This is the LPM strategy that scales: no shuffle, no per-flow window,
  * streaming-compatible (used by the Structured Streaming pipeline where
  * the range-join + row_number variant is unsupported).
  */
final class Ipv4Trie private (
    private val childZero: Array[Int],
    private val childOne: Array[Int],
    private val payload: Array[Int]) extends Serializable {

  /** Longest-prefix-match: payload index of the longest prefix containing
    * `ip`, or -1 if none.
    */
  def lookup(ip: Long): Int = {
    var node = 0
    var best = payload(0)
    var bit = 31
    while (bit >= 0 && node >= 0) {
      val b = (ip >> bit) & 1L
      node = if (b == 0L) childZero(node) else childOne(node)
      if (node >= 0 && payload(node) >= 0) best = payload(node)
      bit -= 1
    }
    best
  }
}

object Ipv4Trie {
  /** Build from (prefixStart, prefixLen, payloadIdx) triples. Longer
    * prefixes naturally sit deeper, so lookup's last-seen payload is the
    * longest match.
    */
  def build(prefixes: Iterable[(Long, Int, Int)]): Ipv4Trie = {
    val childZero = ArrayBuffer(-1)
    val childOne = ArrayBuffer(-1)
    val payload = ArrayBuffer(-1)
    prefixes.foreach { case (start, len, idx) =>
      var node = 0
      var bit = 31
      while (bit > 31 - len) {
        val b = (start >> bit) & 1L
        val children = if (b == 0L) childZero else childOne
        var next = children(node)
        if (next < 0) {
          next = payload.length
          children(node) = next
          childZero += -1
          childOne += -1
          payload += -1
        }
        node = next
        bit -= 1
      }
      payload(node) = idx
    }
    new Ipv4Trie(childZero.toArray, childOne.toArray, payload.toArray)
  }
}
