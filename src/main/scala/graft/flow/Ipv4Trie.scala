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

/** Native codegen'd LPM probe (SURVEY.md §2.9 preference order: a
  * Catalyst `Expression` with `doGenCode` beats a Scala UDF): returns
  * the payload index of the longest prefix containing the child IP,
  * NULL when none matches. The trie rides the generated code as a
  * reference object (`ctx.addReferenceObj`) — deserialized once per
  * executor like a broadcast — and the probe call stays inside the
  * WholeStageCodegen span instead of a boxed ScalaUDF invocation.
  */
case class TrieLpm(child: org.apache.spark.sql.catalyst.expressions.Expression,
    trie: Ipv4Trie)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.ExpectsLongInput {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val r = trie.lookup(v.asInstanceOf[Long])
    if (r < 0) null else java.lang.Integer.valueOf(r)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("trie", trie, classOf[Ipv4Trie].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |int r = $ref.lookup($c);
       |if (r < 0) { ${ev.isNull} = true; } else { ${ev.value} = r; }
     """.stripMargin)
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): TrieLpm =
    copy(child = c)
  override def prettyName: String = "trie_lpm"
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
