package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Greedy longest-match subword tokenizer vocabulary (the WordPiece-style
  * inference pass over a learned BPE merge list — at inference time a
  * merge table collapses to its vocabulary, and greedy longest-prefix
  * matching is the standard deterministic approximation). Space-free
  * fragments only: a match can never span a word boundary, so scanning
  * the whole text while skipping spaces equals per-word tokenization —
  * which is exactly how the DuckDB oracle mirrors it.
  */
final class BpeVocab(val fragments: Seq[String]) extends Serializable {
  require(fragments.nonEmpty && fragments.forall(f =>
    f.length >= 2 && !f.contains(" ")), "fragments: length >= 2, space-free")
  private val maxLen = fragments.map(_.length).max
  private val byLen: Array[java.util.HashSet[String]] =
    Array.tabulate(maxLen + 1) { l =>
      val s = new java.util.HashSet[String]()
      fragments.filter(_.length == l).foreach(s.add)
      s
    }

  /** Token count of `s`: at each position take the longest vocabulary
    * fragment, else one character; spaces are boundaries, not tokens. */
  def count(s: String): Int = {
    var pos = 0
    var n = 0
    while (pos < s.length) {
      if (s.charAt(pos) == ' ') pos += 1
      else {
        var took = 1
        var l = math.min(maxLen, s.length - pos)
        while (l >= 2 && took == 1) {
          if (byLen(l).contains(s.substring(pos, pos + l))) took = l
          l -= 1
        }
        n += 1
        pos += took
      }
    }
    n
  }
}

/** Native codegen'd token counter over a broadcast-analog vocabulary:
  * the vocab rides the generated code as a reference object (one
  * deserialization per executor, like [[graft.flow.TrieLpm]]) and the
  * scan stays inside whole-stage codegen — no UDF boxing, no row-level
  * explode of candidate merges.
  */
case class BpeCount(child: Expression, vocab: BpeVocab)
    extends UnaryExpression with org.apache.spark.sql.ExpectsStringInput {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    vocab.count(v.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeVocab", vocab, classOf[BpeVocab].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c.toString())")
  }
  override protected def withNewChildInternal(c: Expression): BpeCount =
    copy(child = c)
  override def prettyName: String = "bpe_count"
}
