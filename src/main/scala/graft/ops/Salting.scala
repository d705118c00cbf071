package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY.md §"Optimize for scale").
  *
  * AQE's skew-join splitting handles most shuffle-join skew at runtime;
  * these helpers cover the two cases it can't:
  *  - a shuffle join where ONE side can be replicated (salted join),
  *  - a high-cardinality aggregation whose partial aggregation stops
  *    helping because one grouping key dominates (two-phase salted agg).
  */
object Salting {

  /** Equi-join `facts ⋈ dim` on `key`, spreading each hot key over
    * `factor` tasks: facts get a deterministic per-row salt, the dim side
    * is replicated once per salt value. Result is row-identical to the
    * plain join (verified by SaltingSpec); cost is `factor`x the dim.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
      factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0)
    // right/full outer would emit each unmatched (replicated) dim row
    // `factor` times — only fact-preserving join types keep the
    // row-identical-to-plain-join contract
    require(joinType == "inner" || joinType.startsWith("left"),
      s"saltedJoin supports inner/left join types, not $joinType")
    // salt from the whole fact row: deterministic, uniform enough
    val factCols = facts.columns.map(col)
    val salted = facts.withColumn("__salt",
      pmod(hash(factCols: _*), lit(factor)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("__salt") === replicated("__salt"),
        joinType)
      .drop("__salt").drop(replicated(key))
  }

  /** Two-phase per-key top-K cap — the skew arm for rank-based caps
    * (e.g. the per-domain document cap when ONE domain dominates the
    * corpus and a single window partition would serialize it). Phase 1
    * ranks within (keys, salt) lanes and keeps each lane's best `k`,
    * bounding any task's window input to ~1/factor of the hot key;
    * phase 2 ranks only the ≤ factor×k lane survivors per key. The
    * result — including the final rank column `rankCol` — is
    * row-identical to the plain single-window cap (SaltingSpec):
    * every global top-k row is its lane's top-≤k, so phase 1 never
    * drops a survivor. `order` must be a total order within a key
    * (include a tiebreaker column) or neither formulation is
    * deterministic to begin with.
    */
  def saltedCap(df: DataFrame, keys: Seq[String], order: Seq[String],
      k: Int, factor: Int, rankCol: String = "rnk"): DataFrame = {
    require(factor > 0 && k > 0)
    import org.apache.spark.sql.expressions.Window
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col): _*), lit(factor)))
    val w1 = Window.partitionBy((keys :+ "__salt").map(col): _*)
      .orderBy(order.map(col): _*)
    val lane = salted.withColumn("__lane_rnk", row_number().over(w1))
      .filter(col("__lane_rnk") <= k).drop("__lane_rnk", "__salt")
    val w2 = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(col): _*)
    lane.withColumn(rankCol, row_number().over(w2))
      .filter(col(rankCol) <= k)
  }

  /** Two-phase aggregation: first sum per (keys, salt), then collapse the
    * salts — bounds any single reducer's input to ~1/factor of the hot
    * key. `aggs` maps column -> "sum"/"count" style associative ops.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
      factor: Int): DataFrame = {
    require(factor > 0)
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col): _*), lit(factor)))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(sumCols.head -> "sum", sumCols.tail.map(_ -> "sum"): _*)
    val renamed = sumCols.foldLeft(phase1) { (d, c) =>
      d.withColumnRenamed(s"sum($c)", c)
    }
    val phase2 = renamed.groupBy(keys.map(col): _*)
      .agg(sumCols.head -> "sum", sumCols.tail.map(_ -> "sum"): _*)
    sumCols.foldLeft(phase2) { (d, c) =>
      d.withColumnRenamed(s"sum($c)", c)
    }
  }
}
