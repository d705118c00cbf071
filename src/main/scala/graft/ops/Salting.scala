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
