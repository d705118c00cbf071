package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over the `embeddings` table (Array[Float] x 64):
  * brute-force cosine top-k as the correctness baseline, sign-bit LSH
  * bucketing as the approximate scale path, and a kNN label classifier
  * on top of the exact top-k.
  *
  * Determinism: components are quantized to integers (round(x*10000))
  * so dot products and norms are exact integer sums — immune to float
  * summation order. The cosine double is then derived from identical
  * integers with identical IEEE ops on both engines.
  *
  * Scale design (billions of vectors):
  *  - brute-force is a broadcast nested-loop (queries broadcast, corpus
  *    scanned once; per-partition top-k via the rank window collapses
  *    before the final shuffle) — right up to ~10^7 corpus rows;
  *  - the LSH variant buckets the corpus once (pure projection, no
  *    shuffle) and turns kNN into an equi-join on bucket id — the
  *    IVF-style path where only 1/2^bits of the corpus is probed;
  *  - both avoid UDFs: zip_with/aggregate stay in codegen.
  */
object VectorQueries {

  /** quantized embedding + exact integer self-norm */
  private def quantized(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))").as("q"),
      col("embedding"))
      .withColumn("nrm",
        expr("aggregate(q, CAST(0 AS BIGINT), (acc, v) -> acc + v * v)"))

  private val quantizedSql: String =
    """quant AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
      |  FROM embeddings
      |), qn AS (
      |  SELECT vec_id, label, q,
      |    (SELECT SUM(q[i.i] * q[i.i])
      |     FROM (SELECT unnest(range(1, 65)) AS i) i) AS nrm
      |  FROM quant
      |)""".stripMargin

  /** 4-bit sign-LSH bucket over 1-indexed array elements — the ONE
    * definition behind qv_lsh_ann / qv_lsh_multiprobe / the multi-table
    * variant (raw `embedding`) and qv_cosine_dedup (quantized `q`, so
    * the oracle reproduces it exactly; for components in
    * (-0.00005, 0.00005] the two variants can differ by design, each
    * mirrored consistently). Default positions = hash table 0.
    */
  private def signBucket(arr: String,
      pos: Seq[Int] = LSH_TABLES.head): String =
    pos.zipWithIndex.map { case (p, i) =>
      s"CASE WHEN element_at($arr, $p) > 0 THEN ${8 >> i} ELSE 0 END"
    }.mkString("CAST(", " + ", " AS INTEGER)")
  private def signBucketSql(arr: String,
      pos: Seq[Int] = LSH_TABLES.head): String =
    pos.zipWithIndex.map { case (p, i) =>
      s"CASE WHEN $arr[$p] > 0 THEN ${8 >> i} ELSE 0 END"
    }.mkString("CAST(", " + ", " AS INTEGER)")

  /** L independent hash tables for the multi-table LSH variant: each
    * table draws its 4 sign bits from disjoint components, so a near
    * pair straddling one table's hyperplanes still collides in another
    * (p_miss ≈ p_single^L for independent tables).
    */
  val LSH_TABLES: Seq[Seq[Int]] = Seq(
    Seq(1, 17, 33, 49), Seq(5, 21, 37, 53),
    Seq(9, 25, 41, 57), Seq(13, 29, 45, 61))

  /** exact cosine top-k pairs for query vectors (vec_id < 10), k = 5 */
  private def topk(s: SparkSession, d: String): DataFrame = {
    val base = quantized(s, d)
    val qs = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("q").as("qa"), col("nrm").as("qn"))
    val ns = base.select(col("vec_id").as("n_id"), col("label").as("n_label"),
      col("q").as("na"), col("nrm").as("nn"))
    val pairs = broadcast(qs).join(ns, col("q_id") =!= col("n_id"))
      .withColumn("dot",
        expr("aggregate(zip_with(qa, na, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
      .withColumn("cos", col("dot") /
        sqrt(col("qn").cast("double") * col("nn").cast("double")))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("n_id"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
  }

  private val topkSql: String =
    s"""$quantizedSql, pairs AS (
      |  SELECT a.vec_id AS q_id, b.vec_id AS n_id, b.label AS n_label,
      |    (SELECT SUM(a.q[i.i] * b.q[i.i])
      |     FROM (SELECT unnest(range(1, 65)) AS i) i) AS dot,
      |    a.nrm AS qn, b.nrm AS nn
      |  FROM qn a JOIN qn b ON a.vec_id < 10 AND a.vec_id <> b.vec_id
      |), scored AS (
      |  SELECT q_id, n_id, n_label,
      |    dot / sqrt(CAST(qn AS DOUBLE) * CAST(nn AS DOUBLE)) AS cos
      |  FROM pairs
      |), ranked AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
      |    ORDER BY cos DESC, n_id) AS INTEGER) AS rank
      |  FROM scored)""".stripMargin

  /** Nearest-cell assignment against the 16 seed centroids (shared by
    * qv_ivf_ann and the Lloyd-step centroid update): the 16-way
    * candidate fan-out collapses via a partial-aggregated
    * min(struct(d2, cell)) argmin BEFORE the exchange, so the shuffle
    * carries one row per vector.
    */
  private def ivfAssigned(s: SparkSession, d: String): DataFrame = {
    val base = quantized(s, d).select("vec_id", "q", "nrm")
    val seeds = base.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cell_id"), col("q").as("sq"),
        col("nrm").as("snrm"))
    val dists = base.crossJoin(broadcast(seeds))
      .withColumn("dot_s",
        expr("aggregate(zip_with(q, sq, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
      .withColumn("d2", col("nrm") + col("snrm") - lit(2) * col("dot_s"))
    dists.groupBy("vec_id")
      .agg(min(struct(col("d2"), col("cell_id"))).as("m"),
        first(col("q")).as("q"), first(col("nrm")).as("nrm"))
      .select(col("vec_id"), col("m.cell_id").as("cell_id"),
        col("q"), col("nrm"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // brute-force cosine top-5 per query vector
    "qv_cosine_topk" -> ((s, d) => {
      topk(s, d)
        .select(col("q_id"), col("n_id"), col("rank"),
          round(col("cos") * 10000, 0).cast("long").as("cos_bp"))
        .orderBy("q_id", "rank")
    }),

    // kNN majority-label classification from the exact top-5
    "qv_knn_label" -> ((s, d) => {
      val votes = topk(s, d).groupBy("q_id", "n_label")
        .agg(count(lit(1)).as("votes"))
      val w = Window.partitionBy("q_id").orderBy(desc("votes"), asc("n_label"))
      votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("q_id"), col("n_label").as("pred_label"), col("votes"))
        .orderBy("q_id")
    }),

    // sign-bit LSH bucketing + within-bucket top-3 (the IVF-style path)
    "qv_lsh_ann" -> ((s, d) => {
      val base = quantized(s, d).withColumn("bucket",
        expr(signBucket("embedding")))
      val qs = base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("q").as("qa"),
          col("nrm").as("qn"), col("bucket"))
      val ns = base.select(col("vec_id").as("n_id"), col("q").as("na"),
        col("nrm").as("nn"), col("bucket").as("bucket2"))
      val pairs = broadcast(qs)
        .join(ns, col("bucket") === col("bucket2") && col("q_id") =!= col("n_id"))
        .withColumn("dot",
          expr("aggregate(zip_with(qa, na, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
        .withColumn("cos", col("dot") /
          sqrt(col("qn").cast("double") * col("nn").cast("double")))
      val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("n_id"))
      pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
        .select(col("q_id"), col("bucket"), col("n_id"), col("rank"))
        .orderBy("q_id", "rank")
    }),

    // ANN quality EVALUATION — recall@3 of the single-table sign-LSH
    // against exact brute force, per query vector: "measure, don't
    // guess" applied to the index itself (production tunes
    // bits/tables/probes against exactly this measurement, and an
    // index regression shows up as a recall drop, not an anecdote).
    // hits ∈ [0,3]; k rides along so the gate also pins the brute
    // top-k's cardinality.
    "qv_recall" -> ((s, d) => {
      val brute = topk(s, d).filter(col("rank") <= 3)
        .select(col("q_id"), col("n_id"))
      val base = quantized(s, d).withColumn("bucket",
        expr(signBucket("embedding")))
      val qs = base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("q").as("qa"),
          col("nrm").as("qn"), col("bucket"))
      val ns = base.select(col("vec_id").as("n_id"), col("q").as("na"),
        col("nrm").as("nn"), col("bucket").as("bucket2"))
      val pairs = broadcast(qs)
        .join(ns, col("bucket") === col("bucket2") && col("q_id") =!= col("n_id"))
        .withColumn("dot",
          expr("aggregate(zip_with(qa, na, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
        .withColumn("cos", col("dot") /
          sqrt(col("qn").cast("double") * col("nn").cast("double")))
      val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("n_id"))
      val lsh = pairs.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
      brute.join(lsh, Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"),
          count(lit(1)).as("k"))
        .orderBy("q_id")
    }),

    // embedding-cosine near-dup dedup over a re-ingested corpus (every
    // 10th vector duplicated), cos >= 0.99. Blocking is (label × sign-bit
    // LSH bucket): label alone leaves O(N²/|labels|) pairs — an all-pairs
    // cartesian in disguise at 10⁹ vectors — while the 4-bit bucket cuts
    // each block ~16× more and near-identical vectors (cos≥0.99) land in
    // the same bucket with near-certainty. Approximation: a qualifying
    // pair straddling a sign boundary is missed — the standard LSH
    // recall trade-off, recoverable with multi-probe.
    "qv_cosine_dedup" -> ((s, d) => {
      val base = quantized(s, d)
      val corpus = base.select("vec_id", "label", "q", "nrm")
        .unionByName(base.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 10000).as("vec_id"), col("label"),
            col("q"), col("nrm")))
        .withColumn("bucket", expr(signBucket("q")))
      val a = corpus.toDF("a_id", "label", "qa", "qn", "bucket")
      val b = corpus.toDF("b_id", "label2", "na", "nn", "bucket2")
      a.join(b, col("label") === col("label2") &&
          col("bucket") === col("bucket2") && col("a_id") < col("b_id"))
        .withColumn("dot",
          expr("aggregate(zip_with(qa, na, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
        .withColumn("cos_bp", round(col("dot") * 10000 /
          sqrt(col("qn").cast("double") * col("nn").cast("double")), 0)
          .cast("long"))
        .filter(col("cos_bp") >= 9900)
        .select(col("a_id").as("keeper"), col("b_id").as("dup"), col("cos_bp"))
        .orderBy("keeper", "dup")
    }),

    // SemDeDup (Abbas et al. 2023): semantic dedup by cluster-then-
    // compare — k-means cells bound the pair search to within-cluster
    // O(N²/k) instead of all-pairs, then cos >= 0.99 inside a cell
    // drops every non-minimal member of a near-dup group. The cell
    // assignment is the same broadcast-seeds argmin as qv_ivf_ann
    // (partial-agg'd below its exchange); the pair scan is an equi-join
    // on cell_id, so each cluster is its own bounded join partition —
    // no cartesian anywhere. k = 16 here is the deterministic-oracle
    // harness instantiation; O(N²/k) only stays bounded if k GROWS with
    // the corpus (SemDeDup's paper setting is k ≈ O(√N), e.g. 50k
    // clusters for 100M embeddings) — at scale the seeds come from
    // iterating qv_kmeans_step's Lloyd pass, and the plan shape here is
    // UNCHANGED by k (the broadcast carries k centroids; the pair join
    // key is still cell_id). Re-ingested corpus (every 10th vector
    // duplicated) provides true positives; verdict per vector: its
    // cell and whether it is dropped as a dup
    "qv_semdedup" -> ((s, d) => {
      val base = quantized(s, d)
      val corpus = base.select("vec_id", "q", "nrm")
        .unionByName(base.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 10000).as("vec_id"), col("q"),
            col("nrm")))
      val seeds = base.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cell_id"), col("q").as("sq"),
          col("nrm").as("snrm"))
      val assigned = corpus.crossJoin(broadcast(seeds))
        .withColumn("dot_s",
          expr("aggregate(zip_with(q, sq, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
        .withColumn("d2", col("nrm") + col("snrm") - lit(2) * col("dot_s"))
        .groupBy("vec_id")
        .agg(min(struct(col("d2"), col("cell_id"))).as("m"),
          first(col("q")).as("q"), first(col("nrm")).as("nrm"))
        .select(col("vec_id"), col("m.cell_id").as("cell_id"),
          col("q"), col("nrm"))
      val a = assigned.toDF("a_id", "cell", "qa", "qn")
      val b = assigned.toDF("b_id", "cell2", "na", "nn")
      val dropped = a.join(b,
          col("cell") === col("cell2") && col("a_id") < col("b_id"))
        .withColumn("dot",
          expr("aggregate(zip_with(qa, na, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
        .withColumn("cos_bp", round(col("dot") * 10000 /
          sqrt(col("qn").cast("double") * col("nn").cast("double")), 0)
          .cast("long"))
        .filter(col("cos_bp") >= 9900)
        .select(col("b_id").as("vec_id")).distinct()
        .withColumn("is_dup", lit(true))
      assigned.select("vec_id", "cell_id")
        .join(dropped, Seq("vec_id"), "left_outer")
        .select(col("vec_id"), col("cell_id"),
          coalesce(col("is_dup"), lit(false)).as("is_dup"))
        .orderBy("vec_id")
    }),

    // multi-probe LSH: recall recovery for the bucketed ANN — each query
    // probes its own bucket plus the 4 Hamming-distance-1 neighbors
    // (one sign bit flipped), catching near neighbors that straddle a
    // hyperplane. Probe fan-out is on the (tiny, broadcast) query side
    // only; the corpus is still bucketed once and equi-joined, so cost
    // is 5/2^bits of the corpus per query instead of 1/2^bits.
    "qv_lsh_multiprobe" -> ((s, d) => {
      val base = quantized(s, d).withColumn("bucket",
        expr(signBucket("embedding")))
      val qs = base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("q").as("qa"),
          col("nrm").as("qn"),
          explode(array(col("bucket"), col("bucket").bitwiseXOR(lit(1)),
            col("bucket").bitwiseXOR(lit(2)), col("bucket").bitwiseXOR(lit(4)),
            col("bucket").bitwiseXOR(lit(8)))).as("pb"))
      val ns = base.select(col("vec_id").as("n_id"), col("q").as("na"),
        col("nrm").as("nn"), col("bucket").as("bucket2"))
      val pairs = broadcast(qs)
        .join(ns, col("pb") === col("bucket2") && col("q_id") =!= col("n_id"))
        .withColumn("dot",
          expr("aggregate(zip_with(qa, na, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
        .withColumn("cos", col("dot") /
          sqrt(col("qn").cast("double") * col("nn").cast("double")))
      val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("n_id"))
      pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
        .select(col("q_id"), col("n_id"), col("rank"))
        .orderBy("q_id", "rank")
    }),

    // multi-table LSH: L=4 independent hash tables (disjoint sign
    // components). The corpus is bucketed L times via a generator (no
    // shuffle — the join is broadcast-hash on (table, bucket)), the
    // candidate pair set is deduped on (q_id, n_id) BEFORE scoring so a
    // pair colliding in several tables is scored once, and the vectors
    // are re-gathered for the dot product. A near pair must straddle a
    // hyperplane in EVERY table to be missed (p_miss ~ p^L) — the
    // recall-dominance property vs the single-table variant is asserted
    // in TextOpsSpec.
    "qv_lsh_multitable" -> ((s, d) => {
      val base = quantized(s, d)
      val bucketed = base.select(col("vec_id"),
        explode(array(LSH_TABLES.zipWithIndex.map { case (ps, t) =>
          struct(lit(t).as("t"), expr(signBucket("embedding", ps)).as("b"))
        }: _*)).as("tb"))
        .select(col("vec_id"), col("tb.t").as("t"), col("tb.b").as("b"))
      val cand = broadcast(bucketed.filter(col("vec_id") < 10)
          .toDF("q_id", "t", "b"))
        .join(bucketed.toDF("n_id", "t2", "b2"),
          col("t") === col("t2") && col("b") === col("b2") &&
            col("q_id") =!= col("n_id"))
        .select("q_id", "n_id").distinct()
      val qv = base.filter(col("vec_id") < 10).select(
        col("vec_id").as("q_id"), col("q").as("qa"), col("nrm").as("qn2"))
      val nv = base.select(col("vec_id").as("n_id"), col("q").as("na"),
        col("nrm").as("nn2"))
      val pairs = cand.join(broadcast(qv), "q_id").join(nv, "n_id")
        .withColumn("dot",
          expr("aggregate(zip_with(qa, na, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
        .withColumn("cos", col("dot") /
          sqrt(col("qn2").cast("double") * col("nn2").cast("double")))
      val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("n_id"))
      pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
        .select(col("q_id"), col("n_id"), col("rank"))
        .orderBy("q_id", "rank")
    }),

    // IVF-style ANN with real cells: 16 seed vectors act as centroids,
    // every vector is assigned to its nearest cell, queries probe only
    // their own cell. Scale shape: the seed table broadcasts, the
    // 16-way candidate fan-out collapses via a partial-aggregated
    // min(struct(dist, cell)) argmin BEFORE the exchange (the shuffle
    // carries one row per vector, not 16), and the probe is an
    // equi-join on cell id — 1/|cells| of the corpus scanned per query.
    "qv_ivf_ann" -> ((s, d) => {
      val assigned = ivfAssigned(s, d)
      val qs = assigned.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("cell_id").as("cell"),
          col("q").as("qa"), col("nrm").as("qn2"))
      val ns = assigned
        .select(col("vec_id").as("n_id"), col("cell_id").as("cell2"),
          col("q").as("na"), col("nrm").as("nn2"))
      val pairs = broadcast(qs)
        .join(ns, col("cell") === col("cell2") && col("q_id") =!= col("n_id"))
        .withColumn("dot",
          expr("aggregate(zip_with(qa, na, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
        .withColumn("cos", col("dot") /
          sqrt(col("qn2").cast("double") * col("nn2").cast("double")))
      val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("n_id"))
      pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
        .select(col("q_id"), col("cell"), col("n_id"), col("rank"))
        .orderBy("q_id", "rank")
    }),

    // product quantization with asymmetric distance (ADC) — the
    // compression scheme billion-vector indexes actually ship: each
    // 64-dim vector becomes M=4 4-bit codes (one per 16-dim subspace,
    // nearest of 16 seed centroids), a 16x storage cut; a query scores
    // candidates by summing 4 precomputed subspace distances instead of
    // a 64-dim dot product. Scale shape: encoding partial-aggregates
    // the per-(vector, subspace) argmin map-side; the query-time join
    // is against a broadcast 10x4x16-entry LUT, and the (q_id, n_id)
    // ADC sum collapses its 4 subspace rows map-side before the
    // exchange.
    "qv_pq" -> ((s, d) => {
      val sub = quantized(s, d).select(col("vec_id"), explode(expr(
        "transform(sequence(0, 3), m -> named_struct(" +
          "'m', m, 'sub', slice(q, m * 16 + 1, 16)))")).as("e"))
        .select(col("vec_id"), col("e.m").as("m"), col("e.sub").as("sub"))
      val cent = sub.filter(col("vec_id") < 16)
        .select(col("m"), col("vec_id").as("cell"), col("sub").as("csub"))
      val dists = sub.join(broadcast(cent), "m")
        .withColumn("d2", expr(
          "aggregate(zip_with(sub, csub, (x, y) -> (x - y) * (x - y)), " +
            "CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
      val assign = dists.groupBy("vec_id", "m")
        .agg(min(struct(col("d2"), col("cell"))).as("a"))
        .select(col("vec_id"), col("m"), col("a.cell").as("cell"))
      val lut = dists.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("m"), col("cell"), col("d2"))
      val adc = assign.join(broadcast(lut), Seq("m", "cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(sum("d2").as("adc"))
      val w = Window.partitionBy("q_id").orderBy(asc("adc"), asc("vec_id"))
      adc.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("q_id"), col("vec_id").as("n_id"), col("rank"), col("adc"))
        .orderBy("q_id", "rank")
    }),

    // one Lloyd iteration of k-means: per-cell centroid update from the
    // IVF assignment, emitted as exact integer component sums + counts
    // (centroid = csum/n, derived by the caller in whatever float
    // precision it wants). Scale shape: posexplode widens each vector
    // to 64 (pos, component) ints, and the (cell, pos) groupBy
    // partial-aggregates map-side, so the exchange carries
    // |cells| x 64 rows per partition — the minimal width of a dense
    // centroid update, not |vectors| x 64.
    "qv_kmeans_step" -> ((s, d) => {
      ivfAssigned(s, d)
        .select(col("cell_id"), posexplode(col("q")).as(Seq("pos", "c")))
        .groupBy("cell_id", "pos")
        .agg(sum("c").as("csum"), count(lit(1)).as("n"))
        .orderBy("cell_id", "pos")
    }),

    // asymmetric 8-bit scalar quantization of each embedding (the
    // storage-compression pass an embedding lake runs before ANN):
    // code = (q - min) * 255 div range over the quantized-integer
    // components, all non-negative so floor division agrees across
    // engines; emits per-vector codebook params + code checksums + the
    // exact integer reconstruction-error sum. Pure per-row
    // aggregate()/transform lambdas — no shuffle at all until the
    // final orderBy.
    "qv_quantize" -> ((s, d) => {
      quantized(s, d)
        .withColumn("lo", expr(
          "aggregate(q, CAST(9223372036854775807 AS BIGINT), (a, v) -> least(a, v))"))
        .withColumn("hi", expr(
          "aggregate(q, CAST(-9223372036854775808 AS BIGINT), (a, v) -> greatest(a, v))"))
        .withColumn("rng", expr("greatest(hi - lo, CAST(1 AS BIGINT))"))
        .withColumn("codes", expr(
          "transform(q, v -> ((v - lo) * 255) div rng)"))
        .select(col("vec_id"), col("lo").as("zero_point"), col("rng").as("q_range"),
          expr("aggregate(codes, CAST(0 AS BIGINT), (a, c) -> a + c)")
            .as("code_sum"),
          expr("aggregate(zip_with(q, codes, (v, c) -> abs(v - (lo + (c * rng) div 255))), CAST(0 AS BIGINT), (a, e) -> a + e)")
            .as("recon_err"))
        .orderBy("vec_id")
    }),

    // per-label exact centroid norms (integer): IVF cell statistics
    "qv_label_stats" -> ((s, d) => {
      quantized(s, d)
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          sum("nrm").as("sum_sq_norm"),
          max("nrm").as("max_sq_norm"))
        .orderBy("label")
    })
  )

  /** IVF seed/assignment CTEs shared by qv_ivf_ann and qv_kmeans_step. */
  private val ivfAssignedSql: String =
    s"""$quantizedSql, seeds AS (
       |  SELECT vec_id AS cell_id, q AS sq, nrm AS snrm
       |  FROM qn WHERE vec_id < 16
       |), dists AS (
       |  SELECT v.vec_id, s.cell_id, v.q, v.nrm,
       |    v.nrm + s.snrm - 2 * (SELECT SUM(v.q[i.i] * s.sq[i.i])
       |      FROM (SELECT unnest(range(1, 65)) AS i) i) AS d2
       |  FROM qn v CROSS JOIN seeds s
       |), assigned AS (
       |  SELECT vec_id, cell_id, q, nrm FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY d2, cell_id) AS rn FROM dists) t
       |  WHERE rn = 1
       |)""".stripMargin

  val oracle: Map[String, String] = Map(
    "qv_pq" ->
      s"""WITH $quantizedSql, sub AS (
         |  SELECT vec_id, mm.m AS m,
         |    q[mm.m * 16 + 1 : mm.m * 16 + 16] AS sub
         |  FROM qn, (SELECT unnest(range(0, 4)) AS m) mm
         |), cent AS (
         |  SELECT m, vec_id AS cell, sub AS csub FROM sub WHERE vec_id < 16
         |), d AS (
         |  SELECT s.vec_id, s.m, c.cell,
         |    (SELECT SUM((s.sub[i.i] - c.csub[i.i]) * (s.sub[i.i] - c.csub[i.i]))
         |     FROM (SELECT unnest(range(1, 17)) AS i) i) AS d2
         |  FROM sub s JOIN cent c ON s.m = c.m
         |), assign AS (
         |  SELECT vec_id, m, cell FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
         |      ORDER BY d2, cell) AS rn FROM d) t
         |  WHERE rn = 1
         |), lut AS (
         |  SELECT vec_id AS q_id, m, cell, d2 FROM d WHERE vec_id < 10
         |), adc AS (
         |  SELECT l.q_id, a.vec_id AS n_id, SUM(l.d2) AS adc
         |  FROM assign a JOIN lut l ON a.m = l.m AND a.cell = l.cell
         |  WHERE a.vec_id <> l.q_id
         |  GROUP BY 1, 2
         |), rankedq AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY adc, n_id) AS INTEGER) AS rank FROM adc)
         |SELECT q_id, n_id, rank, CAST(adc AS BIGINT) AS adc
         |FROM rankedq WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "qv_kmeans_step" ->
      s"""WITH $ivfAssignedSql
         |SELECT cell_id, CAST(i.i - 1 AS INTEGER) AS pos,
         |  CAST(SUM(q[i.i]) AS BIGINT) AS csum,
         |  CAST(COUNT(*) AS BIGINT) AS n
         |FROM assigned, (SELECT unnest(range(1, 65)) AS i) i
         |GROUP BY cell_id, pos ORDER BY cell_id, pos""".stripMargin,
    "qv_cosine_topk" ->
      s"""WITH $topkSql
         |SELECT q_id, n_id, rank, CAST(ROUND(cos * 10000) AS BIGINT) AS cos_bp
         |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "qv_knn_label" ->
      s"""WITH $topkSql, votes AS (
         |  SELECT q_id, n_label, COUNT(*) AS votes
         |  FROM ranked WHERE rank <= 5 GROUP BY q_id, n_label
         |), vr AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY votes DESC, n_label) AS rn FROM votes)
         |SELECT q_id, n_label AS pred_label, CAST(votes AS BIGINT) AS votes
         |FROM vr WHERE rn = 1 ORDER BY q_id""".stripMargin,
    "qv_lsh_ann" ->
      s"""WITH $quantizedSql, bucketed AS (
         |  SELECT e.vec_id, qn.q, qn.nrm,
         |    ${signBucketSql("e.embedding")} AS bucket
         |  FROM embeddings e JOIN qn ON e.vec_id = qn.vec_id
         |), pairs AS (
         |  SELECT a.vec_id AS q_id, a.bucket, b.vec_id AS n_id,
         |    (SELECT SUM(a.q[i.i] * b.q[i.i])
         |     FROM (SELECT unnest(range(1, 65)) AS i) i) AS dot,
         |    a.nrm AS qn2, b.nrm AS nn2
         |  FROM bucketed a JOIN bucketed b
         |    ON a.vec_id < 10 AND a.bucket = b.bucket AND a.vec_id <> b.vec_id
         |), scored AS (
         |  SELECT q_id, bucket, n_id,
         |    dot / sqrt(CAST(qn2 AS DOUBLE) * CAST(nn2 AS DOUBLE)) AS cos
         |  FROM pairs
         |), ranked2 AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, n_id) AS INTEGER) AS rank FROM scored)
         |SELECT q_id, bucket, n_id, rank
         |FROM ranked2 WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
    "qv_recall" ->
      s"""WITH $topkSql, bucketed AS (
         |  SELECT e.vec_id, qn.q, qn.nrm,
         |    ${signBucketSql("e.embedding")} AS bucket
         |  FROM embeddings e JOIN qn ON e.vec_id = qn.vec_id
         |), pairs2 AS (
         |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
         |    (SELECT SUM(a.q[i.i] * b.q[i.i])
         |     FROM (SELECT unnest(range(1, 65)) AS i) i) AS dot,
         |    a.nrm AS qn2, b.nrm AS nn2
         |  FROM bucketed a JOIN bucketed b
         |    ON a.vec_id < 10 AND a.bucket = b.bucket AND a.vec_id <> b.vec_id
         |), scored2 AS (
         |  SELECT q_id, n_id,
         |    dot / sqrt(CAST(qn2 AS DOUBLE) * CAST(nn2 AS DOUBLE)) AS cos
         |  FROM pairs2
         |), ranked2 AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, n_id) AS rank FROM scored2
         |), brute AS (SELECT q_id, n_id FROM ranked WHERE rank <= 3
         |), lsh AS (SELECT q_id, n_id FROM ranked2 WHERE rank <= 3)
         |SELECT b.q_id,
         |  CAST(SUM(CASE WHEN l.n_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS hits,
         |  CAST(COUNT(*) AS BIGINT) AS k
         |FROM brute b LEFT JOIN lsh l ON b.q_id = l.q_id AND b.n_id = l.n_id
         |GROUP BY b.q_id ORDER BY b.q_id""".stripMargin,

    "qv_cosine_dedup" ->
      s"""WITH $quantizedSql, corpus AS (
         |  SELECT vec_id, label, q, nrm,
         |    ${signBucketSql("q")} AS bucket
         |  FROM (
         |    SELECT vec_id, label, q, nrm FROM qn
         |    UNION ALL
         |    SELECT vec_id + 10000, label, q, nrm FROM qn WHERE vec_id % 10 = 0)
         |), pairs AS (
         |  SELECT a.vec_id AS keeper, b.vec_id AS dup,
         |    (SELECT SUM(a.q[i.i] * b.q[i.i])
         |     FROM (SELECT unnest(range(1, 65)) AS i) i) AS dot,
         |    a.nrm AS qn2, b.nrm AS nn2
         |  FROM corpus a JOIN corpus b
         |    ON a.label = b.label AND a.bucket = b.bucket
         |    AND a.vec_id < b.vec_id)
         |SELECT keeper, dup,
         |  CAST(ROUND(dot * 10000 / sqrt(CAST(qn2 AS DOUBLE) * CAST(nn2 AS DOUBLE))) AS BIGINT) AS cos_bp
         |FROM pairs
         |WHERE CAST(ROUND(dot * 10000 / sqrt(CAST(qn2 AS DOUBLE) * CAST(nn2 AS DOUBLE))) AS BIGINT) >= 9900
         |ORDER BY keeper, dup""".stripMargin,
    "qv_semdedup" ->
      s"""WITH $quantizedSql, corpus AS (
         |  SELECT vec_id, q, nrm FROM qn
         |  UNION ALL
         |  SELECT vec_id + 10000, q, nrm FROM qn WHERE vec_id % 10 = 0
         |), seeds AS (
         |  SELECT vec_id AS cell_id, q AS sq, nrm AS snrm
         |  FROM qn WHERE vec_id < 16
         |), dists AS (
         |  SELECT v.vec_id, s.cell_id, v.q, v.nrm,
         |    v.nrm + s.snrm - 2 * (SELECT SUM(v.q[i.i] * s.sq[i.i])
         |      FROM (SELECT unnest(range(1, 65)) AS i) i) AS d2
         |  FROM corpus v CROSS JOIN seeds s
         |), assigned AS (
         |  SELECT vec_id, cell_id, q, nrm FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY d2, cell_id) AS rn FROM dists) t
         |  WHERE rn = 1
         |), pairs AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |    (SELECT SUM(a.q[i.i] * b.q[i.i])
         |     FROM (SELECT unnest(range(1, 65)) AS i) i) AS dot,
         |    a.nrm AS qn2, b.nrm AS nn2
         |  FROM assigned a JOIN assigned b
         |    ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
         |), dropped AS (
         |  SELECT DISTINCT b_id AS vec_id FROM pairs
         |  WHERE CAST(ROUND(dot * 10000 / sqrt(CAST(qn2 AS DOUBLE)
         |    * CAST(nn2 AS DOUBLE))) AS BIGINT) >= 9900)
         |SELECT s.vec_id, CAST(s.cell_id AS BIGINT) AS cell_id,
         |  (d.vec_id IS NOT NULL) AS is_dup
         |FROM assigned s LEFT JOIN dropped d ON s.vec_id = d.vec_id
         |ORDER BY s.vec_id""".stripMargin,
    "qv_lsh_multiprobe" ->
      s"""WITH $quantizedSql, bucketed AS (
         |  SELECT e.vec_id, qn.q, qn.nrm,
         |    ${signBucketSql("e.embedding")} AS bucket
         |  FROM embeddings e JOIN qn ON e.vec_id = qn.vec_id
         |), probes AS (
         |  SELECT vec_id AS q_id, q AS qa, nrm AS qnrm,
         |    unnest([bucket, xor(bucket, 1), xor(bucket, 2),
         |            xor(bucket, 4), xor(bucket, 8)]) AS pb
         |  FROM bucketed WHERE vec_id < 10
         |), pairs AS (
         |  SELECT p.q_id, b.vec_id AS n_id,
         |    (SELECT SUM(p.qa[i.i] * b.q[i.i])
         |     FROM (SELECT unnest(range(1, 65)) AS i) i) AS dot,
         |    p.qnrm AS qn2, b.nrm AS nn2
         |  FROM probes p JOIN bucketed b
         |    ON p.pb = b.bucket AND p.q_id <> b.vec_id
         |), scored AS (
         |  SELECT q_id, n_id,
         |    dot / sqrt(CAST(qn2 AS DOUBLE) * CAST(nn2 AS DOUBLE)) AS cos
         |  FROM pairs
         |), rankedp AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, n_id) AS INTEGER) AS rank FROM scored)
         |SELECT q_id, n_id, rank
         |FROM rankedp WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
    "qv_lsh_multitable" -> {
      val bucketCase = LSH_TABLES.zipWithIndex.map { case (ps, t) =>
        s"WHEN $t THEN ${signBucketSql("e.embedding", ps)}"
      }.mkString(" ")
      s"""WITH $quantizedSql, bucketed AS (
         |  SELECT e.vec_id, t.t, CASE t.t $bucketCase END AS b
         |  FROM embeddings e
         |  CROSS JOIN (SELECT unnest(range(${LSH_TABLES.length})) AS t) t
         |), cand AS (
         |  SELECT DISTINCT a.vec_id AS q_id, b2.vec_id AS n_id
         |  FROM bucketed a JOIN bucketed b2
         |    ON a.t = b2.t AND a.b = b2.b
         |    AND a.vec_id < 10 AND a.vec_id <> b2.vec_id
         |), pairs AS (
         |  SELECT c.q_id, c.n_id,
         |    (SELECT SUM(qa.q[i.i] * qb.q[i.i])
         |     FROM (SELECT unnest(range(1, 65)) AS i) i) AS dot,
         |    qa.nrm AS qn2, qb.nrm AS nn2
         |  FROM cand c
         |  JOIN qn qa ON c.q_id = qa.vec_id
         |  JOIN qn qb ON c.n_id = qb.vec_id
         |), scored AS (
         |  SELECT q_id, n_id,
         |    dot / sqrt(CAST(qn2 AS DOUBLE) * CAST(nn2 AS DOUBLE)) AS cos
         |  FROM pairs
         |), rankedt AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, n_id) AS INTEGER) AS rank FROM scored)
         |SELECT q_id, n_id, rank
         |FROM rankedt WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
    },
    "qv_ivf_ann" ->
      s"""WITH $ivfAssignedSql, pairs AS (
         |  SELECT a.vec_id AS q_id, a.cell_id AS cell, b.vec_id AS n_id,
         |    (SELECT SUM(a.q[i.i] * b.q[i.i])
         |     FROM (SELECT unnest(range(1, 65)) AS i) i) AS dot,
         |    a.nrm AS qn2, b.nrm AS nn2
         |  FROM assigned a JOIN assigned b
         |    ON a.cell_id = b.cell_id AND a.vec_id < 10 AND a.vec_id <> b.vec_id
         |), scored AS (
         |  SELECT q_id, cell, n_id,
         |    dot / sqrt(CAST(qn2 AS DOUBLE) * CAST(nn2 AS DOUBLE)) AS cos
         |  FROM pairs
         |), rankedv AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, n_id) AS INTEGER) AS rank FROM scored)
         |SELECT q_id, cell, n_id, rank
         |FROM rankedv WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
    "qv_quantize" ->
      s"""WITH $quantizedSql, p AS (
         |  SELECT vec_id, q, CAST(list_min(q) AS BIGINT) AS lo,
         |    CAST(GREATEST(list_max(q) - list_min(q), 1) AS BIGINT) AS rng
         |  FROM qn)
         |SELECT vec_id, lo AS zero_point, rng AS q_range,
         |  CAST((SELECT SUM(((q[i.i] - lo) * 255) // rng)
         |        FROM (SELECT unnest(range(1, 65)) AS i) i) AS BIGINT)
         |    AS code_sum,
         |  CAST((SELECT SUM(ABS(q[i.i] - (lo +
         |          ((((q[i.i] - lo) * 255) // rng) * rng) // 255)))
         |        FROM (SELECT unnest(range(1, 65)) AS i) i) AS BIGINT)
         |    AS recon_err
         |FROM p ORDER BY vec_id""".stripMargin,
    "qv_label_stats" ->
      s"""WITH $quantizedSql
         |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |  CAST(SUM(nrm) AS BIGINT) AS sum_sq_norm,
         |  CAST(MAX(nrm) AS BIGINT) AS max_sq_norm
         |FROM qn GROUP BY label ORDER BY label""".stripMargin
  )
}
