package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data text pipeline operators over the `documents` table:
  * exact dedup, MinHash+LSH and n-gram-Jaccard near-dup, SimHash,
  * bag fingerprinting, language-ID, quality scoring, token counting.
  *
  * Determinism: similarity scores are kept as exact integers
  * (intersection / union sizes, not ratios) and all hashing is md5
  * (identical in the JVM and DuckDB), so every query hash-matches the
  * oracle bit-for-bit.
  *
  * Scale design (100 TB corpus):
  *  - dedup keys (md5 / minhash bands / fingerprints) are groupBy
  *    shuffles over short fixed-width keys — partial aggregation keeps
  *    the exchange narrow;
  *  - shingling/minhashing is a pure per-row flatMap (no shuffle, stays
  *    in whole-stage codegen via explode/transform);
  *  - LSH banding turns the quadratic all-pairs problem into an
  *    equi-join on (band, band_hash) — the classic shuffle-join-safe
  *    near-dup plan; the shingle-blocking Jaccard variant exists for
  *    verification, its join key (shingle) is far more skewed and it is
  *    the one to avoid at full scale.
  */
object TextQueries {

  /** Re-crawl corpus: every 7th doc duplicated exactly, every 10th
    * near-duplicated (suffix appended). Gives the dedup operators real
    * positives while staying DuckDB-reproducible.
    */
  private def corpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    docs
      .unionByName(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(col("text"), lit(" the data")).as("text")))
      .unionByName(docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 20000).as("doc_id"), col("text")))
  }

  private val corpusSql: String =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000, text || ' the data' FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 20000, text FROM documents WHERE doc_id % 7 = 0
      |)""".stripMargin

  /** Seeded deterministic ~40% doc sample of the corpus (Knuth
    * multiplicative hash — exact BIGINT math in both engines), the
    * bench-scale population for [[lshEvalCurve]]: the exact all-pairs
    * curve is quadratic-in-cluster-size BY DESIGN, so the timing
    * harness measures it on a fixed sample while the full-corpus gate
    * stays in the correctness suite.
    */
  private def corpusSample(s: SparkSession, d: String): DataFrame =
    corpus(s, d).filter((col("doc_id") * 2654435761L + 7) % 10 < 4)

  private val corpusSampleSql: String =
    corpusSql.replace("corpus AS (", "corpus_all AS (") +
      """, corpus AS (
        |  SELECT * FROM corpus_all
        |  WHERE (doc_id * 2654435761 + 7) % 10 < 4
        |)""".stripMargin

  /** The per-decile S-curve oracle, parameterized by the corpus CTE —
    * exact per-decile detection curve: intersecting pairs over the
    * df-capped shingle universe vs the banded candidate set.
    */
  private def lshEvalOracle(corpusCte: String): String =
    s"""WITH $corpusCte, $shinglesSql, ${minhashBandedSql()},
       |dfreq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
       |shr AS (SELECT sh.doc_id, sh.s FROM sh
       |  JOIN dfreq ON sh.s = dfreq.s WHERE dfreq.df <= $MAX_SHINGLE_DF),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shr GROUP BY doc_id),
       |ij AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i_n
       |  FROM shr a JOIN shr b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |pairs AS (
       |  SELECT a_id, b_id, i_n, sa.n + sb.n - i_n AS u_n
       |  FROM ij JOIN sizes sa ON a_id = sa.doc_id
       |  JOIN sizes sb ON b_id = sb.doc_id),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
       |SELECT LEAST(9, CAST((i_n * 10) // u_n AS INTEGER)) AS decile,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(CASE WHEN cand.a_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_caught
       |FROM pairs LEFT JOIN cand
       |  ON pairs.a_id = cand.a_id AND pairs.b_id = cand.b_id
       |GROUP BY 1 ORDER BY decile""".stripMargin

  /** Distinct word-3-gram shingles per doc (docs with ≥3 tokens).
    * Dedup happens per-row via `array_distinct` BEFORE the explode — a
    * DataFrame-wide `.distinct()` would shuffle the entire exploded
    * shingle table just to dedup within each doc.
    */
  private[graft] def shingles(c: DataFrame): DataFrame =
    c.withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(1, size(w) - 2)," +
          " i -> concat_ws(' ', element_at(w, i), element_at(w, i+1), element_at(w, i+2)))")))
        .as("s"))

  private val shinglesSql: String =
    """words AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM corpus
      |), sh AS (
      |  SELECT doc_id,
      |    unnest(list_distinct(list_transform(range(1, len(w) - 1),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
      |  FROM words WHERE len(w) >= 3
      |)""".stripMargin

  /** MinHash-LSH parameters: `LSH_BANDS` bands × `LSH_ROWS` hashes per
    * band. Detection probability for a pair at Jaccard j is
    * 1 - (1 - j^r)^b — the S-curve threshold sits near (1/b)^(1/r)
    * ≈ 0.59 for (8, 4): near-dups ≥0.7 are caught with p > 0.93 while
    * unrelated pairs (j ≤ 0.3) collide with p < 0.07. See the
    * lsh-detection property in PropertySpec.
    */
  val LSH_BANDS = 8
  val LSH_ROWS = 4

  /** Shingle document-frequency cap for the blocking Jaccard variant:
    * boilerplate shingles ("the data ...") appearing in more than
    * `MAX_SHINGLE_DF` docs would make the shingle-equi-join quadratic in
    * the hottest key. Dropping them trades a little recall on pairs
    * whose overlap is ONLY boilerplate — which are not near-dups anyway.
    */
  val MAX_SHINGLE_DF = 50

  /** Per-band MinHash signature via the one-hash-many-pieces trick:
    * ONE md5 per band per shingle (salt `g<band>|`), split into `rows`
    * fixed-width hex substrings — each substring induces its own
    * near-independent shingle ordering, so the `rows` per-band minima
    * cost b md5 calls instead of b×r. Everything happens in a single
    * groupBy pass over the shingle table (no band explode): the shuffle
    * carries |docs| rows of fixed-width minima, and the (doc, band)
    * form for the bucket join is a cheap 8-way generator per doc.
    */
  def minhashBanded(sh: DataFrame, bands: Int = LSH_BANDS,
      rows: Int = LSH_ROWS): DataFrame = {
    val w = 32 / rows
    val hashed = sh.select(col("doc_id") +: (0 until bands).map(b =>
      md5(concat(lit(s"g$b|"), col("s"))).as(s"h$b")): _*)
    val mins = for { b <- 0 until bands; j <- 0 until rows } yield
      min(substring(col(s"h$b"), j * w + 1, w)).as(s"m_${b}_$j")
    val perDoc = hashed.groupBy("doc_id").agg(mins.head, mins.tail: _*)
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat((0 until rows).map(j => col(s"m_${b}_$j")): _*)).as("bh"))
    }
    perDoc.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  private def minhashBandedSql(bands: Int = LSH_BANDS,
      rows: Int = LSH_ROWS): String = {
    val w = 32 / rows
    val hcols = (0 until bands)
      .map(b => s"md5('g$b|' || s) AS h$b").mkString(", ")
    val mins = (for { b <- 0 until bands; j <- 0 until rows } yield
      s"MIN(substr(h$b, ${j * w + 1}, $w)) AS m_${b}_$j").mkString(", ")
    val arms = (0 until bands).map { b =>
      val cat = (0 until rows).map(j => s"m_${b}_$j").mkString(" || ")
      s"SELECT doc_id, $b AS band, md5($cat) AS bh FROM perdoc"
    }.mkString("\n  UNION ALL ")
    s"""hashed AS (
       |  SELECT doc_id, $hcols FROM sh
       |), perdoc AS (
       |  SELECT doc_id, $mins FROM hashed GROUP BY doc_id
       |), banded AS (
       |  $arms)""".stripMargin
  }

  /** Verified near-dup pairs (Jaccard >= 0.5, exact integer scores).
    * High-document-frequency shingles are dropped BEFORE the pair join:
    * the join key is the raw shingle, so one boilerplate phrase shared
    * by k docs alone produces k² candidate rows — the df cap bounds the
    * per-key blowup at MAX_SHINGLE_DF². Jaccard is then computed over
    * the capped shingle universe on both sides (consistent sizes).
    */
  def jaccardPairs(s: SparkSession, d: String): DataFrame = {
    // The shingle lineage (scan → split → explode) feeds the df filter,
    // both join sides, and the sizes agg; Spark only reuses identical
    // exchanges opportunistically, so without a persist the corpus is
    // re-shingled 3-4×. Both frames are persisted: Spark's CacheManager
    // matches by canonicalized plan, so qt_ngram_jaccard and
    // qt_dedup_keep (which each call this) share one materialization.
    // Lifetime: deliberately session-scoped — an in-function unpersist
    // would defeat exactly that cross-query reuse. MEMORY_AND_DISK caps
    // the memory cost (blocks spill rather than evict execution
    // memory); the harness releases both via CacheRegistry.releaseAll()
    // once the suite is done.
    val all = graft.ops.CacheRegistry.track(shingles(corpus(s, d)))
    val sh = graft.ops.CacheRegistry.track(
      all.join(
        all.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") <= MAX_SHINGLE_DF).select("s"), "s")
        .select("doc_id", "s"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.toDF("a_id", "s")
    val b = sh.toDF("b_id", "s2")
    val inter = a.join(b, col("s") === col("s2") && col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("a_id", "na"), "a_id")
      .join(sizes.toDF("b_id", "nb"), "b_id")
      .withColumn("union_n", col("na") + col("nb") - col("inter"))
      // jaccard >= 0.5 without float math
      .filter(col("inter") * 2 >= col("union_n"))
      .select("a_id", "b_id", "inter", "union_n")
  }

  /** EVERY shingle-intersecting pair with exact (inter, union) counts
    * over the df-capped universe — [[jaccardPairs]] without its ≥0.5
    * cut. Feeds the LSH evaluation gate, which needs the low-Jaccard
    * tail to show what the bands correctly DON'T catch.
    */
  private def jaccardAllPairs(c: DataFrame): DataFrame = {
    val all = graft.ops.CacheRegistry.track(shingles(c))
    val sh = graft.ops.CacheRegistry.track(
      all.join(
        all.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") <= MAX_SHINGLE_DF).select("s"), "s")
        .select("doc_id", "s"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.toDF("a_id", "s")
    val b = sh.toDF("b_id", "s2")
    a.join(b, col("s") === col("s2") && col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("a_id", "na"), "a_id")
      .join(sizes.toDF("b_id", "nb"), "b_id")
      .withColumn("union_n", col("na") + col("nb") - col("inter"))
      .select("a_id", "b_id", "inter", "union_n")
  }

  /** The LSH S-curve over one corpus population: every shingle-
    * intersecting pair scored with its EXACT Jaccard decile, LEFT-
    * joined against the banded candidate set — per-decile (pairs,
    * caught) counts as integers. Parameterized by corpus so the exact
    * full-corpus gate and the seeded-sample bench variant share one
    * definition (and, for the full corpus, one cached shingle lineage
    * with [[jaccardPairs]] via CacheManager plan matching).
    */
  private def lshEvalCurve(c: DataFrame): DataFrame = {
    val pairs = jaccardAllPairs(c)
    val banded = graft.ops.CacheRegistry.track(minhashBanded(shingles(c)))
    val a = banded.toDF("a_id", "band", "bh")
    val b = banded.toDF("b_id", "band2", "bh2")
    val cands = a.join(b, col("band") === col("band2") &&
        col("bh") === col("bh2") && col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
      .withColumn("caught", lit(1L))
    pairs.join(cands, Seq("a_id", "b_id"), "left")
      .withColumn("decile",
        least(lit(9), expr("(inter * 10) div union_n").cast("int")))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_pairs"),
        sum(coalesce(col("caught"), lit(0L))).as("n_caught"))
      .orderBy("decile")
  }

  /** Dedup CLUSTER formation: connected components over the union of
    * exact-duplicate edges (same md5) and verified near-dup edges
    * (jaccardPairs), by min-label propagation to fixpoint. The result —
    * each doc labeled with the smallest doc_id reachable through any
    * chain of duplicates — is deterministic regardless of iteration
    * schedule, and is what a training-data pipeline actually keys
    * keeper selection on (pairwise decisions miss transitive chains:
    * a~b, b~c puts a,b,c in ONE cluster even when a~c was never
    * scored). Scale shape: each round is one join + one groupBy(min)
    * over (id, comp) longs; rounds are bounded by the cluster graph's
    * diameter (shallow for dedup — near-dup chains, not social graphs),
    * and each round localCheckpoints so the plan doesn't deepen
    * geometrically (the classic iterative-join pitfall).
    */
  def dedupComponents(s: SparkSession, d: String): DataFrame = {
    val c = corpus(s, d)
    val hashes = c.select(col("doc_id"), md5(col("text")).as("h"))
    val exactEdges = hashes
      .join(hashes.groupBy("h").agg(min("doc_id").as("k")), "h")
      .filter(col("doc_id") =!= col("k"))
      .select(col("k").as("a"), col("doc_id").as("b"))
    val nearEdges = jaccardPairs(s, d)
      .select(col("a_id").as("a"), col("b_id").as("b"))
    val edges = exactEdges.unionByName(nearEdges).distinct()
    connectedComponents(c.select(col("doc_id").as("id")), edges)
  }

  /** Min-label connected components over an undirected edge list
    * (a, b) — the loop behind qt_dedup_cluster, extracted so the
    * convergence property is testable on adversarial graphs.
    *
    * Each round propagates the component label across edges AND
    * through the label table itself (comp := comp of comp — pointer
    * jumping), so label paths HALVE every round: a diameter-D
    * component converges in O(log D) rounds, not O(D) — a 10k-node
    * chain needs ~14 rounds where plain neighbor propagation needs
    * 10k (the large-star/small-star result, obtained here with one
    * extra self-join of the small label table per round). Convergence
    * is an O(1)-column agg: a round can only LOWER labels (every min
    * includes the old value), so the label sum strictly decreases
    * until the fixpoint. Each round localCheckpoints eagerly and
    * frees the previous round's blocks — the iterative-join hygiene
    * that keeps the plan from deepening geometrically.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame): DataFrame = {
    // sym is consumed only inside this loop — unpersisted on exit (any
    // lineage underneath is suite-shared and registry-released)
    val sym = edges
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = nodes.withColumn("comp", col("id"))
      .localCheckpoint(true)
    var prevSum = Long.MinValue
    var converged = false
    var rounds = 0
    while (!converged) {
      rounds += 1
      require(rounds <= 50, "component propagation failed to converge")
      val viaNbr = sym.join(labels, col("a") === col("id"))
        .select(col("b").as("id"), col("comp"))
      val viaPtr = labels.toDF("id0", "c0")
        .join(labels, col("c0") === col("id"))
        .select(col("id0").as("id"), col("comp"))
      val next = labels.unionByName(viaNbr).unionByName(viaPtr)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint(true)
      val newSum = next.agg(sum("comp")).collect().head.getLong(0)
      // next is eagerly materialized, so the PREVIOUS round's checkpoint
      // blocks are fully consumed — free them now instead of leaking one
      // cached copy of the label table per round
      graft.ops.CacheRegistry.freeCheckpoint(labels)
      converged = newSum == prevSum
      prevSum = newSum
      labels = next
    }
    sym.unpersist(blocking = false)
    // the FINAL checkpoint backs the returned frame until the caller
    // consumes it — released with the rest of the suite's caches
    graft.ops.CacheRegistry.checkpointRdd(labels)
      .foreach(graft.ops.CacheRegistry.trackRdd)
    labels
  }

  /** Per-lang stopword lexicon for the language-ID heuristic: 8
    * languages × 14-16 high-frequency function words (shared words like
    * es/pt "de" legitimately score for both). The production analog
    * swaps in a full per-language stopword list or character-n-gram
    * model behind the same broadcast-join shape — the lexicon is DATA,
    * not code.
    */
  private val lexicon: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "of", "en" -> "and",
    "en" -> "is", "en" -> "to", "en" -> "in", "en" -> "that",
    "en" -> "it", "en" -> "for", "en" -> "was", "en" -> "with",
    "en" -> "as", "en" -> "on", "en" -> "at", "en" -> "by",
    "es" -> "el", "es" -> "la", "es" -> "y", "es" -> "de",
    "es" -> "que", "es" -> "los", "es" -> "un", "es" -> "en",
    "es" -> "se", "es" -> "del", "es" -> "las", "es" -> "por",
    "es" -> "con", "es" -> "una", "es" -> "su", "es" -> "para",
    "fr" -> "le", "fr" -> "et", "fr" -> "un", "fr" -> "les",
    "fr" -> "des", "fr" -> "est", "fr" -> "dans", "fr" -> "la",
    "fr" -> "une", "fr" -> "du", "fr" -> "que", "fr" -> "pour",
    "fr" -> "qui", "fr" -> "sur", "fr" -> "pas", "fr" -> "au",
    "de" -> "der", "de" -> "und", "de" -> "das", "de" -> "die",
    "de" -> "ist", "de" -> "nicht", "de" -> "ein", "de" -> "zu",
    "de" -> "den", "de" -> "mit", "de" -> "von", "de" -> "auf",
    "de" -> "auch", "de" -> "sich", "de" -> "dem", "de" -> "eine",
    "it" -> "il", "it" -> "che", "it" -> "di", "it" -> "non",
    "it" -> "la", "it" -> "per", "it" -> "una", "it" -> "sono",
    "it" -> "le", "it" -> "si", "it" -> "con", "it" -> "del",
    "it" -> "gli", "it" -> "nel",
    "pt" -> "o", "pt" -> "em", "pt" -> "uma", "pt" -> "com",
    "pt" -> "de", "pt" -> "que", "pt" -> "do", "pt" -> "da",
    "pt" -> "os", "pt" -> "um", "pt" -> "para", "pt" -> "ao",
    "pt" -> "das", "pt" -> "dos",
    "nl" -> "de", "nl" -> "het", "nl" -> "een", "nl" -> "van",
    "nl" -> "en", "nl" -> "is", "nl" -> "dat", "nl" -> "op",
    "nl" -> "te", "nl" -> "met", "nl" -> "voor", "nl" -> "niet",
    "nl" -> "zijn", "nl" -> "aan",
    "sv" -> "och", "sv" -> "att", "sv" -> "det", "sv" -> "som",
    "sv" -> "en", "sv" -> "av", "sv" -> "den", "sv" -> "till",
    "sv" -> "med", "sv" -> "ett", "sv" -> "om", "sv" -> "han",
    "sv" -> "inte", "sv" -> "har")
  private val lexiconSql: String =
    "lexicon(lex_lang, lex_word) AS (VALUES " +
      lexicon.map { case (l, w) => s"('$l', '$w')" }.mkString(", ") + ")"

  /** Subword merge-list vocabulary for qt_bpe (space-free fragments,
    * length >= 2; the production path swaps in a learned merge table
    * behind the same greedy longest-match shape).
    */
  val BPE_VOCAB: Seq[String] = Seq(
    "tion", "data", "ing", "the", "and", "ent", "for",
    "er", "re", "an", "in", "on", "at", "es", "ed", "is",
    "or", "st", "le", "ar")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // cross-doc duplicated-SPAN coverage — the exact-substring dedup
    // decision (Lee et al. 2022, "Deduplicating Training Data"): every
    // 8-word window of every doc is checked against the corpus; a
    // window is duplicated when its exact text occurs in >= 2 DISTINCT
    // docs (internal repetition is qp_repetition's dimension, not
    // this). Per doc: window count, duplicated-window count, and the
    // drop decision at >= 50% coverage. Scale shape: the span table is
    // |tokens|-bounded (explode, no shuffle); the dup set is one
    // partial-agg'd exchange; the membership probe is a shuffle
    // equi-join on the span text (production would dictionary-encode
    // the span to a 64-bit key or front a Bloom filter, trading exact
    // equality for shuffle width — kept exact here to match the
    // oracle bit-for-bit).
    "qt_span_dedup" -> ((s, d) => {
      val spans = corpus(s, d)
        .withColumn("w", split(col("text"), " "))
        .filter(size(col("w")) >= 8)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(w) - 7)," +
            " i -> array_join(slice(w, i, 8), ' '))")).as("s"))
      val dup = spans.select("doc_id", "s").distinct()
        .groupBy("s").agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2).select(col("s"), lit(1L).as("d"))
      spans.join(dup, Seq("s"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_windows"),
          sum(coalesce(col("d"), lit(0L))).as("n_dup"))
        .select(col("doc_id"), col("n_windows"), col("n_dup"),
          when(col("n_dup") * 2 >= col("n_windows"), 1).otherwise(0)
            .cast("int").as("drop_flag"))
        .orderBy("doc_id")
    }),

    // exact dedup: hash-groupBy, keep lowest doc_id per content hash
    "qt_exact_dedup" -> ((s, d) => {
      corpus(s, d)
        .groupBy(md5(col("text")).as("h"))
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
        .filter(col("n_copies") > 1)
        .orderBy("keeper")
    }),

    // MinHash + LSH banding: near-dup candidate pairs via band-bucket join
    "qt_minhash_lsh" -> ((s, d) => {
      // the banded frame feeds BOTH sides of the self-join; without a
      // persist each side re-shingles and re-minhashes the corpus —
      // cheap in a fresh session, but in a long suite run the recompute
      // threads through a full block manager and BENCH_r04 measured it
      // as a 7x in-session regression. Persisted session-scoped like the
      // other shared text intermediates (released via CacheRegistry).
      val banded = graft.ops.CacheRegistry.track(
        minhashBanded(shingles(corpus(s, d))))
      val a = banded.toDF("a_id", "band", "bh")
      val b = banded.toDF("b_id", "band2", "bh2")
      a.join(b, col("band") === col("band2") && col("bh") === col("bh2") &&
          col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
        .orderBy("a_id", "b_id")
    }),

    // C4-STYLE SENTENCE DEDUP: any sentence occurring more than once
    // in the corpus keeps only its FIRST occurrence (min (doc_id,
    // position)); documents are reassembled from their surviving
    // sentences in order. One window over the sentence hash partition
    // — no pair join at all, which is what makes this the cheapest
    // dedup pass and why C4 runs it before everything else. Output is
    // per-doc (survivor count, rebuilt-text md5) so the full rebuilt
    // corpus sits behind the hash oracle without shipping megabytes.
    "qt_sentence_dedup" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val sent = corpus(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), "\\. ")).as(Seq("pos", "sent")))
        .filter(length(col("sent")) > 0)
      val rn = row_number().over(
        Window.partitionBy("sent").orderBy("doc_id", "pos"))
      sent.withColumn("rn", rn).filter(col("rn") === 1)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          md5(concat_ws(". ", expr(
            "transform(array_sort(collect_list(struct(pos, sent)))," +
              " x -> x.sent)"))).as("text_md5"))
        .orderBy("doc_id")
    }),

    // LSH QUALITY EVALUATION — the S-curve measured on real data, the
    // text sibling of qv_recall: every shingle-intersecting pair is
    // scored with its EXACT Jaccard decile, LEFT-joined against the
    // banded candidate set, and the per-decile (pairs, caught) counts
    // come back as integers. High deciles must be caught (recall of
    // the 8×4 bands), low deciles mostly not (precision = candidate
    // set stays subquadratic) — and because the counts are exact and
    // deterministic, the whole curve sits behind the hash oracle, not
    // a tolerance check.
    "qt_lsh_eval" -> ((s, d) => lshEvalCurve(corpus(s, d))),

    // the same S-curve on a seeded 40% doc sample — what the BENCH
    // harness times (the full-corpus evaluation is quadratic-in-
    // cluster-size by design and dominated a 235 s suite with 26-35 s
    // across its samples); still exact integer math, still hash-gated
    "qt_lsh_eval_sample" -> ((s, d) => lshEvalCurve(corpusSample(s, d))),

    // INCREMENTAL ingest dedup — the production shape of near-dup at
    // 100 TB: a standing corpus keeps its banded MinHash index
    // MATERIALIZED (here: the doc_id % 5 == 0 slice of the banded
    // table), and each new crawl batch is banded and equi-joined
    // against that index instead of re-clustering the whole corpus.
    // Per new doc: how many distinct corpus docs it band-collides
    // with and the smallest such id (the dedup attribution). The join
    // is the same (band, bh) bucket join as qt_minhash_lsh — new-batch
    // sized × index lookups, never corpus × corpus
    "qt_incr_dedup" -> ((s, d) => {
      val banded = graft.ops.CacheRegistry.track(
        minhashBanded(shingles(corpus(s, d))))
      val idx = banded.filter(col("doc_id") % 5 === 0)
        .toDF("c_id", "band", "bh")
      val fresh = banded.filter(col("doc_id") % 5 =!= 0)
        .toDF("n_id", "band2", "bh2")
      fresh.join(idx,
          col("band2") === col("band") && col("bh2") === col("bh"))
        .groupBy(col("n_id").as("doc_id"))
        .agg(countDistinct("c_id").as("n_corpus_matches"),
          min("c_id").as("first_match"))
        .orderBy("doc_id")
    }),

    // STREAMING incremental dedup — the standing-index production
    // shape driven end-to-end through the engine's OWN streaming
    // source: the corpus arrives as 3 commits on a tx table, each
    // micro-batch (maxVersionsPerTrigger=1, so batch k IS commit k)
    // MinHash-bands its documents, probes the STANDING band index
    // built by the previous batches (work = new batch × index, never
    // corpus²), and only then appends its own bands to the index. The
    // collected matches must equal the closed-form replay: banded
    // pairs whose arrival batches differ, new side strictly later
    // (batch = doc_id % 3 — the commit each doc shipped in). A lost
    // batch, a probe against a stale index, or an index updated
    // before probing all move the pair set.
    "qs_incr_dedup" -> ((s, d) => {
      val c = corpus(s, d)
      val base = sys.props("java.io.tmpdir") +
        s"/graft_qsdedup_${math.abs(d.hashCode)}"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
      val t = s"$base/t"
      (0 until 3).foreach { i =>
        graft.sink.TxTable.append(s,
          c.filter(col("doc_id") % 3 === i)
            .withColumn("date",
              lit(java.sql.Date.valueOf("2024-01-01"))), t)
      }
      val idxDir = s"$base/idx"
      val q = s.readStream.format("graft")
        .option("maxVersionsPerTrigger", "1").load(t)
        .writeStream.option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (df: DataFrame, _: Long) =>
          val banded = minhashBanded(
            shingles(df.select("doc_id", "text"))).persist()
          val matches =
            if (new java.io.File(idxDir).exists())
              banded.toDF("n_id", "band", "bh")
                .join(s.read.parquet(idxDir).toDF("c_id", "band2", "bh2"),
                  col("band") === col("band2") && col("bh") === col("bh2"))
                .select("n_id", "c_id").distinct()
            else banded.limit(0).select(col("doc_id").as("n_id"),
              col("doc_id").as("c_id"))
          matches.write.mode("append").parquet(s"$base/matches")
          banded.write.mode("append").parquet(idxDir)
          banded.unpersist()
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      s.read.parquet(s"$base/matches")
        .select(col("n_id").as("new_id"), col("c_id").as("idx_id"))
        .orderBy("new_id", "idx_id")
    }),

    // SimHash (60-bit: 15 md5 hex positions x 4 bits — wide enough for
    // production Hamming-distance thresholds while staying clear of the
    // int64 sign bit on both engines), one signature per doc. Single
    // per-doc pass, integer-only: each token's first 15 md5 hex chars
    // parse into ONE packed 60-bit long, the 60 bit-counts are plain
    // shiftright/&1 sums partial-aggregated map-side (no position/bit
    // row explode, no per-position string ops), and a bit sets when its
    // ones outnumber zeros (2·ones > n_tokens ⟺ Σ±1 > 0). The exchange
    // carries |docs| rows, not |tokens|×60.
    "qt_simhash" -> ((s, d) => {
      val toks = corpus(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .select(col("doc_id"),
          expr("CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT)").as("v"))
      // hex char p (0-based) has numeric weight 16^(14-p) in v, so bit b
      // of digit p sits at packed position (14-p)*4 + b; the signature
      // re-packs it at p*4 + b (same layout as the oracle's explode)
      val sums = (for { p <- 0 until 15; b <- 0 until 4 } yield
        sum(expr(s"shiftright(v, ${(14 - p) * 4 + b}) & 1"))
          .as(s"o_${p}_$b")) :+ count(lit(1)).as("nt")
      val packed = (for { p <- 0 until 15; b <- 0 until 4 } yield
        when(col(s"o_${p}_$b") * 2 > col("nt"), lit(1L << (p * 4 + b)))
          .otherwise(0L))
        .reduce(_ + _)
      toks.groupBy("doc_id").agg(sums.head, sums.tail: _*)
        .select(col("doc_id"), packed.as("simhash"))
        .orderBy("doc_id")
    }),

    // n-gram Jaccard near-dup via shingle blocking; exact integer scores.
    "qt_ngram_jaccard" -> ((s, d) =>
      jaccardPairs(s, d).orderBy("a_id", "b_id")),

    // the end-to-end corpus dedup DECISION: per doc, keep / drop-as-
    // exact-copy / drop-as-near-dup — the keeper-selection workflow a
    // training-data pipeline actually runs on top of the dedup
    // primitives. Pairwise greedy-by-id policy (a doc drops if a
    // smaller-id verified near-dup exists); exact beats near in the
    // cascade so byte-identical copies are attributed precisely.
    "qt_dedup_keep" -> ((s, d) => {
      val c = corpus(s, d)
      val hashes = c.select(col("doc_id"), md5(col("text")).as("h"))
      val keepers = hashes.groupBy("h").agg(min("doc_id").as("keeper"))
      val nearDrop = jaccardPairs(s, d)
        .select(col("b_id").as("doc_id")).distinct()
        .withColumn("is_near", lit(true))
      hashes.join(keepers, "h")
        .join(nearDrop, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          when(col("doc_id") =!= col("keeper"), "drop_exact")
            .when(col("is_near"), "drop_near")
            .otherwise("keep").as("decision"))
        .orderBy("doc_id")
    }),

    // document fingerprinting: bag-of-words fingerprint groups
    "qt_fingerprint" -> ((s, d) => {
      corpus(s, d)
        .withColumn("fp", md5(array_join(
          array_sort(array_distinct(split(col("text"), " "))), " ")))
        .groupBy("fp")
        .agg(min("doc_id").as("min_doc"), count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .orderBy("min_doc")
    }),

    // language-ID: stopword-lexicon scoring with deterministic argmax
    "qt_langid" -> ((s, d) => {
      import s.implicits._
      val lex = lexicon.toDF("lex_lang", "lex_word")
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      val scores = toks.join(broadcast(lex), col("t") === col("lex_word"))
        .groupBy("doc_id", "lex_lang").agg(count(lit(1)).as("hits"))
      val w = Window.partitionBy("doc_id")
        .orderBy(desc("hits"), asc("lex_lang"))
      scores.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lex_lang").as("pred_lang"), col("hits"))
        .orderBy("doc_id")
    }),

    // quality scoring: integer-exact length/diversity/stopword metrics
    "qt_quality" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"),
          length(col("text")).as("n_chars_q"),
          size(col("w")).as("n_tokens"),
          size(array_distinct(col("w"))).as("n_uniq"),
          expr("size(filter(w, t -> t IN ('the', 'a', 'of', 'and')))").as("stop_hits"))
        .withColumn("quality",
          when(col("n_tokens").between(20, 80) &&
            col("n_uniq") * 2 >= col("n_tokens"), "good").otherwise("bad"))
        .orderBy("doc_id")
    }),

    // Token-diversity quality filter (lexical-diversity analog of the
    // Gopher repetition rules), integer-exact so the oracle hash
    // matches: Simpson effective vocabulary n²/Σc² and type-token
    // ratio, both as integer divisions. ZERO shuffle: instead of the
    // (doc,token) groupBy×2 formulation (which exchanges |tokens|
    // rows), each doc's per-token counts come from one run-length pass
    // over its SORTED token array (runs of a sorted array ≡ frequency
    // table), folded by a codegen'd `aggregate` HOF — Σc² and the
    // distinct count accumulate in a 5-slot struct per row. At 100 TB
    // this is a pure map stage; the only exchange is the final sort.
    "qt_diversity" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("w", sort_array(split(col("text"), " ")))
        .withColumn("st", aggregate(
          col("w"),
          struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
            lit(0L).as("s2"), lit(0L).as("u"), lit(0L).as("n")),
          (acc, t) => struct(
            t.as("prev"),
            when(acc("prev").isNotNull && t === acc("prev"),
              acc("run") + 1L).otherwise(lit(1L)).as("run"),
            when(acc("prev").isNotNull && t =!= acc("prev"),
              acc("s2") + acc("run") * acc("run")).otherwise(acc("s2"))
              .as("s2"),
            when(acc("prev").isNull || t =!= acc("prev"), acc("u") + 1L)
              .otherwise(acc("u")).as("u"),
            (acc("n") + 1L).as("n")),
          acc => struct((acc("s2") + acc("run") * acc("run")).as("s2"),
            acc("u").as("u"), acc("n").as("n"))))
        .select(col("doc_id"),
          col("st.n").as("n_tok"), col("st.u").as("n_uniq"),
          col("st.s2").as("s2"),
          expr("st.n * st.n DIV st.s2").as("simpson_eff"),
          expr("100 * st.u DIV st.n").as("ttr_pct"),
          (expr("100 * st.u DIV st.n") >= 40).as("keep"))
        .orderBy("doc_id")
    }),

    // corpus-wide heavy hitters: top-k tokens by frequency. Partial
    // (map-side) counting keeps the exchange narrow; the final top-k is
    // a TakeOrderedAndProject, never a full sort of the vocabulary
    "qt_top_tokens" -> ((s, d) => {
      corpus(s, d)
        .select(explode(split(col("text"), " ")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("t")).limit(20)
    }),

    // REAL subword tokenization over a merge-list vocabulary: greedy
    // longest-match (the deterministic WordPiece-style inference pass a
    // learned BPE merge table collapses to), counted by a native
    // codegen'd expression carrying the vocab as a reference object —
    // the qt_tokens `bpe_ish` proxy upgraded to an actual vocabulary.
    "qt_bpe" -> ((s, d) => {
      import org.apache.spark.sql.GraftSqlBridge.{column, expression}
      val vocab = new graft.functions.BpeVocab(BPE_VOCAB)
      Tables.documents(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        column(graft.functions.BpeCount(expression(col("text")), vocab))
          .as("bpe_tokens"))
        .orderBy("doc_id")
    }),

    // dedup clusters: each doc labeled with its component's smallest
    // doc_id over the exact+near duplicate graph (see dedupComponents)
    "qt_dedup_cluster" -> ((s, d) =>
      dedupComponents(s, d)
        .select(col("id").as("doc_id"), col("comp").as("cluster"))
        .orderBy("doc_id")),

    // corpus-level boilerplate span removal (the C4-style repeated-span
    // scrub, reshaped for flat word streams): non-overlapping 5-word
    // spans, a span recurring in >= 2 DISTINCT docs is boilerplate, and
    // each doc reports its token count after dropping flagged spans.
    // Scale shape: the span-frequency groupBy shuffles md5 keys (fixed
    // width, partial-counted map-side), never raw span text.
    "qt_boilerplate" -> ((s, d) => {
      val c = corpus(s, d).withColumn("w", split(col("text"), " "))
      // spans feeds both the df aggregation and the flag join: persist
      // so the corpus is split+hashed once (same shared-lineage pattern
      // as jaccardPairs' shingle table), released at suite end
      val spans = graft.ops.CacheRegistry.track(
        c.filter(size(col("w")) >= 5)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, CAST(size(w) div 5 AS INT))," +
              " i -> md5(concat_ws(' ', slice(w, (i-1)*5 + 1, 5))))")).as("sph")))
      val boiler = spans
        .groupBy("sph").agg(countDistinct(col("doc_id")).as("span_df"))
        .filter(col("span_df") >= 2).select("sph")
      val flagged = spans.join(boiler, "sph")
        .groupBy("doc_id").agg(count(lit(1)).as("n_boiler"))
      c.select(col("doc_id"), size(col("w")).as("n_tokens"),
          expr("CAST(size(w) div 5 AS INT)").as("n_spans"))
        .join(flagged, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("n_tokens"), col("n_spans"),
          coalesce(col("n_boiler"), lit(0L)).cast("int").as("n_boiler"),
          (col("n_tokens") - lit(5) * coalesce(col("n_boiler"), lit(0L)))
            .cast("int").as("n_tokens_clean"))
        .orderBy("doc_id")
    }),

    // token counting: whitespace + alpha-run + char accounting
    "qt_tokens" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("ws_tokens"),
          size(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("alpha_tokens"),
          // BPE-ish: greedy fixed-width subword chunks as a cheap proxy
          // for a learned merge table (deterministic, engine-portable)
          size(expr("regexp_extract_all(text, '[a-z]{1,4}', 0)")).as("bpe_ish_tokens"),
          length(col("text")).as("n_chars_q"),
          (length(col("text")) -
            length(regexp_replace(col("text"), " ", ""))).as("n_spaces"))
        .orderBy("doc_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "qt_span_dedup" ->
      s"""WITH $corpusSql, words AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM corpus
         |), spans AS (
         |  SELECT doc_id, array_to_string(w[i:i+7], ' ') AS s
         |  FROM words, unnest(range(1, len(w) - 6)) AS t(i)
         |  WHERE len(w) >= 8
         |), dup AS (
         |  SELECT s FROM (
         |    SELECT s, COUNT(DISTINCT doc_id) AS nd FROM spans GROUP BY s)
         |  WHERE nd >= 2
         |), marked AS (
         |  SELECT spans.doc_id,
         |    CASE WHEN dup.s IS NULL THEN 0 ELSE 1 END AS d
         |  FROM spans LEFT JOIN dup ON spans.s = dup.s)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
         |  CAST(SUM(d) AS BIGINT) AS n_dup,
         |  CAST(CASE WHEN 2 * SUM(d) >= COUNT(*) THEN 1 ELSE 0 END
         |    AS INTEGER) AS drop_flag
         |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "qt_exact_dedup" ->
      s"""WITH $corpusSql
         |SELECT md5(text) AS h, CAST(MIN(doc_id) AS BIGINT) AS keeper,
         |  CAST(COUNT(*) AS BIGINT) AS n_copies
         |FROM corpus GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY keeper""".stripMargin,
    "qt_minhash_lsh" ->
      s"""WITH $corpusSql, $shinglesSql, ${minhashBandedSql()}
         |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |ORDER BY a_id, b_id""".stripMargin,
    // keep-first per sentence, rebuild in order, md5 the result
    "qt_sentence_dedup" ->
      s"""WITH $corpusSql, sent AS (
         |  SELECT doc_id, i - 1 AS pos, s FROM (
         |    SELECT doc_id, generate_subscripts(parts, 1) AS i,
         |      unnest(parts) AS s
         |    FROM (SELECT doc_id, string_split(text, '. ') AS parts
         |          FROM corpus))
         |  WHERE len(s) > 0),
         |kept AS (
         |  SELECT doc_id, pos, s FROM (
         |    SELECT doc_id, pos, s, ROW_NUMBER() OVER (
         |      PARTITION BY s ORDER BY doc_id, pos) AS rn FROM sent)
         |  WHERE rn = 1)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |  md5(string_agg(s, '. ' ORDER BY pos)) AS text_md5
         |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // exact per-decile detection curve: intersecting pairs over the
    // df-capped shingle universe vs the banded candidate set
    "qt_lsh_eval" -> lshEvalOracle(corpusSql),
    "qt_lsh_eval_sample" -> lshEvalOracle(corpusSampleSql),
    "qt_incr_dedup" ->
      s"""WITH $corpusSql, $shinglesSql, ${minhashBandedSql()}
         |SELECT n.doc_id AS doc_id,
         |  CAST(COUNT(DISTINCT c.doc_id) AS BIGINT) AS n_corpus_matches,
         |  CAST(MIN(c.doc_id) AS BIGINT) AS first_match
         |FROM banded n JOIN banded c
         |  ON n.band = c.band AND n.bh = c.bh
         |  AND n.doc_id % 5 <> 0 AND c.doc_id % 5 = 0
         |GROUP BY n.doc_id ORDER BY doc_id""".stripMargin,
    // closed-form replay of the streamed index build: a pair matches
    // iff its docs share a band-hash and arrived in DIFFERENT commits,
    // the new side strictly later
    "qs_incr_dedup" ->
      s"""WITH $corpusSql, $shinglesSql, ${minhashBandedSql()},
         |b2 AS (SELECT doc_id, band, bh, doc_id % 3 AS batch FROM banded)
         |SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS idx_id
         |FROM b2 a JOIN b2 b
         |  ON a.band = b.band AND a.bh = b.bh AND a.batch > b.batch
         |ORDER BY new_id, idx_id""".stripMargin,
    "qt_simhash" ->
      s"""WITH $corpusSql, toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM corpus
         |), hashed AS (
         |  SELECT doc_id, md5(t) AS h FROM toks
         |), bits AS (
         |  SELECT doc_id, p, b,
         |    CASE WHEN ((strpos('0123456789abcdef', substr(h, p + 1, 1)) - 1)
         |      // CAST(pow(2, b) AS INTEGER)) % 2 = 1 THEN 1 ELSE -1 END AS w
         |  FROM hashed
         |  CROSS JOIN (SELECT unnest(range(15)) AS p) ps
         |  CROSS JOIN (SELECT unnest(range(4)) AS b) bs
         |), sums AS (
         |  SELECT doc_id, p, b, SUM(w) AS sw FROM bits GROUP BY doc_id, p, b)
         |SELECT doc_id, CAST(SUM(CASE WHEN sw > 0
         |    THEN CAST(1 AS BIGINT) << (p * 4 + b) ELSE 0 END) AS BIGINT) AS simhash
         |FROM sums GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "qt_ngram_jaccard" ->
      s"""WITH $corpusSql, $shinglesSql, dfreq AS (
         |  SELECT s, COUNT(*) AS df FROM sh GROUP BY s
         |), shr AS (
         |  SELECT sh.doc_id, sh.s FROM sh
         |  JOIN dfreq ON sh.s = dfreq.s WHERE dfreq.df <= $MAX_SHINGLE_DF
         |), sizes AS (
         |  SELECT doc_id, COUNT(*) AS n FROM shr GROUP BY doc_id
         |), ij AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i_n
         |  FROM shr a JOIN shr b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT a_id, b_id, CAST(i_n AS BIGINT) AS inter,
         |  CAST(na.n + nb.n - i_n AS BIGINT) AS union_n
         |FROM ij
         |JOIN sizes na ON ij.a_id = na.doc_id
         |JOIN sizes nb ON ij.b_id = nb.doc_id
         |WHERE i_n * 2 >= na.n + nb.n - i_n
         |ORDER BY a_id, b_id""".stripMargin,
    "qt_dedup_keep" ->
      s"""WITH $corpusSql, $shinglesSql, dfreq AS (
         |  SELECT s, COUNT(*) AS df FROM sh GROUP BY s
         |), shr AS (
         |  SELECT sh.doc_id, sh.s FROM sh
         |  JOIN dfreq ON sh.s = dfreq.s WHERE dfreq.df <= $MAX_SHINGLE_DF
         |), sizes AS (
         |  SELECT doc_id, COUNT(*) AS n FROM shr GROUP BY doc_id
         |), ij AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i_n
         |  FROM shr a JOIN shr b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), near AS (
         |  SELECT DISTINCT b_id FROM ij
         |  JOIN sizes na ON ij.a_id = na.doc_id
         |  JOIN sizes nb ON ij.b_id = nb.doc_id
         |  WHERE i_n * 2 >= na.n + nb.n - i_n
         |), exacth AS (
         |  SELECT doc_id, md5(text) AS h FROM corpus
         |), keepers AS (
         |  SELECT h, MIN(doc_id) AS keeper FROM exacth GROUP BY h)
         |SELECT e.doc_id,
         |  CASE WHEN e.doc_id <> k.keeper THEN 'drop_exact'
         |       WHEN e.doc_id IN (SELECT b_id FROM near) THEN 'drop_near'
         |       ELSE 'keep' END AS decision
         |FROM exacth e JOIN keepers k ON e.h = k.h
         |ORDER BY e.doc_id""".stripMargin,
    "qt_fingerprint" ->
      s"""WITH $corpusSql
         |SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
         |  CAST(MIN(doc_id) AS BIGINT) AS min_doc, CAST(COUNT(*) AS BIGINT) AS n
         |FROM corpus GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY min_doc""".stripMargin,
    "qt_langid" ->
      s"""WITH $lexiconSql, toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
         |), scores AS (
         |  SELECT doc_id, lex_lang, COUNT(*) AS hits
         |  FROM toks JOIN lexicon ON t = lex_word
         |  GROUP BY doc_id, lex_lang
         |), ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |    ORDER BY hits DESC, lex_lang) AS rn FROM scores)
         |SELECT doc_id, lex_lang AS pred_lang, CAST(hits AS BIGINT) AS hits
         |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "qt_quality" ->
      """SELECT doc_id,
        |  CAST(LENGTH(text) AS INTEGER) AS n_chars_q,
        |  CAST(LEN(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  CAST(LEN(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_uniq,
        |  CAST(LEN(list_filter(string_split(text, ' '),
        |    t -> t IN ('the', 'a', 'of', 'and'))) AS INTEGER) AS stop_hits,
        |  CASE WHEN LEN(string_split(text, ' ')) BETWEEN 20 AND 80
        |    AND LEN(list_distinct(string_split(text, ' '))) * 2 >= LEN(string_split(text, ' '))
        |    THEN 'good' ELSE 'bad' END AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    // frequency-table formulation — provably equal to the Spark side's
    // run-length fold over the sorted token array (runs of a sorted
    // array ARE the frequency table)
    "qt_diversity" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
        |), cnt AS (
        |  SELECT doc_id, t, COUNT(*) AS c FROM toks GROUP BY doc_id, t
        |), agg AS (
        |  SELECT doc_id, SUM(c) AS n_tok, COUNT(*) AS n_uniq,
        |    SUM(c*c) AS s2 FROM cnt GROUP BY doc_id)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
        |  CAST(n_uniq AS BIGINT) AS n_uniq, CAST(s2 AS BIGINT) AS s2,
        |  CAST(n_tok*n_tok // s2 AS BIGINT) AS simpson_eff,
        |  CAST(100*n_uniq // n_tok AS BIGINT) AS ttr_pct,
        |  (100*n_uniq // n_tok) >= 40 AS keep
        |FROM agg ORDER BY doc_id""".stripMargin,
    "qt_top_tokens" ->
      s"""WITH $corpusSql, toks AS (
         |  SELECT unnest(string_split(text, ' ')) AS t FROM corpus)
         |SELECT t, CAST(COUNT(*) AS BIGINT) AS n
         |FROM toks GROUP BY t ORDER BY n DESC, t LIMIT 20""".stripMargin,
    // greedy longest-match tokenization as a recursive CTE: each word
    // walks position -> position + longest vocab match (else 1),
    // terminal states carry the word's token count
    "qt_bpe" -> {
      val values = BPE_VOCAB
        .map(f => s"('$f', ${f.length})").mkString(", ")
      s"""WITH RECURSIVE vocab(v, l) AS (
         |  VALUES $values
         |), words AS (
         |  SELECT doc_id, ROW_NUMBER() OVER () AS wid, w
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |        FROM documents)
         |), step(doc_id, wid, w, pos, cnt) AS (
         |  SELECT doc_id, wid, w, 1, 0 FROM words
         |  UNION ALL
         |  SELECT doc_id, wid, w,
         |    pos + COALESCE((SELECT MAX(l) FROM vocab
         |                    WHERE substr(w, pos, l) = v), 1),
         |    cnt + 1
         |  FROM step WHERE pos <= LEN(w)
         |), fin AS (
         |  SELECT doc_id, SUM(cnt) AS s
         |  FROM step WHERE pos > LEN(w) GROUP BY doc_id
         |)
         |SELECT d.doc_id,
         |  CAST(LEN(string_split(d.text, ' ')) AS INTEGER) AS ws_tokens,
         |  CAST(COALESCE(f.s, 0) AS INTEGER) AS bpe_tokens
         |FROM documents d LEFT JOIN fin f ON d.doc_id = f.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },
    // transitive closure over the symmetric dup graph: reach(x, r) =
    // "r reaches x"; MIN(r) per x is the component's smallest id
    "qt_dedup_cluster" ->
      s"""WITH RECURSIVE $corpusSql, $shinglesSql, dfreq AS (
         |  SELECT s, COUNT(*) AS df FROM sh GROUP BY s
         |), shr AS (
         |  SELECT sh.doc_id, sh.s FROM sh
         |  JOIN dfreq ON sh.s = dfreq.s WHERE dfreq.df <= $MAX_SHINGLE_DF
         |), sizes AS (
         |  SELECT doc_id, COUNT(*) AS n FROM shr GROUP BY doc_id
         |), ij AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i_n
         |  FROM shr a JOIN shr b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), near AS (
         |  SELECT a_id AS a, b_id AS b FROM ij
         |  JOIN sizes na ON ij.a_id = na.doc_id
         |  JOIN sizes nb ON ij.b_id = nb.doc_id
         |  WHERE i_n * 2 >= na.n + nb.n - i_n
         |), exacth AS (
         |  SELECT doc_id, md5(text) AS h FROM corpus
         |), exact_e AS (
         |  SELECT k.k AS a, e.doc_id AS b FROM exacth e
         |  JOIN (SELECT h, MIN(doc_id) AS k FROM exacth GROUP BY h) k
         |    ON e.h = k.h
         |  WHERE e.doc_id <> k.k
         |), edges AS (
         |  SELECT a, b FROM exact_e UNION SELECT a, b FROM near
         |), sym AS (
         |  SELECT a, b FROM edges UNION SELECT b, a FROM edges
         |), reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM corpus
         |  UNION
         |  SELECT s2.b, reach.r FROM reach JOIN sym s2 ON s2.a = reach.id
         |)
         |SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    "qt_boilerplate" ->
      s"""WITH $corpusSql, wd AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM corpus
         |), spans AS (
         |  SELECT doc_id, unnest(list_transform(
         |    range(1, CAST(len(w) // 5 AS BIGINT) + 1),
         |    i -> md5(array_to_string(w[(i-1)*5 + 1 : (i-1)*5 + 5], ' ')))) AS sph
         |  FROM wd WHERE len(w) >= 5
         |), sdf AS (
         |  SELECT sph FROM spans GROUP BY sph
         |  HAVING COUNT(DISTINCT doc_id) >= 2
         |), flagged AS (
         |  SELECT s.doc_id, COUNT(*) AS n_boiler
         |  FROM spans s JOIN sdf ON s.sph = sdf.sph
         |  GROUP BY s.doc_id
         |)
         |SELECT c.doc_id, CAST(len(c.w) AS INTEGER) AS n_tokens,
         |  CAST(len(c.w) // 5 AS INTEGER) AS n_spans,
         |  CAST(COALESCE(f.n_boiler, 0) AS INTEGER) AS n_boiler,
         |  CAST(len(c.w) - 5 * COALESCE(f.n_boiler, 0) AS INTEGER)
         |    AS n_tokens_clean
         |FROM wd c LEFT JOIN flagged f ON c.doc_id = f.doc_id
         |ORDER BY c.doc_id""".stripMargin,
    "qt_tokens" ->
      """SELECT doc_id,
        |  CAST(LEN(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
        |  CAST(LEN(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS alpha_tokens,
        |  CAST(LEN(regexp_extract_all(text, '[a-z]{1,4}')) AS INTEGER) AS bpe_ish_tokens,
        |  CAST(LENGTH(text) AS INTEGER) AS n_chars_q,
        |  CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS INTEGER) AS n_spaces
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
