package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data WORKFLOW operators — the steps between "deduped corpus"
  * and "training shards" that every large-scale pipeline runs: dataset
  * splitting, stratified sampling, context-window chunking, PII
  * redaction, TF-IDF term scoring, and inverted-index construction.
  *
  * Determinism rules (same as TextQueries): all randomness is md5-keyed
  * (identical hex in the JVM and DuckDB), similarity/importance scores
  * are integer-quantized with integer division (`div`), and every query
  * ends in a total ORDER BY — so each hash-matches the oracle
  * bit-for-bit.
  *
  * Scale shapes (100 TB corpus):
  *  - split/sample/redact/chunk are pure per-row projections or
  *    generators — zero shuffles, fully whole-stage-codegen'd, and
  *    embarrassingly parallel at any scale;
  *  - hash-keyed splitting is the ONLY split that stays stable when the
  *    corpus is re-partitioned, re-ordered, or incrementally extended —
  *    row_number-based splits silently reshuffle membership on every
  *    ingest, leaking val/test docs into train across runs;
  *  - tf-idf / inverted index shuffle (doc_id, term) and term keys —
  *    both partial-aggregate map-side so the exchanges carry counts,
  *    not token instances; the df table is vocabulary-sized. The
  *    posting-list query enforces df ≤ 20 with a count-only first pass
  *    and a semi-join BELOW the list aggregation, so no reducer ever
  *    builds a stopword's corpus-length posting array (the classic
  *    inverted-index OOM) — plan-audited in PlanAuditSpec.
  */
object PipelineQueries {

  /** Distinct 3-gram shingle hashes per doc — the shared contamination
    * fingerprint for qp_decontam / qp_bloom_decontam. Pure per-row
    * generator (zero shuffle until a consumer aggregates).
    */
  private def docShingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(1, size(w) - 2), i -> md5(concat_ws(' '," +
          " element_at(w,i), element_at(w,i+1), element_at(w,i+2))))")))
        .as("sh"))

  /** Deterministic unit-interval draw from a salted doc_id: the first 2
    * hex chars of md5 give 256 evenly-distributed buckets; comparing
    * against a hex threshold keeps ALL the math in string space —
    * identical bits in both engines, no int parsing.
    */
  private def hashBucket(salt: String) =
    substring(md5(concat(lit(salt), col("doc_id").cast("string"))), 1, 2)

  // train < 'cc' (204/256 ~ 80%) <= val < 'e6' (230/256 ~ 90%) <= test
  private val TrainThr = "cc"
  private val ValThr = "e6"

  // per-stratum sampling thresholds: en is downsampled harder than the
  // tail languages (128/256 = 50% vs 64/256 = 25%)
  private val EnThr = "80"
  private val OtherThr = "40"

  // context-window chunking: 200-char windows, 50-char overlap
  private val ChunkLen = 200
  private val Stride = 150

  private val EmailRe = "[a-z0-9.]+@[a-z0-9.]+\\.[a-z]+"
  private val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  // per-domain document cap (URL-dedup domain cap analog)
  private val DomainCap = 15
  // rarity filter: drop docs whose mean token rarity is extreme
  private val RarityThr = 40L
  // rarity vocabulary cap: only the top-K tokens by corpus count ride
  // the broadcast; everything in the long tail gets the saturated
  // default rarity (count 1). A 100 TB web corpus has a billion-token
  // long tail — broadcasting the full distinct-token table is a driver/
  // executor OOM, and semantically the tail saturates the score anyway
  // (a hapax and a 5-count typo both read "maximally rare"). Production
  // K is ~64k-1M; 24 here so the tail arm is genuinely exercised by the
  // gate at every SF (the synthetic corpus has 31 distinct tokens)
  private val RarityVocabK = 24

  // bigram LM filter: pruned-model size + keep threshold (milli-prob;
  // splits the corpus ~60/40 at every SF so the decision column
  // actually discriminates)
  private val BigramK = 64
  private val BigramThr = 4

  // sequence packing: token budget per training sequence
  private val PackBudget = 512
  // sequence packing: target tokens per PACK SHARD (the partition-bytes
  // knob, in token units — tokens are what packing actually allocates).
  // The shard count DERIVES from corpus size: ceil(total_tokens / this),
  // so a 100 TB corpus fans out to ~|corpus|/budget parallel pack
  // streams instead of serializing through a fixed 16. 2048 keeps the
  // test corpus multi-shard at every SF; production would be O(10^8+)
  // (one output shard ≈ one training file)
  private val PackShardTokens = 2048L
  // repetition filter: keep docs with < 15% duplicated 5-grams
  private val RepThr = 1500

  /** Corpus with deterministic PII injected into every 4th doc — gives
    * the redaction operator real positives (the synthetic lorem text
    * contains none) while staying DuckDB-reproducible.
    */
  private def piiCorpus(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      when(col("doc_id") % 4 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or call 555-123-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(col("text")).as("text"))

  private val piiCorpusSql =
    """pii AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 4 = 0 THEN
      |      text || ' contact user' || CAST(doc_id AS VARCHAR) ||
      |        '@example.com or call 555-123-' ||
      |        lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |    ELSE text END AS text
      |  FROM documents
      |)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // hash-keyed train/val/test assignment (~80/10/10): membership is a
    // pure function of doc_id, so it survives repartitioning and
    // incremental corpus growth — the property row_number splits lack
    "qp_split" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), hashBucket("split|").as("hb"))
        .select(col("doc_id"),
          when(col("hb") < TrainThr, "train")
            .when(col("hb") < ValThr, "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    }),

    // stratified Bernoulli sample with per-stratum rates (en 50%, tail
    // languages 25%) — the domain-rebalancing step of a data mix; output
    // is the sample itself
    "qp_sample" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), hashBucket("sample|").as("hb"),
          when(col("lang") === "en", EnThr).otherwise(OtherThr).as("thr"))
        .filter(col("hb") < col("thr"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // DETERMINISTIC EPOCH SHUFFLE + SHARDING — the training-loader
    // contract: every epoch visits every doc exactly once in a
    // pseudorandom order that is a pure function of (seed, doc_id), so
    // any worker can recompute its shard's order with zero
    // coordination, resume mid-epoch, and epoch 2 differs from epoch 1.
    // Shard = hash mod nShards (embarrassingly parallel, no global
    // sort); within-shard order = the hash (a range sort per shard).
    // The order is PINNED by order_sig = Σ position·doc_id — any
    // permutation difference moves it. Knuth multiplicative hashing
    // keeps the oracle exact (pure BIGINT arithmetic on both engines).
    "qp_epoch_shuffle" -> ((s, d) => {
      val nShards = 8
      val epochs = Seq(1, 2).map(e =>
        Tables.documents(s, d).select(
          lit(e).as("epoch"), col("doc_id"),
          ((col("doc_id") * 2654435761L + e * 40503L) % 1000000007L)
            .as("skey")))
        .reduce(_ unionByName _)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("epoch", "shard").orderBy("skey", "doc_id")
      epochs
        .withColumn("shard", pmod(col("skey"), lit(nShards)))
        .withColumn("pos", row_number().over(w).cast("long"))
        .groupBy("epoch", "shard")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("doc_sum"),
          sum(col("pos") * col("doc_id")).as("order_sig"))
        .orderBy("epoch", "shard")
    }),

    // fixed-size context-window chunking with overlap: 200-char windows
    // every 150 chars (50-char overlap), short docs yield one chunk.
    // A generator explode per row — narrow, no shuffle
    "qp_chunk" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"), length(col("text")).as("len"))
        .withColumn("n_chunks", expr(
          s"CAST(1 + (CAST(greatest(len - $ChunkLen, 0) AS BIGINT) + ${Stride - 1}) div $Stride AS INT)"))
        .select(col("doc_id"), col("text"),
          explode(expr("sequence(0, n_chunks - 1)")).as("ci"))
        .select(col("doc_id"), col("ci").cast("int").as("chunk_idx"),
          (col("ci") * Stride + 1).cast("int").as("chunk_start"),
          length(expr(s"substring(text, ci * $Stride + 1, $ChunkLen)"))
            .as("chunk_len"),
          md5(expr(s"substring(text, ci * $Stride + 1, $ChunkLen)"))
            .as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // PII redaction: count + scrub emails and phone numbers (simple
    // portable character-class regexes — Java and RE2 agree on these).
    // Redacted text is reported as md5 + length so the gate checks the
    // FULL scrubbed string without shipping it
    "qp_redact" -> ((s, d) => {
      val red = regexp_replace(
        regexp_replace(col("text"), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>")
      piiCorpus(s, d)
        .select(col("doc_id"),
          size(expr(s"regexp_extract_all(text, '$EmailRe', 0)")).as("n_emails"),
          size(expr(s"regexp_extract_all(text, '$PhoneRe', 0)")).as("n_phones"),
          md5(red).as("redacted_md5"),
          length(red).as("redacted_len"))
        .orderBy("doc_id")
    }),

    // TF-IDF top-3 terms per doc. Importance is integer-quantized as
    // tf * N * 10000 div df — monotone in tf·(N/df), exact in both
    // engines (no log, no float division). tf/df aggregations are
    // partial-aggregated; N is a 1-row broadcast
    "qp_tfidf" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      val tf = toks.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("t").agg(count(lit(1)).as("df"))
      val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("doc_id").orderBy(desc("score_q"), asc("t"))
      tf.join(dfreq, "t").crossJoin(broadcast(n))
        .withColumn("score_q", expr("tf * n_docs * 10000 div df"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("t").as("term"), col("tf"), col("df"),
          col("score_q"), col("rnk"))
        .orderBy("doc_id", "rnk")
    }),

    // data-mixture rebalancing: downsample each language toward an
    // equal per-language TOKEN budget (the "data mix" step that decides
    // what a model trains on). Unlike qp_sample's fixed rates, the
    // acceptance thresholds here are DATA-DERIVED: two partial-agg
    // passes produce per-language token totals, the fair-share math
    // happens on a broadcast vocabulary-sized frame, and membership is
    // again a pure md5 function of doc_id — so the 100 TB corpus is
    // filtered by one projection against a broadcast threshold map,
    // with no shuffle of fact rows at all
    "qp_mix" -> ((s, d) => {
      val toks = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      val byLang = toks.groupBy("lang").agg(sum("n_tok").as("lang_tok"))
      val tot = byLang.agg(sum("lang_tok").as("tot"),
        count(lit(1)).as("nl"))
      val thr = byLang.crossJoin(broadcast(tot))
        .withColumn("acc256",
          least(lit(256L), expr("tot div nl * 256 div lang_tok")))
        .select(col("lang"), col("acc256"))
      toks.join(broadcast(thr), "lang")
        .withColumn("hb", hashBucket("mix|"))
        .filter(col("acc256") === 256 ||
          col("hb") < format_string("%02x", col("acc256")))
        .select("doc_id", "lang", "n_tok")
        .orderBy("doc_id")
    }),

    // sequence packing: the shard-building step that turns chunks into
    // fixed-token-budget training sequences ("concatenate then cut").
    // Docs are laid end-to-end in deterministic (shard, doc_id) order;
    // each doc's sequence id / offset is a pure function of the running
    // token count BEFORE it. The window partitions by a shard key, so
    // the running sum parallelizes across shards (a single global
    // cumsum would serialize 100 TB through one partition — per-shard
    // packing is also what a real loader does, one pack stream per
    // output shard). The shard COUNT is data-derived from total corpus
    // tokens against [[PackShardTokens]] (a 1-row broadcast — no fact
    // shuffle), so the fan-out scales with the corpus instead of
    // pinning 100 TB onto 16 windows
    "qp_pack" -> ((s, d) => {
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val ns = toks.agg(greatest(lit(1L), expr(
        s"(sum(n_tok) + ${PackShardTokens - 1}) div $PackShardTokens"))
        .as("n_shards"))
      toks.crossJoin(broadcast(ns))
        .select(col("doc_id"),
          (col("doc_id") % col("n_shards")).cast("int").as("shard"),
          col("n_tok"))
        .withColumn("cum", sum("n_tok").over(w))
        .select(col("doc_id"), col("shard"), col("n_tok"),
          expr(s"(cum - n_tok) div $PackBudget").as("seq_id"),
          expr(s"(cum - n_tok) % $PackBudget").as("seq_off"))
        .orderBy("doc_id")
    }),

    // repetition filter (Gopher-style quality signal): the fraction of
    // duplicated word 5-grams per document. Entirely higher-order array
    // functions — per-row, zero shuffle, whole-stage codegen; at 100 TB
    // this runs at scan speed, which is why repetition filters are the
    // first pass of every corpus pipeline
    "qp_repetition" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("w", split(col("text"), " "))
        .filter(size(col("w")) >= 5)
        .withColumn("g", expr(
          "transform(sequence(1, size(w) - 4), i -> concat_ws(' '," +
            " element_at(w,i), element_at(w,i+1), element_at(w,i+2)," +
            " element_at(w,i+3), element_at(w,i+4)))"))
        .select(col("doc_id"),
          size(col("g")).cast("long").as("n_grams"),
          (size(col("g")) - size(array_distinct(col("g"))))
            .cast("long").as("n_dup"))
        .withColumn("dup_q", expr("n_dup * 10000 div n_grams"))
        .withColumn("keep", col("dup_q") < RepThr)
        .orderBy("doc_id")
    }),

    // benchmark decontamination: training docs sharing any word 3-gram
    // shingle with the held-out benchmark slice (doc_id % 97 — the eval
    // set a real pipeline must scrub from train). Shingles are md5'd to
    // fixed width before the join; the benchmark side is tiny by
    // construction (|corpus|/97), so Spark broadcasts it and the train
    // side never shuffles — decontamination at 100 TB is a broadcast
    // join, not an exchange
    "qp_decontam" -> ((s, d) => {
      val sh = docShingles(s, d)
      val bench = sh.filter(col("doc_id") % 97 === 0)
        .select(col("sh"), col("doc_id").as("bench_id")).distinct()
      sh.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(countDistinct("sh").as("n_shared"),
          countDistinct("bench_id").as("n_bench_docs"))
        .orderBy("doc_id")
    }),

    // Bloom-prefiltered decontamination — the runtime-filter shape
    // Spark's own InjectRuntimeFilter uses, made explicit as an
    // operator: build a Bloom filter over the (small, fixed) benchmark
    // shingle set once, prefilter the TRAIN side's shingles with a
    // codegen-adjacent membership probe BEFORE any exchange, then
    // exact-join only the survivors to eliminate false positives.
    // Output is provably identical to qp_decontam (same oracle): the
    // bloom admits every true member (no false negatives by
    // construction) and the exact join removes the ~fpp of impostors.
    // At 100 TB this is the difference between shuffling every train
    // shingle into the join and shuffling ~0.1% of them: the bloom is
    // built from the benchmark side (bounded — benchmark suites don't
    // grow with the corpus), ships once per executor, and the fact-side
    // scan stays a pure map stage until after 99%+ of rows are gone.
    // PipelineOpsSpec asserts the no-false-negative property and the
    // bloom-path ≡ exact-path equality on real data.
    "qp_bloom_decontam" -> ((s, d) => {
      val sh = docShingles(s, d)
      val bench = graft.ops.CacheRegistry.track(
        sh.filter(col("doc_id") % 97 === 0)
          .select(col("sh"), col("doc_id").as("bench_id")).distinct())
      // sizing action + bloom build are both benchmark-side jobs —
      // metadata-scale, and served from the cached bench frame. The
      // filter is built by Spark's own BloomFilterAggregate over
      // xxhash64(sh) and probed by the codegen'd
      // BloomFilterMightContain — the exact (build, probe) pair
      // InjectRuntimeFilter plants, so the probe stays inside
      // whole-stage codegen instead of boxing through a ScalaUDF
      // (PlanAuditSpec asserts no UDF in this plan)
      import org.apache.spark.sql.GraftSqlBridge.{column => colOf, expression => exprOf}
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal => CatLit, XxHash64}
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      val nBench = math.max(bench.count(), 1000L)
      // optimal bit count for fpp=0.01 at nBench items (ln2-squared law)
      val nBits = math.ceil(
        -nBench * math.log(0.01) / (math.log(2) * math.log(2))).toLong
      val bloomBytes = bench.select(colOf(new BloomFilterAggregate(
          XxHash64(Seq(exprOf(col("sh"))), 42L),
          CatLit(nBench), CatLit(nBits)).toAggregateExpression()))
        .head().getAs[Array[Byte]](0)
      val mightContain = colOf(BloomFilterMightContain(
        CatLit(bloomBytes,
          org.apache.spark.sql.types.BinaryType),
        XxHash64(Seq(exprOf(col("sh"))), 42L)))
      sh.filter(col("doc_id") % 97 =!= 0)
        .filter(mightContain)
        .join(broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(countDistinct("sh").as("n_shared"),
          countDistinct("bench_id").as("n_bench_docs"))
        .orderBy("doc_id")
    }),

    // per-domain cap (the URL/domain-cap pass of a web-corpus pipeline:
    // no single site may contribute more than K documents). Survivors
    // are chosen by md5 order, NOT ingest order, so the kept set is a
    // pure function of (doc_id, source) — stable under repartitioning
    // and incremental crawls. One shuffle on the domain key; the window
    // only ranks WITHIN a domain, so partitions stay balanced unless one
    // domain dominates the corpus — the skew arm for that case is
    // `graft.ops.Salting.saltedCap` (two-phase cap-then-union per salt
    // lane), proven row-identical to this plain window in SaltingSpec
    "qp_domain_cap" -> ((s, d) => {
      val w = Window.partitionBy("source")
        .orderBy(asc("pick"), asc("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          md5(concat(lit("cap|"), col("doc_id").cast("string"))).as("pick"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= DomainCap)
        .select(col("doc_id"), col("source"), col("rnk"))
        .orderBy("doc_id")
    }),

    // unigram-rarity quality score — the integer-exact analog of a
    // CCNet-style LM-perplexity filter: rare-token-heavy documents score
    // high (gibberish/boilerplate outliers), common-token documents
    // score low. rarity(t) = N div count(t) (corpus-trained unigram
    // "surprisal" without the log), doc score = mean token rarity.
    // The broadcast build side is the top-[[RarityVocabK]] tokens by
    // count — BOUNDED at any corpus size (see the constant's comment);
    // tail tokens fall out of the left-outer join and take the
    // saturated default rarity N div 1. The fact side then
    // partial-aggregates (doc_id sums) below its single exchange, so at
    // 100 TB the token instances never shuffle — same shape as qp_tfidf
    // Bigram-LM quality filter — the CCNet/KenLM "perplexity filter"
    // one level up from qp_rarity's unigram: each document is scored by
    // the average conditional probability p(w2|w1) of its bigrams under
    // a PRUNED model trained on the corpus itself. Integer-exact for
    // the oracle: q(b) = 1000·c(w1w2) ÷ c(w1·) for the top-K bigrams
    // (count-desc, pair-asc tie-break), 0 for the unseen tail — the
    // saturated-default trick that keeps the model broadcastable at any
    // corpus size (production KenLM models are pruned the same way).
    // Scale shape: pair counts partial-aggregate map-side (the exchange
    // carries |bigram types|, vocabulary²-bounded and Zipf-light, not
    // |tokens|); the model is ≤K rows broadcast; the fact side is one
    // generator pass + a per-doc aggregation.
    "qp_bigram_lm" -> ((s, d) => {
      val bg = Tables.documents(s, d)
        .withColumn("w", split(col("text"), " "))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(w) - 1), i -> " +
            "struct(element_at(w,i) AS w1, element_at(w,i+1) AS w2))"))
          .as("p"))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      val pairCnt = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val topk = pairCnt
        .orderBy(desc("c12"), asc("w1"), asc("w2")).limit(BigramK)
      val pred = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
      val model = topk.join(pred, "w1")
        .select(col("w1"), col("w2"), expr("1000 * c12 DIV c1").as("q"))
      bg.join(broadcast(model), Seq("w1", "w2"), "left_outer")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(coalesce(col("q"), lit(0L))).as("q_sum"))
        .withColumn("score_q", expr("q_sum DIV n_bigrams"))
        .withColumn("keep", col("score_q") >= BigramThr)
        .orderBy("doc_id")
    }),

    "qp_rarity" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      val topk = toks.groupBy("t").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("t")).limit(RarityVocabK)
      val n = toks.agg(count(lit(1)).as("n_total"))
      toks.join(broadcast(topk), Seq("t"), "left_outer")
        .crossJoin(broadcast(n))
        .withColumn("rarity", expr("n_total div coalesce(cnt, 1)"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"), sum("rarity").as("rar_sum"))
        .withColumn("score_q", expr("rar_sum div n_tok"))
        .withColumn("keep", col("score_q") < RarityThr)
        .orderBy("doc_id")
    }),

    // inverted index over mid-frequency BIGRAM phrases (2 <= df <= 20):
    // sorted posting lists. Bigrams (not unigrams) because a posting
    // list is only useful for selective terms. TWO-PASS so the df bound
    // is enforced BEFORE any posting array exists: pass 1 is a pure
    // count aggregation (narrow shuffle of fixed-width counts), whose
    // mid-df survivors semi-join the (doc, term) stream, and only the
    // surviving rows reach collect_list — a stopword-grade bigram
    // ("of the", df in the billions at 100 TB) is pruned at the join
    // and never materializes a corpus-length array in any reducer
    // buffer (the classic inverted-index OOM). Per-doc dedup happens
    // BEFORE the explode (array_distinct), so post-join count(1) per
    // term IS df. The bigram stream is recomputed for pass 2 rather
    // than cached — scan+split+explode is narrow and runs at scan
    // URL canonicalization + dedup — the CommonCrawl/C4 staple: crawl
    // URLs arrive with mixed-case scheme/host, explicit default ports,
    // tracking params (utm_*/fbclid), fragments, and trailing slashes;
    // five deterministic rewrites produce the canonical form and dedup
    // keeps the lowest doc_id per canonical URL. Raw URLs are
    // synthesized per doc (the corpus's `source` isn't a URL), spread
    // across 4 variants so every rewrite has real work. Scale shape:
    // canonicalization is a pure codegen'd per-row projection; the
    // dedup is ONE hash exchange on the canonical key with map-side
    // partial aggregation — at 100 TB nothing else moves.
    "qp_url_dedup" -> ((s, d) => {
      val host = (col("doc_id") % 7).cast("string")
      val pid = (col("doc_id") % 50).cast("string")
      val raw = when(col("doc_id") % 4 === 0,
          concat(lit("https://Example"), host, lit(".COM:443/path/"), pid,
            lit("?utm_source=x&id="), pid))
        .when(col("doc_id") % 4 === 1,
          concat(lit("HTTPS://example"), host, lit(".com/path/"), pid,
            lit("?id="), pid, lit("#frag")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("https://example"), host, lit(".com/path/"), pid,
            lit("/?id="), pid))
        .otherwise(
          concat(lit("http://example"), host, lit(".com:80/path/"), pid,
            lit("?id="), pid, lit("&utm_campaign=y")))
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.ops.UrlOps.canonicalizeUrl(raw).as("url"))
        .groupBy("url")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
        .orderBy("url")
    }),

    // speed, which beats pinning a token-instance table at corpus scale
    "qp_invindex" -> ((s, d) => {
      def bigrams = Tables.documents(s, d)
        .withColumn("w", split(col("text"), " "))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(1, size(w) - 1)," +
            " i -> concat_ws(' ', element_at(w, i), element_at(w, i+1)))")))
          .as("t"))
      val midDf = bigrams.groupBy("t").agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, 20)).select("t")
      bigrams.join(midDf, Seq("t"), "left_semi")
        .groupBy("t")
        .agg(count(lit(1)).as("df"),
          // serialized as a comma-joined string (not ARRAY) so the
          // result stays hashable for row-level comparison tooling;
          // numeric sort BEFORE stringify keeps order identical to the
          // oracle's list_sort over BIGINTs (lexicographic would not be)
          expr("concat_ws(',', transform(sort_array(collect_list(doc_id))," +
            " x -> cast(x AS string)))").as("postings"))
        .orderBy("t")
    })
  )

  val oracle: Map[String, String] = Map(
    // mirrors the Spark canonicalization step-for-step; DuckDB
    // regexp_replace needs the explicit 'g' flag where Java's default
    // is replace-all, and \1 backreferences where Java uses $1
    "qp_url_dedup" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN 'https://Example' || CAST(doc_id % 7 AS VARCHAR)
        |        || '.COM:443/path/' || CAST(doc_id % 50 AS VARCHAR)
        |        || '?utm_source=x&id=' || CAST(doc_id % 50 AS VARCHAR)
        |      WHEN 1 THEN 'HTTPS://example' || CAST(doc_id % 7 AS VARCHAR)
        |        || '.com/path/' || CAST(doc_id % 50 AS VARCHAR)
        |        || '?id=' || CAST(doc_id % 50 AS VARCHAR) || '#frag'
        |      WHEN 2 THEN 'https://example' || CAST(doc_id % 7 AS VARCHAR)
        |        || '.com/path/' || CAST(doc_id % 50 AS VARCHAR)
        |        || '/?id=' || CAST(doc_id % 50 AS VARCHAR)
        |      ELSE 'http://example' || CAST(doc_id % 7 AS VARCHAR)
        |        || '.com:80/path/' || CAST(doc_id % 50 AS VARCHAR)
        |        || '?id=' || CAST(doc_id % 50 AS VARCHAR) || '&utm_campaign=y'
        |    END AS u
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(u, '#.*', '', 'g') AS u FROM raw),
        |s2 AS (SELECT doc_id,
        |  regexp_extract(u, '^[A-Za-z]+://[^/?#]+') AS head,
        |  substr(u, length(regexp_extract(u, '^[A-Za-z]+://[^/?#]+')) + 1) AS tail
        |  FROM s1),
        |s3 AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(lower(head),
        |    '^https://(.*):443$', 'https://\1'),
        |    '^http://(.*):80$', 'http://\1') AS head,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(tail,
        |      '(utm_[a-z]+|fbclid)=[^&]*', '', 'g'),
        |      '&&+', '&', 'g'), '\?&', '?', 'g'), '[?&]+$', '', 'g'),
        |      '/\?', '?', 'g'), '/+$', '', 'g') AS tail
        |  FROM s2)
        |SELECT head || tail AS url, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_dups
        |FROM s3 GROUP BY 1 ORDER BY url""".stripMargin,

    "qp_split" ->
      s"""SELECT doc_id,
         |  CASE WHEN hb < '$TrainThr' THEN 'train'
         |       WHEN hb < '$ValThr' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id,
         |        substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 2) AS hb
         |      FROM documents) t
         |ORDER BY doc_id""".stripMargin,
    "qp_sample" ->
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang,
         |    substr(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 2) AS hb,
         |    CASE WHEN lang = 'en' THEN '$EnThr' ELSE '$OtherThr' END AS thr
         |  FROM documents) t
         |WHERE hb < thr ORDER BY doc_id""".stripMargin,
    // same Knuth hash, shard, and within-shard (skey, doc_id) order —
    // the position-weighted signature pins the exact permutation
    "qp_epoch_shuffle" ->
      """WITH e AS (
        |  SELECT epoch, doc_id,
        |    (doc_id * 2654435761 + epoch * 40503) % 1000000007 AS skey
        |  FROM documents, (SELECT unnest([1, 2]) AS epoch)),
        |p AS (
        |  SELECT epoch, doc_id, skey, skey % 8 AS shard,
        |    ROW_NUMBER() OVER (PARTITION BY epoch, skey % 8
        |      ORDER BY skey, doc_id) AS pos
        |  FROM e)
        |SELECT epoch, CAST(shard AS BIGINT) AS shard,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(doc_id) AS BIGINT) AS doc_sum,
        |  CAST(SUM(pos * doc_id) AS BIGINT) AS order_sig
        |FROM p GROUP BY epoch, shard ORDER BY epoch, shard""".stripMargin,
    "qp_chunk" ->
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |    1 + (GREATEST(LENGTH(text) - $ChunkLen, 0) + ${Stride - 1}) // $Stride
         |      AS n_chunks
         |  FROM documents)
         |SELECT doc_id, CAST(ci AS INTEGER) AS chunk_idx,
         |  CAST(ci * $Stride + 1 AS INTEGER) AS chunk_start,
         |  CAST(LENGTH(substr(text, CAST(ci * $Stride + 1 AS INTEGER), $ChunkLen))
         |    AS INTEGER) AS chunk_len,
         |  md5(substr(text, CAST(ci * $Stride + 1 AS INTEGER), $ChunkLen)) AS chunk_md5
         |FROM base, unnest(range(0, n_chunks)) AS u(ci)
         |ORDER BY doc_id, chunk_idx""".stripMargin,
    "qp_redact" ->
      s"""WITH $piiCorpusSql, red AS (
         |  SELECT doc_id, text,
         |    regexp_replace(regexp_replace(text,
         |      '$EmailRe', '<EMAIL>', 'g'),
         |      '$PhoneRe', '<PHONE>', 'g') AS r
         |  FROM pii)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS INTEGER) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$PhoneRe')) AS INTEGER) AS n_phones,
         |  md5(r) AS redacted_md5,
         |  CAST(LENGTH(r) AS INTEGER) AS redacted_len
         |FROM red ORDER BY doc_id""".stripMargin,
    "qp_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
        |), tf AS (
        |  SELECT doc_id, t, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        |), dfq AS (
        |  SELECT t, COUNT(*) AS df FROM tf GROUP BY t
        |), n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.t, tf.tf, dfq.df,
        |    tf.tf * n.n_docs * 10000 // dfq.df AS score_q
        |  FROM tf JOIN dfq ON tf.t = dfq.t, n
        |), r AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY score_q DESC, t) AS INTEGER) AS rnk
        |  FROM scored)
        |SELECT doc_id, t AS term, CAST(tf AS BIGINT) AS tf,
        |  CAST(df AS BIGINT) AS df, CAST(score_q AS BIGINT) AS score_q, rnk
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "qp_mix" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents
        |), bl AS (
        |  SELECT lang, SUM(n_tok) AS lang_tok FROM toks GROUP BY lang
        |), t AS (
        |  SELECT SUM(lang_tok) AS tot, COUNT(*) AS nl FROM bl
        |), thr AS (
        |  SELECT lang,
        |    CAST(LEAST(256, tot // nl * 256 // lang_tok) AS BIGINT) AS acc256
        |  FROM bl, t)
        |SELECT k.doc_id, k.lang, k.n_tok
        |FROM toks k JOIN thr ON k.lang = thr.lang
        |WHERE acc256 = 256 OR
        |  substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 2) <
        |    printf('%02x', CAST(acc256 AS INTEGER))
        |ORDER BY doc_id""".stripMargin,
    "qp_pack" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents
         |), ns AS (
         |  SELECT GREATEST(1, (SUM(n_tok) + ${PackShardTokens - 1})
         |    // $PackShardTokens) AS n_shards
         |  FROM toks
         |), base AS (
         |  SELECT doc_id, CAST(doc_id % n_shards AS INTEGER) AS shard, n_tok
         |  FROM toks, ns
         |), c AS (
         |  SELECT doc_id, shard, n_tok,
         |    SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM base)
         |SELECT doc_id, shard, n_tok,
         |  CAST((cum - n_tok) // $PackBudget AS BIGINT) AS seq_id,
         |  CAST((cum - n_tok) % $PackBudget AS BIGINT) AS seq_off
         |FROM c ORDER BY doc_id""".stripMargin,
    "qp_repetition" ->
      s"""WITH wd AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |), g AS (
         |  SELECT doc_id, list_transform(range(1, len(w) - 3),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
         |         w[i+3] || ' ' || w[i+4]) AS g
         |  FROM wd WHERE len(w) >= 5)
         |SELECT doc_id, CAST(len(g) AS BIGINT) AS n_grams,
         |  CAST(len(g) - len(list_distinct(g)) AS BIGINT) AS n_dup,
         |  CAST((len(g) - len(list_distinct(g))) * 10000 // len(g)
         |    AS BIGINT) AS dup_q,
         |  ((len(g) - len(list_distinct(g))) * 10000 // len(g)) < $RepThr
         |    AS keep
         |FROM g ORDER BY doc_id""".stripMargin,
    "qp_decontam" ->
      """WITH wd AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(w) - 1),
        |    i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2])))) AS sh
        |  FROM wd WHERE len(w) >= 3
        |), bench AS (
        |  SELECT DISTINCT sh, doc_id AS bench_id FROM sh WHERE doc_id % 97 = 0
        |), train AS (
        |  SELECT * FROM sh WHERE doc_id % 97 <> 0)
        |SELECT t.doc_id, CAST(COUNT(DISTINCT t.sh) AS BIGINT) AS n_shared,
        |  CAST(COUNT(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs
        |FROM train t JOIN bench b ON t.sh = b.sh
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    // the bloom prefilter is output-invisible (exact join removes its
    // false positives), so the oracle is qp_decontam's, verbatim
    "qp_bloom_decontam" ->
      """WITH wd AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(w) - 1),
        |    i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2])))) AS sh
        |  FROM wd WHERE len(w) >= 3
        |), bench AS (
        |  SELECT DISTINCT sh, doc_id AS bench_id FROM sh WHERE doc_id % 97 = 0
        |), train AS (
        |  SELECT * FROM sh WHERE doc_id % 97 <> 0)
        |SELECT t.doc_id, CAST(COUNT(DISTINCT t.sh) AS BIGINT) AS n_shared,
        |  CAST(COUNT(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs
        |FROM train t JOIN bench b ON t.sh = b.sh
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "qp_domain_cap" ->
      s"""WITH ranked AS (
         |  SELECT doc_id, source,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY md5('cap|' || CAST(doc_id AS VARCHAR)), doc_id)
         |      AS INTEGER) AS rnk
         |  FROM documents)
         |SELECT doc_id, source, rnk FROM ranked
         |WHERE rnk <= $DomainCap ORDER BY doc_id""".stripMargin,
    "qp_bigram_lm" ->
      s"""WITH wd AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |), bgs AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
         |    i -> {'w1': w[i], 'w2': w[i+1]})) AS p
         |  FROM wd WHERE len(w) >= 2
         |), bgf AS (
         |  SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bgs
         |), pc AS (
         |  SELECT w1, w2, COUNT(*) AS c12 FROM bgf GROUP BY w1, w2
         |), topk AS (
         |  SELECT * FROM pc ORDER BY c12 DESC, w1, w2 LIMIT $BigramK
         |), pred AS (
         |  SELECT w1, COUNT(*) AS c1 FROM bgf GROUP BY w1
         |), model AS (
         |  SELECT t.w1, t.w2, 1000 * c12 // c1 AS q
         |  FROM topk t JOIN pred USING (w1))
         |SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |  CAST(SUM(COALESCE(m.q, 0)) AS BIGINT) AS q_sum,
         |  CAST(SUM(COALESCE(m.q, 0)) // COUNT(*) AS BIGINT) AS score_q,
         |  (SUM(COALESCE(m.q, 0)) // COUNT(*)) >= $BigramThr AS keep
         |FROM bgf f LEFT JOIN model m ON f.w1 = m.w1 AND f.w2 = m.w2
         |GROUP BY f.doc_id ORDER BY f.doc_id""".stripMargin,

    "qp_rarity" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
         |), topk AS (
         |  SELECT t, COUNT(*) AS cnt FROM toks GROUP BY t
         |  ORDER BY cnt DESC, t LIMIT $RarityVocabK
         |), n AS (SELECT COUNT(*) AS n_total FROM toks),
         |scored AS (
         |  SELECT k.doc_id, n.n_total // COALESCE(c.cnt, 1) AS rarity
         |  FROM toks k LEFT JOIN topk c ON k.t = c.t, n)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
         |  CAST(SUM(rarity) AS BIGINT) AS rar_sum,
         |  CAST(SUM(rarity) // COUNT(*) AS BIGINT) AS score_q,
         |  (SUM(rarity) // COUNT(*)) < $RarityThr AS keep
         |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "qp_invindex" ->
      """WITH wd AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), toks AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(w)), i -> w[i] || ' ' || w[i+1]))) AS t
        |  FROM wd WHERE len(w) >= 2)
        |SELECT t, CAST(COUNT(*) AS BIGINT) AS df,
        |  array_to_string(list_sort(list(doc_id)), ',') AS postings
        |FROM toks GROUP BY t
        |HAVING COUNT(*) BETWEEN 2 AND 20
        |ORDER BY t""".stripMargin
  )
}
