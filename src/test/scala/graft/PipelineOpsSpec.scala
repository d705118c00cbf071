package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic checks for the training-data workflow operators
  * (PipelineQueries) and the new relational surface (as-of join,
  * rollup, pivot).
  */
class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("qp_split: hash split is exhaustive, disjoint, and ~80/10/10") {
    val rows = q("qp_split").collect()
    val docs = Tables.documents(spark, sf).count()
    assert(rows.length == docs)
    val frac = rows.groupBy(_.getAs[String]("split"))
      .map { case (k, v) => k -> v.length.toDouble / rows.length }
    assert(frac.keySet == Set("train", "val", "test"))
    assert(frac("train") > 0.7 && frac("train") < 0.9, frac)
    assert(frac("val") > 0.04 && frac("val") < 0.18, frac)
  }

  test("qp_split: membership is a pure function of doc_id (stable)") {
    val a = q("qp_split").collect().map(r => (r.getLong(0), r.getString(1)))
    val b = q("qp_split").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.sameElements(b))
  }

  test("qp_sample: en stratum is sampled at about twice the tail rate") {
    val docs = Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = q("qp_sample").collect()
      .groupBy(_.getAs[String]("lang")).map { case (k, v) => k -> v.length }
    val enRate = kept.getOrElse("en", 0).toDouble / docs("en")
    assert(enRate > 0.35 && enRate < 0.65, s"en rate $enRate")
    val tail = (kept.keySet - "en")
    tail.foreach { l =>
      val r = kept(l).toDouble / docs(l)
      assert(r > 0.1 && r < 0.4, s"$l rate $r")
    }
  }

  test("qp_chunk: chunks tile every document with the declared overlap") {
    val rows = q("qp_chunk").collect()
    val lens = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).as("len")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_.getAs[Int]("chunk_idx"))
      // first chunk starts at 1; consecutive starts differ by the stride
      assert(sorted.head.getAs[Int]("chunk_start") == 1)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Int]("chunk_start") - a.getAs[Int]("chunk_start") == 150)
        case _ => ()
      }
      // the last chunk reaches the end of the doc: start + len - 1 == doc len
      val lastRow = sorted.last
      assert(lastRow.getAs[Int]("chunk_start") + lastRow.getAs[Int]("chunk_len") - 1
        == lens(id), s"doc $id")
      // every non-final chunk is full width
      sorted.init.foreach(c => assert(c.getAs[Int]("chunk_len") == 200))
    }
  }

  test("qp_redact: injected PII is counted and fully scrubbed") {
    val rows = q("qp_redact").collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (id % 4 == 0) {
        assert(r.getAs[Int]("n_emails") >= 1, s"doc $id emails")
        assert(r.getAs[Int]("n_phones") >= 1, s"doc $id phones")
      } else {
        assert(r.getAs[Int]("n_emails") == 0)
        assert(r.getAs[Int]("n_phones") == 0)
      }
    }
    // double-redaction is a fixpoint: scrubbing the scrubbed text again
    // changes nothing (i.e. no residual matches survive the first pass)
    val emailRe = "[a-z0-9.]+@[a-z0-9.]+\\.[a-z]+"
    val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val red = Tables.documents(spark, sf).select(col("doc_id"),
      regexp_replace(regexp_replace(
        concat(col("text"), lit(" contact user1@example.com or call 555-123-0001")),
        emailRe, "<EMAIL>"), phoneRe, "<PHONE>").as("r"))
    val residual = red.filter(
      size(expr(s"regexp_extract_all(r, '$emailRe', 0)")) > 0 ||
      size(expr(s"regexp_extract_all(r, '$phoneRe', 0)")) > 0).count()
    assert(residual == 0)
  }

  test("qp_tfidf: exactly top-3 per doc, scores non-increasing in rank") {
    val rows = q("qp_tfidf").collect()
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rnk"))
      assert(byRank.map(_.getAs[Int]("rnk")).toSeq == (1 to byRank.length))
      assert(byRank.length <= 3)
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("score_q") >= b.getAs[Long]("score_q"), s"doc $id")
        case _ => ()
      }
    }
  }

  test("qp_invindex: postings are sorted, distinct, and df-consistent") {
    val rows = q("qp_invindex").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // postings serialize as a comma-joined string (hashable for the
      // row-level gate); parse back for the structural assertions
      val p = r.getAs[String]("postings").split(",").map(_.toLong).toSeq
      assert(p.length == r.getAs[Long]("df"))
      assert(p == p.distinct.sorted, r.getAs[String]("t"))
      assert(p.length >= 2 && p.length <= 20)
    }
  }

  test("qp_pack: sequences tile contiguously and survive repartitioning") {
    val rows = q("qp_pack").collect()
    assert(rows.nonEmpty)
    // within a shard, each doc starts exactly where the previous ended
    // (mod the budget): seq_id * 512 + seq_off is the running token sum
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (shard, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("seq_id") * 512 + r.getAs[Long]("seq_off") == cum,
          s"shard $shard doc ${r.getAs[Long]("doc_id")}")
        cum += r.getAs[Long]("n_tok")
      }
    }
    // ingest-stability: the same packing regardless of input partitioning
    // (the property row_number-based packers lack)
    val again = q("qp_pack").repartition(7).orderBy("doc_id").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("qp_repetition: hand-built docs score exact duplicate fractions") {
    val docs = Seq(
      (1L, "a b c d e f g h"),            // 4 5-grams, all distinct
      (2L, "x y z w v x y z w v x y z w v")) // repeated span -> dups
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("rep_docs")
    val g = docs.withColumn("w", split(col("text"), " "))
      .withColumn("g", expr(
        "transform(sequence(1, size(w) - 4), i -> concat_ws(' '," +
          " element_at(w,i), element_at(w,i+1), element_at(w,i+2)," +
          " element_at(w,i+3), element_at(w,i+4)))"))
      .select(col("doc_id"), size(col("g")).as("n"),
        (size(col("g")) - size(array_distinct(col("g")))).as("d"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(g(1L) == ((4, 0)))
    // doc 2: 11 5-grams over a period-5 string -> only 5 distinct
    assert(g(2L) == ((11, 6)))
    // and the declared query keeps the clean doc, flags nothing below
    // threshold as dup-free
    val out = q("qp_repetition").collect()
    assert(out.forall(r => r.getAs[Long]("n_dup") <= r.getAs[Long]("n_grams")))
    assert(out.exists(_.getAs[Boolean]("keep")))
  }

  test("qp_decontam: the benchmark side broadcasts (no shuffle on the " +
    "train side) and flagged docs truly share a shingle") {
    val plan = q("qp_decontam").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"decontam join must broadcast the bench side:\n$plan")
    val rows = q("qp_decontam").collect()
    assert(rows.nonEmpty, "gate must exercise non-trivial contamination")
    assert(rows.forall(_.getAs[Long]("doc_id") % 97 != 0),
      "only train docs are reported")
    assert(rows.forall(r => r.getAs[Long]("n_shared") >= 1 &&
      r.getAs[Long]("n_bench_docs") >= 1))
  }

  test("qp_domain_cap: no source exceeds the cap; the survivor set is a " +
    "pure function of (doc_id, source), not ingest order") {
    val rows = q("qp_domain_cap").collect()
    val bySrc = rows.groupBy(_.getAs[String]("source")).view.mapValues(_.length)
    assert(bySrc.values.forall(_ <= 15), "cap violated")
    assert(rows.map(_.getAs[Int]("rnk")).forall(r => r >= 1 && r <= 15))
    // md5-order survivors must not depend on physical layout: recompute
    // over a shuffled/repartitioned corpus and compare doc_id sets
    val docs = Tables.documents(spark, sf).repartition(13)
      .sortWithinPartitions(desc("n_chars"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy(asc("pick"), asc("doc_id"))
    val again = docs
      .select(col("doc_id"), col("source"),
        md5(concat(lit("cap|"), col("doc_id").cast("string"))).as("pick"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 15)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == rows.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("qp_rarity: common-token docs score below rare-token docs and the " +
    "mean rarity is bounded by the per-token extremes") {
    val rows = q("qp_rarity").collect()
    assert(rows.forall(_.getAs[Long]("score_q") >= 1),
      "rarity = N div cnt is at least 1 for every present token")
    // a doc's mean cannot beat its own best token: score_q <= rar_sum
    assert(rows.forall(r =>
      r.getAs[Long]("score_q") <= r.getAs[Long]("rar_sum")))
    // keep flag is exactly the threshold predicate
    assert(rows.forall(r =>
      r.getAs[Boolean]("keep") == (r.getAs[Long]("score_q") < 40L)))
  }

  test("q20_asof: golden truth on a hand-built frame") {
    // u1: view@10, purchase@20 -> matches view 100
    //     purchase@5 (before any view) -> sentinel
    //     view@20 exists too: same-ts view counts as prior for purchase@20
    val rows = Seq(
      (100L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), "view"),
      (101L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05"), "purchase"),
      (102L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:20"), "view"),
      (103L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:20"), "purchase"),
      (104L, 2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "click"))
      .toDF("event_id", "user_id", "ts", "event_type")
    rows.createOrReplaceTempView("asof_spec_events")
    import org.apache.spark.sql.expressions.Window
    val e = rows.filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "view", 0).otherwise(1).as("kind"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = e.withColumn("av",
        last(when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), coalesce(col("av"), lit(-1L)).as("asof_view_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(101L -> -1L, 103L -> 102L))
  }

  test("qp_bloom_decontam: bloom path ≡ exact path (FPs eliminated), " +
      "and the bloom admits every true member") {
    val exact = q("qp_decontam").collect().map(_.toSeq).toSeq
    val bloom = q("qp_bloom_decontam").collect().map(_.toSeq).toSeq
    assert(bloom == exact,
      "bloom-prefiltered decontam must be output-identical to exact")
    // no-false-negative property on the sketch itself: every inserted
    // key must probe positive (this is what makes the prefilter safe
    // to run BEFORE the exact join rather than instead of it)
    val keys = (1 to 1000).map(i => s"member_$i")
    val df = keys.toDF("k")
    val bf = df.stat.bloomFilter("k", 1000, 0.01)
    assert(keys.forall(bf.mightContainString),
      "a Bloom filter may never reject a true member")
    // and it actually filters: overwhelmingly negative on non-members
    val fp = (1 to 1000).count(i => bf.mightContainString(s"other_$i"))
    assert(fp < 100, s"bloom should reject most non-members, FPs=$fp")
  }

  test("qp_bigram_lm: scores are valid milli-probabilities, the decision " +
      "discriminates, and common-bigram docs outscore rare-bigram docs") {
    val rows = q("qp_bigram_lm").collect()
    rows.foreach { r =>
      val (n, s, q) = (r.getAs[Long]("n_bigrams"), r.getAs[Long]("q_sum"),
        r.getAs[Long]("score_q"))
      assert(n > 0 && q == s / n, s"score must be the integer mean: $r")
      // each bigram contributes at most 1000 (p(w2|w1) <= 1)
      assert(q >= 0 && q <= 1000, s"score out of [0,1000]: $r")
    }
    val keeps = rows.count(_.getAs[Boolean]("keep"))
    assert(keeps > 0 && keeps < rows.length,
      s"threshold must split the corpus, kept $keeps/${rows.length}")
    // docs whose average conditional probability is high are exactly the
    // ones built from the head of the bigram distribution: the top-decile
    // scorers must all clear the keep bar and the bottom decile must not
    val sorted = rows.map(_.getAs[Long]("score_q")).sorted
    assert(sorted.take(rows.length / 10).forall(_ < sorted.last))
  }

  test("q21_rollup: level sums reconcile (leaves == subtotals == total)") {
    val rows = q("q21_rollup").collect()
    def sumAt(g: Int) = rows.filter(_.getAs[Int]("gid") == g)
      .map(_.getAs[Long]("sum_qty")).sum
    assert(sumAt(0) == sumAt(1) && sumAt(1) == sumAt(3))
    assert(rows.count(_.getAs[Int]("gid") == 3) == 1)
  }

  test("q22_pivot: wide counts reconcile with the long count") {
    val rows = q("q22_pivot").collect()
    val wide = rows.map(r =>
      (1 to 5).map(i => r.getAs[Long](s"p$i")).sum).sum
    assert(wide == Tables.orders(spark, sf).count())
  }

  test("UrlOps.canonicalizeUrl: adversarial goldens + fixpoint " +
    "(canon(canon(u)) == canon(u))") {
    val cases = Seq(
      "https://Example.COM:443/a/b/?utm_source=x&id=1&utm_campaign=y#f" ->
        "https://example.com/a/b?id=1",
      "HTTP://HOST.org:80/#only-frag" -> "http://host.org",
      "https://h.io/p?utm_a=1" -> "https://h.io/p",
      "https://h.io/p/?fbclid=abc&x=2" -> "https://h.io/p?x=2",
      "https://h.io:443/" -> "https://h.io",
      "http://h.io/p?a=1&utm_b=2&c=3" -> "http://h.io/p?a=1&c=3",
      // :443 is only default for https — http keeps it (and vice versa)
      "http://h.io:443/p" -> "http://h.io:443/p")
    val df = cases.map(_._1).toDF("u")
    val once = df.select(graft.ops.UrlOps.canonicalizeUrl(col("u")).as("c"))
    assert(once.as[String].collect().toSeq == cases.map(_._2))
    val twice = once
      .select(graft.ops.UrlOps.canonicalizeUrl(col("c")).as("c"))
    assert(twice.as[String].collect().toSeq == cases.map(_._2),
      "canonicalization must be a fixpoint")
  }

  test("qp_url_dedup: canonicalization collapses the https variants " +
    "and keeps http distinct") {
    val rows = q("qp_url_dedup").collect()
      .map(r => r.getAs[String]("url") ->
        (r.getAs[Long]("keep_id"), r.getAs[Long]("n_dups"))).toMap
    // every canonical https URL is fully scrubbed: lowercase, no :443,
    // no fragment, no tracking params, no trailing slash
    rows.keys.foreach { u =>
      assert(u == u.toLowerCase && !u.contains(":443") &&
        !u.contains("#") && !u.contains("utm_") && !u.contains("/?"),
        s"uncanonical survivor: $u")
    }
    // docs 0 (variant 0: mixed case + :443 + utm) and 350 (variant 2:
    // trailing slash) hash to the same host/path → one row, keeper 0
    assert(rows("https://example0.com/path/0?id=0") == (0L, 2L))
    // the http variant of the same host/path stays a distinct URL
    assert(rows.contains("http://example3.com/path/3?id=3"))
    // dedup conserves rows: sum of n_dups == corpus size
    assert(rows.values.map(_._2).sum ==
      Tables.documents(spark, sf).count())
  }
}
