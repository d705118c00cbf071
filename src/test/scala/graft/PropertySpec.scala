package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.flow.Ipv4Trie
import graft.functions.IpOps

/** Property-based checks for the pure kernels (SURVEY.md §5 plan). */
object PropertySpec extends Properties("graft") {

  private val genIp: Gen[Long] = Gen.chooseNum(0L, 4294967295L)

  property("ip string round-trip over u32 space") = forAll(genIp) { ip =>
    IpOps.ipToLong(IpOps.longToIp(ip)) == ip
  }

  property("ip_is_private matches definitional ranges") = forAll(genIp) { ip =>
    val b1 = (ip >> 24) & 0xff
    val b2 = (ip >> 16) & 0xff
    val expected = b1 == 10 || (b1 == 172 && b2 >= 16 && b2 <= 31) ||
      (b1 == 192 && b2 == 168) || b1 == 127 || (b1 == 169 && b2 == 254)
    IpOps.ipIsPrivate(ip) == expected
  }

  property("format_readable_size parses back within precision") =
    forAll(Gen.chooseNum(0L, 1L << 60)) { b =>
      val s = IpOps.formatReadableSize(b.toDouble).toString
      val Array(num, unit) = s.split(" ")
      val factor = Seq("B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB")
        .indexOf(unit)
      val back = num.toDouble * math.pow(1024, factor)
      factor >= 0 &&
        math.abs(back - b) <= 0.005 * math.pow(1024, factor) + 1e-6
    }

  /** MinHash-LSH S-curve: p(j) = 1 - (1 - j^r)^b (bands b, rows r). */
  private def lshDetectP(j: Double, bands: Int, rows: Int): Double =
    1.0 - math.pow(1.0 - math.pow(j, rows), bands)

  property("LSH detection probability: monotone in j, sharp at the ends") =
    forAll(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0)) { (j1, j2) =>
      val b = graft.queries.TextQueries.LSH_BANDS
      val r = graft.queries.TextQueries.LSH_ROWS
      val (lo, hi) = if (j1 <= j2) (j1, j2) else (j2, j1)
      // monotone non-decreasing; identical docs always detected;
      // disjoint docs never; near-dups (>=0.8) almost surely caught and
      // unrelated pairs (<=0.3) almost surely not at the (8,4) defaults
      lshDetectP(lo, b, r) <= lshDetectP(hi, b, r) + 1e-12 &&
        lshDetectP(1.0, b, r) == 1.0 && lshDetectP(0.0, b, r) == 0.0 &&
        lshDetectP(0.8, b, r) > 0.9 && lshDetectP(0.3, b, r) < 0.07
    }

  private val genCidr: Gen[(Long, Int)] = for {
    len <- Gen.chooseNum(4, 30)
    raw <- genIp
  } yield ((raw >> (32 - len)) << (32 - len), len)

  property("Ipv4Trie lookup == linear longest-prefix scan") =
    forAll(Gen.listOfN(30, genCidr), Gen.listOfN(50, genIp)) { (cidrs, probes) =>
      val indexed = cidrs.zipWithIndex.map { case ((s, l), i) => (s, l, i) }
      val trie = Ipv4Trie.build(indexed)
      // last insert wins for duplicate prefixes in both models
      val dedup = indexed.groupBy(t => (t._1, t._2)).map(_._2.last).toSeq
      Prop.all(probes.map { ip =>
        val linear = dedup
          .filter { case (s, l, _) => (ip >> (32 - l)) << (32 - l) == s }
          .sortBy { case (_, l, i) => (l, i) }
          .lastOption.map(_._3).getOrElse(-1)
        Prop(trie.lookup(ip) == linear) :| s"ip=$ip"
      }: _*)
    }

  // ---- KllQuantiles: the mergeable-sketch guarantees (q19's 100 TB
  //      path) hold under ANY partitioning / merge order ----

  private def kllSketch(probes: Seq[Double]) =
    new graft.functions.KllQuantiles(probes, k = 64)

  /** Tie-aware rank error: a value with duplicates occupies the whole
    * rank interval [count(<v)+1, count(<=v)]; the error is the distance
    * from the target rank to that interval (0 when it intersects).
    */
  private def rankErr(sorted: Vector[Long], v: Long, target: Long): Long = {
    val lo = sorted.count(_ < v).toLong + 1
    val hi = sorted.count(_ <= v).toLong
    if (target < lo) lo - target else if (target > hi) target - hi else 0L
  }

  private val genData: Gen[Vector[Long]] = for {
    n <- Gen.chooseNum(1, 4000)
    skewed <- Gen.oneOf(true, false)
    xs <- Gen.listOfN(n,
      if (skewed) Gen.chooseNum(0L, 20L) else Gen.chooseNum(-100000L, 100000L))
  } yield xs.toVector

  private val genCuts: Gen[(Double, Double)] =
    for { a <- Gen.chooseNum(0.0, 1.0); b <- Gen.chooseNum(0.0, 1.0) }
      yield (math.min(a, b), math.max(a, b))

  property("KLL rank error bounded under any 3-way split + merge order") =
    forAll(genData, genCuts) { case (xs, (c1, c2)) =>
      val agg = kllSketch(Seq(0.1, 0.5, 0.9))
      val (i, j) = ((xs.length * c1).toInt, (xs.length * c2).toInt)
      val parts = Seq(xs.take(i), xs.slice(i, j), xs.drop(j))
        .map(_.foldLeft(agg.zero)(agg.reduce))
      // left-fold and right-fold merge trees — partial buffers arrive in
      // arbitrary order on a real exchange, so the bound must not care
      val lf = agg.finish(parts.reduceLeft(agg.merge))
      val rf = agg.finish(parts.reduceRight(agg.merge))
      val sorted = xs.sorted
      val n = xs.length.toLong
      // worst-case envelope for deterministic KLL at k=64 over n<=4000:
      // 2 compacting levels x k/2 rank noise each, cushioned; observed
      // error is far smaller — this guards against regressions, not ulp
      val eps = math.max(2.0, 0.08 * n)
      Prop.all(Seq(0.1, 0.5, 0.9).zipWithIndex.flatMap { case (p, qi) =>
        val target = math.max(1L, math.ceil(p * n).toLong)
        Seq(lf, rf).map { est =>
          val err = rankErr(sorted, est(qi), target)
          Prop(err <= eps) :| s"p=$p err=$err n=$n"
        }
      }: _*)
    }

  property("KLL is exact while no compaction has fired (n < k)") =
    forAll(Gen.listOfN(50, Gen.chooseNum(-1000L, 1000L))) { xs0 =>
      val xs = xs0.toVector
      val agg = kllSketch(Seq(0.5))
      val est = agg.finish(xs.foldLeft(agg.zero)(agg.reduce)).head
      val sorted = xs.sorted
      val target = math.max(1, math.ceil(0.5 * xs.length).toInt)
      Prop(est == sorted(target - 1)) :| s"est=$est"
    }

  property("KLL is deterministic: identical fold -> identical output") =
    forAll(genData) { xs =>
      val agg = kllSketch(Seq(0.25, 0.75))
      val run = () => agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      run() == run()
    }

  property("KLL buffer stays O(k log n): no level exceeds capacity") =
    forAll(genData) { xs =>
      val agg = kllSketch(Seq(0.5))
      val buf = xs.foldLeft(agg.zero)(agg.reduce)
      val depthBound = 64 - java.lang.Long.numberOfLeadingZeros(
        math.max(1L, xs.length.toLong / 32)) + 2
      Prop(buf.levels.forall(_.length <= 64) &&
        buf.levels.length <= depthBound &&
        buf.n == xs.length.toLong) :| s"levels=${buf.levels.map(_.length)}"
    }

  // ---- commit-log Bloom filters (the skip-index correctness core) ----
  import graft.sink.Bloom

  property("bloom: NO false negatives — every inserted hash is found, " +
    "whatever the insert set or split/merge order") =
    forAll(Gen.nonEmptyListOf(Gen.long), Gen.chooseNum(0, 10)) { (hs, cut) =>
      // build via the aggregator in two merged partials, like a real
      // map-side split
      val agg = new Bloom.BloomAgg()
      val (l, r) = hs.splitAt(math.min(cut, hs.size))
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      val b64 = Bloom.encode(agg.finish(merged))
      Prop(hs.forall(h =>
        Bloom.mayContain(b64, s"${Bloom.M},${Bloom.K}", h)))
    }

  property("bloom: block-decode testBit == whole-filter membership, and " +
    "driver-side ofHashes == the aggregator's filter") =
    forAll(Gen.nonEmptyListOf(Gen.long), Gen.listOfN(50, Gen.long)) {
      (ins, probes) =>
        val agg = new Bloom.BloomAgg()
        val viaAgg = Bloom.encode(
          agg.finish(ins.foldLeft(agg.zero)(agg.reduce)))
        val viaDriver = Bloom.ofHashes(ins)
        val params = s"${Bloom.M},${Bloom.K}"
        Prop(viaAgg == viaDriver &&
          probes.forall(p => Bloom.mayContain(viaAgg, params, p) ==
            Bloom.mayContain(viaDriver, params, p)))
    }

  property("bloom: false-positive rate stays honest at value-filter " +
    "density (≤10% at 4k inserts, m=32768)") =
    forAll(Gen.chooseNum(0L, Long.MaxValue / 2)) { seed =>
      val rnd = new scala.util.Random(seed)
      val ins = Seq.fill(4000)(rnd.nextLong())
      val b64 = Bloom.ofHashes(ins)
      val params = s"${Bloom.M},${Bloom.K}"
      val inSet = ins.toSet
      val probes = Seq.fill(2000)(rnd.nextLong()).filterNot(inSet)
      val fp = probes.count(Bloom.mayContain(b64, params, _))
      Prop(fp <= probes.size / 10) :| s"fp=$fp/${probes.size}"
    }
}
