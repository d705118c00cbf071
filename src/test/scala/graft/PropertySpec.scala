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
}
