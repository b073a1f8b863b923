package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.PrefixFilter

/** The prefix-filter recall lemma, property-tested: for ANY corpus and
  * threshold, every pair with Jaccard ≥ t must share at least one token
  * inside both documents' prefixes — recall 1.0 is a theorem of the
  * prefix length, not an empirical observation, and the one fragile
  * ingredient is the float boundary in `|x| − ⌈round(t·|x|, 9)⌉ + 1`
  * (`PrefixFilter.scala`: a bare ceil of t·n = 7.000000000000001
  * overshoots and breaks the lemma). ScalaCheck drives random
  * (t, corpus) pairs — with t biased toward the rational values whose
  * products land on those integral boundaries — against a pure-JVM twin
  * of the prefix construction (hundreds of cases, no Spark), and one
  * seeded end-to-end case pins the twin to the real Catalyst expressions.
  *
  * t stays ≥ 0.05: prefix filtering REQUIRES t > 0 (at t = 0 disjoint
  * sets qualify yet can never share a token — the operator's documented
  * domain, not a gap).
  */
class PrefixFilterRecallSpec extends AnyFunSuite with SparkSpec {

  /** Twin of the prefix length expression: Spark's `round(x, 9)` is
    * BigDecimal HALF_UP on the double, then `ceil`.
    */
  private def prefLen(n: Int, t: Double): Int =
    if (n == 0) 0
    else n - math.ceil(java.math.BigDecimal.valueOf(n * t)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()).toInt + 1

  /** Twin of the df-ordered prefix construction: global order is
    * (document frequency asc, token asc); prefix = first prefLen tokens.
    */
  private def prefixes(corpus: Seq[(Long, Set[String])],
      t: Double): Map[Long, Set[String]] = {
    val df = corpus.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size }
    corpus.map { case (id, set) =>
      val sorted = set.toSeq.sortBy(tok => (df(tok), tok))
      id -> sorted.take(prefLen(set.size, t)).toSet
    }.toMap
  }

  private def jaccard(a: Set[String], b: Set[String]): Double = {
    val inter = (a & b).size
    inter.toDouble / (a.size + b.size - inter)
  }

  private def qualifyingPairs(corpus: Seq[(Long, Set[String])],
      t: Double): Seq[(Long, Long)] =
    for {
      (i, a) <- corpus; (j, b) <- corpus
      if i < j && a.nonEmpty && b.nonEmpty && jaccard(a, b) >= t
    } yield (i, j)

  private val genCorpus: Gen[Seq[(Long, Set[String])]] = for {
    nDocs <- Gen.choose(2, 24)
    alphabet = (0 until 14).map(i => f"t$i%02d")
    sets <- Gen.listOfN(nDocs, Gen.someOf(alphabet).map(_.toSet))
  } yield sets.zipWithIndex.map { case (s, i) => (i.toLong, s) }

  // bias toward thresholds whose t·n is integral-but-not-binary-exact —
  // the exact boundary the round-before-ceil exists for
  private val genT: Gen[Double] = Gen.frequency(
    3 -> Gen.choose(0.05, 1.0),
    2 -> Gen.oneOf(0.7, 0.5, 0.3, 0.9, 0.6, 0.8, 2.0 / 3.0, 1.0 / 3.0, 0.75, 1.0))

  test("lemma: every qualifying pair shares a prefix token (ScalaCheck)") {
    val prop = Prop.forAll(genCorpus, genT) { (corpus, t) =>
      val pref = prefixes(corpus, t)
      qualifyingPairs(corpus, t).forall { case (i, j) =>
        (pref(i) & pref(j)).nonEmpty
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(400), prop)
    assert(res.passed, res.status.toString)
  }

  test("prefix length twin never exceeds the set size and is ≥ 1 on nonempty sets") {
    val prop = Prop.forAll(Gen.choose(1, 100), genT) { (n, t) =>
      val len = prefLen(n, t)
      len >= 1 && len <= n
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(400), prop)
    assert(res.passed, res.status.toString)
  }

  test("end-to-end: jaccardSelfJoin output equals the brute-force qualifying pairs") {
    // seeded corpora through the REAL operator — pins the twin's
    // round/ceil and df-order semantics to the Catalyst expressions
    val rnd = new scala.util.Random(7)
    val alphabet = (0 until 14).map(i => f"t$i%02d")
    for (t <- Seq(0.3, 0.5, 0.7, 2.0 / 3.0)) {
      val corpus: Seq[(Long, Set[String])] = (0 until 30).map { i =>
        (i.toLong, rnd.shuffle(alphabet).take(1 + rnd.nextInt(9)).toSet)
      }
      import spark.implicits._
      val df = corpus.map { case (id, s) => (id, s.toSeq.sorted) }
        .toDF("doc_id", "toks")
      val got = PrefixFilter.jaccardSelfJoin(df, "doc_id", "toks", t)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val cmap = corpus.toMap
      val want = qualifyingPairs(corpus, t)
        .map(p => p -> jaccard(cmap(p._1), cmap(p._2))).toMap
      assert(got == want, s"t=$t: got ${got.size} pairs, want ${want.size}")
    }
  }
}
