package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.sim.Similarity

/** Corner cases for the dedup/similarity primitives that the data-scale
  * oracle queries never reach.
  */
class DedupSimSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("wordShingles: fewer than k tokens → empty; exact count otherwise") {
    val got = Seq("a b", "a b c", "a b c d", "", "  a   b  c  ")
      .toDF("t").select(Dedup.wordShingles(col("t")).as("s"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Nil)
    assert(got(1) == Seq("a b c"))
    assert(got(2) == Seq("a b c", "b c d"))
    assert(got(3) == Nil)
    assert(got(4) == Seq("a b c")) // multi-space safe
  }

  test("charNgrams: short strings and distinctness") {
    val got = Seq("ab", "abc", "aaaa")
      .toDF("t").select(Dedup.charNgrams(col("t")).as("g"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Nil)
    assert(got(1) == Seq("abc"))
    assert(got(2) == Seq("aaa")) // distinct: two identical grams collapse
  }

  test("charNgramsJvm ≡ the expression form, incl. order and null") {
    val texts = Seq("ab", "abc", "aaaa", "the quick brown fox the quick",
      "x" * 300, null)
    val df = texts.toDF("t").select(
      Dedup.charNgrams(col("t")).as("jvm"),
      Dedup.charNgramsExpr(col("t")).as("expr"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("jaccard: identical = 1.0, disjoint = 0.0") {
    val df = Seq(
      (Seq("x", "y"), Seq("x", "y")),
      (Seq("x"), Seq("y"))).toDF("a", "b")
    val got = df.select(Dedup.jaccard(col("a"), col("b"))).as[Double].collect()
    assert(got(0) == 1.0 && got(1) == 0.0)
  }

  test("minhashSignature: empty input → null signature (oracle's list_min([]))") {
    val got = Seq(Seq.empty[Long], Seq(5L))
      .toDF("hs").select(Dedup.minhashSignature(col("hs")).as("mh"))
      .collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getSeq[Long](0).length == Dedup.NumPerms)
  }

  test("simhash: identical token multisets → identical signatures; 24-bit range") {
    val got = Seq(Seq("spark", "fast", "spark"), Seq("spark", "spark", "fast"))
      .toDF("t").select(Dedup.simhash(Dedup.hashAll(col("t"))).as("sh"))
      .as[Long].collect()
    assert(got(0) == got(1))
    assert(got(0) >= 0 && got(0) < (1L << Dedup.SimHashBits))
  }

  test("simhash: 16-bit lanes exact past 255 tokens; empty and oversize → null") {
    val rnd = new scala.util.Random(7)
    val hashes = Seq.fill(1000)(rnd.nextInt(1 << Dedup.SimHashBits).toLong)
    // naive per-bit majority vote — the semantics the packed fold must match
    def naive(hs: Seq[Long]): Long =
      (0 until Dedup.SimHashBits).map { b =>
        val ones = hs.count(h => ((h >> b) & 1L) == 1L)
        if (2 * ones >= hs.length) 1L << b else 0L
      }.sum
    val over = Seq.fill(Dedup.SimHashMaxTokens + 1)(3L)
    val got = Seq(hashes, Seq.empty[Long], over)
      .toDF("hs").select(Dedup.simhash(col("hs")).as("sh")).collect()
    assert(got(0).getLong(0) == naive(hashes)) // byte lanes would overflow here
    assert(got(1).isNullAt(0)) // mirrors minhashSignature's empty → null
    assert(got(2).isNullAt(0)) // lane-overflow bound → no signature
  }

  test("distinctShinglesJvm ≡ array_distinct(wordShingles) incl. order") {
    val rnd = new scala.util.Random(17)
    val vocab = Seq("a", "b", "c", "d", "ee", "fff")
    val texts = (0 until 30).map(_ =>
      Seq.fill(rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")) ++
      Seq("", "a b", "  a   b  c  a b c ")
    for (k <- Seq(2, 3, 8)) {
      val got = texts.toDF("t")
        .select(
          Dedup.distinctShinglesUdf(col("t"), lit(k)).as("jvm"),
          array_distinct(Dedup.wordShingles(col("t"), k)).as("expr"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"k=$k")
      }
    }
  }

  test("null text: shingle/bigram kernels match expression semantics, no NPE") {
    // the expression forms route null through when(...).otherwise(empty):
    // null text → [] shingles / (0, 0) bigram stats, never a null or crash
    val df = Seq("a b c d", null).toDF("t")
    val got = df.select(
      Dedup.distinctShinglesUdf(col("t"), lit(2)).as("jvm"),
      array_distinct(Dedup.wordShingles(col("t"), 2)).as("expr"),
      graft.text.TextAnalysis.bigramStatsUdf(col("t")).as("bs")).collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
      assert(!r.isNullAt(2))
    }
    assert(got(1).getSeq[String](0).isEmpty)
    assert(got(1).getStruct(2).getLong(0) == 0L)
    assert(got(1).getStruct(2).getLong(1) == 0L)
  }

  test("minhashJvm fused kernel ≡ expression pipeline (incl. empty → null)") {
    val rnd = new scala.util.Random(3)
    val docs = (0 until 20).map { _ =>
      Seq.fill(1 + rnd.nextInt(50))(rnd.alphanumeric.take(3 + rnd.nextInt(12)).mkString)
    } :+ Seq.empty[String]
    val got = docs.toDF("shd")
      .select(
        Dedup.minhashUdf(col("shd")).as("jvm"),
        Dedup.minhashSignature(Dedup.hashAll(col("shd"))).as("expr"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
    assert(got.last.isNullAt(0)) // empty set → null signature both ways
  }

  test("simhashJvm fused kernel ≡ expression pipeline") {
    val rnd = new scala.util.Random(5)
    val docs = (0 until 20).map { _ =>
      Seq.fill(1 + rnd.nextInt(200))(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
    } :+ Seq.empty[String]
    val got = docs.toDF("t")
      .select(
        Dedup.simhashUdf(col("t")).as("jvm"),
        Dedup.simhash(Dedup.hashAll(col("t"))).as("expr"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
    }
    assert(got.last.isNullAt(0))
  }

  test("simhash: exact past 32,768 tokens (top-lane sign bit)") {
    // 40,000 tokens all sharing bit 3 (top lane of counter 0) drives that
    // lane past 32,767 — the packed long goes negative, and the old
    // arithmetic-shift + sign-preserving-% extraction returned negative
    // `ones`, silently clearing majority bits. SimHashMaxTokens = 65535
    // promises these documents fold exactly.
    val rnd = new scala.util.Random(11)
    val hashes = Seq.fill(40000)((rnd.nextInt(1 << Dedup.SimHashBits) | 0x8).toLong)
    def naive(hs: Seq[Long]): Long =
      (0 until Dedup.SimHashBits).map { b =>
        val ones = hs.count(h => ((h >> b) & 1L) == 1L)
        if (2L * ones >= hs.length) 1L << b else 0L
      }.sum
    val got = Seq(hashes).toDF("hs")
      .select(Dedup.simhash(col("hs")).as("sh")).as[Long].head()
    assert(got == naive(hashes))
    assert((got & 0x8L) == 0x8L) // the overflowing lane's bit IS set
  }

  test("simhash64: deterministic, local, null contracts, sign-safe bands") {
    val base = (1 to 200).map(i => s"tok$i")
    val a = Dedup.simhash64Jvm(base)
    // deterministic
    assert(a == Dedup.simhash64Jvm(base))
    // locality: replacing one token of 200 flips few of the 64 vote bits
    val b = Dedup.simhash64Jvm(base.updated(7, "CHANGED"))
    assert(java.lang.Long.bitCount(a ^ b) <= 8)
    // a disjoint vocabulary lands far away
    val c = Dedup.simhash64Jvm((1 to 200).map(i => s"other$i"))
    assert(java.lang.Long.bitCount(a ^ c) > 8)
    // contracts shared with the 24-bit form
    assert(Dedup.simhash64Jvm(Seq.empty) == null)
    assert(Dedup.simhash64Jvm(Seq.fill(Dedup.SimHashMaxTokens + 1)("x")) == null)
    // band extraction: a negative signature (top bit set) must yield the
    // true top-16 bits, not a sign-smeared value
    val neg = Seq(java.lang.Long.valueOf(0xF000_0000_0000_1234L))
    val got = neg.toDF("sh")
      .select(array(Dedup.simhash64Bands(col("sh")): _*).as("bs"))
      .head().getSeq[Long](0)
    assert(got == Seq(0x1234L, 0L, 0L, 0xF000L))
    // bands cover the signature: equal signatures share all four keys
    assert(got.length == 4)
  }

  test("PrefixFilter: exact prefix length at t=0.7, n=10 (float-ceil trap)") {
    // 10·0.7 = 7.000000000000001 in doubles; a bare ceil gives 8 and a
    // 3-prefix. A = {u1,u2,u3} ∪ S, B = S (|S|=7): jac = 7/10 = 0.7.
    // A's three df-1 unique tokens fill the shortened prefix, so the pair
    // is found ONLY via A's 4th prefix slot — missed by the buggy length.
    val shared = (1 to 7).map(i => s"s$i")
    val rows = Seq(
      (1L, Seq("u1", "u2", "u3") ++ shared),
      (2L, shared))
    val got = graft.dedup.PrefixFilter
      .jaccardSelfJoin(rows.toDF("doc_id", "gs"), "doc_id", "gs", 0.7)
      .collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 2L)
    assert(got(0).getDouble(2) == 0.7)
  }

  test("PrefixFilter: recall 1.0 vs brute force across t in {0.5,0.7,0.8,0.9}") {
    val rnd = new scala.util.Random(99)
    val vocab = (0 until 40).map(i => f"w$i%02d")
    val rows = (0 until 25).map { i =>
      (i.toLong, rnd.shuffle(vocab).take(5 + rnd.nextInt(12)).distinct)
    } ++ Seq((50L, (0 until 10).map(i => f"w$i%02d"))) // fixed 10-set: t·n integral at .7/.8/.9
    val df = rows.toDF("doc_id", "gs")
    for (t <- Seq(0.5, 0.7, 0.8, 0.9)) {
      val got = graft.dedup.PrefixFilter
        .jaccardSelfJoin(df, "doc_id", "gs", t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = rows.flatMap { case (i, a) =>
        rows.collect { case (j, b) if i < j =>
          val inter = a.toSet.intersect(b.toSet).size.toDouble
          (i, j, inter / (a.size + b.size - inter))
        }
      }.filter(_._3 >= t).map(p => (p._1, p._2)).toSet
      assert(got == brute, s"t=$t: got ${got.size}, brute ${brute.size}")
    }
  }

  test("foldHash UDFs: null-safe, empty string hashes to 0") {
    val df = Seq(("x", Seq("a", "b")), (null: String, null: Seq[String]))
      .toDF("s", "xs")
    val got = df.select(
      graft.functions.Exact.foldHashUdf(col("s")).as("h"),
      graft.functions.Exact.foldHashAllUdf(col("xs")).as("hs")).collect()
    assert(!got(0).isNullAt(0) && !got(0).isNullAt(1))
    assert(got(1).isNullAt(0) && got(1).isNullAt(1))
    val empty = Seq("").toDF("s")
      .select(graft.functions.Exact.foldHashUdf(col("s"))).as[Long].head()
    assert(empty == 0L)
  }

  test("rpLshBucket: deterministic and within [0, 2^planes)") {
    graft.functions.VectorFold.register(spark) // fold_dot, like st_contains
    val planes = Similarity.rpPlanes(8, 4)
    val v = Seq(Seq(1.0f, -2.0f, 0.5f, 3.0f)).toDF("e")
    val b1 = v.select(Similarity.rpLshBucket(col("e"), planes)).as[Long].head()
    val b2 = v.select(Similarity.rpLshBucket(col("e"), planes)).as[Long].head()
    assert(b1 == b2 && b1 >= 0 && b1 < 256)
  }

  test("PrefixFilter.jaccardSelfJoin equals brute-force all-pairs") {
    val rnd = new scala.util.Random(42)
    val vocab = ('a' to 'z').map(_.toString)
    // overlapping random sets, including clones, subsets, and an empty set
    val base = (0 until 30).map { i =>
      (i.toLong, rnd.shuffle(vocab).take(4 + rnd.nextInt(10)).distinct)
    }
    val rows = base ++ Seq(
      (100L, base(3)._2),                 // exact clone → jac 1.0
      (101L, base(5)._2.take(3)),         // subset
      (102L, Seq.empty[String]))          // empty set
    val df = rows.toDF("doc_id", "gs")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))
    val got = graft.dedup.PrefixFilter
      .jaccardSelfJoin(df, "doc_id", "gs", 0.5)
      .collect().map(key).toSet
    val brute = rows.flatMap { case (i, a) =>
      rows.collect { case (j, b) if i < j =>
        val inter = a.toSet.intersect(b.toSet).size
        val uni = a.toSet.union(b.toSet).size
        (i, j, if (uni == 0) -1.0 else inter.toDouble / uni)
      }
    }.filter(_._3 >= 0.5)
      .map { case (i, j, jac) => (i, j, math.round(jac * 1e9)) }.toSet
    assert(got == brute && brute.nonEmpty)
  }

  test("hamming: 0 for equal, counts flipped bits") {
    val got = Seq((5L, 5L), (0L, 7L))
      .toDF("a", "b").select(Dedup.hamming(col("a"), col("b")))
      .as[Int].collect()
    assert(got.toSeq == Seq(0, 3))
  }
}
