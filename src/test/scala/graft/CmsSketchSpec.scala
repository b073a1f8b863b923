package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Cms

/** q141/q142's mergeable count-min state. Three properties:
  * the hard no-undercount guarantee (every cell counts a superset of its
  * key's occurrences, so min over rows never undercounts); the CMS error
  * bound est ≤ exact + ε·N, ε = e/W, which holds per key with probability
  * ≥ 1 − e^{-d} over the hash draw (fixed hashes + fixed data make the
  * observed fraction deterministic; gated at ≥ 90%); and incremental
  * state maintenance — per-batch counter rows summed ≡ the one-shot
  * sketch, with committed-batch replay a no-op. The bit-exact estimate
  * replay itself is the q141/q142 oracle's job.
  */
class CmsSketchSpec extends AnyFunSuite with SparkSpec {

  // Zipf-ish skew over 200 keys, 6000 rows, deterministic
  private def corpus = {
    import spark.implicits._
    (0 until 6000).map { i =>
      val r = (i * 2654435761L) % 1000
      val key = if (r < 500) r % 10 else r % 200
      key
    }.toDF("k")
  }

  test("small-width sketch: no undercount ever; CMS bound holds for >=90% of keys") {
    val w = 64L // narrow on purpose: collisions guaranteed (200 keys, 64 cells)
    val merged = Cms.merge(Cms.state(corpus, col("k"), Nil, w))
    val got = Cms.estimate(corpus.select(col("k")).distinct(), merged, "k", w)
      .join(corpus.groupBy("k").agg(count(lit(1)).as("n")), "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 200)
    got.foreach { case (k, est, n) =>
      assert(est >= n, s"key $k undercounted: est $est < exact $n")
    }
    val epsN = math.E / w * 6000
    val inBound = got.count { case (_, est, n) => est - n <= epsN }
    assert(inBound >= 180, s"only $inBound/200 keys inside est-exact <= $epsN")
  }

  test("per-row cells are exact collision sums (the state build is the sketch)") {
    // independent scala-side replay of row 0's cells: the (r=0, c) counter
    // must equal the total count of ALL keys hashing to c — the superset
    // property behind no-undercount, checked as an exact identity
    val w = 64L
    val keys = corpus.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (a, b) = Cms.RowParams(0)
    val expected = keys.groupBy { case (k, _) => ((k % Cms.P) * a + b) % Cms.P % w }
      .map { case (c, ks) => c -> ks.map(_._2).sum }
    val row0 = Cms.state(corpus, col("k"), Nil, w)
      .filter(col("r") === 0).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(row0 == expected)
  }

  test("counter state maintained incrementally across batches equals the one-shot sketch") {
    val root = java.nio.file.Files.createTempDirectory("graft_cms_inc").toString
    val all = corpus
    Seq(0, 1, 2).foreach { b =>
      sinks.IdempotentFileSink.writeBatch(
        Cms.state(all.filter(abs(hash(col("k"))) % 3 === b), col("k"), Nil),
        root, b)
    }
    // replay of a committed batch adds nothing (exactly-once state)
    sinks.IdempotentFileSink.writeBatch(Cms.state(all.limit(10), col("k"), Nil), root, 1)
    val merged = Cms.merge(sinks.IdempotentFileSink.read(spark, root))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val oneShot = Cms.state(all, col("k"), Nil)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == oneShot)
  }
}
