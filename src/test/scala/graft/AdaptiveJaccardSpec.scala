package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.PrefixFilter

/** The cost-based similarity-join dispatch ([[PrefixFilter]]):
  *
  *  - the grid-blocked all-pairs path must equal brute force exactly
  *    (every pair meets in exactly ONE grid cell — the canonicalization
  *    subtlety: a mixed cell sees one arbitrary orientation of a pair,
  *    the diagonal sees both);
  *  - the adaptive entry must produce identical (d1, d2, jac) rows to
  *    the prefix path on BOTH corpus shapes, so whichever plan the
  *    statistic picks, results cannot fork;
  *  - [[PrefixFilter.denseByStats]] itself: dense ⇔ avgPrefixLen² ≥
  *    distinct tokens (the Cauchy–Schwarz lower bound on prefix-join
  *    emissions vs the all-pairs count).
  */
class AdaptiveJaccardSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))

  private def brute(rows: Seq[(Long, Seq[String])], t: Double) =
    rows.flatMap { case (i, a) =>
      rows.collect { case (j, b) if i < j =>
        val inter = a.toSet.intersect(b.toSet).size
        val uni = a.toSet.union(b.toSet).size
        (i, j, if (uni == 0) -1.0 else inter.toDouble / uni)
      }
    }.filter(_._3 >= t)
      .map { case (i, j, jac) => (i, j, math.round(jac * 1e9)) }.toSet

  /** Dense shape: 30 docs over a 12-token vocabulary (avg prefix length
    * ~4 → 16 ≥ 12), plus a clone, a subset, and an empty set.
    */
  private def denseRows: Seq[(Long, Seq[String])] = {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 12).map(i => f"v$i%02d")
    val base = (0 until 30).map { i =>
      (i.toLong, rnd.shuffle(vocab).take(5 + rnd.nextInt(6)).distinct)
    }
    base ++ Seq(
      (100L, base(4)._2), (101L, base(9)._2.take(3)),
      (102L, Seq.empty[String]))
  }

  /** Sparse shape: 30 docs of 5–8 tokens over a 900-token vocabulary
    * (avg prefix length ~3 → 9 « 900), with planted near-dups so the
    * result set is non-empty.
    */
  private def sparseRows: Seq[(Long, Seq[String])] = {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 900).map(i => f"w$i%03d")
    val base = (0 until 30).map { i =>
      (i.toLong, rnd.shuffle(vocab).take(5 + rnd.nextInt(4)).distinct)
    }
    base ++ base.take(4).map { case (i, s) => (200L + i, s) } // clones
  }

  test("jaccardBlockJoin equals brute-force all-pairs") {
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val rows = denseRows
      val got = PrefixFilter
        .jaccardBlockJoin(rows.toDF("doc_id", "gs"), "doc_id", "gs", t)
        .collect().map(key).toSet
      assert(got == brute(rows, t) && brute(rows, t).nonEmpty, s"t=$t")
    }
  }

  test("blockJoin emits each qualifying pair exactly once") {
    val rows = denseRows
    val got = PrefixFilter
      .jaccardBlockJoin(rows.toDF("doc_id", "gs"), "doc_id", "gs", 0.3)
      .groupBy("d1", "d2").count().filter(col("count") > 1).count()
    assert(got == 0L)
  }

  test("adaptive equals the prefix path on dense AND sparse corpora") {
    for (rows <- Seq(denseRows, sparseRows)) {
      val df = rows.toDF("doc_id", "gs")
      val viaAdaptive = PrefixFilter
        .jaccardSelfJoinAdaptive(df, "doc_id", "gs", 0.5)
        .collect().map(key).toSet
      val viaPrefix = PrefixFilter
        .jaccardSelfJoin(df, "doc_id", "gs", 0.5)
        .collect().map(key).toSet
      assert(viaAdaptive == viaPrefix && viaPrefix.nonEmpty)
    }
  }

  test("denseByStats: the Cauchy-Schwarz switch") {
    // measured 10x documents corpus: pbar 73, alphabet 389 -> dense
    assert(PrefixFilter.denseByStats(73.0, 389L))
    // natural-text shape: prefixes of tens, alphabet in the millions
    assert(!PrefixFilter.denseByStats(60.0, 5_000_000L))
    // boundary: pbar^2 == A counts as dense (raw >= all-pairs already)
    assert(PrefixFilter.denseByStats(20.0, 400L))
    assert(!PrefixFilter.denseByStats(19.0, 400L))
    assert(!PrefixFilter.denseByStats(5.0, 0L)) // empty corpus -> prefix
  }
}
