package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** [[Dedup.substringDupStats]] — substring-level duplication via k-token
  * window hashing (the ExactSubstr approximation):
  *
  *  - window arithmetic: a doc of n ≥ k tokens yields n−k+1 windows;
  *    fewer than k tokens (or NULL text) yields no output row;
  *  - cross-doc detection: two docs sharing one k-token span each get
  *    exactly the shared window flagged, nothing else;
  *  - WITHIN-doc repetition counts too (both copies of a repeated span
  *    are duplicated occurrences — the hash count is global, not
  *    distinct-doc);
  *  - a property pin against a JVM brute force on random low-vocabulary
  *    token streams (collisions guaranteed), covering counts and the
  *    dup_frac division.
  */
class SubstringDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val K = 4

  private def run(docs: Seq[(Long, String)]) =
    Dedup.substringDupStats(docs.toDF("doc_id", "text"), K)
      .select("doc_id", "n_windows", "n_dup_windows", "dup_frac")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  private def brute(docs: Seq[(Long, String)]) = {
    val wins = docs.flatMap { case (id, t) =>
      Option(t).toSeq.flatMap(_.split(" ").filter(_.nonEmpty).toSeq
        .sliding(K).filter(_.size == K).map(w => (id, w.mkString(" "))))
    }
    val cnt = wins.groupBy(_._2).view.mapValues(_.size).toMap
    wins.groupBy(_._1).view.mapValues { ws =>
      val n = ws.size.toLong
      val dup = ws.count(w => cnt(w._2) > 1).toLong
      (n, dup, dup.toDouble / n)
    }.toMap
  }

  test("window count, short-doc absence, and cross-doc span detection") {
    val docs = Seq(
      (1L, "a b c d e f"),     // 3 windows; shares "c d e f" with doc 2
      (2L, "c d e f x y"),     // 3 windows; window 1 is the shared span
      (3L, "p q r"),           // < K tokens → absent
      (4L, "u v w x")          // 1 window, unique → 0 dups
    )
    val got = run(docs)
    assert(got === Map(
      1L -> ((3L, 1L, 1.0 / 3)),
      2L -> ((3L, 1L, 1.0 / 3)),
      4L -> ((1L, 0L, 0.0))))
  }

  test("within-doc repetition flags both occurrences") {
    // "m n o p m n o p": windows at 1 and 5 are identical — the hash
    // count is 2, so BOTH occurrences are duplicated spans
    val got = run(Seq((1L, "m n o p m n o p")))
    val (n, dup, _) = got(1L)
    assert(n === 5L)
    assert(dup >= 2L) // 1 and 5 at minimum (bridging windows are unique)
    assert(got(1L)._3 === dup.toDouble / n)
  }

  test("null text contributes nothing") {
    val docs = Seq((1L, "a b c d e"), (2L, null: String))
    assert(run(docs).keySet === Set(1L))
  }

  test("property: matches JVM brute force on random low-vocab streams") {
    val rnd = new scala.util.Random(43)
    val vocab = Vector("t0", "t1", "t2", "t3")
    val docs = (0 until 40).map { i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(4))).mkString(" "))
    }
    assert(run(docs) === brute(docs))
  }
}
