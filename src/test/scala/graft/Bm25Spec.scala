package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Bm25

/** q143's BM25 scoring: the Catalyst expression against an independent
  * Scala-double replay of the same formula (identical op order — must
  * match bit-for-bit, both run on the JVM), the top-k plan shape
  * (TakeOrderedAndProject, never a global sort), and end-to-end rank
  * sanity on the real table. The cross-engine score gate itself is the
  * q143 DuckDB oracle's job.
  */
class Bm25Spec extends AnyFunSuite with SparkSpec {

  private def scalaBm25(tf: Long, dl: Long, df: Long, n: Long, avgdl: Double): Double = {
    val idf = math.log(1.0 + (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5))
    idf * ((tf.toDouble * 2.2) / (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl))))
  }

  test("termScore matches a scala-double replay bit-for-bit; tf=0 scores exactly 0") {
    import spark.implicits._
    val rows = Seq(
      (3L, 7L, 2L, 10L, 6.5),
      (1L, 30L, 9L, 10L, 6.5),
      (0L, 12L, 5L, 10L, 6.5),
      (5L, 5L, 10L, 10L, 6.5)) // df > N/2 still non-negative (Lucene idf)
    val got = rows.toDF("tf", "dl", "df", "n", "avgdl")
      .select(Bm25.termScore(col("tf"), col("dl"), col("df"), col("n"), col("avgdl")).as("s"))
      .collect().map(_.getDouble(0))
    rows.zip(got).foreach { case ((tf, dl, df, n, avgdl), s) =>
      assert(s == scalaBm25(tf, dl, df, n, avgdl), s"tf=$tf dl=$dl df=$df")
      assert(s >= 0.0)
    }
    assert(got(2) == 0.0)
  }

  test("q143 top-k is TakeOrderedAndProject (per-partition heap), not a global sort") {
    val plan = SparkEntry.queries("q143_bm25_topk")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q143 end-to-end: 10 ranked rows, scores non-increasing, every row matches a term") {
    val out = SparkEntry.queries("q143_bm25_topk")(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(4)).toSeq == (1L to 10L))
    val scores = out.map(_.getLong(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(out.forall(_.getLong(2) >= 1)) // n_hit ≥ 1: candidate filter held
    assert(out.forall(_.getLong(3) > 0)) // matched docs score strictly positive
  }
}
