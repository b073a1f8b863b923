package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextAnalysis

/** Dual-impl cross-check for the quality-score twins (the VectorFold/
  * HashedLinear policy): the JVM counting kernel + Catalyst score
  * assembly must be BIT-identical to the pure-expression form on real
  * testdata and on the edge shapes — punct-only, no-stopword,
  * >100-token cap saturation, NULL text (NULL score both ways), and
  * EMPTY text, where both forms throw the same ANSI DIVIDE_BY_ZERO
  * (the score's 0-token division).
  */
class TextKernelSpec extends AnyFunSuite with SparkSpec {

  private val stop = graft.queries.TextQueries.EnStop

  test("qualityScoreFast ≡ qualityScore bit-for-bit on testdata") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val both = docs.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text"), stop).as("expr"),
      TextAnalysis.qualityScoreFast(col("text"), stop).as("fast"))
      .collect()
    assert(both.length >= 100)
    both.foreach { r =>
      val (e, f) = (r.getDouble(1), r.getDouble(2))
      assert(java.lang.Double.doubleToLongBits(e) ==
        java.lang.Double.doubleToLongBits(f),
        s"doc ${r.getLong(0)}: expr $e vs fast $f")
    }
  }

  test("edge shapes: punct-only, stopword-free, long, NULL; both throw on empty") {
    import spark.implicits._
    // empty text: 0 tokens → the score's 0/0 division throws under ANSI
    // in BOTH forms (identical Divide ops) — exception parity, pinned
    Seq(
      TextAnalysis.qualityScore(col("text"), stop),
      TextAnalysis.qualityScoreFast(col("text"), stop)).foreach { c =>
      intercept[Exception] {
        Seq("").toDF("text").select(c).collect()
      }
    }
    val rows = Seq(
      Some("!!! ??? ..."), Some("zz yy xx"),
      Some(Seq.fill(250)("the").mkString(" ")), Some("the  a   scan"),
      None).toDF("text")
    val got = rows.select(
      TextAnalysis.qualityScore(col("text"), stop).as("expr"),
      TextAnalysis.qualityScoreFast(col("text"), stop).as("fast"))
      .collect()
    got.foreach { r =>
      (r.isNullAt(0), r.isNullAt(1)) match {
        case (true, true) => ()
        case (false, false) =>
          assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
            java.lang.Double.doubleToLongBits(r.getDouble(1)),
            s"expr ${r.getDouble(0)} vs fast ${r.getDouble(1)}")
        case other => fail(s"null-ness diverged: $other")
      }
    }
  }
}
