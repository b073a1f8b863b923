package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Exact
import graft.text.TextAnalysis

/** Pins the hashed-linear classifier kernel: the one-pass JVM fold is
  * bit-identical to the builtin-expression formulation (hash → bucket →
  * weight → sum per token), weights stay in their declared range, and
  * null/empty text degrades to (0, 0).
  */
class HashedLinearSpec extends AnyFunSuite with SparkSpec {

  /** Expression twin of [[TextAnalysis.hashedLinearJvm]] at dim=4096 —
    * the documented-slower form the kernel replaced (per-token
    * per-character fold arrays), kept here as the equivalence witness.
    */
  private def marginExpr(text: org.apache.spark.sql.Column) =
    aggregate(
      transform(TextAnalysis.tokens(text),
        t => Exact.foldHash(t) % 4096L * 2654435761L % 2001L - 1000L),
      lit(0L), (a, x) => a + x)

  test("JVM kernel ≡ expression twin on the documents corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val both = docs
      .withColumn("hl", TextAnalysis.hashedLinearUdf(col("text")))
      .select(col("doc_id"), col("hl._1").as("n_udf"), col("hl._2").as("m_udf"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_exp"),
        marginExpr(col("text")).as("m_exp"))
    val off = both.filter(col("n_udf") =!= col("n_exp") ||
      col("m_udf") =!= col("m_exp")).count()
    assert(off == 0, "kernel and expression twin disagree")
    // and the corpus actually exercises both classes
    val kept = both.filter(col("m_udf") > 0).count()
    assert(kept > 0 && kept < both.count(), "degenerate margin distribution")
  }

  test("weights bounded, determinism across calls, null/empty → (0,0)") {
    // per-token weight range: |w| ≤ 1000 ⇒ |margin| ≤ 1000·n_tok
    val (n, m) = TextAnalysis.hashedLinearJvm("a b c d e f", 4096L)
    assert(n == 6 && math.abs(m) <= 6000)
    assert(TextAnalysis.hashedLinearJvm("a b c d e f", 4096L) == ((n, m)))
    assert(TextAnalysis.hashedLinearJvm("", 4096L) == ((0L, 0L)))
    assert(TextAnalysis.hashedLinearJvm("   ", 4096L) == ((0L, 0L)))
    import spark.implicits._
    val got = Seq(Option.empty[String]).toDF("text")
      .select(TextAnalysis.hashedLinearUdf(col("text")).as("hl"))
      .select("hl._1", "hl._2").head()
    assert(got.getLong(0) == 0L && got.getLong(1) == 0L)
  }
}
