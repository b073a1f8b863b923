package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the sequence-prep extensions beyond their
  * oracle hash gates: q152's sliding-window chunk geometry (coverage, no
  * phantom tails, exact overlap) and q151's bigram accounting, checked
  * against token counts recomputed independently from the corpus.
  */
class SeqPrepSpec extends AnyFunSuite with SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  private def tokenCounts = Tables.documents(spark, Sf)
    .select(col("doc_id"),
      size(graft.text.TextAnalysis.tokens(col("text"))).cast("long").as("n"))

  test("q152 chunk geometry: full coverage, clipped tail, stride-exact starts") {
    val chunks = SparkEntry.queries("q152_chunk_sliding")(spark, Sf)
      .select("doc_id", "chunk_id", "start_tok", "n_tok")
    val byDoc = chunks.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"),
      max(col("start_tok") + col("n_tok") - 1).as("last_end"),
      min(col("start_tok")).as("first_start"),
      max(col("n_tok")).as("max_len"),
      min(col("n_tok")).as("min_len"))
      .join(tokenCounts, Seq("doc_id"))
      .collect()
    assert(byDoc.nonEmpty)
    byDoc.foreach { r =>
      val (n, nChunks) = (r.getAs[Long]("n"), r.getAs[Long]("n_chunks"))
      // every token of the doc is inside some chunk, and no chunk reaches
      // past the document
      assert(r.getAs[Long]("first_start") == 1L, r.toString)
      assert(r.getAs[Long]("last_end") == n, r.toString)
      assert(r.getAs[Long]("max_len") <= 32L, r.toString)
      assert(r.getAs[Long]("min_len") >= 1L, r.toString)
      // chunk count formula: one window, then one per stride step
      val expected = if (n <= 32) 1L else 1L + ((n - 32) + 23) / 24
      assert(nChunks == expected, s"doc ${r.getAs[Long]("doc_id")}: $r")
    }
    // starts advance by exactly the stride (24), per chunk_id
    val badStart = chunks.filter(col("start_tok") =!= col("chunk_id") * 24 + 1)
    assert(badStart.isEmpty, "chunk starts off-stride")
  }

  test("q151 bigram accounting: one bigram per adjacent pair, positive NLL") {
    val out = SparkEntry.queries("q151_bigram_lm_nll")(spark, Sf)
      .join(tokenCounts, Seq("doc_id"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") == r.getAs[Long]("n") - 1, r.toString)
      // smoothed probabilities are strictly < 1, so every doc pays > 0
      assert(r.getAs[Long]("nll_e6") > 0L, r.toString)
    }
    // every multi-token doc is scored; shorter docs are excluded
    val scored = out.length.toLong
    val eligible = tokenCounts.filter(col("n") >= 2).count()
    assert(scored == eligible)
  }
}
