package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** BM25 (Okapi, Lucene's non-negative idf variant) term scoring as pure
  * Catalyst double arithmetic — the ranking core of lexical retrieval and
  * of retrieval-based quality filtering over a training corpus.
  *
  * Cross-engine determinism contract (the q143 oracle replays every
  * score): all inputs are integers (tf, dl, df, N, Σdl), constants are
  * exactly-representable doubles written identically on both sides
  * (2.2, 1.2, 0.25, 0.75), and the expression tree applies +,-,*,/ in
  * the SAME association order as the oracle SQL — IEEE 754 makes those
  * bit-exact. The one transcendental (ln) may differ by an ulp between
  * libm and the JVM, which the gate absorbs by comparing scores at 1e-6
  * granularity (floor(x*1e6+0.5), never a raw double).
  *
  * Scale shape: termScore is per-row map-side math over an
  * already-candidate-filtered frame; the corpus-level inputs (N, Σdl,
  * per-term df) are one-row aggregates broadcast to it.
  */
object Bm25 {

  /** k1 = 1.2 (tf saturation), b = 0.75 (length normalization) — the
    * standard Robertson/Lucene defaults.
    */
  val K1 = 1.2
  val B = 0.75

  /** Lucene-style idf: ln(1 + (N − df + 0.5)/(df + 0.5)) — always ≥ 0,
    * unlike the classic form which goes negative past df > N/2.
    */
  def idf(df: Column, nDocs: Column): Column =
    log(lit(1.0) + (nDocs.cast("double") - df.cast("double") + lit(0.5)) /
      (df.cast("double") + lit(0.5)))

  /** One term's BM25 contribution: idf · tf·(k1+1) / (tf + k1·(1−b +
    * b·dl/avgdl)). tf = 0 yields exactly 0.0, so summing over a fixed
    * query-term list needs no matched-term bookkeeping.
    */
  def termScore(tf: Column, dl: Column, df: Column, nDocs: Column,
      avgdl: Column): Column = {
    val sat = (tf.cast("double") * lit(2.2)) /
      (tf.cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) *
        (dl.cast("double") / avgdl)))
    idf(df, nDocs) * sat
  }
}
