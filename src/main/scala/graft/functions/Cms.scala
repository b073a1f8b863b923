package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as PERSISTED STATE rows — the frequency member of the
  * mergeable-sketch family (distinct: HLL q104, quantile: histogram
  * q137/q138, frequency: here). The sketch is d hash rows × W counter
  * columns stored as (r, c, cnt) LONG rows, so merging ingest batches or
  * days is exact long addition — order-free and batching-invariant, the
  * same property the histogram state relies on. Point estimates read the
  * merged table only (≤ d·W rows, broadcastable), never the raw corpus.
  *
  * Hashing is the classic universal family h_i(k) = ((k mod p)·a_i + b_i)
  * mod p mod W over the Mersenne prime p = 2^31−1, computed entirely in
  * int64 Catalyst arithmetic: (k mod p) < 2^31 and a_i < 2^31 keep the
  * product under 2^62, so the SAME expression replays bit-for-bit in any
  * engine with 64-bit integer semantics — the DuckDB oracle recomputes
  * the whole sketch rather than checking a tolerance band.
  *
  * Guarantees (CmsSketchSpec pins all three): est ≥ exact always (each
  * cell counts a superset of the key's occurrences); est ≤ exact + ε·N
  * with probability 1−(1/2)^d over the hash draw for ε = e/W; and
  * per-batch state summed ≡ one-shot state.
  *
  * Scale shape: the state build is one partial-agg shuffle over the
  * corpus at ingest (the explode is map-side, ×d); estimates touch the
  * merged sketch + a workload-sized probe set only.
  */
object Cms {

  val P: Long = 2147483647L // 2^31 − 1
  val W: Long = 8192L
  /** (a_i, b_i) per hash row; a_i < 2^31 keeps (k mod p)·a_i < 2^62. */
  val RowParams: Seq[(Long, Long)] = Seq(
    (98765431L, 12345L),
    (123456791L, 54321L),
    (777767777L, 11111L),
    (999999937L, 99999L))

  def depth: Int = RowParams.length

  /** Hash row i's column index for `key` (non-negative long keys). */
  def cell(key: Column, i: Int, w: Long = W): Column = {
    val (a, b) = RowParams(i)
    ((key % P) * a + b) % P % w
  }

  /** One (r, c) struct per hash row, for explode-based state builds. */
  private def cells(key: Column, w: Long): Column =
    array(RowParams.indices.map(i =>
      struct(lit(i.toLong).as("r"), cell(key, i, w).as("c"))): _*)

  /** Sketch-state rows (groupNames..., r, c, cnt) for the long keys in
    * `keyCol` — one partial-agged shuffle; the group columns (e.g. a day
    * column already on `df`) make the state incrementally mergeable per
    * cell.
    */
  def state(df: DataFrame, keyCol: Column, groupNames: Seq[String],
      w: Long = W): DataFrame =
    df.select(groupNames.map(col) :+ explode(cells(keyCol, w)).as("rc"): _*)
      .groupBy(groupNames.map(col) ++
        Seq(col("rc.r").as("r"), col("rc.c").as("c")): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Collapse state rows (any grouping) to the merged d×W sketch. */
  def merge(state: DataFrame): DataFrame =
    state.groupBy("r", "c").agg(sum(col("cnt")).as("cnt"))

  /** Frequency estimates for `probes` (a frame with long column `keyName`)
    * against a merged sketch: min over the d probed cells. The sketch is
    * broadcast (≤ d·W rows); the probe side never rescans the corpus.
    * Keys absent from every cell of some row would inner-join away — CMS
    * cells are ≥ 0 and a key present in the corpus hits cnt ≥ its own
    * count, so inner is correct for corpus-derived probe sets.
    */
  def estimate(probes: DataFrame, merged: DataFrame, keyName: String,
      w: Long = W): DataFrame =
    probes
      .select(col(keyName), explode(cells(col(keyName), w)).as("rc"))
      .select(col(keyName), col("rc.r").as("r"), col("rc.c").as("c"))
      .join(broadcast(merged), Seq("r", "c"))
      .groupBy(keyName)
      .agg(min(col("cnt")).as("est"))

  /** The DuckDB replay of the whole sketch + probe path over the events
    * table — day grouping elided because exact addition makes the merge
    * invariant to it. Shared verbatim by the batch (q141) and streaming
    * (q142) gates, which must produce identical state by construction.
    */
  def eventsOracleSql: String = {
    val hRows = RowParams.zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    s"""WITH h(r, a, b) AS (VALUES $hRows),
       |state AS (
       |  SELECT r, ((user_id % $P) * a + b) % $P % $W AS c,
       |    COUNT(*) AS cnt
       |  FROM events CROSS JOIN h GROUP BY 1, 2),
       |pr AS (
       |  SELECT p.user_id, h.r,
       |    ((p.user_id % $P) * h.a + h.b) % $P % $W AS c
       |  FROM (SELECT DISTINCT user_id FROM events) p CROSS JOIN h),
       |est AS (
       |  SELECT pr.user_id, MIN(s.cnt) AS est
       |  FROM pr JOIN state s ON s.r = pr.r AND s.c = pr.c
       |  GROUP BY 1),
       |ex AS (SELECT user_id, COUNT(*) AS n_exact FROM events GROUP BY 1)
       |SELECT ex.user_id, n_exact, est, est >= n_exact AS no_undercount
       |FROM ex JOIN est ON ex.user_id = est.user_id
       |ORDER BY ex.user_id""".stripMargin
  }
}
