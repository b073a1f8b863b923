package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SetKernels

/** Exact Jaccard similarity self-join via prefix filtering — the
  * AllPairs / PPJoin candidate-generation principle (Bayardo et al.,
  * WWW'07; Xiao et al., WWW'08; both public literature).
  *
  * Principle: fix any global total order over set elements and give each
  * set `x` a prefix of its first `|x| − ⌈t·|x|⌉ + 1` elements. Any pair
  * with Jaccard ≥ t has overlap ≥ ⌈t·max(|a|,|b|)⌉, and two sets with
  * overlap ≥ α must share an element within their (|x| − α + 1)-prefixes
  * — so joining prefix tokens finds EVERY qualifying pair (recall 1.0,
  * unlike MinHash banding whose s-curve drops threshold-grazing pairs),
  * while non-candidates never meet.
  *
  * Design for 100 TB:
  *  - The global element order is ascending document frequency (ties by
  *    value) — rare elements land in prefixes, so candidate buckets stay
  *    small even though natural-language token frequencies are Zipfian
  *    (a lexicographic order would put stop-grams in prefixes and
  *    recreate the quadratic blowup in those buckets).
  *  - Everything is equi-join shaped: explode → count → sort → slice →
  *    equi-join on the prefix token → verify candidates by id join. No
  *    cross join, no non-equi self-join, no driver-side loops.
  *  - The `a.id < b.id` pair canonicalization is a post-join filter on an
  *    equi-keyed join, not a join condition that forces a nested loop.
  *  - Prefix filtering is COST-BASED, not unconditional
  *    ([[jaccardSelfJoinAdaptive]]): over a small element alphabet the
  *    prefix buckets cover the corpus and the candidate join degenerates
  *    to emitting (nearly) all pairs once PER SHARED PREFIX TOKEN —
  *    measured on the 10× documents corpus (2,500 docs, 389 distinct
  *    3-grams): 91.2M raw join rows for 3.12M distinct candidates, i.e.
  *    29× the rows a direct all-pairs evaluation would even look at.
  *    When a cheap statistic PROVES the prefix join can't emit fewer
  *    rows than all-pairs, the adaptive entry switches to
  *    [[jaccardBlockJoin]], a grid-blocked all-pairs equi-join whose
  *    verify kernel is the only per-pair cost.
  */
object PrefixFilter {

  /** Exact-verify projection shared by both paths: sort each set once
    * per DOCUMENT (`array_sort` → binary `UTF8String` order) so every
    * pair evaluation is a zero-allocation two-pointer merge
    * ([[graft.functions.SortedIntersectCount]]) instead of a per-pair
    * hash set (`array_intersect`). The Jaccard arithmetic is the exact
    * shape of [[Dedup.jaccard]] — `c / (|a| + |b| − c)` in double — so
    * values are bit-identical to the `array_intersect` form.
    */
  private def jac(s1: Column, n1: Column, s2: Column, n2: Column): Column = {
    val c = SetKernels.intersectCount(s1, s2)
    c.cast("double") / (n1 + n2 - c)
  }

  /** All pairs from `sets` (`idCol`: orderable id, `setCol`:
    * array&lt;string&gt; of DISTINCT elements) with Jaccard ≥ `t`.
    * Output: (d1, d2, jac), d1 &lt; d2 — exactly the all-pairs result.
    *
    * This is the SPARSE-alphabet path (prefix filtering); prefer
    * [[jaccardSelfJoinAdaptive]] when the corpus shape is not known in
    * advance.
    */
  def jaccardSelfJoin(sets: DataFrame, idCol: String, setCol: String,
      t: Double): DataFrame = {
    SetKernels.register(sets.sparkSession)
    val src = sets.select(col(idCol).as("_id"), col(setCol).as("_set"))
    val tokens = src.select(col("_id"), explode(col("_set")).as("_tok"))

    // global order: ascending document frequency, ties by token value
    val dfreq = tokens.groupBy("_tok").agg(count(lit(1)).as("_df"))
    val ordered = tokens.join(dfreq, "_tok")
      .groupBy("_id")
      .agg(array_sort(collect_list(struct(col("_df"), col("_tok")))).as("_ord"))
      .select(col("_id"),
        transform(col("_ord"), e => e("_tok")).as("_sorted"))

    // prefix length |x| - ceil(t*|x|) + 1 (≥ 1 unless the set is empty;
    // empty sets yield empty prefixes → no candidates, matching J=∅ rules).
    // The product is rounded to 9 decimals before the ceiling: for t·n
    // mathematically integral but not binary-exact (t=0.7, n=10 →
    // 7.000000000000001) a bare ceil overshoots, shortening the prefix by
    // one and breaking the recall-1.0 lemma.
    val n = size(col("_sorted"))
    val prefLen = (n - ceil(round(n * t, 9)) + 1).cast("int")
    val prefixes = ordered
      .select(col("_id"),
        explode(slice(col("_sorted"), lit(1), prefLen)).as("_tok"))

    // candidate pairs: equi-join on the prefix token (skew-bounded by the
    // df ordering), canonicalized and deduped. The explicit-width
    // repartition after the dedup is load-bearing: a candidate row is two
    // bare ids, so the exchange is tiny in BYTES and AQE coalesces its
    // read down to one task — but every surviving row then pays an
    // O(|set|) exact-intersection verify in that same stage, so the stage
    // is CPU-bound, not byte-bound (measured on q29 at sf0.1: coalesced =
    // ~4 s of single-threaded verification; pinned = parallel, ~1.5 s
    // total). A user-specified partition count is exempt from AQE
    // coalescing, which is exactly the contract wanted here.
    val width = sets.sparkSession.sessionState.conf.numShufflePartitions
    val cand = prefixes.as("a")
      .join(prefixes.as("b"), col("a._tok") === col("b._tok"))
      .filter(col("a._id") < col("b._id"))
      .select(col("a._id").as("d1"), col("b._id").as("d2"))
      .distinct()
      .repartition(width, col("d1"), col("d2"))

    // exact verification on the original sets (sorted once per doc)
    val srcSorted = src.select(col("_id"),
      array_sort(col("_set")).as("_ss"), size(col("_set")).as("_n"))
    cand
      .join(srcSorted.select(col("_id").as("d1"),
        col("_ss").as("_s1"), col("_n").as("_n1")), "d1")
      .join(srcSorted.select(col("_id").as("d2"),
        col("_ss").as("_s2"), col("_n").as("_n2")), "d2")
      .select(col("d1"), col("d2"),
        jac(col("_s1"), col("_n1"), col("_s2"), col("_n2")).as("jac"))
      .filter(col("jac") >= t)
  }

  /** The cost decision: can the prefix-token equi-join possibly emit
    * fewer rows than a direct all-pairs evaluation?
    *
    * Let T = Σ per-doc prefix length = docs · avgPrefixLen be the total
    * prefix rows and A the number of distinct elements in the corpus.
    * The raw join emission is Σ_buckets C(c_b, 2) over per-token bucket
    * sizes c_b with Σ c_b ≤ T over ≤ A buckets; by Cauchy–Schwarz it is
    * minimized when buckets are uniform: Σ C(c_b,2) ≥ ~T²/(2A). If even
    * that BEST case is ≥ C(docs, 2) ≈ docs²/2 — i.e.
    * `avgPrefixLen² ≥ A` — prefix filtering provably emits at least as
    * many rows as all-pairs looks at (and in practice many times more:
    * one row per shared prefix token, before the dedup exchange), so the
    * block join is the cheaper plan. The test is deliberately one-sided:
    * it switches ONLY on proof, so a Zipfian natural-text corpus (A in
    * the millions, prefixes of tens) always keeps the prefix path.
    */
  def denseByStats(avgPrefixLen: Double, distinctTokens: Long): Boolean =
    distinctTokens > 0 && avgPrefixLen * avgPrefixLen >= distinctTokens.toDouble

  /** Grid-blocked all-pairs Jaccard — the DENSE-alphabet path. Each doc
    * hashes to one of B blocks; a pair of blocks (i ≤ j) is one grid
    * cell, each side replicates to its B−b (resp. b+1) cells, and the
    * cell id is an EQUI-join key — no cross join, no BNLJ, and every
    * pair of docs meets in exactly one cell (proved in AdaptiveJaccardSpec
    * against brute force). B ≈ √(4·width) keeps ~2 cells per shuffle
    * partition for smoothing while each row replicates only O(√width)
    * times — the classic triangle-join replication bound, so a wider
    * cluster (higher `spark.sql.shuffle.partitions`) gets more cells,
    * not more copies per row.
    */
  def jaccardBlockJoin(sets: DataFrame, idCol: String, setCol: String,
      t: Double): DataFrame = {
    SetKernels.register(sets.sparkSession)
    val width = sets.sparkSession.sessionState.conf.numShufflePartitions
    val blocks = math.max(2, math.ceil(math.sqrt(4.0 * width)).toInt)
    val src = sets.select(col(idCol).as("_id"),
      array_sort(col(setCol)).as("_ss"), size(col(setCol)).as("_n"),
      pmod(hash(col(idCol)), lit(blocks)).as("_b"))
    val left = src.select(col("_id").as("_ida"), col("_ss").as("_sa"),
      col("_n").as("_na"), col("_b").as("_i"),
      explode(sequence(col("_b"), lit(blocks - 1))).as("_j"))
    val right = src.select(col("_id").as("_idb"), col("_ss").as("_sb"),
      col("_n").as("_nb"), col("_b").as("_j"),
      explode(sequence(lit(0), col("_b"))).as("_i"))
    left.join(right, Seq("_i", "_j"))
      // diagonal cells see both orientations of a pair → keep one; a
      // mixed cell (i < j) sees exactly one orientation → keep it
      // regardless of id order and canonicalize below
      .filter(col("_i") =!= col("_j") || col("_ida") < col("_idb"))
      .select(
        least(col("_ida"), col("_idb")).as("d1"),
        greatest(col("_ida"), col("_idb")).as("d2"),
        jac(col("_sa"), col("_na"), col("_sb"), col("_nb")).as("jac"))
      .filter(col("jac") >= t)
  }

  /** Cost-based entry: one metadata-scale statistics pass (a single
    * one-row driver collect, same spirit as [[graft.Sizing.measuredWidth]])
    * decides between [[jaccardSelfJoin]] (sparse alphabet) and
    * [[jaccardBlockJoin]] (dense alphabet) via [[denseByStats]]. The
    * distinct-token count uses `approx_count_distinct` — a few percent
    * of error cannot flip a decision whose dense side is entered on a
    * provable ≥1× bound that in the measured dense case holds with 13×
    * slack (avgPrefixLen² = 73² = 5,329 vs A = 389; a natural-text
    * corpus sits orders of magnitude on the other side).
    */
  def jaccardSelfJoinAdaptive(sets: DataFrame, idCol: String,
      setCol: String, t: Double): DataFrame = {
    val src = sets.select(col(idCol).as("_id"), col(setCol).as("_set"))
    val sz = size(col("_set"))
    // BOTH statistics in ONE action over ONE scan: a caller whose input
    // is an unmaterialized upstream pipeline would otherwise execute it
    // twice here and a third time under the chosen join. posexplode_outer
    // keeps empty-set rows (null pos/tok), so gating _p on "first
    // position or no position" counts exactly one prefix length per
    // source row — the same avg as a pre-explode pass — while the token
    // column feeds the HLL in the same aggregate (nulls are ignored).
    val stats = src
      .select((sz - ceil(round(sz * t, 9)) + 1).cast("double").as("_p"),
        posexplode_outer(col("_set")).as(Seq("_pos", "_tok")))
      .agg(
        avg(when(col("_pos").isNull || col("_pos") === 0, col("_p"))),
        approx_count_distinct(col("_tok")))
      .collect()(0)
    val pbar = if (stats.isNullAt(0)) 0.0 else stats.getDouble(0)
    val aTok = stats.getLong(1)
    if (denseByStats(pbar, aTok)) jaccardBlockJoin(sets, idCol, setCol, t)
    else jaccardSelfJoin(sets, idCol, setCol, t)
  }
}
