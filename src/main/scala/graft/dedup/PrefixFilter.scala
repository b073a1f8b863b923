package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  */
object PrefixFilter {

  /** All pairs from `sets` (`idCol`: orderable id, `setCol`:
    * array&lt;string&gt; of DISTINCT elements) with Jaccard ≥ `t`.
    * Output: (d1, d2, jac), d1 &lt; d2 — exactly the all-pairs result.
    */
  def jaccardSelfJoin(sets: DataFrame, idCol: String, setCol: String,
      t: Double): DataFrame = {
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

    // exact verification on the original sets
    cand
      .join(src.select(col("_id").as("d1"), col("_set").as("_s1")), "d1")
      .join(src.select(col("_id").as("d2"), col("_set").as("_s2")), "d2")
      .select(col("d1"), col("d2"),
        Dedup.jaccard(col("_s1"), col("_s2")).as("jac"))
      .filter(col("jac") >= t)
  }
}
