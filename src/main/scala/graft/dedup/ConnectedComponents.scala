package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the step a dedup
  * pipeline needs between near-dup PAIRS (q26/q28/q29/q31 emit them) and a
  * deletion decision: transitively-connected documents form one duplicate
  * cluster, and exactly one member per cluster is kept. Pairs alone miss
  * transitivity (A~B, B~C ⇒ {A,B,C} even when A~C was never emitted).
  *
  * Algorithm: alternating large-star / small-star contraction (Kiveris,
  * Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
  * MapReduce and Beyond", SoCC 2014 — public literature). Each round is
  * one groupBy-min plus one equi-join per star step; neighbor sets are
  * never collected to a single row, so power-law hub nodes (the failure
  * mode of naive label propagation over collect_list) cost nothing extra,
  * and convergence is O(log n) rounds on any graph — at 100 TB the round
  * count stays in the teens while every round is an ordinary shuffled
  * aggregation Catalyst plans like any other.
  *
  *  - large-star: every node connects its LARGER neighbors to its current
  *    minimum (m(u) = min(N(u) ∪ {u})): edge (v, m(u)) for v ∈ N(u), v > u.
  *  - small-star: on the (u > v)-oriented result, every node connects its
  *    smaller neighbors AND itself to its minimum: (v, m(u)) for
  *    v ∈ N(u) ∪ {u}.
  *
  * At the fixpoint the edge set is a star forest: every non-root node
  * carries exactly the edge (node, componentMin).
  *
  * The reference has no clustering step (its dedup is exact keep-first,
  * cleaner.py:60-64); this is part of the training-data extension surface.
  */
object ConnectedComponents {

  /** Large-star round. Input: symmetric edge set (u, v) with u ≠ v.
    * Output: oriented edges (u, v) with u > v.
    */
  private[dedup] def largeStar(sym: DataFrame): DataFrame = {
    // m(u) = min over N(u) ∪ {u}; min(v) alone is wrong for nodes whose
    // neighbors are all larger than themselves
    val mins = sym.groupBy("u").agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("mv"), col("u")).as("m"))
    sym.filter(col("v") > col("u"))
      .join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
    // no distinct here: the consumer (smallStar) takes a duplicate-
    // agnostic groupBy-min and dedups its own output — dropping the
    // exchange saves one full shuffle per round
  }

  /** Small-star round. Input: oriented edges (u, v), u > v.
    * Output: oriented edges (u, v), u > v (self-edges dropped).
    */
  private[dedup] def smallStar(oriented: DataFrame): DataFrame = {
    val mins = oriented.groupBy("u").agg(min(col("v")).as("m"))
    oriented.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .unionByName(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Component assignment for every endpoint of `edges` (long columns
    * `u`, `v`; direction, duplicates and self-loops are all tolerated).
    * Returns (`node`, `label`) where label = the component's minimum node
    * id — the canonical cluster id both engines can agree on.
    */
  def run(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    val clean = edges.select(col("u").cast("long"), col("v").cast("long"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))

    // iterative refinement: localCheckpoint each round so the plan does
    // not double in depth per iteration (lineage cut is what makes a
    // driver-side loop over DataFrames viable; blocks are reclaimed by
    // the ContextCleaner when the previous round's frame is dropped)
    val first = clean.filter(col("u") > col("v"))
      .unionByName(clean.filter(col("v") > col("u"))
        .select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .localCheckpoint()
    var cur = first
    // endpoints off the CHECKPOINT, not the raw input — the edge list is
    // often the tail of an expensive pipeline (LSH pairs), and reading it
    // twice would re-run that pipeline for what is just a projection
    val nodes = first.select(col("u").as("node"))
      .unionByName(first.select(col("v").as("node"))).distinct()

    // convergence = canonical edge set unchanged; an order-independent
    // (count, hash-xor) digest checks that with one tiny aggregate
    // instead of two extra anti-joins per round (xor, not sum: ANSI mode
    // throws on signed-long SUM overflow, and xor is overflow-free)
    def digest(df: DataFrame): (Long, Long) = {
      val r = df.agg(
        count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("h")).head()
      (r.getLong(0), r.getLong(1))
    }

    var prev = digest(cur)
    var round = 0
    var done = prev._1 == 0L
    // each round runs ~6 shuffles; size them to the MEASURED edge count
    // (from the digest we already paid for), not the session default — a
    // 20k-edge graph at 32 partitions pays 6 × 32 empty-task overheads
    // per round, while a 100 TB pair list (billions of edges) keeps the
    // session's (large) setting. Scoped set/restore: the loop owns every
    // action between here and convergence. ~2M edges/partition keeps a
    // partition's groupBy hash map comfortably in executor memory.
    // AQE's per-stage re-planning is also pure latency on a loop whose
    // partition count is already sized to measured data — off inside the
    // loop, restored after.
    val spark = edges.sparkSession
    val scoped = Seq(
      "spark.sql.shuffle.partitions" -> math.max(8L, math.min(
        spark.conf.getOption("spark.sql.shuffle.partitions")
          .flatMap(_.toLongOption).getOrElse(200L),
        prev._1 / 2000000L + 1L)).toString,
      "spark.sql.adaptive.enabled" -> "false")
    val prior = scoped.map { case (k, _) => k -> spark.conf.getOption(k) }
    scoped.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      while (!done && round < maxRounds) {
        val t0 = System.nanoTime()
        val sym = cur.unionByName(cur.select(col("v").as("u"), col("u").as("v")))
        // LAZY checkpoint: the digest below is the materializing action,
        // so each round schedules one job instead of an eager-checkpoint
        // job plus a digest job (same total work, half the job-submission
        // round-trips — which is what a busy 1000-executor driver queues on)
        val next = smallStar(largeStar(sym)).localCheckpoint(false)
        val t1 = System.nanoTime()
        val d = digest(next)
        if (sys.env.contains("GRAFT_CC_DEBUG"))
          println(f"CCROUND $round%d edges=${d._1}%d star=${(t1 - t0) / 1e9}%.2f " +
            f"digest=${(System.nanoTime() - t1) / 1e9}%.2f")
        done = d == prev
        prev = d
        cur = next
        round += 1
      }
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    // convergence is proven O(log n) rounds for star contraction, so 50
    // covers any physical graph — but if the loop DID exit on the cap,
    // `cur` is not a star forest and the labels below would be silently
    // wrong. Fail loud instead.
    require(done,
      s"connected components did not converge within $maxRounds rounds " +
        s"(${prev._1} edges remain) — raise maxRounds")

    // star forest → assignment; roots (and nothing else) are absent from
    // the `u` side and label themselves
    nodes.join(cur.select(col("u").as("node"), col("v").as("label")), Seq("node"), "left")
      .select(col("node"), coalesce(col("label"), col("node")).as("label"))
  }
}
