package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT deterministic top-`n` rows per stratum under `(hashCol,
  * tieCol)` ascending order — the "cap each language/source at N
  * documents" sampler, done the way that survives a stratum with 10¹⁰
  * rows.
  *
  * The naive form is a rank window per stratum: with FEW large strata
  * that is one reducer sorting an entire stratum (the per-stratum twin
  * of the partition-less-window problem [[GlobalRowNumber]] exists
  * for). This is the threshold-prefilter rewrite instead:
  *
  *  1. per-stratum counts (a tiny aggregate, checkpointed and broadcast
  *     back — NULL-SAFE keyed, so a NULL stratum is a stratum like any
  *     other, exactly as the naive window's PARTITION BY treats it);
  *  2. MAP-SIDE prefilter `hashCol < t` with
  *     `t = ceil(margin · n / cnt · hashMax)` — for the uniform hash
  *     keys the deterministic-sampling family uses (q60/q77/q120's
  *     multiplicative hashes), survivors ≈ margin·n per stratum; the
  *     survivor set (small by construction) is checkpointed once;
  *  3. exact rank window over the survivors only (~margin·n rows per
  *     stratum, whatever the stratum's true size);
  *  4. SOUNDNESS GUARD: a stratum whose survivors < min(n, cnt) (a
  *     non-uniform/adversarial key) is recomputed with the full exact
  *     window and unioned back — the fast path is an optimization,
  *     never a correctness assumption. Routing is a null-safe JOIN
  *     against the shorted-strata rows, never a string-rendered key
  *     (driver `toString` and Spark's `cast("string")` disagree on
  *     timestamps/binary, which would silently mis-route).
  *
  * Exactness of the fast path: survivors are exactly {hash < t}; if at
  * least min(n, cnt) rows clear the threshold, the n globally-smallest
  * (hash, tie) rows all lie below t (any row ≥ t is ordered after every
  * survivor), so ranking survivors ≡ ranking the stratum.
  *
  * Cost in scans of the input: one for the counts (then checkpointed),
  * one for the prefilter (survivors then checkpointed) — the shortfall
  * probe and the final rank read the small checkpoints, and only
  * genuinely shorted strata trigger a further input pass.
  *
  * `hashCol` must be non-negative and < `hashMax`; NULL hashes sort
  * nowhere and are dropped (a deterministic sampler's key is derived,
  * never absent — derive before calling).
  */
object StratifiedTopN {

  def byHashOrder(df: DataFrame, stratum: Seq[String], hashCol: String,
      hashMax: Long, tieCol: String, n: Int, margin: Double = 2.5,
      rankCol: String = "rk"): DataFrame = {
    require(n > 0 && margin >= 1.0, s"need n > 0, margin >= 1 (got $n, $margin)")
    val sCols = stratum.map(col)
    val in = df.filter(col(hashCol).isNotNull)

    // null-safe equi-join helper: plain === drops NULL-stratum rows,
    // which the naive window (and the oracles) rank as a real stratum.
    // The right side is always strata-sized (counts, shorted-strata
    // rows) — broadcast is the 100 TB plan (map-side probe, the big
    // side never shuffles) — but a pathological high-cardinality
    // stratum column must degrade to an AQE-planned join, not a forced-
    // broadcast OOM: the hint applies only under `broadcastRight`,
    // decided once from the actual stratum count below.
    var broadcastRight = true
    def joinNullSafe(left: DataFrame, right: DataFrame, how: String,
        keep: DataFrame => Seq[org.apache.spark.sql.Column]): DataFrame = {
      val l = left.alias("__stn_l")
      val r = right.alias("__stn_r")
      val cond = stratum.map(c =>
        col(s"__stn_l.$c") <=> col(s"__stn_r.$c")).reduce(_ && _)
      val joined = l.join(if (broadcastRight) broadcast(r) else r, cond, how)
      how match {
        case "inner" | "left_outer" => joined.select(keep(left).map(c => c) ++
          right.columns.filterNot(stratum.contains)
            .map(c => col(s"__stn_r.$c")): _*)
        case _ => joined // semi/anti keep the left schema as-is
      }
    }

    val counts = graft.Materialize.checkpoint(
      in.groupBy(sCols: _*).agg(count(lit(1)).as("__cnt")))
    // counts is checkpointed, so this sizing count is metadata-cheap
    broadcastRight = counts.count() <= 1000000L
    val withT = joinNullSafe(in, counts, "inner",
      left => left.columns.map(c => col(s"__stn_l.$c")).toSeq)
      .withColumn("__t",
        least(lit(hashMax),
          ceil(lit(margin * n) * lit(hashMax) / col("__cnt")).cast("long")))
    // survivors ≈ margin·n per stratum — small by construction, so the
    // checkpoint is cheap and the probe + final rank never rescan input
    val survivors = graft.Materialize.checkpoint(
      withT.filter(col(hashCol) < col("__t")))

    val w = Window.partitionBy(sCols: _*).orderBy(col(hashCol), col(tieCol))
    def rank(d: DataFrame) = d
      .withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= n)

    // shortfall probe: strata where the prefilter kept fewer rows than
    // the exact answer needs. LEFT join from counts: a stratum the
    // prefilter emptied ENTIRELY has no survivors row at all — an inner
    // join would drop exactly the strata most in need of the fallback.
    val survCounts = survivors.groupBy(sCols: _*).agg(count(lit(1)).as("__s"))
    val short = joinNullSafe(counts, survCounts, "left_outer",
      left => left.columns.map(c => col(s"__stn_l.$c")).toSeq)
      .filter(coalesce(col("__s"), lit(0L)) < least(lit(n.toLong), col("__cnt")))
      .select(sCols: _*)
    val shortRows = short.collect()

    val fast =
      if (shortRows.isEmpty) survivors
      else {
        // recompute ONLY the shorted strata exactly; everyone else keeps
        // the fast path. Routing by null-safe JOIN against the shorted
        // rows themselves — no string rendering anywhere.
        val shortDf = df.sparkSession.createDataFrame(
          java.util.Arrays.asList(shortRows: _*), short.schema)
        joinNullSafe(survivors, shortDf, "left_anti", _ => Nil)
          .unionByName(joinNullSafe(withT, shortDf, "left_semi", _ => Nil))
      }
    rank(fast).drop("__cnt", "__t")
  }
}
