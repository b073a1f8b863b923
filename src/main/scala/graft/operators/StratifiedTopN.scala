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
  *  1. per-stratum counts (a tiny aggregate, broadcast back);
  *  2. MAP-SIDE prefilter `hashCol < t` with
  *     `t = ceil(margin · n / cnt · hashMax)` — for the uniform hash
  *     keys the deterministic-sampling family uses (q60/q77/q120's
  *     multiplicative hashes), survivors ≈ margin·n per stratum;
  *  3. exact rank window over the survivors only (~margin·n rows per
  *     stratum, whatever the stratum's true size);
  *  4. SOUNDNESS GUARD: a stratum whose survivors < min(n, cnt) (a
  *     non-uniform/adversarial key) is recomputed with the full exact
  *     window and unioned back — the fast path is an optimization,
  *     never a correctness assumption.
  *
  * Exactness of the fast path: survivors are exactly {hash < t}; if at
  * least min(n, cnt) rows clear the threshold, the n globally-smallest
  * (hash, tie) rows all lie below t (any row ≥ t is ordered after every
  * survivor), so ranking survivors ≡ ranking the stratum.
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

    val counts = in.groupBy(sCols: _*).agg(count(lit(1)).as("__cnt"))
    val withT = in.join(broadcast(counts), stratum)
      .withColumn("__t",
        least(lit(hashMax),
          ceil(lit(margin * n) * lit(hashMax) / col("__cnt")).cast("long")))
    val survivors = withT.filter(col(hashCol) < col("__t"))

    val w = Window.partitionBy(sCols: _*).orderBy(col(hashCol), col(tieCol))
    def rank(d: DataFrame) = d
      .withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= n)

    // shortfall check: strata where the prefilter kept fewer rows than
    // the exact answer needs — a tiny collect (≤ |strata| rows), so the
    // common all-clear case pays one metadata-scale job and never a
    // second scan of the input
    // LEFT join from counts: a stratum the prefilter emptied ENTIRELY
    // has no survivors row at all — an inner join would drop exactly
    // the strata most in need of the fallback
    val short = counts
      .join(survivors.groupBy(sCols: _*).agg(count(lit(1)).as("__s")),
        stratum, "left")
      .filter(coalesce(col("__s"), lit(0L)) < least(lit(n.toLong), col("__cnt")))
      .select(sCols: _*).collect()

    val fast =
      if (short.isEmpty) survivors
      else {
        // recompute ONLY the shorted strata exactly; everyone else keeps
        // the fast path. NUL-joined routing key: a printable separator
        // could alias two multi-column strata ("a b"+"c" vs "a"+"b c")
        // and silently route one down the wrong path.
        val sep = "\u0000"
        val shortKeys = short
          .map(r => stratum.indices.map(i => String.valueOf(r.get(i)))
            .mkString(sep)).toSeq
        val keyExpr = concat_ws(sep, sCols.map(_.cast("string")): _*)
        survivors.filter(!keyExpr.isin(shortKeys: _*))
          .unionByName(withT.filter(keyExpr.isin(shortKeys: _*)))
      }
    rank(fast).drop("__cnt", "__t")
  }
}
