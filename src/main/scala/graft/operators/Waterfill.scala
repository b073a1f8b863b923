package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Water-filling token allocation over per-source aggregates — the
  * mixture-PLANNING primitive behind q157: given each source's token
  * capacity `c`, target mixture weight `w`, and a total budget `B`,
  * allocate ∝ weight except sources whose capacity runs out first
  * SATURATE (take all they have) and their shortfall redistributes to
  * the rest at a common water level λ.
  *
  * Closed form, no iteration: sort by capacity/weight ascending,
  * prefix-sum both; λ(k) = (B − Σ_{i≤k} c_i) / (W − Σ_{i≤k} w_i); the
  * saturation set is the longest ratio-sorted prefix whose own ratio is
  * ≤ its λ. WaterfillPropSpec pins the laws (Σalloc ≤ B, alloc ≤ c,
  * saturated ⇔ ratio ≤ λ, unsaturated alloc = ⌊λw⌋) against a
  * driver-side sequential reference on random instances.
  *
  * Scale shape: the input is ALREADY the per-source aggregate (K rows),
  * so the unpartitioned windows here are K-row exchanges, never a data
  * path — the one corpus-sized job is whatever groupBy produced `t`.
  * Input columns: (source: string, c: long, w: long); budget arrives as
  * a 1-row (budget, wtot) frame so callers can derive it from `t`
  * itself without a driver round-trip.
  */
object Waterfill {

  /** (source, c, w, saturated, alloc), ordered by source. */
  def allocate(t: DataFrame, budget: DataFrame): DataFrame = {
    val ratio = col("c").cast("double") / col("w").cast("double")
    val ord = Window.orderBy(ratio, col("source"))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val l = t
      .withColumn("ratio", ratio)
      .withColumn("rk", row_number().over(ord).cast("long"))
      .withColumn("ck", sum(col("c")).over(cum))
      .withColumn("wk", sum(col("w")).over(cum))
      .crossJoin(broadcast(budget))
      .withColumn("lam_k", when(col("wtot") - col("wk") > 0,
        (col("budget") - col("ck")).cast("double") /
          (col("wtot") - col("wk")).cast("double")))
      .transform(graft.Materialize.checkpoint)
    val star = l.agg(coalesce(
      max(when(col("ratio") <= col("lam_k"), col("rk"))), lit(0L)).as("kstar"))
    val lam = l.crossJoin(broadcast(star))
      .groupBy("kstar", "budget", "wtot")
      .agg(max(when(col("rk") === col("kstar"), col("lam_k"))).as("lamk"))
      .select(when(col("kstar") === 0,
          col("budget").cast("double") / col("wtot").cast("double"))
        .otherwise(col("lamk")).as("lam"))
    l.crossJoin(broadcast(star)).crossJoin(broadcast(lam))
      .select(col("source"), col("c"), col("w"),
        (col("rk") <= col("kstar")).as("saturated"),
        when(col("rk") <= col("kstar"), col("c"))
          .otherwise(floor(col("lam") * col("w").cast("double"))).as("alloc"))
      .orderBy("source")
  }
}
