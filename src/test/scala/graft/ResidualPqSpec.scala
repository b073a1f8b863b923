package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Exact
import graft.sim.Similarity

/** [[Similarity.residuals]] + [[Similarity.ivfPqResidualSearch]] — why
  * the residual tier (q108) exists: with the SAME codebook budget
  * (subspaces, codewords, Lloyd rounds, training sample, init subset),
  * coding cell residuals must reconstruct strictly closer than coding
  * raw vectors (q106's scheme). The centroid explains the coarse
  * position; the codebook spends its whole budget on the within-cell
  * displacement — that is the entire IVFADC argument, so the spec pins
  * it as a measured inequality, not prose.
  */
class ResidualPqSpec extends AnyFunSuite with SparkSpec {

  private val Sf = "/root/testdata/sf0.001"
  private val (m, dim) = (8, 64)

  /** Mean squared reconstruction error of `recon` vs the raw corpus
    * (`recon`: vec_id + vhat array<double>).
    */
  private def msre(e: DataFrame, recon: DataFrame): Double =
    e.select(col("vec_id"), col("embedding")).join(recon, "vec_id")
      .select(Exact.foldDot(
        zip_with(col("embedding"), col("vhat"), (x, v) => x.cast("double") - v),
        zip_with(col("embedding"), col("vhat"), (x, v) => x.cast("double") - v))
        .as("err"))
      .agg(avg("err")).head().getDouble(0)

  test("residual coding strictly beats raw coding on reconstruction error at equal budget") {
    val e = Tables.embeddings(spark, Sf)
    val train = e.filter(col("vec_id") % 4 === 0)
    val init = e.filter(col("vec_id") % 97 === 0)
    val cents = Similarity.ivfTrain(train, init, dim, 2)

    // raw coding (q106): vhat = decoded raw codes
    val cbRaw = Similarity.pqTrain(train, Similarity.pqCodebook(init, m, dim),
      m, dim, 2)
    val rawRecon = Similarity.pqIndex(e, cbRaw, m, dim)
      .select(col("vec_id"), col("dv").as("vhat"))
    val rawErr = msre(e, rawRecon)

    // residual coding (q108): vhat = cell centroid + decoded residual
    val assigned = Similarity.ivfAssign(e, cents)
    val res = Similarity.residuals(assigned, cents)
    val cbRes = Similarity.pqTrain(
      res.filter(col("vec_id") % 4 === 0),
      Similarity.pqCodebook(res.filter(col("vec_id") % 97 === 0), m, dim),
      m, dim, 2)
    val cvec = cents.select(col("vec_id").as("cell"), col("embedding").as("cvec"))
    val resRecon = Similarity.pqIndex(res, cbRes, m, dim)
      .select(col("vec_id"), col("dv"))
      .join(assigned.select(col("vec_id"), col("cell")), "vec_id")
      .join(broadcast(cvec), Seq("cell"))
      .select(col("vec_id"),
        zip_with(col("cvec"), col("dv"), (c, r) => c + r).as("vhat"))
    val resErr = msre(e, resRecon)

    info(f"reconstruction MSE: raw=$rawErr%.6f residual=$resErr%.6f " +
      f"(ratio ${resErr / rawErr}%.3f)")
    assert(resErr < rawErr,
      f"residual coding ($resErr%.6f) must beat raw coding ($rawErr%.6f) " +
        "at the same codebook budget — the IVFADC premise")
  }

  test("q108 ranks by a psim that tracks the reconstruction, and its winners carry true cosine") {
    val out = SparkEntry.queries("q108_ann_residual_pq")(spark, Sf)
      .collect()
    assert(out.nonEmpty)
    // psim approximates sim: on the top-3 winners the ADC score must
    // correlate with the true cosine well enough that the mean absolute
    // gap stays small — a sign error or mis-grouped term would blow this
    // far past the loose bound (raw-PQ q106's gap at this budget is
    // already ~0.05-0.1; the bound only guards gross structural bugs)
    val gap = out.map(r => math.abs(r.getDouble(2) - r.getDouble(3))).sum / out.length
    assert(gap < 0.25, f"mean |psim - sim| = $gap%.4f — ADC score no longer tracks the reconstruction")
    // ranks are 1..k per query, dense
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getLong(4)).sorted.toSeq == (1L to rows.length).toSeq,
        s"q=$q ranks not dense")
    }
  }
}
