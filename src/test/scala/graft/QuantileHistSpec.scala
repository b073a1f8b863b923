package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q137's mergeable histogram-quantile state: the estimate's accuracy
  * is STRUCTURAL — it interpolates inside the bin whose cumulative
  * count crosses p·total, so |est − exact percentile| ≤ one bin width
  * (hi−lo)/256 by construction. Pinned here against Spark's exact
  * `percentile` (the q64 contract style, but with a deterministic
  * bound instead of a rank tolerance); the bit-exact estimate replay
  * itself is the q137 oracle's job.
  */
class QuantileHistSpec extends AnyFunSuite with SparkSpec {

  test("merged-histogram estimates sit within one bin width of exact percentiles") {
    val sf = "/root/testdata/sf0.01"
    val ev = Tables.events(spark, sf)
    val b = ev.agg(min("value"), max("value")).head()
    val binW = (b.getDouble(1) - b.getDouble(0)) / 256

    val est = graft.SparkEntry.queries("q137_quantile_hist_merge")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3)).toMap
    val exact = ev.groupBy("event_type")
      .agg(expr("percentile(value, array(0.5, 0.9, 0.99))").as("ex"))
      .collect().flatMap { r =>
        val ex = r.getSeq[Double](1)
        Seq(0.5, 0.9, 0.99).zip(ex).map { case (p, v) => (r.getString(0), p) -> v }
      }.toMap
    assert(est.keySet == exact.keySet && est.size == 15)
    est.foreach { case (k, e) =>
      assert(math.abs(e - exact(k)) <= binW + 1e-9,
        s"$k: sketch $e vs exact ${exact(k)} exceeds bin width $binW")
    }
  }
}
