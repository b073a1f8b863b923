package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gate over the WHOLE query registry: the
  * invariants that make the 100 TB claims true stay pinned, so a future
  * edit that silently degrades a plan (a dropped equi-join condition
  * turning into a cartesian product, a lost broadcast turning the probe
  * side into a full shuffle) fails here, not in production.
  *
  * Streaming queries drain eagerly when constructed, so at sf0.001 this
  * doubles as an everything-still-runs smoke over the registry.
  */
class PlanAuditSpec extends AnyFunSuite with SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  /** Queries whose BroadcastNestedLoopJoin is the DESIGN, not a missed
    * equi-join: a small broadcast side streamed against the corpus with a
    * non-equi predicate (ANN query sets, point-in-polygon) — one corpus
    * scan, no shuffle, exactly what those operators want.
    */
  private val deliberateBnlj = Set(
    "q30_cosine_topk", // broadcast query set x corpus, q_id <> n_id
    "q80_quantized_ann", // same shape, quantized scores
    "q100_ann_pq", // same shape, PQ-decoded corpus + codebook encode cross
    "q39_spatial_join", // broadcast polygons, PointInPolygon predicate
    "q55_frame_sample", // broadcast frame index x payloads
    "q58_resize", // broadcast target dims
    "q32_ann_ivf", // broadcast centroids x corpus: map-side cell argmin
    "q66_ann_ivf_nprobe", // same centroid-assignment cross
    "q76_freq_sketch", // broadcast 1-row total for the support threshold
    "q87_gap_fill_daily" // calendar x event-type frame: both sides tiny
  )

  test("no cartesian product in any registered plan; BNLJ only where deliberate") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, Sf)
      val plan = df.queryExecution.sparkPlan.toString
      if (plan.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !deliberateBnlj(name))
        offenders += s"$name: unexpected BroadcastNestedLoopJoin"
      spark.sharedState.cacheManager.clearCache()
    }
    assert(offenders.isEmpty, s"plan regressions:\n${offenders.mkString("\n")}")
  }
}
