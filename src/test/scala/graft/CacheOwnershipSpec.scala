package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression gate for the query registry's cache-ownership contract:
  * a query lambda must not leave a session-lifetime cache-manager entry
  * behind (reused intermediates are `localCheckpoint`ed — blocks are
  * released by the ContextCleaner when the plan is dropped — never
  * bare-`persist()`ed with no owner to unpersist). Before round 7, ~14
  * query lambdas leaked one entry per invocation and the bench stayed
  * clean only because it called `clearCache()` between reps.
  *
  * The probe set covers every family that previously leaked: LSH pairs
  * (q26), prefix-filtered n-gram Jaccard (q29), IVF ANN (q32), quantized
  * ANN (q80), PQ ANN (q100), the HLL sketch table (q104), the shingle
  * decontamination probe (q67), and incremental dedup (q79).
  */
class CacheOwnershipSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  for (q <- Seq("q26_minhash_lsh", "q29_ngram_jaccard", "q32_ann_ivf",
    "q80_quantized_ann", "q100_ann_pq", "q104_hll_merge",
    "q67_decontaminate", "q79_incremental_dedup",
    "q56_grid_spatial_join")) { // Geo.gridSpatialJoin's id-pinning checkpoint
    test(s"$q leaves no cache-manager entry behind") {
      spark.sharedState.cacheManager.clearCache() // isolate from other suites
      SparkEntry.queries(q)(spark, sf).queryExecution.toRdd.count()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$q registered a cache entry it never released")
    }
  }
}
