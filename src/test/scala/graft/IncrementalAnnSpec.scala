package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** q107's contract: maintaining the ANN index incrementally (persisted
  * base index + delta encoded with the STALE books) serves queries
  * IDENTICALLY to a monolithic rebuild with those same books. With fixed
  * centroids and codebook, assignment and encoding are per-row maps, so
  * encode-then-union ≡ union-then-encode — this spec asserts that
  * row-for-row, which is also what licenses q107's oracle to encode the
  * full corpus in one pass.
  */
class IncrementalAnnSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("incremental index union serves queries identically to a rebuild") {
    val e = Tables.embeddings(spark, sf)
    val existing = e.filter(col("vec_id") % 10 =!= 9)
    val train = existing.filter(col("vec_id") % 4 === 0)
    val init = existing.filter(col("vec_id") % 97 === 0)
    val cents = Similarity.ivfTrain(train, init, 64, 2)
    val cb = Similarity.pqTrain(train, Similarity.pqCodebook(init, 8, 64),
      8, 64, 2)
    // monolithic rebuild: one assignment+encode pass over the FULL corpus
    val rebuilt = Similarity.buildIvfPqIndex(e, cents, cb, 8, 64)
    val probes = Similarity.ivfProbes(
      e.filter(col("vec_id") % 100 === 0), cents, 2)
    val fromRebuild = Similarity.ivfPqSearch(rebuilt, probes, cb, e, 8, 64, 3)
      .orderBy("q_id", "rank").collect().map(_.toSeq)

    val incremental = SparkEntry.queries("q107_incremental_ann")(spark, sf)
      .collect().map(_.toSeq)

    assert(incremental.length === fromRebuild.length)
    incremental.zip(fromRebuild).foreach { case (a, b) => assert(a === b) }
    spark.sharedState.cacheManager.clearCache()
  }
}
