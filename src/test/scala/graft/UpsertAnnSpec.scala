package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** q148's contract — the update half of the persisted-index story:
  * serving (base − updatedIds) ∪ re-encode(updated batch) with stale
  * books is IDENTICAL to an index rebuilt with the same books over the
  * POST-UPDATE corpus. With fixed books both sides assign/encode every
  * row the same way, so the only difference is where the swap happens —
  * the upsert touches batch-sized state only, the rebuild re-encodes
  * everything. Row-identical top-k proves an updated row can neither
  * serve its STALE codes (it would rank/decode wrong) nor appear twice
  * (delete-half dropped the old row before the insert-half appended).
  */
class UpsertAnnSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("upsert serve is row-identical to a rebuild over the updated corpus") {
    val e = Tables.embeddings(spark, sf)
    val updMask = col("vec_id") % 13 === 5
    val upd = e.filter(updMask).withColumn("embedding",
      transform(col("embedding"),
        x => (x.cast("double") * lit(0.5)).cast("float")))
    val corpus2 = e.filter(!updMask).unionByName(upd)
    val train = e.filter(col("vec_id") % 4 === 0 && !updMask)
    val init = e.filter(col("vec_id") % 97 === 0 && !updMask)
    val cents = Similarity.ivfTrain(train, init, 64, 2)
    val cb = Similarity.pqTrain(train, Similarity.pqCodebook(init, 8, 64),
      8, 64, 2)
    // rebuild over the UPDATED corpus, same books
    val rebuilt = Similarity.buildIvfPqIndex(corpus2, cents, cb, 8, 64)
    val probes = Similarity.ivfProbes(
      corpus2.filter(col("vec_id") % 100 === 0), cents, 2)
    val fromRebuild = Similarity.ivfPqSearch(rebuilt, probes, cb, corpus2,
      8, 64, 3).orderBy("q_id", "rank").collect().map(_.toSeq)

    val served = SparkEntry.queries("q148_ann_upsert")(spark, sf)
      .collect().map(_.toSeq)

    assert(served.nonEmpty, "upsert serve returned nothing")
    assert(served.length === fromRebuild.length)
    served.zip(fromRebuild).foreach { case (a, b) => assert(a === b) }
    spark.sharedState.cacheManager.clearCache()
  }
}
