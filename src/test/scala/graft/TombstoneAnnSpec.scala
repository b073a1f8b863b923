package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** q109's contract — the delete half of the persisted-index story:
  * serving (base ∪ delta) with a tombstone anti-join is IDENTICAL to an
  * index rebuilt with the same books over the corpus WITHOUT the deleted
  * rows. With fixed books both sides assign/encode each surviving row
  * the same way, so the only difference is where the exclusion happens —
  * q109 excludes at serve time without touching the persisted state, the
  * rebuild never indexes the rows at all. Row-identical top-k proves the
  * tombstones can never shadow a live row (the anti-join runs before
  * ranking) and that deleted rows can never surface.
  */
class TombstoneAnnSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("tombstoned serve is row-identical to a rebuild without the deleted rows") {
    val e = Tables.embeddings(spark, sf)
    val existing = e.filter(col("vec_id") % 10 =!= 9)
    val deleted = col("vec_id") % 10 =!= 9 && col("vec_id") % 7 === 3
    val train = existing.filter(col("vec_id") % 4 === 0)
    val init = existing.filter(col("vec_id") % 97 === 0)
    val cents = Similarity.ivfTrain(train, init, 64, 2)
    val cb = Similarity.pqTrain(train, Similarity.pqCodebook(init, 8, 64),
      8, 64, 2)
    // rebuild WITHOUT the deleted rows, same (stale) books
    val survivors = e.filter(!deleted)
    val rebuilt = Similarity.buildIvfPqIndex(survivors, cents, cb, 8, 64)
    // the query set stays the FULL corpus slice (a deleted vector may
    // still arrive as an external query — vec_id 500 is deleted AND a
    // query at sf0.01, so that case is exercised, not hypothetical)
    val probes = Similarity.ivfProbes(
      e.filter(col("vec_id") % 100 === 0), cents, 2)
    val fromRebuild = Similarity.ivfPqSearch(rebuilt, probes, cb, e, 8, 64, 3)
      .orderBy("q_id", "rank").collect().map(_.toSeq)

    val served = SparkEntry.queries("q109_ann_tombstones")(spark, sf)
      .collect().map(_.toSeq)

    assert(served.nonEmpty, "tombstoned serve returned nothing")
    assert(served.length === fromRebuild.length)
    served.zip(fromRebuild).foreach { case (a, b) => assert(a === b) }

    // and no deleted id ever surfaces as a neighbor
    val servedIds = served.map(_(1).asInstanceOf[Long]).toSet
    val deletedIds = e.filter(deleted).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(servedIds.intersect(deletedIds).isEmpty,
      "a tombstoned row surfaced in the served top-k")
    spark.sharedState.cacheManager.clearCache()
  }
}
