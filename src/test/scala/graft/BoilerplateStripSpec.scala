package graft

import org.scalatest.funsuite.AnyFunSuite

/** q126's two execution paths must be indistinguishable in output: the
  * map-side hash-set rebuild (boilerplate set measured small — every
  * real corpus) and the digest-anti-join fallback (pathological density:
  * the 100× smoke replicates every doc ~100×, so nearly every chunk
  * repeats and collecting the "small" set would be a driver OOM plus an
  * O(|bp|) scan per chunk — the spin the first r15 rewrite shipped and
  * the smoke caught). The switch is a measured count, so only this spec
  * can force the fallback at gate scale.
  */
class BoilerplateStripSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("fast path and anti-join fallback are bit-identical on the gate corpus") {
    def rows(bpMax: Long) =
      graft.queries.MixQueries.boilerplateStrip(spark, sf, bpMax)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
    val fast = rows(bpMax = Long.MaxValue) // always the hash-set rebuild
    val fallback = rows(bpMax = -1L) // always the digest anti-join
    assert(fast.nonEmpty)
    assert(fast.exists(r => r._2 != r._3),
      "gate corpus stripped nothing — the paths were never exercised")
    assert(fast.toSeq === fallback.toSeq,
      "boilerplate-strip paths diverge")
    spark.sharedState.cacheManager.clearCache()
  }

  test("digest128 lanes: deterministic, distinct lanes, empty/ascii edges") {
    import graft.functions.Exact
    val a = Exact.digest128Jvm("the quick brown fox")
    assert(a === Exact.digest128Jvm("the quick brown fox"))
    assert(a._1 !== a._2, "lanes collided structurally")
    assert(Exact.digest128Jvm("") !== Exact.digest128Jvm(" "),
      "empty vs single-space collided")
    // a near-miss pair that a weak 32-bit fold might collide
    assert(Exact.digest128Jvm("ab") !== Exact.digest128Jvm("ba"))
  }
}
