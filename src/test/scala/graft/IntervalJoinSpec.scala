package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntervalJoin

class IntervalJoinSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val W = 100L

  test("bucketized interval join ≡ naive range theta-join, incl. boundaries") {
    // boundary cases: exactly at probeTs (IN), exactly at probeTs - W
    // (OUT: exclusive), same bucket, adjacent bucket, far bucket
    val probe = Seq(
      (1L, 10L, 250L), (1L, 11L, 300L), (2L, 12L, 150L))
      .toDF("k", "pid", "pts")
    val build = Seq(
      (1L, 20L, 250L),  // == pts of pid 10 → IN
      (1L, 21L, 150L),  // == 250-100 → OUT (exclusive lower bound)
      (1L, 22L, 299L),  // within (200, 300] for pid 11 → IN
      (1L, 23L, 151L),  // in (150, 250] for pid 10 → IN (but NOT pid 11)
      (2L, 24L, 60L),   // in (50, 150] for pid 12 → IN
      (2L, 25L, 151L),  // after pid 12 → OUT
      (3L, 26L, 250L))  // key with no probe → OUT
      .toDF("k", "bid", "bts")
    val got = IntervalJoin.preceding(probe, build.withColumnRenamed("k", "bk"),
        col("k"), col("bk"), col("pts"), col("bts"), W)
      .select("pid", "bid").as[(Long, Long)].collect().toSet
    val naive = probe.join(build.withColumnRenamed("k", "bk"),
        col("k") === col("bk") &&
          col("bts") > col("pts") - W && col("bts") <= col("pts"))
      .select("pid", "bid").as[(Long, Long)].collect().toSet
    assert(got === naive)
    // bid 20 (ts 250) also falls in pid 11's (200, 300] window
    assert(got === Set((10L, 20L), (10L, 23L), (11L, 20L), (11L, 22L), (12L, 24L)))
  }

  test("plan is a shuffled equi-join, not BNLJ/cartesian") {
    // force past the broadcast threshold with a non-local source
    val probe = spark.range(2000).select(
      (col("id") % 50).as("k"), col("id").as("pid"), (col("id") * 7L).as("pts"))
    val build = spark.range(2000).select(
      (col("id") % 50).as("bk"), col("id").as("bid"), (col("id") * 11L).as("bts"))
    val plan = IntervalJoin.preceding(probe, build,
        col("k"), col("bk"), col("pts"), col("bts"), W)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("Cartesian"),
      plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), plan)
  }

  test("randomized: bucketized ≡ naive across widths, keys, negative epochs") {
    // seeded-random property sweep (the BatchPlannerSpec pattern): dense
    // key collisions and timestamps straddling zero so bucket edges,
    // exact-boundary hits, and floor-vs-truncate all get exercised
    val r = new scala.util.Random(42)
    val probe = (1 to 300).map(i =>
      (r.nextInt(12).toLong, i.toLong, r.nextLong() % 2000L))
      .toDF("k", "pid", "pts")
    val build = (1 to 300).map(i =>
      (r.nextInt(12).toLong, (i + 1000).toLong, r.nextLong() % 2000L))
      .toDF("bk", "bid", "bts")
    for (w <- Seq(1L, 7L, 100L, 3600L)) {
      val got = IntervalJoin.preceding(probe, build,
          col("k"), col("bk"), col("pts"), col("bts"), w)
        .select("pid", "bid").as[(Long, Long)].collect().toSet
      val naive = probe.join(build,
          col("k") === col("bk") &&
            col("bts") > col("pts") - w && col("bts") <= col("pts"))
        .select("pid", "bid").as[(Long, Long)].collect().toSet
      assert(got === naive, s"width $w")
    }
  }

  test("negative timestamps bucket by floor division (no toward-zero flip)") {
    val probe = Seq((1L, 1L, 50L)).toDF("k", "pid", "pts")
    val build = Seq((1L, 2L, -40L), (1L, 3L, -60L)).toDF("bk", "bid", "bts")
    // (pts - W, pts] = (-50, 50]: -40 IN, -60 OUT — correct only if
    // bucket ids floor (bucket(-40) = -1), not truncate toward zero
    val got = IntervalJoin.preceding(probe, build,
        col("k"), col("bk"), col("pts"), col("bts"), W)
      .select("bid").as[Long].collect().toSet
    assert(got === Set(2L))
  }
}
