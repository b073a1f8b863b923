package graft


import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Retry

/** Connector resilience policy (pure) + bucketed co-located join (the
  * pre-shuffled layout big fact⋈fact joins use at scale).
  */
class RetryBucketingSpec extends AnyFunSuite with SparkSpec {

  test("backoff schedule doubles and caps") {
    assert(Retry.backoffSchedule(5, 1000, 8000) ==
      Seq(1000, 2000, 4000, 8000, 8000))
  }

  test("withRetries: succeeds after failures, sleeps the schedule") {
    val sleeps = Seq.newBuilder[Long]
    var calls = 0
    val got = Retry.withRetries(Seq(10L, 20L, 40L), sleeps += _) { () =>
      calls += 1
      if (calls < 3) throw new RuntimeException("boom")
      "ok"
    }
    assert(got == "ok" && calls == 3 && sleeps.result() == Seq(10L, 20L))
    // exhausted schedule → final failure propagates
    intercept[RuntimeException] {
      Retry.withRetries(Seq(1L), _ => ())(() => throw new RuntimeException("x"))
    }
  }

  test("paceDelays enforces the minimum interval (1 req/s reference rate)") {
    // requests at 0ms, 200ms, 2500ms with 1000ms spacing:
    assert(Retry.paceDelays(Seq(0L, 200L, 2500L), 1000L) == Seq(0L, 800L, 0L))
    assert(Retry.paceDelays(Nil, 1000L).isEmpty)
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    // warehouse.dir is static per-JVM; use the default (gitignored)
    spark.sql("DROP TABLE IF EXISTS bfact")
    spark.sql("DROP TABLE IF EXISTS bdim")
    val fact = (1 to 1000).map(i => (i % 100, s"v$i")).toDF("k", "v")
    val dim = (0 until 100).map(i => (i, s"d$i")).toDF("k", "d")
    fact.write.bucketBy(8, "k").sortBy("k").saveAsTable("bfact")
    dim.write.bucketBy(8, "k").saveAsTable("bdim")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bfact").join(spark.table("bdim"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bfact")
      spark.sql("DROP TABLE IF EXISTS bdim")
    }
  }
}
