package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PitJoin

/** Pins the point-in-time join: version routing incl. the open-version
  * and boundary-instant cases, NULL for pre-first-version and
  * coverage-gap facts, and the zero-join window plan.
  */
class PitJoinSpec extends AnyFunSuite with SparkSpec {

  // k=1: [10,100) "old", [100,∞) "new"; k=2: [0,50) "only", GAP, [80,∞) "back"
  private def dim = {
    import spark.implicits._
    Seq(
      (1L, "old", 10L, Some(100L)),
      (1L, "new", 100L, Option.empty[Long]),
      (2L, "only", 0L, Some(50L)),
      (2L, "back", 80L, Option.empty[Long]))
      .toDF("k", "seg", "valid_from", "valid_to")
  }

  private def got(facts: org.apache.spark.sql.DataFrame) =
    PitJoin.atTime(facts, dim, Seq("k"), "ts", Seq("seg"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) "∅" else r.getString(2))).toSet

  test("facts route to the version valid at their timestamp") {
    import spark.implicits._
    val facts = Seq((1L, 5L), (1L, 10L), (1L, 99L), (1L, 100L), (1L, 500L))
      .toDF("k", "ts")
    assert(got(facts) == Set(
      (1L, 5L, "∅"), // before the first version
      (1L, 10L, "old"), // open boundary is inclusive
      (1L, 99L, "old"),
      (1L, 100L, "new"), // close is exclusive: the NEW version owns t=100
      (1L, 500L, "new"))) // open version covers forever
  }

  test("coverage gaps yield NULL, never the stale neighbor") {
    import spark.implicits._
    val facts = Seq((2L, 49L), (2L, 50L), (2L, 79L), (2L, 80L)).toDF("k", "ts")
    assert(got(facts) == Set(
      (2L, 49L, "only"),
      (2L, 50L, "∅"), // valid_to exclusive: 50 is already outside
      (2L, 79L, "∅"), // inside the gap
      (2L, 80L, "back")))
  }

  test("keys absent from the dim get NULL attributes") {
    import spark.implicits._
    assert(got(Seq((9L, 10L)).toDF("k", "ts")) == Set((9L, 10L, "∅")))
  }

  test("NULL keys follow join semantics: null-key facts get NULL, null-key versions never attach") {
    import spark.implicits._
    // an Scd2 dim CAN carry null-key rows (MERGE semantics insert them);
    // the window rewrite must not let them "match" null-key facts the
    // way partitionBy's GROUP-BY null grouping would
    val d = Seq(
      (Some(1L), "real", 0L, Option.empty[Long]),
      (Option.empty[Long], "orphan", 0L, Option.empty[Long]))
      .toDF("k", "seg", "valid_from", "valid_to")
    val facts = Seq((Some(1L), 5L), (Option.empty[Long], 5L)).toDF("k", "ts")
    val got = PitJoin.atTime(facts, d, Seq("k"), "ts", Seq("seg"))
      .collect().map(r => (if (r.isNullAt(0)) -99L else r.getLong(0),
        if (r.isNullAt(2)) "∅" else r.getString(2))).toSet
    assert(got == Set((1L, "real"), (-99L, "∅")))
  }

  test("the plan has ZERO join operators (window rewrite, not a range join)") {
    import spark.implicits._
    val plan = PitJoin.atTime(Seq((1L, 10L)).toDF("k", "ts"), dim,
      Seq("k"), "ts", Seq("seg")).queryExecution.sparkPlan.toString
    assert(!plan.contains("Join"), s"expected a join-free plan:\n$plan")
    assert(plan.contains("Window"))
  }

  test("atTimeBucketed: one key owning ~all facts — identical output, bucketed window") {
    import spark.implicits._
    // hot key 1 owns 2000 facts across the full time range (incl. exact
    // version-boundary instants and pre-history); keys 2/9 contribute a
    // handful — the gap/absent classes must survive the bucketing too
    val hot = (0 until 2000).map(i => (1L, (i * 7L) % 700))
    val cold = Seq((2L, 49L), (2L, 50L), (2L, 80L), (9L, 10L))
    val facts = (hot ++ cold).toDF("k", "ts")
    val plain = PitJoin.atTime(facts, dim, Seq("k"), "ts", Seq("seg"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) "∅" else r.getString(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val bucketed = PitJoin.atTimeBucketed(facts, dim, Seq("k"), "ts",
      Seq("seg"), buckets = 8)
    val got = bucketed
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) "∅" else r.getString(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(got == plain, "bucketed PIT join diverged from the plain path")

    // the skew escape is structural: the window partitions by
    // (key, __bkt), so the hot key's sort splits across buckets
    val winParts = bucketed.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.map(_.toString)
    }.flatten
    assert(winParts.exists(_.contains("__bkt")),
      s"window must partition by the ts bucket, got $winParts")
    // and several buckets are actually populated for the hot key
    val bounds = facts.filter(col("k") === 1).stat
      .approxQuantile("ts", (1 until 8).map(_ / 8.0).toArray, 0.001)
    assert(bounds.distinct.length >= 4, "hot key's facts must spread over buckets")
  }
}
