package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dims.Cdc

/** Pins the CDC apply: per-key net-effect semantics (insert / update /
  * delete / carry), sequence-ordered collapse incl. out-of-order arrival
  * and resurrects, replay idempotence, null-op and null-key handling,
  * and the single-join execution shape.
  */
class CdcSpec extends AnyFunSuite with SparkSpec {

  private def snap0 = {
    import spark.implicits._
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "v", "n")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) "∅" else r.getString(1),
      if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

  private def apply0(feed: org.apache.spark.sql.DataFrame) =
    Cdc.applyChanges(snap0, feed, Seq("k"), Seq("v", "n"), "op", "seq")

  test("upsert/delete/insert/carry in one batch") {
    import spark.implicits._
    val feed = Seq(
      (1L, "a2", 11L, "U", 1L), // update existing
      (2L, "", 0L, "D", 1L), // delete existing
      (4L, "d", 40L, "I", 1L)) // insert new
      .toDF("k", "v", "n", "op", "seq")
    assert(rows(apply0(feed)) == Set(
      (1L, "a2", 11L), (3L, "c", 30L), (4L, "d", 40L)))
  }

  test("per-key net effect: highest sequence wins, arrival order irrelevant") {
    import spark.implicits._
    // k=1: U@5 then D@3 arrives late → the update is the net effect
    // k=2: D@9 after U@1 → deleted
    // k=3: D@1 then I@2 → resurrected with the insert's values
    val feed = Seq(
      (1L, "late", 0L, "D", 3L), (1L, "win", 99L, "U", 5L),
      (2L, "x", 0L, "U", 1L), (2L, "", 0L, "D", 9L),
      (3L, "", 0L, "D", 1L), (3L, "back", 7L, "I", 2L))
      .toDF("k", "v", "n", "op", "seq")
    assert(rows(apply0(feed)) == Set((1L, "win", 99L), (3L, "back", 7L)))
  }

  test("delete of an absent key is a no-op; update of an absent key inserts") {
    import spark.implicits._
    val feed = Seq(
      (9L, "", 0L, "D", 1L), // absent → no-op
      (8L, "up", 80L, "U", 1L)) // absent U → upsert inserts
      .toDF("k", "v", "n", "op", "seq")
    assert(rows(apply0(feed)) == Set(
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (8L, "up", 80L)))
  }

  test("an upsert may set attributes to NULL (when-not-coalesce semantics)") {
    import spark.implicits._
    val feed = Seq((1L, Option.empty[String], Option.empty[Long], "U", 1L))
      .toDF("k", "v", "n", "op", "seq")
    assert(rows(apply0(feed)) == Set(
      (1L, "∅", -1L), (2L, "b", 20L), (3L, "c", 30L)))
  }

  test("replaying a batch onto its own output is a no-op") {
    import spark.implicits._
    val feed = Seq(
      (1L, "a2", 11L, "U", 1L), (2L, "", 0L, "D", 2L), (4L, "d", 40L, "I", 3L))
      .toDF("k", "v", "n", "op", "seq")
    val once = apply0(feed)
    val twice = Cdc.applyChanges(once, feed, Seq("k"), Seq("v", "n"), "op", "seq")
    assert(rows(twice) == rows(once))
  }

  test("NULL op degrades to upsert, never three-valued row loss") {
    import spark.implicits._
    val feed = Seq((1L, Some("nop"), Some(1L), Option.empty[String], 1L))
      .toDF("k", "v", "n", "op", "seq")
    assert(rows(apply0(feed)) == Set(
      (1L, "nop", 1L), (2L, "b", 20L), (3L, "c", 30L)))
  }

  test("NULL-key rows: snapshot carries, feed I inserts on every apply (MERGE semantics)") {
    import spark.implicits._
    val snap = Seq((Some(1L), "a"), (Option.empty[Long], "orphan")).toDF("k", "v")
    val feed = Seq((Option.empty[Long], "nullins", "I", 1L))
      .toDF("k", "v", "op", "seq")
    val out = Cdc.applyChanges(snap, feed, Seq("k"), Seq("v"), "op", "seq")
    val got = out.collect().map(r =>
      (if (r.isNullAt(0)) -99L else r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(got == Map((1L, "a") -> 1, (-99L, "orphan") -> 1, (-99L, "nullins") -> 1))
  }

  test("deriveFeed emits the minimal diff-sized feed; apply∘derive round-trips") {
    import spark.implicits._
    val to = Seq((1L, "a", 10L), // unchanged → absent from the feed
      (2L, Option.empty[String].orNull, 21L), // changed (incl. a NULL-set)
      (4L, "d", 40L)) // added; 3 removed
      .toDF("k", "v", "n")
    val feed = Cdc.deriveFeed(snap0, to, Seq("k"), Seq("v", "n"), seqVal = 7L)
    val got = feed.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) "∅" else r.getString(1),
      if (r.isNullAt(2)) -1L else r.getLong(2),
      r.getString(3), r.getLong(4))).toSet
    assert(got == Set(
      (2L, "∅", 21L, "U", 7L),
      (3L, "∅", -1L, "D", 7L),
      (4L, "d", 40L, "I", 7L)))
    // round-trip law: applying the derived feed reproduces `to` exactly
    val applied = Cdc.applyChanges(snap0, feed, Seq("k"), Seq("v", "n"), "op", "seq")
    assert(rows(applied) == rows(to))
  }

  test("the whole apply is one snapshot join (MERGE shape, not per-op passes)") {
    import spark.implicits._
    val feed = Seq((1L, "a2", 11L, "U", 1L), (4L, "d", 40L, "I", 2L))
      .toDF("k", "v", "n", "op", "seq")
    val plan = apply0(feed).queryExecution.sparkPlan.toString
    val joins = "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(plan).size
    assert(joins == 1, s"expected exactly one join, plan:\n$plan")
  }
}
