package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dims.Scd2

/** Pins the SCD-2 merge: per-key semantics (insert / close+reopen /
  * no-op / untouched), null-safe attribute comparison, replay
  * idempotence, batch collapse, and the single-join execution shape.
  */
class Scd2Spec extends AnyFunSuite with SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
      r.getBoolean(4))).toSet

  private def dim0 = {
    import spark.implicits._
    Seq(
      (1L, "A", 0L, Some(50L), false), // k=1 closed history version
      (1L, "A2", 50L, None, true),
      (2L, "B", 0L, None, true),
      (3L, "C", 0L, None, true))
      .toDF("k", "seg", "valid_from", "valid_to", "is_current")
      .withColumn("valid_to", col("valid_to").cast("long"))
  }

  test("merge: insert, close+reopen on change, no-op on same, absent untouched") {
    import spark.implicits._
    val batch = Seq((1L, "A2"), (2L, "B2"), (4L, "D")).toDF("k", "seg")
    val merged = Scd2.merge(dim0, batch, Seq("k"), Seq("seg"), effTs = 100L)
    assert(rows(merged) == Set(
      (1L, "A", 0L, 50L, false), // history untouched
      (1L, "A2", 50L, -1L, true), // matched, unchanged → no-op
      (2L, "B", 0L, 100L, false), // changed → closed at eff
      (2L, "B2", 100L, -1L, true), // …and reopened
      (3L, "C", 0L, -1L, true), // absent from batch → untouched
      (4L, "D", 100L, -1L, true))) // new key → open version
  }

  test("re-merging the same batch is idempotent (replayed feeds don't version)") {
    import spark.implicits._
    val batch = Seq((2L, "B2"), (4L, "D")).toDF("k", "seg")
    val once = Scd2.merge(dim0, batch, Seq("k"), Seq("seg"), 100L)
    val twice = Scd2.merge(once, batch, Seq("k"), Seq("seg"), 200L)
    assert(rows(twice) == rows(once))
  }

  test("null-safe attribute compare: NULL→NULL no-op, value→NULL is a change") {
    import spark.implicits._
    val d = Seq((1L, Option.empty[String], 0L), (2L, Some("X"), 0L))
      .toDF("k", "seg", "valid_from")
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
    val batch = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "seg")
    val merged = Scd2.merge(d, batch, Seq("k"), Seq("seg"), 10L)
    val got = merged.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) "∅" else r.getString(1),
      r.getLong(2), r.getBoolean(4))).toSet
    assert(got == Set(
      (1L, "∅", 0L, true), // NULL ≡ NULL: untouched
      (2L, "X", 0L, false), // X → NULL: closed…
      (2L, "∅", 10L, true))) // …and reopened with the NULL
  }

  test("NULL-key rows are never silently dropped: dim carries, batch inserts") {
    import spark.implicits._
    val d = Seq((Some(1L), "A"), (None, "ORPHAN"))
      .toDF("k", "seg")
      .withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
    val batch = Seq((Some(1L), "A2"), (Option.empty[Long], "NEWNULL")).toDF("k", "seg")
    val merged = Scd2.merge(d, batch, Seq("k"), Seq("seg"), 10L)
    val got = merged.collect().map(r => (
      if (r.isNullAt(0)) -99L else r.getLong(0),
      r.getString(1), r.getLong(2), r.getBoolean(4))).toSet
    assert(got == Set(
      (1L, "A", 0L, false), (1L, "A2", 10L, true), // normal change
      (-99L, "ORPHAN", 0L, true), // null-key dim row CARRIED, not deleted
      (-99L, "NEWNULL", 10L, true))) // null-key batch row inserts (no match)
  }

  test("latestPerKey collapses a multi-update batch to the final update") {
    import spark.implicits._
    val b = Seq((1L, "v1", 5L), (1L, "v2", 9L), (2L, "w", 1L))
      .toDF("k", "seg", "ts")
    val got = Scd2.latestPerKey(b, Seq("k"), "ts")
      .select("k", "seg").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "v2"), (2L, "w")))
  }

  test("first load through emptyDim opens one version per batch row") {
    import spark.implicits._
    val batch = Seq((1L, "A"), (2L, "B")).toDF("k", "seg")
    val merged = Scd2.merge(Scd2.emptyDim(batch, Seq("k"), Seq("seg")),
      batch, Seq("k"), Seq("seg"), 7L)
    assert(rows(merged) == Set((1L, "A", 7L, -1L, true), (2L, "B", 7L, -1L, true)))
  }

  test("the whole merge is one join (Delta-MERGE shape, not N passes)") {
    import spark.implicits._
    val batch = Seq((2L, "B2"), (4L, "D")).toDF("k", "seg")
    val plan = Scd2.merge(dim0, batch, Seq("k"), Seq("seg"), 100L)
      .queryExecution.sparkPlan.toString
    val joins = "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(plan).size
    assert(joins == 1, s"expected exactly one join, plan:\n$plan")
  }
}
