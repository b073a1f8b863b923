package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.validate.TableDiff

/** Pins the snapshot diff: change classes, null-safe attribute compares,
  * diff-sized output (unchanged keys emit nothing), null-key visibility,
  * and the single-join plan.
  */
class TableDiffSpec extends AnyFunSuite with SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) "∅" else r.getString(2))).toSet

  test("added/removed/changed classes with per-column change lists") {
    import spark.implicits._
    val l = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("k", "v", "n")
    val r = Seq((1L, "a", 10L), // unchanged → absent from the diff
      (2L, "b2", 20L), // one column
      (3L, "c2", 31L), // both columns
      (5L, "e", 50L)) // added; 4 removed
      .toDF("k", "v", "n")
    assert(rows(TableDiff.diff(l, r, Seq("k"), Seq("v", "n"))) == Set(
      (2L, "changed", "v"),
      (3L, "changed", "n,v"), // sorted names
      (4L, "removed", "∅"),
      (5L, "added", "∅")))
  }

  test("null-safe compares: NULL→NULL is not a change, value→NULL is") {
    import spark.implicits._
    val l = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("k", "v")
    val r = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "v")
    val got = TableDiff.diff(l, r, Seq("k"), Seq("v"))
      .collect().map(r2 => (r2.getLong(0), r2.getString(1), r2.getString(2))).toSet
    assert(got == Set((2L, "changed", "v")))
  }

  test("null-key rows surface as removed/added, never silently dropped") {
    import spark.implicits._
    val l = Seq((Some(1L), "a"), (Option.empty[Long], "orphanL")).toDF("k", "v")
    val r = Seq((Some(1L), "a"), (Option.empty[Long], "orphanR")).toDF("k", "v")
    val got = TableDiff.diff(l, r, Seq("k"), Seq("v"))
      .collect().map(r2 => (if (r2.isNullAt(0)) -99L else r2.getLong(0),
        r2.getString(1))).toSet
    // null keys match nothing: both orphans are visible, each on its side
    assert(got == Set((-99L, "removed"), (-99L, "added")))
  }

  test("identical tables diff to zero rows; one join in the plan") {
    import spark.implicits._
    val t = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val d = TableDiff.diff(t, t, Seq("k"), Seq("v"))
    assert(d.count() == 0)
    val joins = "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(d.queryExecution.sparkPlan.toString).size
    assert(joins == 1)
  }
}
