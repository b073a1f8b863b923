package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.WhalePipeline

/** Golden test of the composed cleaning chain on an inline fixture shaped
  * like the reference's README run (valid + repairable + unrepairable
  * rows, duplicates, null ids, points inside/outside the polygons) —
  * SURVEY.md §5's "pinned to the README tallies' semantics".
  */
class WhalePipelineSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // (row order, occurrenceID, eventDate, lat, lon, waterBody, vernacular)
  private def fixtureValid = Seq(
    (1, "a1", "2001-05-10", 10.0, 10.0, "stale", null),
    (2, null, "2001-05-10", 10.0, 10.0, "stale", null), // dup of row 1 (dropped)
    (3, null, "2002-06-01", 60.0, 70.0, null, null), // null id -> "-1"
    (4, "a4", "2003-07-02", -5.0, -5.0, null, "Custom Name"),
    (5, null, "2001-05-10", 11.0, 10.0, null, null)) // null id -> "-2"
    .toDF("ord", "occurrenceID", "eventDate", "decimalLatitude",
      "decimalLongitude", "waterBody", "vernacularName")

  private def fixtureErrors = Seq(
    (6, "e1", "1985", 20.0, 20.0, null, null), // repairable (year)
    (7, "e2", "not a date", 0.0, 0.0, null, null)) // unrepairable
    .toDF("ord", "occurrenceID", "eventDate", "decimalLatitude",
      "decimalLongitude", "waterBody", "vernacularName")

  // two axis-aligned boxes: "north" contains (60,70)&(20,20)? no — see asserts
  private def polygons = Seq(
    ("box_a", Array(0.0, 30.0, 30.0, 0.0), Array(0.0, 0.0, 30.0, 30.0)),
    ("box_b", Array(50.0, 90.0, 90.0, 50.0), Array(40.0, 40.0, 80.0, 80.0)))
    .toDF("name", "xs", "ys")

  test("composed cleaning chain matches the reference's tallies semantics") {
    val (out, unrepairable) = WhalePipeline.process(
      fixtureValid, fixtureErrors, "beluga_whale", polygons, "ord")
    val rows = out.orderBy("ord").collect()

    // tallies: 5 valid + 2 errors -> 1 repaired, 1 unrepairable, 1 dup removed
    assert(unrepairable.count() == 1)
    assert(rows.length == 5) // 4 surviving valid + 1 repaired

    val byOrd = rows.map(r => r.getAs[Int]("ord") -> r).toMap
    // keep-first dedup kept row 1, dropped row 2
    assert(byOrd.contains(1) && !byOrd.contains(2))
    // synthetic negative ids in encounter order over the null slice
    assert(byOrd(3).getAs[String]("occurrenceID") == "-1")
    assert(byOrd(5).getAs[String]("occurrenceID") == "-2")
    // vernacular fill: nulls get the title-cased whale, explicit kept
    assert(byOrd(3).getAs[String]("vernacularName") == "Beluga Whale")
    assert(byOrd(4).getAs[String]("vernacularName") == "Custom Name")
    // spatial overwrite: (10,10) in box_a; (70,60) in box_b; (-5,-5) outside
    assert(byOrd(1).getAs[String]("waterBody") == "box_a")
    assert(byOrd(3).getAs[String]("waterBody") == "box_b")
    assert(byOrd(4).getAs[String]("waterBody") == null)
    // repaired year row: parts expanded, strict-date flag false
    assert(byOrd(6).getAs[Int]("start_year") == 1985)
    assert(byOrd(6).getAs[Int]("end_month") == 12)
    assert(!byOrd(6).getAs[Boolean]("date_is_valid"))
    // FK resolution: every non-null waterBody got a surrogate id
    rows.filter(_.getAs[String]("waterBody") != null)
      .foreach(r => assert(r.getAs[Long]("waterBodyId") > 0))

    // A2 date bounds over strictly-valid rows
    assert(WhalePipeline.dateBounds(out) == ("2001-05-10", "2003-07-02"))
  }
}
