package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.dates.DateSplit._

/** Branch table of `cleaner.py:76-158` (SURVEY.md §2.8 F1) — every accept
  * format, the YYYY-MM vs YYYY-YYYY disambiguation, calendar validity,
  * strptime's 1900 default year, range composition, and the 0-sentinel
  * failure channel.
  */
class DateSplitSpec extends AnyFunSuite with SparkSpec {

  private type B = (Int, Int, Int, Int, Int, Int)
  private val Z: B = (0, 0, 0, 0, 0, 0)

  private val cases: Seq[(String, B)] = Seq(
    // exact day
    "1994-03-05" -> (1994, 3, 5, 1994, 3, 5),
    "1994-3-5" -> (1994, 3, 5, 1994, 3, 5),
    // month granularity → first..last day, incl. leap Feb
    "1994-03" -> (1994, 3, 1, 1994, 3, 31),
    "1996-02" -> (1996, 2, 1, 1996, 2, 29),
    "1900-02" -> (1900, 2, 1, 1900, 2, 28), // century non-leap
    "2000-02" -> (2000, 2, 1, 2000, 2, 29), // 400-rule leap
    // YYYY-MM vs YYYY-YYYY disambiguation
    "1994-13" -> Z, // 13 is neither a month nor a 4-digit year
    "1994-1997" -> (1994, 1, 1, 1997, 12, 31),
    // bare year
    "1985" -> (1985, 1, 1, 1985, 12, 31),
    // textual months (abbrev + full, both orders)
    "Oct 1970" -> (1970, 10, 1, 1970, 10, 31),
    "1970 Oct" -> (1970, 10, 1, 1970, 10, 31),
    "October 1970" -> (1970, 10, 1, 1970, 10, 31),
    // day+month without year → strptime's 1900 default
    "20 Nov" -> (1900, 11, 20, 1900, 11, 20),
    "Nov 20" -> (1900, 11, 20, 1900, 11, 20),
    "30 Feb" -> Z, // impossible calendar day
    "20 Xyz" -> Z, // unknown month name
    // ranges: start of left + end of right
    "1972-07-10/1972-07-14" -> (1972, 7, 10, 1972, 7, 14),
    "1972/1975" -> (1972, 1, 1, 1975, 12, 31),
    "1972-07/1973" -> (1972, 7, 1, 1973, 12, 31),
    "1972-07-10T06:00:00/1972-07-14T08:00:00" -> (1972, 7, 10, 1972, 7, 14),
    "1972-07-10/bad" -> Z, // any failing side fails the range
    "1972/1973/1974" -> Z, // >2 parts
    // comma/whitespace strip + time suffix
    " 1994-03-05, " -> (1994, 3, 5, 1994, 3, 5),
    "1994-03-05T23:59:59Z" -> (1994, 3, 5, 1994, 3, 5),
    // calendar validity on explicit days
    "1994-02-30" -> Z,
    "1994-04-31" -> Z,
    "1994-00-10" -> Z,
    // garbage
    "" -> Z,
    "not a date" -> Z,
    "94-03-05" -> Z)

  test("splitDates branch table (expression form)") {
    import spark.implicits._
    val got = cases.map(_._1).toDF("raw")
      .select(col("raw"), splitDates(col("raw")).as("b"))
      .select("raw", "b.*")
      .collect()
      .map(r => r.getString(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6)))
      .toMap
    cases.foreach { case (raw, want) =>
      assert(got(raw) == want, s"for input '$raw'")
    }
  }

  test("splitDates branch table (UDF twin) — identical semantics") {
    cases.foreach { case (raw, want) =>
      val p = graft.dates.SplitDatesFn.parse(raw)
      assert((p.start_year, p.start_month, p.start_day,
        p.end_year, p.end_month, p.end_day) == want, s"for input '$raw'")
    }
  }

  test("expression and UDF agree on generated date strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val gen = (1 to 2000).map { _ =>
      val y = 1900 + rnd.nextInt(150)
      val m = rnd.nextInt(15) // intentionally includes invalid months
      val d = rnd.nextInt(34)
      rnd.nextInt(8) match {
        case 0 => f"$y-$m%02d-$d%02d"
        case 1 => f"$y-$m"
        case 2 => s"$y"
        case 3 => f"$y-$m%02d-$d%02d/$y-${rnd.nextInt(13)}%02d-${rnd.nextInt(29)}%02d"
        case 4 => f"$y-$m%02d-$d%02dT08:30:00"
        case 5 => s"$y/${y + rnd.nextInt(5)}"
        case 6 => s"${Seq("Jan", "Oct", "December", "Foo")(rnd.nextInt(4))} $y"
        case _ => s"garbage-$y"
      }
    }
    val exprOut = gen.toDF("raw")
      .select(col("raw"), splitDates(col("raw")).as("b")).select("raw", "b.*")
      .collect()
      .map(r => r.getString(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6)))
    exprOut.foreach { case (raw, want) =>
      val p = graft.dates.SplitDatesFn.parse(raw)
      assert((p.start_year, p.start_month, p.start_day,
        p.end_year, p.end_month, p.end_day) == want, s"diverged on '$raw'")
    }
  }

  test("dateutilNormalize: pinned accept/reject table from validate.py + dateutil") {
    import spark.implicits._
    // (input, expected normalized date or None) — the validate.py:37-63
    // gate: bad_formats rejected first, then dateutil's parse, normalized
    // the way pydantic's model_dump(mode='json') emits dates
    val table: Seq[(String, Option[String])] = Seq(
      // validate.py docstring accepted examples
      "1913-03-17" -> Some("1913-03-17"),
      "1849-12-04 23:12:00" -> Some("1849-12-04"),
      "1849-12-04T23:12:00" -> Some("1849-12-04"),
      "1849-12-04T23:12:00Z" -> Some("1849-12-04"),
      "1971-01-01 00:00:00+00" -> Some("1971-01-01"),
      "1910-12-24T02:00" -> Some("1910-12-24"),
      // dateutil-lenient shapes beyond the strict gate
      "2020.05.01" -> Some("2020-05-01"),
      "May 5, 2020" -> Some("2020-05-05"),
      "May 5 2020" -> Some("2020-05-05"),
      "5 May 2020" -> Some("2020-05-05"),
      "5 November, 2020" -> Some("2020-11-05"),
      "1994-3-5" -> Some("1994-03-05"),
      // validate.py bad_formats — dateutil COULD parse these, the gate
      // must reject them before it gets the chance
      "1925-11" -> None,
      "03-1990" -> None,
      "1985" -> None,
      "20 Nov" -> None,
      "Oct 15" -> None,
      "June 1758" -> None,
      "1970 Oct" -> None,
      "1800-01-01/1874-06-24" -> None,
      // dateutil failures: impossible dates, unknown months, garbage
      "2020-02-31" -> None,
      "2021-02-29" -> None,
      "2020-13-01" -> None,
      "Foo 5, 2020" -> None,
      "2020-05-01 25:99" -> None,
      "not a date" -> None,
      "" -> None)
    val got = table.map(_._1).toDF("raw")
      .select(col("raw"), dateutilNormalize(col("raw")).as("norm"),
        dateutilAccept(col("raw")).as("ok"))
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(1)), r.getBoolean(2))).toMap
    table.foreach { case (raw, want) =>
      assert(got(raw) == ((want, want.isDefined)), s"for input '$raw'")
      // the JVM twin must agree exactly (it's what q63 and the CLI run)
      assert(Option(graft.dates.SplitDatesFn.dateutilNormalize(raw)) == want,
        s"UDF twin diverged on '$raw'")
    }
    // generated cross-check: expression ≡ twin on derived strings
    val rnd = new scala.util.Random(13)
    val months = Seq("May", "January", "Sep", "Foo")
    val gen = (1 to 1500).map { _ =>
      val (y, m, d) = (1900 + rnd.nextInt(150), rnd.nextInt(15), rnd.nextInt(34))
      rnd.nextInt(6) match {
        case 0 => f"$y-$m%02d-$d%02d"
        case 1 => f"$y.$m.$d"
        case 2 => s"${months(rnd.nextInt(4))} $d, $y"
        case 3 => s"$d ${months(rnd.nextInt(4))} $y"
        case 4 => f"$y-$m%02d-$d%02dT0${rnd.nextInt(10)}:30"
        case _ => s"$y-$m"
      }
    }
    val exprOut = gen.toDF("raw")
      .select(col("raw"), dateutilNormalize(col("raw")).as("n"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1)))
    exprOut.foreach { case (raw, want) =>
      assert(Option(graft.dates.SplitDatesFn.dateutilNormalize(raw)) == want,
        s"diverged on '$raw'")
    }
  }

  test("isValidDate is the strict YYYY-MM-DD gate") {
    import spark.implicits._
    val got = Seq("1994-03-05", "1994-3-5", "1994-03", "1994-03-05T00:00:00", "x")
      .toDF("raw").select(isValidDate(col("raw"))).as[Boolean].collect().toSeq
    assert(got == Seq(true, false, false, false, false))
  }

  test("expandStart/expandEnd widen bare years only") {
    import spark.implicits._
    val got = Seq("1985", "1985-06-01").toDF("raw")
      .select(expandStart(col("raw")), expandEnd(col("raw")))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("1985-01-01", "1985-12-31"), ("1985-06-01", "1985-06-01")))
  }
}
