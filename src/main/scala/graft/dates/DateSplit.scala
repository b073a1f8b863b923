package graft.dates

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's multi-format date-range parser re-expressed as a pure
  * Catalyst expression tree (SURVEY.md §2.8 F1; reference
  * `whalefinder/cleaner.py:76-158`).
  *
  * `split_dates` maps a dirty date string to six ints
  * `(start_year, start_month, start_day, end_year, end_month, end_day)`:
  *
  *  - `YYYY-MM-DD`                → that day on both sides
  *  - `YYYY-MM` (month ≤ 12)     → first .. last day of the month
  *  - `YYYY-YYYY`                → Jan 1 of first .. Dec 31 of second
  *    (the reference's month≤12 disambiguation test,
  *    `cleaner.py:137-147`; a `YYYY-NN` with 12 < NN < 1000 parses as
  *    neither and fails to zeros)
  *  - `YYYY`                     → Jan 1 .. Dec 31
  *  - `Mon YYYY` / `YYYY Mon`    → month bounds (abbrev or full name)
  *  - `DD Mon` / `Mon DD`        → that day in year 1900 (strptime's
  *    missing-year default the reference inherits, `cleaner.py:107-113`)
  *  - `A/B` (range)              → start fields of A + end fields of B,
  *    each side parsed as any of the above
  *  - any time suffix `T...` stripped per side (`cleaner.py:123-125`)
  *  - commas removed + trim first (`cleaner.py:101`)
  *  - anything else (or an impossible calendar date) → six zeros
  *    (`cleaner.py:156-158`)
  *
  * Everything is builtin `when`/`regexp_extract`/arithmetic — stays inside
  * whole-stage codegen, no UDF on the hot path, and the month-length
  * calendar math is pure integer arithmetic (no session-timezone or ANSI
  * date-parse hazards), so it is bit-reproducible across engines.
  */
object DateSplit {

  private val MonthNames: Seq[String] =
    Seq("jan", "feb", "mar", "apr", "may", "jun",
      "jul", "aug", "sep", "oct", "nov", "dec")
  private val MonthFull: Seq[String] =
    Seq("january", "february", "march", "april", "may", "june", "july",
      "august", "september", "october", "november", "december")

  /** 1-12 from a textual month name (any case, abbreviated or full); 0 when
    * unknown. `array_position` over a literal array — constant-folded.
    */
  private def monthNum(m: Column): Column = {
    val low = lower(m)
    greatest(
      array_position(typedlit(MonthNames), low),
      array_position(typedlit(MonthFull), low)).cast("int")
  }

  def isLeap(y: Column): Column =
    (y % 4 === 0 && y % 100 =!= 0) || (y % 400 === 0)

  /** Days in (y, m) by pure integer math — no `last_day`, so no ANSI
    * invalid-date throw and an exact DuckDB-SQL mirror exists.
    */
  def lastDayOf(y: Column, m: Column): Column =
    when(m.isin(1, 3, 5, 7, 8, 10, 12), lit(31))
      .when(m.isin(4, 6, 9, 11), lit(30))
      .when(m === 2, when(isLeap(y), lit(29)).otherwise(lit(28)))
      .otherwise(lit(0))

  private def bstruct(sy: Column, sm: Column, sd: Column,
      ey: Column, em: Column, ed: Column): Column =
    struct(sy.cast("int").as("sy"), sm.cast("int").as("sm"),
      sd.cast("int").as("sd"), ey.cast("int").as("ey"),
      em.cast("int").as("em"), ed.cast("int").as("ed"))

  /** Bounds of ONE already-stripped part: struct(sy,sm,sd,ey,em,ed), or
    * null when the part matches no accepted format / is not a real
    * calendar date.
    */
  def partBounds(p: Column): Column = {
    val ymdPat = "^(\\d{4})-(\\d{1,2})-(\\d{1,2})$"
    val ymPat = "^(\\d{4})-(\\d{1,2})$"
    val yyPat = "^(\\d{4})-(\\d{4})$"
    val yPat = "^(\\d{4})$"
    val monYPat = "^([A-Za-z]+) (\\d{4})$"
    val yMonPat = "^(\\d{4}) ([A-Za-z]+)$"
    val dMonPat = "^(\\d{1,2}) ([A-Za-z]+)$"
    val monDPat = "^([A-Za-z]+) (\\d{1,2})$"
    def gi(pat: String, i: Int): Column = regexp_extract(p, pat, i).cast("int")

    val ymd = {
      val (y, m, d) = (gi(ymdPat, 1), gi(ymdPat, 2), gi(ymdPat, 3))
      when(m.between(1, 12) && d.between(1, lastDayOf(y, m)),
        bstruct(y, m, d, y, m, d))
    }
    val ym = {
      val (y, m) = (gi(ymPat, 1), gi(ymPat, 2))
      when(m.between(1, 12), bstruct(y, m, lit(1), y, m, lastDayOf(y, m)))
    }
    val yy = {
      val (y1, y2) = (gi(yyPat, 1), gi(yyPat, 2))
      bstruct(y1, lit(1), lit(1), y2, lit(12), lit(31))
    }
    val yOnly = {
      val y = gi(yPat, 1)
      bstruct(y, lit(1), lit(1), y, lit(12), lit(31))
    }
    def monthBounds(y: Column, m: Column): Column =
      when(m > 0, bstruct(y, m, lit(1), y, m, lastDayOf(y, m)))
    def dayIn1900(m: Column, d: Column): Column = {
      val y = lit(1900)
      when(m > 0 && d.between(1, lastDayOf(y, m)), bstruct(y, m, d, y, m, d))
    }

    when(p.rlike(ymdPat), ymd)
      .when(p.rlike(yyPat), yy) // before ym: \d{4}-\d{4} also matches neither ym's \d{1,2}
      .when(p.rlike(ymPat), ym)
      .when(p.rlike(yPat), yOnly)
      .when(p.rlike(monYPat),
        monthBounds(gi(monYPat, 2), monthNum(regexp_extract(p, monYPat, 1))))
      .when(p.rlike(yMonPat),
        monthBounds(gi(yMonPat, 1), monthNum(regexp_extract(p, yMonPat, 2))))
      .when(p.rlike(dMonPat),
        dayIn1900(monthNum(regexp_extract(p, dMonPat, 2)), gi(dMonPat, 1)))
      .when(p.rlike(monDPat),
        dayIn1900(monthNum(regexp_extract(p, monDPat, 1)), gi(monDPat, 2)))
      .otherwise(lit(null))
  }

  private def stripT(c: Column): Column = regexp_replace(c, "T.*", "")

  /** Full `split_dates`: returns a struct with fields
    * `start_year,start_month,start_day,end_year,end_month,end_day`.
    */
  def splitDates(c: Column): Column = {
    val s = trim(regexp_replace(c, ",", ""))
    val parts = split(s, "/")
    val single = partBounds(stripT(s))
    val b1 = partBounds(trim(stripT(element_at(parts, 1))))
    val b2 = partBounds(trim(stripT(element_at(parts, 2))))
    val range = when(size(parts) === 2 && b1.isNotNull && b2.isNotNull,
      bstruct(b1("sy"), b1("sm"), b1("sd"), b2("ey"), b2("em"), b2("ed")))
    val chosen = when(s.contains("/"), range).otherwise(single)
    val z = lit(0)
    coalesce(
      when(chosen.isNotNull, struct(
        chosen("sy").as("start_year"), chosen("sm").as("start_month"),
        chosen("sd").as("start_day"), chosen("ey").as("end_year"),
        chosen("em").as("end_month"), chosen("ed").as("end_day"))),
      struct(z.as("start_year"), z.as("start_month"), z.as("start_day"),
        z.as("end_year"), z.as("end_month"), z.as("end_day")))
  }

  /** F2: strict `YYYY-MM-DD` shape gate (`cleaner.py:160-168`). */
  def isValidDate(c: Column): Column = c.rlike("^\\d{4}-\\d{2}-\\d{2}$")

  /** The pydantic eventDate gate's explicit reject list
    * (`whalefinder/validate.py:50-58`) — shapes that ARE
    * dateutil-parsable but whose parse invents values (`1925-11`,
    * `June 1758`, ranges with `/`), checked BEFORE the accept set.
    */
  val BadDateFormats: Seq[String] = Seq(
    "^\\d{4}-\\d{1,2}$", "^\\d{1,2}-\\d{4}$", "^\\d{1,4}$",
    "^\\d{1,2} [A-Za-z]+$", "^[A-Za-z]+ \\d{1,2}$", "^[A-Za-z]+ \\d{4}$",
    "^\\d{4} [A-Za-z]+$", "^.*/.*$")

  /** The reference's full eventDate acceptance (`validate.py:37-63`):
    * reject [[BadDateFormats]], else accept what `dateutil.parse` accepts
    * and emit the date pydantic's `model_dump(mode='json')` would — the
    * normalized `YYYY-MM-DD` string — or null when rejected.
    *
    * dateutil's accept set is open-ended; this pins the subset observed
    * in OBIS data plus the validate.py docstring examples:
    *  - ISO `YYYY-MM-DD`, optional ` `/`T` time, optional `Z`/offset
    *    (`1849-12-04 23:12:00`, `1849-12-04T23:12:00Z`,
    *    `1971-01-01 00:00:00+00`, `1910-12-24T02:00`)
    *  - dotted `YYYY.MM.DD` (`2020.05.01`)
    *  - `Month DD, YYYY` / `DD Month YYYY` (comma optional, full or
    *    abbreviated month — `May 5, 2020`)
    * Impossible calendar dates and unknown month words are rejected,
    * as dateutil rejects them.
    */
  def dateutilNormalize(c: Column): Column = {
    val bad = BadDateFormats.map(c.rlike).reduce(_ || _)
    val time = "([ T]([01]?\\d|2[0-3]):[0-5]\\d(:[0-5]\\d)?(Z|[+-]\\d{2}(:?\\d{2})?)?)?"
    val isoPat = s"^(\\d{4})-(\\d{1,2})-(\\d{1,2})$time$$"
    val dotPat = "^(\\d{4})\\.(\\d{1,2})\\.(\\d{1,2})$"
    val mdyPat = "^([A-Za-z]+) (\\d{1,2}),? (\\d{4})$"
    val dmyPat = "^(\\d{1,2}) ([A-Za-z]+),? (\\d{4})$"
    def g(pat: String, i: Int): Column = regexp_extract(c, pat, i)
    def norm(y: Column, m: Column, d: Column): Column =
      when(m.between(1, 12) && d.between(1, lastDayOf(y, m)),
        format_string("%04d-%02d-%02d", y, m, d))
    def gi(pat: String, i: Int): Column = g(pat, i).cast("int")
    when(bad, lit(null).cast("string"))
      .when(c.rlike(isoPat), norm(gi(isoPat, 1), gi(isoPat, 2), gi(isoPat, 3)))
      .when(c.rlike(dotPat), norm(gi(dotPat, 1), gi(dotPat, 2), gi(dotPat, 3)))
      .when(c.rlike(mdyPat),
        norm(gi(mdyPat, 3), monthNum(g(mdyPat, 1)), gi(mdyPat, 2)))
      .when(c.rlike(dmyPat),
        norm(gi(dmyPat, 3), monthNum(g(dmyPat, 2)), gi(dmyPat, 1)))
      .otherwise(lit(null).cast("string"))
  }

  /** Boolean form of [[dateutilNormalize]] — the P3 validation gate. */
  def dateutilAccept(c: Column): Column = dateutilNormalize(c).isNotNull

  /** F3: bare-year default expansion for request windows
    * (`whalefinder/obis.py:103-122`): `YYYY` → `YYYY-01-01` / `YYYY-12-31`.
    */
  def expandStart(c: Column): Column =
    when(c.rlike("^\\d{4}$"), concat(c, lit("-01-01"))).otherwise(c)
  def expandEnd(c: Column): Column =
    when(c.rlike("^\\d{4}$"), concat(c, lit("-12-31"))).otherwise(c)
}
