package graft.dates

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Imperative twin of [[DateSplit.splitDates]] (same branch table, same
  * zeros-on-failure semantics), exposed as a Scala UDF.
  *
  * Why a UDF exists alongside the expression tree: extracting the six
  * fields of a conditionally-built struct makes Catalyst re-evaluate the
  * whole `CASE` chain per field (common-subexpression elimination skips
  * conditional branches), and the chain re-evaluates its own sub-cases —
  * ~50 full parse evaluations (≈1500 regex executions) per row once
  * flattened. The JVM function parses once per row. Measured at sf0.1:
  * expression flatten ≈ 224 s, UDF ≈ sub-second — this is the
  * "UDF first, expression later" exception SURVEY.md §7.4 anticipated
  * for `split_dates`.
  *
  * Equivalence is pinned three ways: the 30-case branch table runs
  * against BOTH implementations, a generated cross-check compares them
  * on thousands of derived date strings, and q17's DuckDB oracle gates
  * the UDF end-to-end.
  */
object SplitDatesFn {

  final case class DateParts(start_year: Int, start_month: Int, start_day: Int,
      end_year: Int, end_month: Int, end_day: Int)

  private val Zero = DateParts(0, 0, 0, 0, 0, 0)

  private val MonthNames =
    Seq("jan", "feb", "mar", "apr", "may", "jun",
      "jul", "aug", "sep", "oct", "nov", "dec")
  private val MonthFull =
    Seq("january", "february", "march", "april", "may", "june", "july",
      "august", "september", "october", "november", "december")

  private def monthNum(m: String): Int = {
    val low = m.toLowerCase
    math.max(MonthNames.indexOf(low) + 1, MonthFull.indexOf(low) + 1)
  }

  def isLeap(y: Int): Boolean = (y % 4 == 0 && y % 100 != 0) || y % 400 == 0

  def lastDayOf(y: Int, m: Int): Int = m match {
    case 1 | 3 | 5 | 7 | 8 | 10 | 12 => 31
    case 4 | 6 | 9 | 11 => 30
    case 2 => if (isLeap(y)) 29 else 28
    case _ => 0
  }

  private val Ymd = "^(\\d{4})-(\\d{1,2})-(\\d{1,2})$".r
  private val Ym = "^(\\d{4})-(\\d{1,2})$".r
  private val Yy = "^(\\d{4})-(\\d{4})$".r
  private val Y = "^(\\d{4})$".r
  private val MonY = "^([A-Za-z]+) (\\d{4})$".r
  private val YMon = "^(\\d{4}) ([A-Za-z]+)$".r
  private val DMon = "^(\\d{1,2}) ([A-Za-z]+)$".r
  private val MonD = "^([A-Za-z]+) (\\d{1,2})$".r

  /** Bounds of one already-stripped part (None on failure) — the exact
    * branch order of [[DateSplit.partBounds]].
    */
  def partBounds(p: String): Option[DateParts] = p match {
    case Ymd(ys, ms, ds) =>
      val (y, m, d) = (ys.toInt, ms.toInt, ds.toInt)
      if (m >= 1 && m <= 12 && d >= 1 && d <= lastDayOf(y, m))
        Some(DateParts(y, m, d, y, m, d))
      else None
    case Yy(y1s, y2s) =>
      Some(DateParts(y1s.toInt, 1, 1, y2s.toInt, 12, 31))
    case Ym(ys, ms) =>
      val (y, m) = (ys.toInt, ms.toInt)
      if (m >= 1 && m <= 12) Some(DateParts(y, m, 1, y, m, lastDayOf(y, m)))
      else None
    case Y(ys) =>
      val y = ys.toInt
      Some(DateParts(y, 1, 1, y, 12, 31))
    case MonY(mon, ys) =>
      val (y, m) = (ys.toInt, monthNum(mon))
      if (m > 0) Some(DateParts(y, m, 1, y, m, lastDayOf(y, m))) else None
    case YMon(ys, mon) =>
      val (y, m) = (ys.toInt, monthNum(mon))
      if (m > 0) Some(DateParts(y, m, 1, y, m, lastDayOf(y, m))) else None
    case DMon(ds, mon) =>
      val (d, m) = (ds.toInt, monthNum(mon))
      if (m > 0 && d >= 1 && d <= lastDayOf(1900, m))
        Some(DateParts(1900, m, d, 1900, m, d))
      else None
    case MonD(mon, ds) =>
      val (d, m) = (ds.toInt, monthNum(mon))
      if (m > 0 && d >= 1 && d <= lastDayOf(1900, m))
        Some(DateParts(1900, m, d, 1900, m, d))
      else None
    case _ => None
  }

  private def stripT(s: String): String = s.replaceAll("T.*", "")

  def parse(raw: String): DateParts = {
    if (raw == null) return Zero
    val s = raw.replace(",", "").trim
    if (s.contains("/")) {
      val parts = s.split("/", -1)
      if (parts.length != 2) Zero
      else (partBounds(stripT(parts(0)).trim), partBounds(stripT(parts(1)).trim)) match {
        case (Some(a), Some(b)) =>
          DateParts(a.start_year, a.start_month, a.start_day,
            b.end_year, b.end_month, b.end_day)
        case _ => Zero
      }
    } else partBounds(stripT(s)).getOrElse(Zero)
  }

  /** `splitDatesUdf(col)` → struct with the six named int fields. */
  val splitDatesUdf: UserDefinedFunction = udf(parse _)

  // --- dateutil-gate twin ---------------------------------------------------
  // Same rationale as the parser twin: [[DateSplit.dateutilNormalize]] is a
  // branchy per-row regex CASE chain, and every column derived from it
  // (norm + accepted) re-evaluates the chain — ~40 regex executions per
  // row once flattened. The JVM twin compiles the patterns once and
  // parses once per row (measured 4.3 s → sub-second on q63 at sf0.1).
  // Equivalence is pinned by the DateSplitSpec accept/reject table run
  // against BOTH implementations plus q63's ground-truth oracle.

  private val BadPats = DateSplit.BadDateFormats.map(_.r)
  private val IsoT =
    ("^(\\d{4})-(\\d{1,2})-(\\d{1,2})" +
      "([ T]([01]?\\d|2[0-3]):[0-5]\\d(:[0-5]\\d)?(Z|[+-]\\d{2}(:?\\d{2})?)?)?$").r
  private val Dot = "^(\\d{4})\\.(\\d{1,2})\\.(\\d{1,2})$".r
  private val Mdy = "^([A-Za-z]+) (\\d{1,2}),? (\\d{4})$".r
  private val Dmy = "^(\\d{1,2}) ([A-Za-z]+),? (\\d{4})$".r

  /** Twin of [[DateSplit.dateutilNormalize]]: normalized ISO date or null. */
  def dateutilNormalize(s: String): String = {
    if (s == null) return null
    if (BadPats.exists(_.findFirstIn(s).isDefined)) return null
    def norm(y: Int, m: Int, d: Int): String =
      if (m >= 1 && m <= 12 && d >= 1 && d <= lastDayOf(y, m))
        f"$y%04d-$m%02d-$d%02d"
      else null
    s match {
      case IsoT(y, m, d, _*) => norm(y.toInt, m.toInt, d.toInt)
      case Dot(y, m, d) => norm(y.toInt, m.toInt, d.toInt)
      case Mdy(mon, d, y) => norm(y.toInt, monthNum(mon), d.toInt)
      case Dmy(d, mon, y) => norm(y.toInt, monthNum(mon), d.toInt)
      case _ => null
    }
  }

  val dateutilNormalizeUdf: UserDefinedFunction = udf(dateutilNormalize _)
}
