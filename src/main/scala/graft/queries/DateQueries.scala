package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.dates.DateSplit._

/** Differential coverage for the dates module (SURVEY.md §2.8 F1-F4,
  * F8-F9): dirty date strings are derived deterministically from
  * `orders.o_orderdate` in 8 reference formats; the oracle recomputes the
  * expected six-int bounds per format with independent SQL, so the two
  * sides only agree when `splitDates` implements the intended semantics.
  */
object DateQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- F1/F4/F8/F9: the split_dates multi-format range parser ---------
    QueryDef.sql(
      "q17_split_dates",
      """WITH base AS (
        |  SELECT o_orderkey, o_orderkey % 8 AS k, o_orderdate AS d,
        |         CAST(year(o_orderdate) AS INT) AS y,
        |         CAST(month(o_orderdate) AS INT) AS m,
        |         CAST(day(o_orderdate) AS INT) AS dd,
        |         CAST(day(last_day(o_orderdate)) AS INT) AS ld,
        |         o_orderdate + INTERVAL 4 DAY AS d4
        |  FROM orders)
        |SELECT o_orderkey,
        |  CASE k WHEN 0 THEN ' ' || strftime(d, '%Y-%m-%d') || ','
        |         WHEN 1 THEN strftime(d, '%Y-%m')
        |         WHEN 2 THEN strftime(d, '%Y')
        |         WHEN 3 THEN strftime(d, '%Y-%m-%d') || '/' || strftime(d4, '%Y-%m-%d')
        |         WHEN 4 THEN strftime(d, '%Y-%m-%d') || 'T08:30:15'
        |         WHEN 5 THEN strftime(d, '%Y') || '/' || CAST(y + 3 AS VARCHAR)
        |         WHEN 6 THEN strftime(d, '%b %Y')
        |         ELSE 'bad-' || CAST(o_orderkey % 10 AS VARCHAR) END AS raw,
        |  CAST(CASE WHEN k = 7 THEN 0 ELSE y END AS INT) AS start_year,
        |  CAST(CASE WHEN k = 7 THEN 0 WHEN k IN (2, 5) THEN 1 ELSE m END AS INT) AS start_month,
        |  CAST(CASE WHEN k = 7 THEN 0 WHEN k IN (1, 2, 5, 6) THEN 1 ELSE dd END AS INT) AS start_day,
        |  CAST(CASE WHEN k = 7 THEN 0 WHEN k = 5 THEN y + 3
        |            WHEN k = 3 THEN year(d4) ELSE y END AS INT) AS end_year,
        |  CAST(CASE WHEN k = 7 THEN 0 WHEN k IN (2, 5) THEN 12
        |            WHEN k = 3 THEN month(d4) ELSE m END AS INT) AS end_month,
        |  CAST(CASE WHEN k = 7 THEN 0 WHEN k IN (2, 5) THEN 31
        |            WHEN k IN (1, 6) THEN ld
        |            WHEN k = 3 THEN day(d4) ELSE dd END AS INT) AS end_day
        |FROM base ORDER BY o_orderkey""") { (s, dir) =>
      val k = col("o_orderkey") % 8
      val d = col("o_orderdate")
      val raw = when(k === 0, concat(lit(" "), date_format(d, "yyyy-MM-dd"), lit(",")))
        .when(k === 1, date_format(d, "yyyy-MM"))
        .when(k === 2, date_format(d, "yyyy"))
        .when(k === 3, concat(date_format(d, "yyyy-MM-dd"), lit("/"),
          date_format(date_add(d, 4), "yyyy-MM-dd")))
        .when(k === 4, concat(date_format(d, "yyyy-MM-dd"), lit("T08:30:15")))
        .when(k === 5, concat(date_format(d, "yyyy"), lit("/"),
          (year(d) + 3).cast("string")))
        .when(k === 6, date_format(d, "MMM yyyy"))
        .otherwise(concat(lit("bad-"), (col("o_orderkey") % 10).cast("string")))
      Tables.orders(s, dir) // spread retired: measured loss at 1x AND 10x (Tables.spread scaladoc)
        .select(col("o_orderkey"), raw.as("raw"))
        // the UDF twin parses once per row; the expression form re-runs
        // its CASE chain per extracted field (see SplitDatesFn scaladoc)
        .withColumn("p", graft.dates.SplitDatesFn.splitDatesUdf(col("raw")))
        .select(col("o_orderkey"), col("raw"), col("p.*"))
        .orderBy("o_orderkey")
    },

    // ---- P3 extended: the dateutil-lenient pydantic eventDate gate ------
    // Raw strings are derived from o_orderdate in 10 shapes (6 accepted by
    // validate.py:37-63 + dateutil, 4 rejected); the oracle computes the
    // expected normalization from the SOURCE DATE directly, so the gate's
    // regex/calendar logic is checked against ground truth rather than a
    // re-implementation of itself.
    QueryDef.sql(
      "q63_dateutil_gate",
      """SELECT o_orderkey,
        |  CASE k WHEN 0 THEN strftime(d, '%Y-%m-%d')
        |         WHEN 1 THEN strftime(d, '%Y-%m-%d') || ' 23:12:00'
        |         WHEN 2 THEN strftime(d, '%Y-%m-%d') || 'T08:30'
        |         WHEN 3 THEN strftime(d, '%Y.%m.%d')
        |         WHEN 4 THEN strftime(d, '%B') || ' ' || CAST(day(d) AS VARCHAR) || ', ' || strftime(d, '%Y')
        |         WHEN 5 THEN CAST(day(d) AS VARCHAR) || ' ' || strftime(d, '%b') || ' ' || strftime(d, '%Y')
        |         WHEN 6 THEN strftime(d, '%Y-%m')
        |         WHEN 7 THEN strftime(d, '%Y')
        |         WHEN 8 THEN strftime(d, '%Y-%m-%d') || '/' || strftime(d + INTERVAL 4 DAY, '%Y-%m-%d')
        |         ELSE 'Foo ' || CAST(day(d) AS VARCHAR) || ', ' || strftime(d, '%Y') END AS raw,
        |  CASE WHEN k <= 5 THEN strftime(d, '%Y-%m-%d') END AS norm,
        |  (k <= 5) AS accepted
        |FROM (SELECT o_orderkey, o_orderdate AS d, o_orderkey % 10 AS k FROM orders)
        |ORDER BY o_orderkey""") { (s, dir) =>
      val k = col("o_orderkey") % 10
      val d = col("o_orderdate")
      def day = dayofmonth(d).cast("string")
      val raw = when(k === 0, date_format(d, "yyyy-MM-dd"))
        .when(k === 1, concat(date_format(d, "yyyy-MM-dd"), lit(" 23:12:00")))
        .when(k === 2, concat(date_format(d, "yyyy-MM-dd"), lit("T08:30")))
        .when(k === 3, date_format(d, "yyyy.MM.dd"))
        .when(k === 4, concat(date_format(d, "MMMM"), lit(" "), day,
          lit(", "), date_format(d, "yyyy")))
        .when(k === 5, concat(day, lit(" "), date_format(d, "MMM"),
          lit(" "), date_format(d, "yyyy")))
        .when(k === 6, date_format(d, "yyyy-MM"))
        .when(k === 7, date_format(d, "yyyy"))
        .when(k === 8, concat(date_format(d, "yyyy-MM-dd"), lit("/"),
          date_format(date_add(d, 4), "yyyy-MM-dd")))
        .otherwise(concat(lit("Foo "), day, lit(", "), date_format(d, "yyyy")))
      Tables.orders(s, dir) // spread retired: measured loss at 1x AND 10x (Tables.spread scaladoc)
        .select(col("o_orderkey"), raw.as("raw"))
        // the JVM twin parses once per row; the expression form re-runs
        // its regex CASE chain per derived column (see SplitDatesFn)
        .withColumn("norm", graft.dates.SplitDatesFn.dateutilNormalizeUdf(col("raw")))
        .withColumn("accepted", col("norm").isNotNull)
        .orderBy("o_orderkey")
    },

    // ---- F2/F3: strict-date gate + bare-year window expansion -----------
    QueryDef.sql(
      "q18_date_gate_expand",
      """SELECT raw,
        |  (raw SIMILAR TO '[0-9]{4}-[0-9]{2}-[0-9]{2}') AS date_is_valid,
        |  CASE WHEN raw SIMILAR TO '[0-9]{4}' THEN raw || '-01-01' ELSE raw END AS win_start,
        |  CASE WHEN raw SIMILAR TO '[0-9]{4}' THEN raw || '-12-31' ELSE raw END AS win_end,
        |  COUNT(*) AS n
        |FROM (SELECT CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y')
        |                  WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y-%m-%d')
        |                  ELSE strftime(o_orderdate, '%Y-%m') END AS raw
        |      FROM orders)
        |GROUP BY 1, 2, 3, 4 ORDER BY raw""") { (s, dir) =>
      val kk = col("o_orderkey") % 3
      val d = col("o_orderdate")
      val raw = when(kk === 0, date_format(d, "yyyy"))
        .when(kk === 1, date_format(d, "yyyy-MM-dd"))
        .otherwise(date_format(d, "yyyy-MM"))
      Tables.orders(s, dir)
        .select(raw.as("raw"))
        .groupBy(col("raw"), isValidDate(col("raw")).as("date_is_valid"),
          expandStart(col("raw")).as("win_start"),
          expandEnd(col("raw")).as("win_end"))
        .agg(count(lit(1)).as("n"))
        .orderBy("raw")
    }
  )
}
