package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** User-behavior analytics over the `events` table: retention cohorts,
  * event-transition (Markov) counts, and dense-calendar gap filling —
  * the aggregate shapes a product-analytics or training-telemetry
  * pipeline runs after sessionization (§2.9 extensions).
  *
  * Time math follows the EventQueries convention: exact nanosecond
  * integers truncated to microseconds (`ts_ns - ts_ns % 1000`) so the
  * DuckDB oracle's µs-resolution timestamps bucket identically.
  *
  * Scale notes (100 TB):
  *  - retention + transitions shuffle ONCE on `user_id` (window), then
  *    run an ordinary partial-agg groupBy — no self-joins, no global
  *    ordering; per-user state is a partition sort, bounded by the
  *    busiest user, not history.
  *  - gap-fill's dense calendar is bounded by (time range × type
  *    cardinality), independent of event count; the sparse counts join
  *    broadcasts because it is already aggregated.
  */
object CohortQueries {

  private val Week = 7L * 24 * 3600 * 1000 * 1000 * 1000
  private val Day = 24L * 3600 * 1000 * 1000 * 1000

  val defs: Seq[QueryDef] = Seq(

    // ---- weekly retention cohorts ----------------------------------------
    // cohort = the user's first-activity week; one row per (cohort,
    // week-offset) counting users still active that week. The classic
    // retention triangle, computed with a single user_id shuffle: the
    // cohort comes from a partition-wide min window, not a join back.
    QueryDef.sql(
      "q85_retention_cohorts",
      s"""WITH e AS (
         |  SELECT user_id, (epoch_ns(ts) // $Week) * $Week AS wk FROM events),
         |c AS (
         |  SELECT user_id, wk, min(wk) OVER (PARTITION BY user_id) AS cohort
         |  FROM e)
         |SELECT cohort, (wk - cohort) // $Week AS week_offset,
         |  COUNT(DISTINCT user_id) AS n_users
         |FROM c GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
      val tns = col("ts_ns") - col("ts_ns") % 1000
      Tables.events(s, d)
        .select(col("user_id"), (tns - tns % Week).as("wk"))
        .withColumn("cohort", min(col("wk")).over(Window.partitionBy("user_id")))
        // `/` is double division, but exact here: wk−cohort is a multiple
        // of Week (= 2^16·k ns) bounded by the data's time span, so both
        // operands and the integral quotient sit well inside 53 bits
        .groupBy(col("cohort"), ((col("wk") - col("cohort")) / Week).cast("long").as("week_offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .orderBy("cohort", "week_offset")
    },

    // ---- event-transition matrix (first-order Markov counts) -------------
    // lag() inside each user's time-ordered partition gives the previous
    // event; counting (prev → next) pairs yields the transition matrix.
    // Single-event users produce no row (no transition), matching the
    // NULL-prev filter on both sides.
    QueryDef.sql(
      "q86_event_transitions",
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) AS tns, event_id FROM events),
        |t AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY tns, event_id)
        |    AS prev_type, event_type AS next_type
        |  FROM e)
        |SELECT prev_type, next_type, COUNT(*) AS n
        |FROM t WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("tns", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          (col("ts_ns") - col("ts_ns") % 1000).as("tns"), col("event_id"))
        .select(lag(col("event_type"), 1).over(w).as("prev_type"),
          col("event_type").as("next_type"))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "next_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("prev_type", "next_type")
    },

    // ---- dense-calendar gap fill ------------------------------------------
    // Sparse daily counts → a dense (event_type × day) grid with explicit
    // zeros for silent days — the sparse-to-dense step before any
    // time-series model. The calendar is generated from the global
    // [min, max] day bounds (a 1-row aggregate, broadcast by AQE), and
    // the aggregated sparse counts broadcast into the left join.
    QueryDef.sql(
      "q87_gap_fill_daily",
      s"""WITH d AS (
         |  SELECT event_type, (epoch_ns(ts) // $Day) * $Day AS day, COUNT(*) AS n
         |  FROM events GROUP BY 1, 2),
         |b AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
         |cal AS (SELECT unnest(generate_series(lo, hi, $Day)) AS day FROM b),
         |types AS (SELECT DISTINCT event_type FROM events)
         |SELECT t.event_type, c.day, COALESCE(d.n, 0) AS n
         |FROM cal c CROSS JOIN types t
         |LEFT JOIN d ON d.event_type = t.event_type AND d.day = c.day
         |ORDER BY 1, 2""") { (s, d) =>
      // the day key stays in ns (day-start epoch) so every step is pure
      // integer arithmetic — `tns / Day` would be a double divide, lossy
      // past 2^53 ns (~104 days of epoch time)
      val tns = col("ts_ns") - col("ts_ns") % 1000
      val ev = Tables.events(s, d)
      val counts = ev
        .groupBy(col("event_type"), (tns - tns % Day).as("day"))
        .agg(count(lit(1)).as("n"))
      val cal = counts.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), lit(Day))).as("day"))
      val types = ev.select(col("event_type")).distinct()
      cal.crossJoin(broadcast(types))
        .join(broadcast(counts), Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("event_type", "day")
    },

    // ---- fixed-lag exponential smoothing ---------------------------------
    // 4-tap EWMA (α = 1/2) per user in event-time order, written as an
    // EXPLICIT lag polynomial rather than a running recursion: the
    // weights are exact binary fractions and the addition order is fixed
    // by the expression tree, so the float result is bit-identical in
    // any IEEE engine. A true infinite-horizon EWMA needs a sequential
    // scan per key (mapGroups) — the bounded form stays a window over
    // one user_id shuffle, which is what a feature pipeline wants.
    QueryDef.sql(
      "q90_ewma_smooth",
      """WITH e AS (
        |  SELECT user_id, event_id, value, epoch_ns(ts) AS tns FROM events
        |  WHERE user_id % 50 = 0)
        |SELECT user_id, event_id, value,
        |  value + 0.5 * COALESCE(lag(value, 1) OVER w, 0)
        |        + 0.25 * COALESCE(lag(value, 2) OVER w, 0)
        |        + 0.125 * COALESCE(lag(value, 3) OVER w, 0) AS smooth
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)
        |ORDER BY user_id, event_id""") { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy((col("ts_ns") - col("ts_ns") % 1000).asc, col("event_id").asc)
      def tap(k: Int, wt: Double) =
        lit(wt) * coalesce(lag(col("value"), k).over(w), lit(0.0))
      Tables.events(s, d)
        .filter(col("user_id") % 50 === 0)
        .withColumn("smooth",
          col("value") + tap(1, 0.5) + tap(2, 0.25) + tap(3, 0.125))
        .select("user_id", "event_id", "value", "smooth")
        .orderBy("user_id", "event_id")
    }
  )
}
