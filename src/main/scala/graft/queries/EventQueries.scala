package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact

/** Event-time windowing over the `events` table (SURVEY.md §2.9 — the
  * reference is batch-only, so these are the batch forms; the streaming
  * module runs the same shapes through Structured Streaming).
  *
  * Time arithmetic stays in exact nanosecond integer math on the raw
  * parquet TIMESTAMP(NANOS) values (`Tables.events` → `ts_ns: long`), so
  * bucket boundaries are bit-reproducible in any engine — no timestamp
  * truncation, no timezone.
  *
  * Scale: tumbling/sliding aggregate map-side first (partial agg on the
  * bucket key); sessionization shuffles once on `user_id` and computes
  * gaps with lag/running-sum windows inside each user partition — the
  * standard distributed sessionize, no global ordering anywhere.
  */
object EventQueries {

  private val Hour = 3600L * 1000 * 1000 * 1000
  private val Quarter = Hour / 4
  private val SessionGap = 30L * 60 * 1000 * 1000 * 1000

  val defs: Seq[QueryDef] = Seq(

    // ---- tumbling 1-hour window aggregation ------------------------------
    QueryDef.sql(
      "q33_tumbling_window",
      s"""SELECT (epoch_ns(ts) // $Hour) * $Hour AS win_start, event_type,
         |  COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
      Tables.events(s, d)
        // integer bucket math: ts - ts % H == (ts // H) * H for ts >= 0,
        // with no double rounding (ts_ns exceeds double's 53-bit mantissa)
        .groupBy(
          (col("ts_ns") - col("ts_ns") % Hour).as("win_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), Exact.dsum(col("value"), 14, 2).as("total"))
        .orderBy("win_start", "event_type")
    },

    // ---- sliding window: 1 hour every 15 min (4 overlapping buckets) -----
    QueryDef.sql(
      "q34_sliding_window",
      s"""SELECT w_start, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total
         |FROM (
         |  SELECT ((epoch_ns(ts) // $Quarter) - k) * $Quarter AS w_start, value
         |  FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(k)
         |  WHERE epoch_ns(ts) < ((epoch_ns(ts) // $Quarter) - k) * $Quarter + $Hour)
         |GROUP BY 1 ORDER BY 1""") { (s, d) =>
      val slotStart = col("ts_ns") - col("ts_ns") % Quarter
      Tables.events(s, d)
        .select(col("ts_ns"), col("value"),
          explode(sequence(lit(0L), lit(3L))).as("k"))
        .withColumn("w_start", slotStart - col("k") * Quarter)
        .filter(col("ts_ns") < col("w_start") + Hour)
        .groupBy("w_start")
        .agg(count(lit(1)).as("n"), Exact.dsum(col("value"), 14, 2).as("total"))
        .orderBy("w_start")
    },

    // ---- range-frame moving aggregate: trailing 1-hour sum per user ------
    QueryDef.sql(
      "q53_range_frame",
      s"""SELECT event_id, user_id, tus,
         |  CAST(SUM(CAST(value AS DECIMAL(14,2)))
         |    OVER (PARTITION BY user_id ORDER BY tus
         |          RANGE BETWEEN ${3600L * 1000 * 1000} PRECEDING AND CURRENT ROW)
         |    AS DOUBLE) AS trailing_1h
         |FROM (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tus, value
         |      FROM events)
         |ORDER BY event_id""") { (s, d) =>
      val HourUs = 3600L * 1000 * 1000
      val w = Window.partitionBy("user_id").orderBy("tus")
        .rangeBetween(-HourUs, Window.currentRow)
      Tables.events(s, d)
        // integral div: Column./ would round-trip through double and lose
        // precision above 2^53
        .withColumn("tus", expr("(ts_ns - ts_ns % 1000) div 1000"))
        .select(col("event_id"), col("user_id"), col("tus"),
          sum(col("value").cast("decimal(14,2)")).over(w)
            .cast("double").as("trailing_1h"))
        .orderBy("event_id")
    },

    // ---- sessionization: 30-min-gap sessions per user --------------------
    QueryDef.sql(
      "q35_sessionize",
      s"""WITH g AS (
         |  SELECT user_id, epoch_ns(ts) AS tns, value,
         |    CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts))
         |           OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
         |           > $SessionGap
         |         OR lag(epoch_ns(ts))
         |           OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) IS NULL
         |         THEN 1 ELSE 0 END AS is_new,
         |    event_id
         |  FROM events),
         |s AS (
         |  SELECT user_id, tns, value,
         |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY tns, event_id
         |                      ROWS UNBOUNDED PRECEDING) AS session_idx
         |  FROM g)
         |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         |  min(tns) AS session_start, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total
         |FROM s GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
      val byTime = Window.partitionBy("user_id").orderBy("tus", "event_id")
      val run = Window.partitionBy("user_id").orderBy("tus", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prev = lag(col("tus"), 1).over(byTime)
      Tables.events(s, d)
        // DuckDB's parquet reader truncates TIMESTAMP(NANOS) to micros, so
        // the oracle only sees µs; compare at µs (the engine keeps nanos).
        .withColumn("tus", col("ts_ns") - col("ts_ns") % 1000)
        .withColumn("is_new",
          when(col("tus") - prev > SessionGap || prev.isNull, 1L).otherwise(0L))
        .withColumn("session_idx", sum(col("is_new")).over(run))
        .groupBy("user_id", "session_idx")
        .agg(min(col("tus")).as("session_start"), count(lit(1)).as("n"),
          Exact.dsum(col("value"), 14, 2).as("total"))
        .orderBy("user_id", "session_idx")
    },

    // ---- multi-step funnel: ordered step containment per user ------------
    // The product-analytics staple: for each user, the first view, the
    // first click AT OR AFTER that view, and the first purchase at or
    // after that click — each stage's timestamp conditional on the
    // previous. Three chained conditional-min windows over ONE user
    // partitioning: a single shuffle, no self-joins (the naive form is
    // three joins of the event table against itself). Null propagation
    // does the funnel logic: no view → t_view null → the click predicate
    // is null → no click stage, and so on.
    QueryDef.sql(
      "q84_funnel",
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS tns FROM events),
        |w1 AS (
        |  SELECT user_id, event_type, tns,
        |    min(CASE WHEN event_type = 'view' THEN tns END)
        |      OVER (PARTITION BY user_id) AS t_view
        |  FROM e),
        |w2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND tns >= t_view THEN tns END)
        |      OVER (PARTITION BY user_id) AS t_click
        |  FROM w1),
        |w3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND tns >= t_click THEN tns END)
        |      OVER (PARTITION BY user_id) AS t_purchase
        |  FROM w2)
        |SELECT DISTINCT user_id, t_view, t_click, t_purchase
        |FROM w3 ORDER BY user_id""") { (s, d) =>
      val w = Window.partitionBy("user_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          (col("ts_ns") - col("ts_ns") % 1000).as("tns"))
        .withColumn("t_view",
          min(when(col("event_type") === "view", col("tns"))).over(w))
        .withColumn("t_click",
          min(when(col("event_type") === "click" && col("tns") >= col("t_view"),
            col("tns"))).over(w))
        .withColumn("t_purchase",
          min(when(col("event_type") === "purchase" && col("tns") >= col("t_click"),
            col("tns"))).over(w))
        .select("user_id", "t_view", "t_click", "t_purchase")
        .distinct()
        .orderBy("user_id")
    },

    // ---- gaps-and-islands: collapse consecutive equal-state runs ---------
    // The SCD-2 / state-history pattern: per customer, consecutive orders
    // with the same priority collapse into one validity run
    // [first_date, last_date]. Change detection is lag() ≠ current; the
    // island id is the running sum of change flags — two windows over ONE
    // partitioning (a single shuffle on the entity key), then an ordinary
    // grouped aggregate. The only state an executor holds is a partition
    // sort, not history.
    QueryDef.sql(
      "q83_gaps_islands",
      """WITH o AS (
        |  SELECT o_custkey, o_orderpriority AS state,
        |    strftime(o_orderdate, '%Y-%m-%d') AS d, o_orderkey
        |  FROM orders WHERE o_custkey % 100 = 0),
        |g AS (
        |  SELECT o_custkey, state, d, o_orderkey,
        |    CASE WHEN lag(state) OVER w IS DISTINCT FROM state THEN 1 ELSE 0 END AS chg
        |  FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY d, o_orderkey)),
        |i AS (
        |  SELECT o_custkey, state, d,
        |    SUM(chg) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey
        |                   ROWS UNBOUNDED PRECEDING) AS island
        |  FROM g)
        |SELECT o_custkey, CAST(island AS BIGINT) AS island, state,
        |  MIN(d) AS run_start, MAX(d) AS run_end, COUNT(*) AS n_orders
        |FROM i GROUP BY o_custkey, island, state
        |ORDER BY o_custkey, island""") { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
      Tables.orders(s, d)
        .filter(col("o_custkey") % 100 === 0)
        .select(col("o_custkey"), col("o_orderpriority").as("state"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"), col("o_orderkey"))
        .withColumn("chg",
          when(!(lag(col("state"), 1).over(w) <=> col("state")), 1L).otherwise(0L))
        .withColumn("island",
          sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("o_custkey", "island", "state")
        .agg(min(col("d")).as("run_start"), max(col("d")).as("run_end"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_custkey", "island")
    },

    // ---- native session_window sessionization ----------------------------
    // The same sessions as q35/q38, via Spark's BUILTIN session_window
    // (merge-on-overlap session aggregation) instead of lag/running-sum
    // windows or custom state — the operator a Spark-first pipeline
    // reaches for FIRST. Boundary semantics pinned to the oracle:
    // session_window splits when diff >= gap (event windows [t, t+gap)
    // merge on overlap) while the oracle splits when diff > gap; on
    // µs-quantized timestamps `gap + 1 µs` makes the two identical.
    // session_idx is a per-user ordinal over session starts (the one
    // extra window runs on the already-aggregated session rows, not the
    // raw events). Oracle text = q35's, verbatim.
    QueryDef.sql(
      "q95_session_window",
      s"""WITH g AS (
         |  SELECT user_id, epoch_ns(ts) AS tns, value,
         |    CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts))
         |           OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
         |           > $SessionGap
         |         OR lag(epoch_ns(ts))
         |           OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) IS NULL
         |         THEN 1 ELSE 0 END AS is_new,
         |    event_id
         |  FROM events),
         |s AS (
         |  SELECT user_id, tns, value,
         |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY tns, event_id
         |                      ROWS UNBOUNDED PRECEDING) AS session_idx
         |  FROM g)
         |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         |  min(tns) AS session_start, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total
         |FROM s GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
      val gapMicros = SessionGap / 1000 + 1
      val sessions = Tables.events(s, d)
        .withColumn("tus", col("ts_ns") - col("ts_ns") % 1000)
        .withColumn("t", timestamp_micros(expr("tus div 1000")))
        .groupBy(col("user_id"), session_window(col("t"), s"$gapMicros microseconds"))
        .agg(min(col("tus")).as("session_start"), count(lit(1)).as("n"),
          Exact.dsum(col("value"), 14, 2).as("total"))
      val byStart = Window.partitionBy("user_id").orderBy("session_start")
      sessions
        .withColumn("session_idx", row_number().over(byStart).cast("long"))
        .select("user_id", "session_idx", "session_start", "n", "total")
        .orderBy("user_id", "session_idx")
    },

    // ---- batch interval join via bucketized equi-join --------------------
    // The BATCH form of q39b's attribution (purchases ⋈ same-user clicks
    // in the preceding 30 min). Spark has no native range join, and the
    // naive key + range theta-join degenerates to a per-key cross
    // product on hot keys; IntervalJoin buckets time by the window width
    // and replicates the BUILD side into (bucket, bucket+1), so the plan
    // is an ordinary shuffled equi-join on (user, bucket) — IntervalSpec
    // asserts no BNLJ/cartesian node — with the exact range applied
    // after. Same oracle text as q39b: the two formulations (streaming
    // watermarked join, batch bucketized join) must agree exactly.
    QueryDef.sql(
      "q94_interval_join_batch",
      s"""SELECT p.event_id AS purchase_id, c.event_id AS click_id,
         |       p.user_id,
         |       epoch_ns(p.ts) AS p_tus, epoch_ns(c.ts) AS c_tus
         |FROM events p JOIN events c
         |  ON p.user_id = c.user_id
         | AND p.event_type = 'purchase' AND c.event_type = 'click'
         | AND epoch_ns(c.ts) <= epoch_ns(p.ts)
         | AND epoch_ns(c.ts) > epoch_ns(p.ts) - ${30L * 60 * 1000 * 1000 * 1000}
         |ORDER BY purchase_id, click_id""") { (s, d) =>
      val W = 30L * 60 * 1000 * 1000 * 1000
      // µs-truncate BEFORE joining, exactly like q39b: DuckDB's reader
      // truncates TIMESTAMP(NANOS) to µs, so boundary comparisons must
      // run in the same domain
      val ev = Tables.events(s, d)
        .withColumn("tus", col("ts_ns") - col("ts_ns") % 1000)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("tus").as("p_tus"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("tus").as("c_tus"))
      graft.operators.IntervalJoin.preceding(
          purchases, clicks,
          col("user_id"), col("c_user"), col("p_tus"), col("c_tus"), W)
        .select("purchase_id", "click_id", "user_id", "p_tus", "c_tus")
        .orderBy("purchase_id", "click_id")
    }
  )
}
