package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact

/** Extended aggregation surface beyond the reference's count/sum/min/max
  * (SURVEY.md §7.6): exact distinct aggregation, HLL sketch (rows-only —
  * engines' HLL estimates legitimately differ), ROLLUP hierarchies, and
  * pivot (conditional aggregation).
  */
object AggExtQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- exact distinct aggregation --------------------------------------
    QueryDef.sql(
      "q44_distinct_agg",
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust,
        |       COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""") { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    // ---- HLL sketch: estimates are engine-specific → rows-only check -----
    QueryDef.rowsOnly("q45_hll_sketch") { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(approx_count_distinct(col("o_custkey"), rsd = 0.05).as("approx_cust"))
        .orderBy("o_orderpriority")
    },

    // ---- ROLLUP hierarchy (subtotals + grand total) ----------------------
    QueryDef.sql(
      "q46_rollup",
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY 1, 2""") { (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), Exact.dsum(col("l_quantity"), 12, 2).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls")
    },

    // ---- pivot = conditional aggregation ---------------------------------
    QueryDef.sql(
      "q47_pivot",
      """SELECT user_id,
        |  COUNT(*) FILTER (event_type = 'click') AS click,
        |  COUNT(*) FILTER (event_type = 'error') AS error,
        |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""") { (s, d) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      val pivoted = Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", types)
        .count()
      // Spark pivot-count yields null for empty cells; FILTER yields 0
      pivoted.select(col("user_id") +:
        types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("user_id")
    }
  )
}
