package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.CentsSum
import graft.operators.{AsOf, SaltedJoin}

/** Extension operators: typed Aggregator UDAF, as-of join, salted skew
  * join (verified equal to the plain join), and the SQL entry surface.
  */
object ExtOpQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- typed Aggregator (UDAF surface) ---------------------------------
    QueryDef.sql(
      "q48_typed_aggregator",
      """SELECT event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      val centsSum = udaf(CentsSum)
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(centsSum(col("value")).as("total"))
        .orderBy("event_type")
    },

    // ---- as-of join: purchase → most recent prior click per user ---------
    QueryDef.sql(
      "q49_asof_join",
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |         epoch_ns(ts) AS tus
        |  FROM events),
        |w AS (
        |  SELECT event_id, user_id, event_type, tus,
        |    last_value(CASE WHEN event_type = 'click' THEN tus END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY tus, event_id
        |            ROWS UNBOUNDED PRECEDING) AS prior_click
        |  FROM e)
        |SELECT event_id, user_id, tus, prior_click
        |FROM w WHERE event_type = 'purchase' ORDER BY event_id""") { (s, d) =>
      val evs = Tables.events(s, d)
        .withColumn("tus", col("ts_ns") - col("ts_ns") % 1000) // µs parity
      AsOf.lastPrior(evs,
        keyCol = col("user_id"),
        orderCols = Seq(col("tus"), col("event_id")),
        probe = col("event_type") === "purchase",
        reference = col("event_type") === "click",
        attach = col("tus"),
        outName = "prior_click")
        .select("event_id", "user_id", "tus", "prior_click")
        .orderBy("event_id")
    },

    // ---- salted skew join ≡ plain join -----------------------------------
    QueryDef.sql(
      "q50_salted_join",
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""") { (s, d) =>
      SaltedJoin.inner(
        Tables.lineitem(s, d).withColumnRenamed("l_orderkey", "k"),
        Tables.orders(s, d).withColumnRenamed("o_orderkey", "k"),
        key = "k",
        saltExpr = col("l_linenumber").cast("int"),
        salts = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          graft.functions.Exact.dsum(col("l_quantity"), 12, 2).as("qty"))
        .orderBy("o_orderpriority")
    },

    // ---- bloom-filter-pruned join ----------------------------------------
    // The runtime-filter pattern for selective fact⋈dim joins: build a
    // Bloom filter over the (small) dim key set, broadcast it, and drop
    // non-matching fact rows MAP-SIDE before they reach the join
    // exchange — at 100 TB that's the difference between shuffling the
    // whole fact table and shuffling the ~matching slice. Bloom false
    // positives only cost a little extra shuffle; the exact join behind
    // the filter removes them, so the result — and the oracle — is
    // exactly the plain join. (AQE injects this automatically in some
    // shapes; the explicit operator covers the rest.)
    QueryDef.sql(
      "q82_bloom_join",
      """SELECT s_nationkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_nationkey < 5
        |GROUP BY s_nationkey ORDER BY s_nationkey""") { (s, d) =>
      val dim = Tables.supplier(s, d)
        .filter(col("s_nationkey") < 5)
        .select("s_suppkey", "s_nationkey")
      val bf = dim.stat.bloomFilter("s_suppkey", 100000L, 0.01)
      val bfB = s.sparkContext.broadcast(bf)
      // boxed param: a primitive-Long UDF NPEs on a null key (the same
      // hazard class as the null-text UDF crashes fixed this round); a
      // null key can't match any dim row, so false is the right verdict
      val mightContain = udf((k: java.lang.Long) =>
        k != null && bfB.value.mightContainLong(k))
      Tables.lineitem(s, d)
        .select("l_suppkey", "l_quantity")
        .filter(mightContain(col("l_suppkey"))) // map-side prune pre-shuffle
        .join(dim, col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"),
          graft.functions.Exact.dsum(col("l_quantity"), 12, 2).as("qty"))
        .orderBy("s_nationkey")
    },

    // ---- statistical moments from exact sums ------------------------------
    // stddev/variance built compositionally from exact decimal sums (one
    // double division + sqrt at the end) instead of engine-native
    // accumulators (Welford vs naive differ in float rounding across
    // engines — not reproducible; this formulation is).
    QueryDef.sql(
      "q52_moments",
      """WITH a AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(value AS DECIMAL(14,2)) * CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sxx
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n, sx / n AS mean,
        |  (n * sxx - sx * sx) / (n * (n - 1.0)) AS var_samp,
        |  sqrt((n * sxx - sx * sx) / (n * (n - 1.0))) AS std_samp
        |FROM a ORDER BY event_type""") { (s, d) =>
      val dec = col("value").cast("decimal(14,2)")
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(dec).cast("double").as("sx"),
          sum(dec * dec).cast("double").as("sxx"))
        .select(col("event_type"), col("n"),
          (col("sx") / col("n")).as("mean"),
          ((col("n") * col("sxx") - col("sx") * col("sx")) /
            (col("n") * (col("n") - 1.0))).as("var_samp"),
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) /
            (col("n") * (col("n") - 1.0))).as("std_samp"))
        .orderBy("event_type")
    },

    // ---- SQL entry surface (spark.sql over registered views) -------------
    QueryDef.sql(
      "q51_sql_api",
      """SELECT n_name, COUNT(*) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""") { (s, d) =>
      // query-scoped view names: Verify runs query builders concurrently
      // on one shared session, so a generic "customer" view here could be
      // clobbered by another query registering the same name mid-analysis
      Tables.customer(s, d).createOrReplaceTempView("q51_customer")
      Tables.nation(s, d).createOrReplaceTempView("q51_nation")
      s.sql(
        """SELECT n_name, COUNT(*) AS n,
          |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
          |FROM q51_customer JOIN q51_nation ON c_nationkey = n_nationkey
          |GROUP BY n_name ORDER BY n_name""".stripMargin)
    }
  )
}
