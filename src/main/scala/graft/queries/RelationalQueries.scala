package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact._

/** The reference's relational operator surface (SURVEY.md §2.2–§2.7)
  * re-expressed over the driver testdata: aggregations, broadcast
  * dimension joins, semi/anti joins, keep-first dedup, surrogate-key
  * dimension build + FK resolution, unions, windows, explode, sorts.
  *
  * Scale notes (100 TB): every group-by here keys on low-cardinality or
  * well-distributed columns (partial aggregation does the heavy lifting
  * map-side); all dimension joins broadcast (`supplier`/`nation`/`region`
  * are dimension-sized by construction); windows partition by a key so
  * they shuffle once and never collapse to a single partition. Where the
  * reference demands a global ordering over a fact-table slice (q07:
  * sequential negative ids), the numbering runs as the two-pass
  * partition-offset scheme of [[graft.operators.GlobalRowNumber]] — no
  * partition-less window anywhere. q06/q16 keep a bare global window
  * only over dimension-sized deltas (≤ thousands of rows).
  */
object RelationalQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A1/A3: grouped aggregation with exact money arithmetic -------
    // Reference: sightings-per-group tallies (cleaner.py:353-355,
    // visualizations.ipynb cell 13) generalized to TPC-H Q1 shape.
    QueryDef.sql(
      "q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""") { (s, d) =>
      // decimal-exact sums are the cost here, and a single-file scan
      // yields a handful of row-group splits — spread the rows first so
      // the partial aggregation runs on all cores (no-op at real scale,
      // where splits >> cores; see Tables.spread)
      Tables.spread(Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2000-12-01 00:00:00").cast("timestamp")),
        col("l_orderkey"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity"), 12, 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 12, 2).as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1) - col("l_discount").cast("decimal(4,2)"))).cast("double")
            .as("sum_disc_price"),
          (dsum(col("l_quantity"), 12, 2) / count(col("l_quantity"))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- A2/O2: global min/max over date-as-string --------------------
    // Reference: pipeline date bounds, cleaner.py:170-192.
    QueryDef.sql(
      "q02_global_minmax",
      """SELECT min(strftime(o_orderdate, '%Y-%m-%d')) AS min_date,
        |       max(strftime(o_orderdate, '%Y-%m-%d')) AS max_date,
        |       COUNT(*) AS n_orders
        |FROM orders""") { (s, d) =>
      Tables.orders(s, d).agg(
        min(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("min_date"),
        max(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("max_date"),
        count(lit(1)).as("n_orders"))
    },

    // ---- A3/O1: value_counts (group-by count, order desc) -------------
    // Reference: sightings-per-year value_counts, visualizations cell 13.
    QueryDef.sql(
      "q03_value_counts",
      """SELECT event_type, COUNT(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY n DESC, event_type""") { (s, d) =>
      Tables.events(s, d).groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("event_type"))
    },

    // ---- P7/F5: year extraction + range predicate ---------------------
    // Reference: 2000 <= year < 2025 filter, visualizations cell 13.
    QueryDef.sql(
      "q04_year_range",
      """SELECT year(o_orderdate) AS yr, COUNT(*) AS n
        |FROM orders
        |WHERE year(o_orderdate) >= 1996 AND year(o_orderdate) < 2000
        |GROUP BY 1 ORDER BY 1""") { (s, d) =>
      val y = year(col("o_orderdate")).cast("long")
      Tables.orders(s, d)
        .filter(y >= 1996 && y < 2000)
        .groupBy(y.as("yr")).agg(count(lit(1)).as("n"))
        .orderBy("yr")
    },

    // ---- A4/W3: keep-first dedup with pinned order ---------------------
    // Reference: drop_duplicates(subset, keep='first'), cleaner.py:353-355.
    // Spark's dropDuplicates keeps an arbitrary row; the reference's
    // "first" is a total order, reproduced as a MIN-BY aggregation:
    // min(struct(ordering cols)) per key is the keep-first row, and the
    // hash aggregate beats the row_number window at scale — partial
    // aggregation collapses duplicate keys MAP-SIDE (a dup-heavy corpus,
    // the whole point of dedup, shuffles only survivors) and nothing
    // sort-buffers whole partitions. The oracle keeps the window
    // formulation — same rows by construction, pinned by the hash gate.
    QueryDef.sql(
      "q05_dedup_keepfirst",
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber
        |FROM (SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |        row_number() OVER (PARTITION BY l_orderkey, l_partkey
        |                           ORDER BY l_linenumber, l_suppkey) AS rn
        |      FROM lineitem)
        |WHERE rn = 1
        |ORDER BY l_orderkey, l_partkey""") { (s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
        // ONE exchange for dedup + pinned output order (the
        // GlobalRowNumber posture): range partitioning on the dedup key
        // both satisfies the aggregate's clustering requirement AND
        // makes partition order the global order, so the gate's ORDER BY
        // is a free sortWithinPartitions instead of a second full
        // shuffle. Trade: the explicit exchange sits below the
        // aggregate, so there is no map-side combine — on a dup-heavy
        // corpus, drop the repartitionByRange + sortWithinPartitions and
        // let groupBy's own exchange collapse duplicates map-side.
        .repartitionByRange(col("l_orderkey"), col("l_partkey"))
        .groupBy("l_orderkey", "l_partkey")
        // struct comparison is lexicographic in field order — exactly the
        // (l_linenumber, l_suppkey) keep-first ordering
        .agg(min(struct(col("l_linenumber"), col("l_suppkey"))).as("f"))
        .select(col("l_orderkey"), col("l_partkey"),
          col("f.l_suppkey").as("l_suppkey"),
          col("f.l_linenumber").as("l_linenumber"))
        .sortWithinPartitions("l_orderkey", "l_partkey")
    },

    // ---- A6/W2: distinct dimension extraction + surrogate ids ----------
    // Reference: species/locations dims from repeated upserts,
    // storage.py:80-112 re-expressed set-based.
    QueryDef.sql(
      "q06_dim_surrogates",
      """SELECT CAST(row_number() OVER (ORDER BY name) AS BIGINT) AS id, name
        |FROM (SELECT DISTINCT c_mktsegment AS name FROM customer)
        |ORDER BY id""") { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_mktsegment").as("name")).distinct()
        .withColumn("id", row_number().over(Window.orderBy("name")).cast("long"))
        .select("id", "name")
        .orderBy("id")
    },

    // ---- W1/F15: synthetic negative string ids in encounter order ------
    // Reference: null occurrenceIDs -> "-1","-2",..., cleaner.py:66-69.
    QueryDef.sql(
      "q07_negative_ids",
      """SELECT o_orderkey,
        |       CAST(-row_number() OVER (ORDER BY o_orderkey) AS VARCHAR) AS synthetic_id
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""") { (s, d) =>
      // two-pass partition-offset numbering — a bare Window.orderBy would
      // collapse ~20% of orders onto one partition (see GlobalRowNumber)
      graft.operators.GlobalRowNumber.byKeyOrder(
        Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey")),
        "o_orderkey", "_rn")
        .withColumn("synthetic_id", (-col("_rn")).cast("string"))
        .select("o_orderkey", "synthetic_id")
        .orderBy("o_orderkey")
    },

    // ---- J2: fact ⋈ broadcast dimension + grouped revenue --------------
    // Reference: occurrences ⋈ species, visualizations cell 9.
    QueryDef.sql(
      "q08_join_broadcast_dim",
      """SELECT s_name, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""") { (s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1) - col("l_discount").cast("decimal(4,2)"))).cast("double")
            .as("revenue"))
        .orderBy("s_name")
    },

    // ---- J2/J3: snowflake join chain (fact ⋈ dim ⋈ dim) ----------------
    // Reference: sightings ⋈ species ⋈ locations, cells 9-10.
    QueryDef.sql(
      "q09_join_snowflake",
      """SELECT r_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""") { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          count(lit(1)).as("n_customers"),
          davg(col("c_acctbal"), 12, 2).as("avg_acctbal"))
        .orderBy("r_name")
    },

    // ---- J5: existence probe as left-semi join -------------------------
    // Reference: SELECT 1 ... LIMIT 1 probes, procedures.sql:12-17.
    QueryDef.sql(
      "q10_semi_join",
      """SELECT n_name FROM nation
        |WHERE n_nationkey IN (SELECT c_nationkey FROM customer)
        |ORDER BY n_name""") { (s, d) =>
      Tables.nation(s, d)
        .join(Tables.customer(s, d),
          col("n_nationkey") === col("c_nationkey"), "left_semi")
        .select("n_name")
        .orderBy("n_name")
    },

    // ---- J6: anti join (dedup-as-anti-join / not-exists) ----------------
    QueryDef.sql(
      "q11_anti_join",
      """SELECT c_nationkey, COUNT(*) AS n
        |FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 250000)
        |GROUP BY c_nationkey ORDER BY c_nationkey""") { (s, d) =>
      // the filtered right side keeps the result non-empty at every SF
      // (an unfiltered version matches trivially on all-zero rows)
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 250000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
        .orderBy("c_nationkey")
    },

    // ---- U1/U2: union of two channels then aggregate --------------------
    // Reference: valid ⊎ repaired-errors concat, cleaner.py:339-380.
    QueryDef.sql(
      "q12_union_channels",
      """SELECT tag, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT 'high' AS tag, o_totalprice FROM orders WHERE o_totalprice >= 200000
        |  UNION ALL
        |  SELECT 'low' AS tag, o_totalprice FROM orders WHERE o_totalprice < 50000
        |) GROUP BY tag ORDER BY tag""") { (s, d) =>
      val o = Tables.orders(s, d)
      val hi = o.filter(col("o_totalprice") >= 200000)
        .select(lit("high").as("tag"), col("o_totalprice"))
      val lo = o.filter(col("o_totalprice") < 50000)
        .select(lit("low").as("tag"), col("o_totalprice"))
      hi.unionByName(lo)
        .groupBy("tag")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 14, 2).as("total"))
        .orderBy("tag")
    },

    // ---- set ops beyond the reference: INTERSECT / EXCEPT ----------------
    QueryDef.sql(
      "q59_set_ops",
      """SELECT 'both' AS tag, n_nationkey AS k FROM (
        |  SELECT n_nationkey FROM nation WHERE n_nationkey IN (SELECT c_nationkey FROM customer)
        |  INTERSECT
        |  SELECT n_nationkey FROM nation WHERE n_nationkey IN (SELECT s_nationkey FROM supplier))
        |UNION ALL
        |SELECT 'cust_only', n_nationkey FROM (
        |  SELECT n_nationkey FROM nation WHERE n_nationkey IN (SELECT c_nationkey FROM customer)
        |  EXCEPT
        |  SELECT n_nationkey FROM nation WHERE n_nationkey IN (SELECT s_nationkey FROM supplier))
        |ORDER BY tag, k""") { (s, d) =>
      val nation = Tables.nation(s, d)
      val custNations = nation.join(Tables.customer(s, d),
        col("n_nationkey") === col("c_nationkey"), "left_semi")
        .select("n_nationkey")
      val suppNations = nation.join(Tables.supplier(s, d),
        col("n_nationkey") === col("s_nationkey"), "left_semi")
        .select("n_nationkey")
      custNations.intersect(suppNations)
        .select(lit("both").as("tag"), col("n_nationkey").as("k"))
        .unionByName(custNations.except(suppNations)
          .select(lit("cust_only").as("tag"), col("n_nationkey").as("k")))
        .orderBy("tag", "k")
    },

    // ---- U3: explode (array-of-structs flatten) --------------------------
    // Reference: error-details explode, cleaner.py:229-238 — generalized to
    // token explode over documents.
    QueryDef.sql(
      "q13_explode_tokens",
      """SELECT token, COUNT(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token <> ''
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""") { (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(50)
    },

    // ---- W: running sum window (frame spec) ------------------------------
    QueryDef.sql(
      "q14_running_sum",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders WHERE o_custkey <= 200
        |ORDER BY o_custkey, o_orderkey""") { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .filter(col("o_custkey") <= 200)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(14,2)")).over(w)
            .cast("double").as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- W3/O: per-group top-k via ranking window -------------------------
    QueryDef.sql(
      "q15_window_topk",
      """SELECT p_brand, p_partkey, p_retailprice, CAST(rn AS BIGINT) AS rn
        |FROM (SELECT p_brand, p_partkey, p_retailprice,
        |        row_number() OVER (PARTITION BY p_brand
        |                           ORDER BY p_retailprice DESC, p_partkey) AS rn
        |      FROM part)
        |WHERE rn <= 3
        |ORDER BY p_brand, rn""") { (s, d) =>
      val w = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables.part(s, d)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .withColumn("rn", col("rn").cast("long"))
        .orderBy("p_brand", "rn")
    },

    // ---- S11/J4/A5/W2: get-or-create surrogate dim + FK resolution --------
    // Reference: insert_or_update_location proc (procedures.sql:4-28) as a
    // set-based plan: existing dim ∪ (anti-joined new names, ids
    // max(id)+row_number), then facts resolve FK by name equi-join. This is
    // the *intended* semantics — the reference proc has a bug returning 0
    // for already-present names (SURVEY.md §2.1 S11); we implement the
    // lookup-by-name it meant.
    QueryDef.sql(
      "q16_dim_get_or_create",
      """WITH dim0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY name) AS BIGINT) AS id, name
        |  FROM (SELECT DISTINCT c_mktsegment AS name FROM customer WHERE c_mktsegment <= 'F')
        |), newnames AS (
        |  SELECT DISTINCT c_mktsegment AS name FROM customer WHERE c_mktsegment > 'F'
        |), dim AS (
        |  SELECT id, name FROM dim0
        |  UNION ALL
        |  SELECT (SELECT COALESCE(MAX(id), -1) FROM dim0)
        |         + CAST(row_number() OVER (ORDER BY name) AS BIGINT) AS id, name
        |  FROM newnames
        |)
        |SELECT c_custkey, dim.id AS seg_id
        |FROM customer JOIN dim ON c_mktsegment = dim.name
        |ORDER BY c_custkey""") { (s, d) =>
      val cust = Tables.customer(s, d)
      val dim = graft.dims.Dimensions.getOrCreate(
        existing = cust.filter(col("c_mktsegment") <= "F")
          .select(col("c_mktsegment").as("name")).distinct()
          .withColumn("id", row_number().over(Window.orderBy("name")).cast("long"))
          .select("id", "name"),
        incoming = cust.select(col("c_mktsegment").as("name")).distinct())
      cust.join(broadcast(dim), col("c_mktsegment") === col("name"))
        .select(col("c_custkey"), col("id").as("seg_id"))
        .orderBy("c_custkey")
    }
  )
}
