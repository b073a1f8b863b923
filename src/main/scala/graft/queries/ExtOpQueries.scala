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
    },

    // ---- SCD-2 dimension merge (type-2 history, one-join MERGE shape) ----
    // First-load customers as a versioned dimension (all versions open at
    // eff 0), then merge an update batch at eff 100: every key present —
    // segments suffixed '_X' for k % 7 = 0 (close + reopen), identical
    // otherwise (no-op — replayed feeds must not version) — plus new
    // keys (+10^9 for k % 11 = 0, inserts). The gate checks the ENTIRE
    // merged dimension row-for-row against an oracle that constructs
    // each version class directly, so a wrong close timestamp, a
    // phantom version from an unchanged row, or a lost untouched key
    // all fail. Scd2Spec pins null-safe compares, idempotent replay,
    // batch collapse, and the single-join plan.
    QueryDef.sql(
      "q116_scd2_merge",
      """WITH c AS (SELECT c_custkey AS k, c_mktsegment AS seg,
        |                  CAST(c_nationkey AS BIGINT) AS nat FROM customer)
        |SELECT k, seg, nat, valid_from, valid_to, is_current FROM (
        |  SELECT k, seg, nat, CAST(0 AS BIGINT) AS valid_from,
        |         CAST(100 AS BIGINT) AS valid_to,
        |         CAST(0 AS BIGINT) AS is_current
        |  FROM c WHERE k % 7 = 0
        |  UNION ALL
        |  SELECT k, seg || '_X', nat, 100, NULL, 1 FROM c WHERE k % 7 = 0
        |  UNION ALL
        |  SELECT k, seg, nat, 0, NULL, 1 FROM c WHERE k % 7 <> 0
        |  UNION ALL
        |  SELECT k + 1000000000, 'NEW', nat, 100, NULL, 1
        |  FROM c WHERE k % 11 = 0
        |) ORDER BY k, valid_from""") { (s, d) =>
      import graft.dims.Scd2
      val key = Seq("k")
      val attrs = Seq("seg", "nat")
      val c = Tables.customer(s, d).select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"), col("c_nationkey").cast("long").as("nat"))
      val dim0 = Scd2.merge(Scd2.emptyDim(c, key, attrs), c, key, attrs, 0L)
      val batch = c
        .withColumn("seg", when(col("k") % 7 === 0,
          concat(col("seg"), lit("_X"))).otherwise(col("seg")))
        .unionByName(c.filter(col("k") % 11 === 0)
          .select((col("k") + 1000000000L).as("k"), lit("NEW").as("seg"),
            col("nat")))
      Scd2.merge(dim0, batch, key, attrs, 100L)
        .select(col("k"), col("seg"), col("nat"), col("valid_from"),
          col("valid_to"), col("is_current").cast("long").as("is_current"))
        .orderBy("k", "valid_from")
    },

    // ---- CDC apply: I/U/D change feed → next snapshot --------------------
    // The replication MERGE (Scd2's current-state sibling): a snapshot
    // missing some keys (k % 7 = 3) absorbs a five-segment feed whose
    // per-key NET effect is decided by sequence number — updates at seq
    // 10/30 (k % 5 / k % 10, so % 10 keys carry TWO updates and the
    // later must win), deletes at 20 (k % 11), inserts at 40 for the
    // missing keys (some of which also carry earlier U ops the insert
    // must override), and a delete-then-reinsert at 50 (k % 22 — the
    // resurrect case). The gate checks the ENTIRE next snapshot
    // row-for-row, so a lost delete, a stale update winning, a dropped
    // untouched key, or a failed resurrect all fail. CdcSpec pins
    // out-of-order sequences, idempotent replay, null-op/null-key
    // handling, and the one-join plan.
    QueryDef.sql(
      "q118_cdc_apply",
      """WITH c AS (SELECT c_custkey AS k, c_mktsegment AS seg,
        |                 CAST(c_acctbal AS DECIMAL(14,2)) AS bal FROM customer),
        |snap AS (SELECT k, seg, bal FROM c WHERE k % 7 <> 3),
        |feed AS (
        |  SELECT k, seg || '_U1' AS seg, CAST(bal + 10 AS DECIMAL(14,2)) AS bal,
        |         'U' AS op, 10 AS seq FROM c WHERE k % 5 = 0
        |  UNION ALL SELECT k, NULL, NULL, 'D', 20 FROM c WHERE k % 11 = 0
        |  UNION ALL SELECT k, seg, CAST(bal + 7 AS DECIMAL(14,2)), 'U', 30
        |    FROM c WHERE k % 10 = 0
        |  UNION ALL SELECT k, 'INS', bal, 'I', 40 FROM c WHERE k % 7 = 3
        |  UNION ALL SELECT k, 'BACK', CAST(0 AS DECIMAL(14,2)), 'I', 50
        |    FROM c WHERE k % 22 = 0),
        |net AS (SELECT k, seg, bal, op FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
        |  FROM feed) WHERE rn = 1),
        |applied AS (
        |  SELECT COALESCE(n.k, s.k) AS k,
        |         CASE WHEN n.k IS NOT NULL THEN n.seg ELSE s.seg END AS seg,
        |         CASE WHEN n.k IS NOT NULL THEN n.bal ELSE s.bal END AS bal
        |  FROM snap s FULL OUTER JOIN net n ON s.k = n.k
        |  WHERE n.op IS NULL OR n.op <> 'D')
        |SELECT k, seg, CAST(bal AS DOUBLE) AS bal FROM applied ORDER BY k""") { (s, d) =>
      import graft.dims.Cdc
      val c = Tables.customer(s, d).select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"),
        col("c_acctbal").cast("decimal(14,2)").as("bal"))
      val snap = c.filter(col("k") % 7 =!= 3)
      def leg(cond: org.apache.spark.sql.Column, seg: org.apache.spark.sql.Column,
          bal: org.apache.spark.sql.Column, op: String, seq: Long) =
        c.filter(cond).select(col("k"), seg.as("seg"),
          bal.cast("decimal(14,2)").as("bal"), lit(op).as("op"),
          lit(seq).as("seq"))
      val feed = Seq(
        leg(col("k") % 5 === 0, concat(col("seg"), lit("_U1")), col("bal") + 10, "U", 10L),
        leg(col("k") % 11 === 0, lit(null).cast("string"), lit(null).cast("decimal(14,2)"), "D", 20L),
        leg(col("k") % 10 === 0, col("seg"), col("bal") + 7, "U", 30L),
        leg(col("k") % 7 === 3, lit("INS"), col("bal"), "I", 40L),
        leg(col("k") % 22 === 0, lit("BACK"), lit(0).cast("decimal(14,2)"), "I", 50L)
      ).reduce(_.unionByName(_))
      Cdc.applyChanges(snap, feed, Seq("k"), Seq("seg", "bal"), "op", "seq")
        .select(col("k"), col("seg"), col("bal").cast("double").as("bal"))
        .orderBy("k")
    },

    // ---- point-in-time join against the SCD-2 dimension -------------------
    // The temporal join that makes q116's history QUERYABLE (and the
    // label-leakage guard of feature stores): every order joins the
    // customer segment AS OF its (synthetic, deterministic) timestamp.
    // Dim = two Scd2 merges — versions open at eff 10, k % 7 segments
    // change at eff 100 — so facts route three ways: ts < 10 → NULL
    // (pre-history), 10 ≤ ts < 100 → the original segment, ts ≥ 100 →
    // the changed one. PitJoin's union-window rewrite does this with
    // ZERO join operators — one shuffle on the key, linear in
    // facts+versions, where the naive range theta-join is a BNLJ
    // (PitJoinSpec pins the plan and the gap/boundary semantics). The
    // oracle states the intended semantics directly, so a window
    // formulation bug can't self-confirm.
    QueryDef.sql(
      "q125_pit_join",
      """WITH c AS (SELECT c_custkey AS k, c_mktsegment AS seg FROM customer),
        |f AS (SELECT o_orderkey, o_custkey AS k, o_orderkey % 200 AS ts
        |      FROM orders)
        |SELECT o_orderkey, f.k AS k, ts,
        |  CASE WHEN ts < 10 THEN NULL
        |       WHEN ts >= 100 AND f.k % 7 = 0 THEN seg || '_X'
        |       ELSE seg END AS seg
        |FROM f LEFT JOIN c ON f.k = c.k
        |ORDER BY o_orderkey""") { (s, d) =>
      import graft.dims.Scd2
      import graft.operators.PitJoin
      val key = Seq("k")
      val attrs = Seq("seg")
      val c = Tables.customer(s, d).select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"))
      val dim0 = Scd2.merge(Scd2.emptyDim(c, key, attrs), c, key, attrs, 10L)
      val batch = c.withColumn("seg", when(col("k") % 7 === 0,
        concat(col("seg"), lit("_X"))).otherwise(col("seg")))
      val dim = Scd2.merge(dim0, batch, key, attrs, 100L)
      val facts = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey").as("k"), (col("o_orderkey") % 200).as("ts"))
      PitJoin.atTime(facts, dim, key, "ts", attrs)
        .select("o_orderkey", "k", "ts", "seg")
        .orderBy("o_orderkey")
    },

    // ---- CDC round trip: derive the feed from two snapshots, replay it ---
    // The PRODUCING half of the CDC contract (q118 is the consuming
    // half): Cdc.deriveFeed diffs two snapshot versions into the minimal
    // I/U/D feed (q124's edit classes — segment edits, balance edits,
    // deletes, inserts), and the gate replays it through
    // Cdc.applyChanges onto the OLD snapshot. The oracle is the NEW
    // snapshot constructed directly, so the law `apply ∘ derive = to`
    // is hash-checked end-to-end — a feed that missed an edit class,
    // mis-ordered ops, or an apply that mishandled one, cannot
    // round-trip.
    QueryDef.sql(
      "q130_cdc_roundtrip",
      """WITH c AS (SELECT c_custkey AS k, c_mktsegment AS seg,
        |                 CAST(c_acctbal AS DECIMAL(14,2)) AS bal FROM customer),
        |to_snap AS (
        |  SELECT k,
        |    CASE WHEN k % 13 = 0 THEN seg || '_E' ELSE seg END AS seg,
        |    CASE WHEN k % 19 = 0 THEN CAST(bal + 5 AS DECIMAL(14,2)) ELSE bal END AS bal
        |  FROM c WHERE k % 17 <> 0
        |  UNION ALL
        |  SELECT k + 2000000000, 'NEW', CAST(0 AS DECIMAL(14,2))
        |  FROM c WHERE k % 23 = 0)
        |SELECT k, seg, CAST(bal AS DOUBLE) AS bal
        |FROM to_snap ORDER BY k""") { (s, d) =>
      import graft.dims.Cdc
      val c = Tables.customer(s, d).select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"),
        col("c_acctbal").cast("decimal(14,2)").as("bal"))
      val toSnap = c.filter(col("k") % 17 =!= 0)
        .select(col("k"),
          when(col("k") % 13 === 0, concat(col("seg"), lit("_E")))
            .otherwise(col("seg")).as("seg"),
          when(col("k") % 19 === 0, (col("bal") + 5).cast("decimal(14,2)"))
            .otherwise(col("bal")).as("bal"))
        .unionByName(c.filter(col("k") % 23 === 0)
          .select((col("k") + 2000000000L).as("k"), lit("NEW").as("seg"),
            lit(0).cast("decimal(14,2)").as("bal")))
      val feed = Cdc.deriveFeed(c, toSnap, Seq("k"), Seq("seg", "bal"), seqVal = 1L)
      Cdc.applyChanges(c, feed, Seq("k"), Seq("seg", "bal"), "op", "seq")
        .select(col("k"), col("seg"), col("bal").cast("double").as("bal"))
        .orderBy("k")
    },

    // ---- CDC feed → TYPE-2 HISTORY (q116 × q118 composed) ----------------
    // Three I/U/D batches fold into a versioned dimension via
    // Scd2.applyCdc — the delete-aware keep-history merge behind the
    // streaming scd2HistorySink (CdcScd2Spec pins the streamed ≡ batch
    // law; this gate pins the SEMANTICS against an oracle constructing
    // every version class directly). The batches exercise each class:
    // initial load (eff 10); update + delete with the delete's seq
    // beating an earlier update (eff 20 — k%55 keys carry both); a third
    // batch (eff 30) whose net op per key is resurrect-insert (k%22,
    // seq 50) > revert-update to the original segment (k%7, seq 45 — a
    // NO-OP for untouched keys, a real change for '_A' keys, a reopen
    // for deleted keys) > update to '_B' (k%3, seq 40). A wrong close
    // timestamp, a phantom version from an unchanged re-assert, a
    // delete that reopened, or a resurrect that didn't, all fail
    // row-for-row.
    QueryDef.sql(
      "q134_cdc_scd2_history",
      """WITH c AS (SELECT c_custkey AS k, c_mktsegment AS seg FROM customer)
        |SELECT k, seg, valid_from, valid_to, is_current FROM (
        |  SELECT k, seg, CAST(10 AS BIGINT) AS valid_from,
        |    CAST(CASE WHEN k % 11 = 0 OR k % 5 = 0 THEN 20
        |              WHEN k % 3 = 0 AND k % 7 <> 0 THEN 30 END AS BIGINT) AS valid_to,
        |    CAST(CASE WHEN k % 11 = 0 OR k % 5 = 0
        |              OR (k % 3 = 0 AND k % 7 <> 0) THEN 0
        |         ELSE 1 END AS BIGINT) AS is_current
        |  FROM c
        |  UNION ALL
        |  SELECT k, seg || '_A', 20,
        |    CASE WHEN k % 7 = 0 OR k % 3 = 0 THEN 30 END,
        |    CASE WHEN k % 7 = 0 OR k % 3 = 0 THEN 0 ELSE 1 END
        |  FROM c WHERE k % 5 = 0 AND k % 11 <> 0
        |  UNION ALL
        |  SELECT k, 'BACK', 30, NULL, 1 FROM c WHERE k % 22 = 0
        |  UNION ALL
        |  SELECT k, seg, 30, NULL, 1 FROM c
        |  WHERE k % 7 = 0 AND k % 22 <> 0 AND (k % 11 = 0 OR k % 5 = 0)
        |  UNION ALL
        |  SELECT k, seg || '_B', 30, NULL, 1 FROM c
        |  WHERE k % 3 = 0 AND k % 7 <> 0 AND k % 22 <> 0
        |) ORDER BY k, valid_from""") { (s, d) =>
      import graft.dims.Scd2
      val key = Seq("k")
      val attrs = Seq("seg")
      val c = Tables.customer(s, d).select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"))
      def leg(cond: org.apache.spark.sql.Column, seg: org.apache.spark.sql.Column,
          op: String, seq: Long) =
        c.filter(cond).select(col("k"), seg.as("seg"),
          lit(op).as("op"), lit(seq).as("seq"))
      val b1 = leg(lit(true), col("seg"), "I", 1L)
      val b2 = leg(col("k") % 5 === 0, concat(col("seg"), lit("_A")), "U", 10L)
        .unionByName(leg(col("k") % 11 === 0, lit(null).cast("string"), "D", 20L))
      val b3 = leg(col("k") % 3 === 0, concat(col("seg"), lit("_B")), "U", 40L)
        .unionByName(leg(col("k") % 7 === 0, col("seg"), "U", 45L))
        .unionByName(leg(col("k") % 22 === 0, lit("BACK"), "I", 50L))
      val d0 = Scd2.applyCdc(Scd2.emptyDim(b1, key, attrs), b1, key, attrs,
        "op", "seq", 10L)
      val d1 = Scd2.applyCdc(d0, b2, key, attrs, "op", "seq", 20L)
      Scd2.applyCdc(d1, b3, key, attrs, "op", "seq", 30L)
        .select(col("k"), col("seg"), col("valid_from"), col("valid_to"),
          col("is_current").cast("long").as("is_current"))
        .orderBy("k", "valid_from")
    }
  )
}
