package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.validate.Validation
import graft.validate.Validation.Rule

/** Differential coverage for the validation split (SURVEY.md §2.2 P2, §2.7
  * U3): three rules over `events` with designed violation sets; the oracle
  * recomputes each channel independently (errors as a UNION ALL of per-rule
  * SELECTs, valid as the conjunction filter).
  */
object ValidationQueries {

  private val KnownTypes = Seq("click", "view", "purchase", "signup")

  private def rules = Seq(
    Rule("value", "value_error", "value out of range [0, 400)",
      col("value") >= 0 && col("value") < 400),
    Rule("event_type", "enum_error", "unknown event type",
      col("event_type").isin(KnownTypes: _*)),
    Rule("props.k", "value_error", "k out of range [0, 90)",
      get_json_object(col("props"), "$.k").cast("long").between(0, 89)))

  val defs: Seq[QueryDef] = Seq(

    // ---- P2/U3: error channel, diagnostics exploded to rows -------------
    QueryDef.sql(
      "q19_validate_errors",
      """SELECT event_id, type, loc, msg FROM (
        |  SELECT event_id, 'value_error' AS type, 'value' AS loc,
        |         'value out of range [0, 400)' AS msg
        |  FROM events WHERE NOT (value >= 0 AND value < 400)
        |  UNION ALL
        |  SELECT event_id, 'enum_error', 'event_type', 'unknown event type'
        |  FROM events WHERE event_type NOT IN ('click','view','purchase','signup')
        |  UNION ALL
        |  SELECT event_id, 'value_error', 'props.k', 'k out of range [0, 90)'
        |  FROM events WHERE NOT (CAST(props->>'k' AS BIGINT) BETWEEN 0 AND 89)
        |) ORDER BY event_id, loc""") { (s, d) =>
      // the JSON probes in the rules are the CPU cost; spread the
      // under-split single-file scan first (no-op at real scale)
      val annotated = Validation.annotate(
        graft.Tables.spread(Tables.events(s, d), col("event_id")), rules)
      Validation.explodeDetails(annotated, Seq("event_id"))
        .orderBy("event_id", "loc")
    },

    // ---- P2 valid channel + A7 tallies ----------------------------------
    QueryDef.sql(
      "q20_validate_valid",
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE (value >= 0 AND value < 400)
        |  AND event_type IN ('click','view','purchase','signup')
        |  AND (CAST(props->>'k' AS BIGINT) BETWEEN 0 AND 89)
        |GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      val annotated = Validation.annotate(
        graft.Tables.spread(Tables.events(s, d), col("event_id")), rules)
      Validation.valid(annotated)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          graft.functions.Exact.dsum(col("value"), 14, 2).as("sum_value"))
        .orderBy("event_type")
    },

    // ---- column profiler: per-column quality stats in ONE scan -----------
    // The ingest-side data-quality report (null counts, cardinality,
    // bounds) every pipeline runs before trusting a new drop. All metrics
    // for all columns come from a single aggregate over one scan — the
    // multi-countDistinct plans as one Expand + partial aggs, not one
    // pass per column — then unpivot via explode into a row per column.
    QueryDef.sql(
      "q75_profile", {
        def one(c: String, num: Boolean): String = {
          val minMax =
            if (num) s"CAST(MIN($c) AS DOUBLE) AS min_num, CAST(MAX($c) AS DOUBLE) AS max_num, CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
            else s"CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, MIN($c) AS min_str, MAX($c) AS max_str"
          s"""SELECT '$c' AS col_name,
             |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
             |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  $minMax
             |FROM customer""".stripMargin
        }
        Seq("c_custkey" -> true, "c_name" -> false, "c_nationkey" -> true,
          "c_acctbal" -> true, "c_mktsegment" -> false)
          .map((one _).tupled).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      }) { (s, d) =>
      val profiled = Seq("c_custkey" -> true, "c_name" -> false,
        "c_nationkey" -> true, "c_acctbal" -> true, "c_mktsegment" -> false)
      val aggs = profiled.flatMap { case (c, _) => Seq(
        count(col(c)).as(s"${c}__cnt"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).as(s"${c}__min"),
        max(col(c)).as(s"${c}__max"))
      } :+ count(lit(1)).as("__total")
      val one = Tables.customer(s, d).agg(aggs.head, aggs.tail: _*)
      val entries = profiled.map { case (c, num) =>
        struct(
          lit(c).as("col_name"),
          (col("__total") - col(s"${c}__cnt")).as("n_nulls"),
          col(s"${c}__nd").as("n_distinct"),
          (if (num) col(s"${c}__min").cast("double") else lit(null).cast("double")).as("min_num"),
          (if (num) col(s"${c}__max").cast("double") else lit(null).cast("double")).as("max_num"),
          (if (num) lit(null).cast("string") else col(s"${c}__min").cast("string")).as("min_str"),
          (if (num) lit(null).cast("string") else col(s"${c}__max").cast("string")).as("max_str"))
      }
      one.select(explode(array(entries: _*)).as("p"))
        .select("p.*")
        .orderBy("col_name")
    },

    // ---- typed semi-structured parse: from_json with declared schema -----
    // The scale path for JSON columns: get_json_object re-parses the
    // string PER EXTRACTION (q19/q20 use it for per-rule checks, where
    // one field is touched once); from_json parses once into a typed
    // struct every downstream expression reads natively. Malformed rows
    // (injected identically on both engines) degrade to null fields, not
    // failures — counted, not crashed on, matching the validation
    // channel's philosophy. The oracle's json_type guard pins from_json's
    // exact accept-set: only JSON INTEGER tokens become k (quoted "12",
    // 1.5, missing key, malformed doc → null on BOTH engines — probed
    // shape-by-shape).
    QueryDef.sql(
      "q81_json_typed_parse",
      """WITH t AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 97 = 13 THEN substr(props, 1, 3) ELSE props END AS pj
        |  FROM events),
        |p AS (
        |  SELECT event_type,
        |    CASE WHEN json_valid(pj) THEN
        |      CASE WHEN json_type(pj, '$.k') IN ('BIGINT', 'UBIGINT')
        |           THEN CAST(pj->>'k' AS BIGINT) END
        |    END AS k
        |  FROM t)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(COUNT(*) - COUNT(k) AS BIGINT) AS n_bad_k,
        |  CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k,
        |  CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM p GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val pj = when(col("event_id") % 97 === 13, substring(col("props"), 1, 3))
        .otherwise(col("props"))
      Tables.events(s, d)
        .select(col("event_type"),
          from_json(pj, StructType(Seq(StructField("k", LongType)))).getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          (count(lit(1)) - count(col("k"))).as("n_bad_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          sum(col("k")).as("sum_k"))
        .orderBy("event_type")
    },

    // ---- table-level data contract: bulk constraint audit ----------------
    // The publish gate a training-data snapshot runs: named constraints —
    // key uniqueness, referential integrity, domain/range conditions —
    // audited in bulk (TableConstraints). Every row condition and the
    // unique-key check fold into ONE scan of orders (pinned by
    // TableConstraintsSpec's records-read assert); the FK check is one
    // broadcast anti-join against customer's distinct keys. The contract
    // includes a deliberately-failing check (price_under_100k — TPC-H
    // totals run well past it) so the violations/pass=false path is live
    // in the gate, not just in specs.
    QueryDef.sql(
      "q114_data_contract",
      """SELECT check_name, violations,
        |  CAST(violations = 0 AS BIGINT) AS pass
        |FROM (
        |  SELECT 'custkey_fk' AS check_name,
        |    (SELECT COUNT(*) FROM orders
        |     WHERE o_custkey IS NOT NULL
        |       AND o_custkey NOT IN (SELECT c_custkey FROM customer)) AS violations
        |  UNION ALL SELECT 'order_pk_unique',
        |    (SELECT COUNT(*) FILTER (WHERE o_orderkey IS NOT NULL)
        |            - COUNT(DISTINCT o_orderkey) FROM orders)
        |  UNION ALL SELECT 'price_positive',
        |    (SELECT COUNT(*) FROM orders
        |     WHERE NOT COALESCE(o_totalprice > 0, FALSE))
        |  UNION ALL SELECT 'price_under_100k',
        |    (SELECT COUNT(*) FROM orders
        |     WHERE NOT COALESCE(o_totalprice < 100000, FALSE))
        |  UNION ALL SELECT 'status_domain',
        |    (SELECT COUNT(*) FROM orders
        |     WHERE NOT COALESCE(o_orderstatus IN ('O','F','P'), FALSE))
        |) ORDER BY check_name""") { (s, d) =>
      import graft.validate.TableConstraints
      import graft.validate.TableConstraints.{ForeignKey, RowCondition, UniqueKey}
      TableConstraints.audit(Tables.orders(s, d), Seq(
        UniqueKey("order_pk_unique", Seq("o_orderkey")),
        ForeignKey("custkey_fk", Seq("o_custkey"),
          Tables.customer(s, d), Seq("c_custkey")),
        RowCondition("price_positive", col("o_totalprice") > 0),
        RowCondition("price_under_100k", col("o_totalprice") < 100000),
        RowCondition("status_domain",
          col("o_orderstatus").isin("O", "F", "P"))))
        .select(col("check_name"), col("violations"),
          col("pass").cast("long").as("pass"))
        .orderBy("check_name")
    },

    // ---- snapshot reconciliation: row-level diff of two versions ---------
    // The post-backfill check (TableDiff.diff): customers vs an edited
    // replica — segment edits (k % 13), balance edits (k % 19, so
    // k % 247 rows change BOTH columns), deletes (k % 17), inserts
    // (k % 23, shifted keys). Output is one row per differing key with
    // the change class and the sorted changed-column list — |diff|-sized,
    // never |table|-sized. The gate replays every null-safe compare and
    // the concat in DuckDB; a diff that missed an edit class, flagged an
    // unchanged row, or got a column list wrong fails row-for-row.
    QueryDef.sql(
      "q124_table_diff",
      """WITH c AS (SELECT c_custkey AS k, c_mktsegment AS seg,
        |                 CAST(c_acctbal AS DECIMAL(14,2)) AS bal FROM customer),
        |r AS (
        |  SELECT k,
        |    CASE WHEN k % 13 = 0 THEN seg || '_E' ELSE seg END AS seg,
        |    CASE WHEN k % 19 = 0 THEN CAST(bal + 5 AS DECIMAL(14,2)) ELSE bal END AS bal
        |  FROM c WHERE k % 17 <> 0
        |  UNION ALL
        |  SELECT k + 2000000000, 'NEW', CAST(0 AS DECIMAL(14,2))
        |  FROM c WHERE k % 23 = 0),
        |d AS (
        |  SELECT COALESCE(r.k, c.k) AS k,
        |    CASE WHEN c.k IS NULL THEN 'added'
        |         WHEN r.k IS NULL THEN 'removed' ELSE 'changed' END AS change,
        |    CASE WHEN c.k IS NULL OR r.k IS NULL THEN NULL
        |         ELSE concat_ws(',',
        |           CASE WHEN NOT (c.bal IS NOT DISTINCT FROM r.bal) THEN 'bal' END,
        |           CASE WHEN NOT (c.seg IS NOT DISTINCT FROM r.seg) THEN 'seg' END)
        |         END AS changed_cols
        |  FROM c FULL OUTER JOIN r ON c.k = r.k
        |  WHERE c.k IS NULL OR r.k IS NULL
        |     OR NOT (c.seg IS NOT DISTINCT FROM r.seg)
        |     OR NOT (c.bal IS NOT DISTINCT FROM r.bal))
        |SELECT k, change, changed_cols FROM d ORDER BY k""") { (s, d) =>
      import graft.validate.TableDiff
      val c = Tables.customer(s, d).select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"),
        col("c_acctbal").cast("decimal(14,2)").as("bal"))
      val edited = c.filter(col("k") % 17 =!= 0)
        .select(col("k"),
          when(col("k") % 13 === 0, concat(col("seg"), lit("_E")))
            .otherwise(col("seg")).as("seg"),
          when(col("k") % 19 === 0, (col("bal") + 5).cast("decimal(14,2)"))
            .otherwise(col("bal")).as("bal"))
        .unionByName(c.filter(col("k") % 23 === 0)
          .select((col("k") + 2000000000L).as("k"), lit("NEW").as("seg"),
            lit(0).cast("decimal(14,2)").as("bal")))
      TableDiff.diff(c, edited, Seq("k"), Seq("seg", "bal"))
        .orderBy("k")
    },

    // ---- embedding data contract: the vector-hygiene audit ---------------
    // The gate an embedding table passes before it feeds the ANN family:
    // per label, NaN-poisoned vectors counted (a single NaN silently
    // zeroes whole cosine rankings), all-zero vectors counted
    // (undefined direction — unrankable), dimension bounds pinned (a
    // mixed-width table breaks every fold), and the clean vectors' L2
    // norm² envelope (the scale drift signal — an embedding-model swap
    // moves it). norm² is the pinned sequential FoldDot, so the
    // envelope is bit-exact in the oracle; min/max only (a SUM of
    // per-row doubles would be shuffle-order-dependent). Pure map-side
    // per-vector work + one label shuffle.
    QueryDef.sql(
      "q129_embedding_audit",
      """WITH a AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |    list_reduce(list_prepend(0.0::DOUBLE,
        |      list_transform(range(1, len(embedding)+1),
        |        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
        |      (x, y) -> x + y) AS n2,
        |    len(list_filter(embedding, x -> isnan(x))) > 0 AS has_nan,
        |    len(list_filter(embedding, x -> x <> 0)) = 0 AS is_zero,
        |    CAST(len(embedding) AS BIGINT) AS dim
        |  FROM embeddings)
        |SELECT label, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN has_nan THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
        |  CAST(SUM(CASE WHEN NOT has_nan AND is_zero THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  MIN(dim) AS dim_lo, MAX(dim) AS dim_hi,
        |  MIN(CASE WHEN NOT has_nan AND NOT is_zero THEN n2 END) AS norm2_lo,
        |  MAX(CASE WHEN NOT has_nan AND NOT is_zero THEN n2 END) AS norm2_hi
        |FROM a GROUP BY label ORDER BY label""") { (s, d) =>
      graft.functions.VectorFold.register(s)
      val clean = !col("has_nan") && !col("is_zero")
      Tables.embeddings(s, d)
        .select(col("label").cast("long").as("label"),
          graft.functions.VectorFold.dot(col("embedding"), col("embedding")).as("n2"),
          exists(col("embedding"), x => isnan(x)).as("has_nan"),
          (size(filter(col("embedding"), x => x =!= 0f)) === 0).as("is_zero"),
          size(col("embedding")).cast("long").as("dim"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          sum(when(col("has_nan"), 1L).otherwise(0L)).as("n_nan"),
          sum(when(!col("has_nan") && col("is_zero"), 1L).otherwise(0L)).as("n_zero"),
          min(col("dim")).as("dim_lo"), max(col("dim")).as("dim_hi"),
          min(when(clean, col("n2"))).as("norm2_lo"),
          max(when(clean, col("n2"))).as("norm2_hi"))
        .orderBy("label")
    }
  )
}
