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
      val annotated = Validation.annotate(Tables.events(s, d), rules)
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
      val annotated = Validation.annotate(Tables.events(s, d), rules)
      Validation.valid(annotated)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          graft.functions.Exact.dsum(col("value"), 14, 2).as("sum_value"))
        .orderBy("event_type")
    }
  )
}
