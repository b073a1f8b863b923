package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Expression-level schema/rule validation with a dual output channel
  * (SURVEY.md §2.2 P2; reference `whalefinder/validate.py:163-190`).
  *
  * The reference validates row-at-a-time with pydantic, collecting per-field
  * diagnostics `{type, loc, msg}` and splitting records into a valid channel
  * and an error channel that retains both the diagnostics and the offending
  * record. Re-expressed set-based: one pass annotates every row with an
  * `errors: array<struct<type,loc,msg>>` column built from `when(...)`
  * checks; the two channels are then plain filters on `size(errors)`. All
  * expression-level (codegen), so at 100 TB the split costs one scan and no
  * shuffle, and both channels share the scan via the same cached plan.
  *
  * The error-details flatten (reference `whalefinder/cleaner.py:225-241` —
  * pandas MultiIndex from nested dicts) is the builtin `explode` of that
  * array (SURVEY.md §2.7 U3).
  */
object Validation {

  /** One declarative rule: row passes when `ok`; otherwise contributes a
    * `{type, loc, msg}` diagnostic (pydantic's error triple,
    * `validate.py:186`).
    */
  final case class Rule(loc: String, errType: String, msg: String, ok: Column)

  /** Annotate with `errors: array<struct<type,loc,msg>>` (empty = valid).
    * A null check result counts as a failure, like pydantic's rejection of
    * nulls in required fields.
    */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val diags = rules.map { r =>
      when(!coalesce(r.ok, lit(false)),
        struct(lit(r.errType).as("type"), lit(r.loc).as("loc"),
          lit(r.msg).as("msg")))
    }
    df.withColumn("errors",
      filter(array(diags: _*), e => e.isNotNull))
  }

  /** Valid channel: rows with no diagnostics, `errors` dropped. */
  def valid(annotated: DataFrame): DataFrame =
    annotated.filter(size(col("errors")) === 0).drop("errors")

  /** Error channel: failing rows with their diagnostics retained. */
  def invalid(annotated: DataFrame): DataFrame =
    annotated.filter(size(col("errors")) > 0)

  /** Flatten the error channel to one row per diagnostic — the Spark shape
    * of the reference's (error, detail) MultiIndex frame.
    */
  def explodeDetails(annotated: DataFrame, keep: Seq[String]): DataFrame =
    invalid(annotated)
      .select(keep.map(col) :+ explode(col("errors")).as("e"): _*)
      .select(keep.map(col) :+ col("e.type") :+ col("e.loc") :+ col("e.msg"): _*)

  /** SURVEY.md §2.8 F12: the error-dump serialization
    * (`whalefinder/cleaner.py:277-288` — json.dumps followed by a regex
    * that patches pandas' literal `nan`s into `null`). `to_json` emits
    * proper JSON nulls natively, so the reference's regex hack dissolves;
    * one `errors_json` string column per failing row, ready for
    * [[graft.sources.Staging.writeJson]].
    */
  def errorJson(annotated: DataFrame, keep: Seq[String]): DataFrame =
    invalid(annotated).select(
      keep.map(col) :+
        to_json(struct(col("errors") +: keep.map(col): _*)).as("errors_json"): _*)
}
