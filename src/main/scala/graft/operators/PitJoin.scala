package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** POINT-IN-TIME join: attach to every fact row the dimension VERSION
  * that was valid at the fact's timestamp — the temporal join that makes
  * an SCD-2 dimension ([[graft.dims.Scd2]]) queryable ("price the order
  * at the customer's segment AS OF the order date", the
  * feature-store-correctness join every training pipeline needs to
  * avoid label leakage).
  *
  * Dim contract: the Scd2 shape — `key..., attrs..., valid_from,
  * valid_to` (NULL `valid_to` = open version; versions per key
  * non-overlapping). A fact at `ts` matches the version with the
  * greatest `valid_from ≤ ts` still covering it (`ts < valid_to` unless
  * open); a fact before the key's first version — or inside a coverage
  * gap — gets NULL attributes, never a neighboring version.
  *
  * Execution shape: the naive formulation is a range theta-join
  * (`valid_from ≤ ts < valid_to`) — a BNLJ unless bucketized. This is
  * the UNION-WINDOW rewrite instead (the [[AsOf]] idea pointed at
  * version boundaries): dim versions and facts union into ONE keyed
  * stream ordered by (time, dim-first), a running `last(_, ignoreNulls)`
  * carries the latest version struct onto every fact, and the
  * `valid_to` guard nulls out gap hits. One shuffle on the key, ZERO
  * join operators in the plan, linear in |facts| + |versions| — at
  * 100 TB that is the difference between a window and a fact-wide range
  * join. Dim-before-fact ordering at equal timestamps makes a version
  * opening at `t` cover a fact at `t` (Scd2 closes the predecessor at
  * the same instant — close is exclusive, open inclusive).
  */
object PitJoin {

  def atTime(facts: DataFrame, dim: DataFrame, key: Seq[String],
      tsCol: String, attrs: Seq[String]): DataFrame = {
    val factCols = facts.columns.toSeq
    val reserved = Seq("__ord", "__tag", "__ver", "__last")
    require(!factCols.exists(reserved.contains),
      s"facts may not carry the operator's internal columns ${reserved.mkString(", ")}")
    require(!attrs.exists(factCols.contains),
      "dim attribute names must not collide with fact columns " +
        s"(rename before joining): ${attrs.filter(factCols.contains).mkString(", ")}")
    // SQL join semantics for NULL keys (a NULL matches NOTHING): drop
    // null-key dim versions up front — Window.partitionBy groups NULLs
    // TOGETHER (GROUP BY semantics), which would otherwise attach a
    // null-key version to null-key facts, diverging from the range
    // theta-join this rewrite replaces (and from Scd2's own MERGE
    // semantics, whose dims CAN carry null-key rows). Null-key FACTS
    // still flow through and emit with NULL attributes.
    val d = dim
      .filter(key.map(col(_).isNotNull).reduce(_ && _))
      .select(
        key.map(col) ++ Seq(
          col("valid_from").as("__ord"), lit(0).as("__tag"),
          struct((col("valid_to").as("__vto") +: attrs.map(col)): _*).as("__ver")): _*)
    val f = facts
      .withColumn("__ord", col(tsCol))
      .withColumn("__tag", lit(1))
    // allowMissingColumns: fact payload columns null on dim rows, __ver
    // null on fact rows — exactly what last(ignoreNulls) skips
    val unioned = f.unionByName(d, allowMissingColumns = true)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__ord"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val covered = col("__last").isNotNull &&
      (col("__last.__vto").isNull || col("__ord") < col("__last.__vto"))
    unioned
      .withColumn("__last", last(col("__ver"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(factCols.map(col) ++
        attrs.map(a => when(covered, col(s"__last.$a")).as(a)): _*)
  }
}
