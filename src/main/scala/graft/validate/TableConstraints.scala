package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative TABLE-level data contract: named constraints audited in
  * bulk, each reporting its violation count and pass flag — the
  * data-contract gate a training-data ingest runs before publishing a
  * snapshot (row-level rule validation with valid/error channels is
  * [[Validation]]; this is the table-shape complement: uniqueness,
  * referential integrity, domain/range conditions).
  *
  * Execution shape, sized for a 100 TB fact table:
  *   - ALL row conditions AND all unique-key checks fold into ONE scan —
  *     conditions as conditional counts, uniqueness as
  *     `count(non-null keys) − countDistinct(keys)` — so adding a
  *     constraint never adds a pass over the data;
  *   - each foreign-key check is one broadcast LEFT ANTI join against
  *     the dimension's distinct keys (violations = orphaned fact rows;
  *     NULL FKs are not violations, per SQL FK semantics);
  *   - the report is constraint-per-row, built driver-side from the
  *     1-row aggregate — columns of it never shuffle.
  */
object TableConstraints {

  sealed trait Constraint { def name: String }

  /** Rows violate when `cond` is false OR null (fail-closed: an
    * unevaluable condition is not a pass).
    */
  final case class RowCondition(name: String, cond: Column) extends Constraint

  /** Violations = non-null key tuples in excess of one per value. */
  final case class UniqueKey(name: String, cols: Seq[String]) extends Constraint

  /** Violations = fact rows whose fully non-null key tuple has no match
    * in `dim` (orphans). `dim` is reduced to distinct keys and broadcast.
    */
  final case class ForeignKey(name: String, cols: Seq[String],
      dim: DataFrame, dimCols: Seq[String]) extends Constraint

  /** Audit `df` against `constraints` → (check_name, violations, pass),
    * ordered by check_name.
    */
  def audit(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(constraints.nonEmpty, "audit with no constraints")
    require(constraints.map(_.name).distinct.size == constraints.size,
      "duplicate constraint names")

    // one scan: conditional counts + (count − countDistinct) per key set
    val scanned = constraints.collect {
      case RowCondition(n, c) =>
        n -> sum(when(coalesce(c, lit(false)), 0L).otherwise(1L)).as(s"v_$n")
      case UniqueKey(n, cols) =>
        val nonNull = cols.map(col(_).isNotNull).reduce(_ && _)
        n -> (sum(when(nonNull, 1L).otherwise(0L)) -
          countDistinct(cols.head, cols.tail: _*)).as(s"v_$n")
    }
    val scanRow: Map[String, Long] =
      if (scanned.isEmpty) Map.empty
      else {
        val r = df.agg(scanned.head._2, scanned.tail.map(_._2): _*).head()
        scanned.map(_._1).zipWithIndex
          .map { case (n, i) => n -> (if (r.isNullAt(i)) 0L else r.getLong(i)) }
          .toMap
      }

    // per FK: broadcast distinct dim keys, anti-join, count orphans
    val fkCounts: Map[String, Long] = constraints.collect {
      case ForeignKey(n, cols, dim, dimCols) =>
        require(cols.size == dimCols.size, s"$n: key arity mismatch")
        val keys = dim.select(dimCols.map(col): _*).distinct()
        val cond = cols.zip(dimCols).map { case (f, k) =>
          df(f) === keys(k) }.reduce(_ && _)
        val nonNull = cols.map(df(_).isNotNull).reduce(_ && _)
        n -> df.filter(nonNull)
          .join(broadcast(keys), cond, "left_anti").count()
    }.toMap

    val all = scanRow ++ fkCounts
    constraints.map(c => (c.name, all(c.name), all(c.name) == 0L))
      .toDF("check_name", "violations", "pass")
      .orderBy("check_name")
  }
}
