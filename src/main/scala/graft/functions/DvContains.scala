package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** `dv_contains(dv, row_index)` — is a file row position marked deleted
  * by a [[graft.sources.DeletionVectors]] sidecar? The read-side hot
  * probe of the deletion-vector stack: it runs once per row of a
  * DV-carrying file's scan, so it is a NATIVE codegen expression (a
  * static binary search straight over the manifest's binary cell — no
  * ScalaUDF boxing, no per-batch deserialization, stays inside the
  * whole-stage pipeline) rather than a UDF.
  *
  * TOTAL semantics, never null: a NULL dv (the left-join miss of a file
  * with no deletes) and a NULL index both yield `false` ("not
  * deleted"), so the caller's keep-filter is a bare
  * `!dv_contains(dv, _metadata.row_index)` with no null guard — a
  * nullable result would silently DROP rows of DV-less files under
  * filter semantics, the exact inversion a delete stack can't afford.
  */
case class DvContains(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "dv_contains"

  override def checkInputDataTypes(): TypeCheckResult = {
    val got = children.map(_.dataType)
    if (got == Seq(BinaryType, LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dv_contains expects (binary, bigint), got $got")
  }

  override def eval(input: InternalRow): Any = {
    val idx = right.eval(input)
    if (idx == null) false
    else graft.sources.DeletionVectors.contains(
      left.eval(input).asInstanceOf[Array[Byte]], idx.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dvGen = left.genCode(ctx)
    val idxGen = right.genCode(ctx)
    val dvCls = "graft.sources.DeletionVectors$.MODULE$"
    ev.copy(
      isNull = FalseLiteral,
      code = code"""
        ${idxGen.code}
        ${dvGen.code}
        boolean ${ev.value} = false;
        if (!${idxGen.isNull}) {
          ${ev.value} = $dvCls.contains(
            ${dvGen.isNull} ? null : ${dvGen.value}, ${idxGen.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DvContains {
  /** Register `dv_contains` (idempotent; same registry route as
    * [[graft.functions.VectorFold.register]] — Spark 4 exposes no
    * public Expression→Column constructor).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dv_contains", exprs => DvContains(exprs(0), exprs(1)), "built-in")
}
