package graft.geo

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BooleanType, DataType, DoubleType}

/** Spatial point-in-polygon support (SURVEY.md §2.3 J1; reference
  * `whalefinder/cleaner.py:194-212` — geopandas `sjoin` of sighting points
  * against ocean polygons).
  *
  * Spark has no spatial join strategy, so this is the one place the engine
  * drops to a custom Catalyst expression: [[PointInPolygon]] is a native
  * `Expression` with whole-stage codegen (`doGenCode` emits the ray-cast
  * loop inline — no UDF boxing, no serialization). The join itself is a
  * BroadcastNestedLoopJoin against the (tiny, broadcast) polygon table:
  * `points.join(broadcast(polys), stContains(xs, ys, x, y), "left")` —
  * exactly the shape the reference's 9-ocean sjoin wants. For polygon
  * tables too large to broadcast, prefix the condition with a bbox
  * conjunct (Catalyst pushes it into the BNLJ loop) or grid-index both
  * sides to turn it into an equi-join on cell id.
  */
object Geo {

  /** Even-odd ray-cast: vertex i pairs with vertex (i+1) mod n; a crossing
    * is counted when the horizontal ray from (x, y) crosses the edge —
    * `((yi > y) != (yj > y)) && (x < (xj-xi)·(y-yi)/(yj-yi) + xi)`.
    * The formula (incl. operand order) is mirrored verbatim in the DuckDB
    * oracle, so results agree bit-for-bit.
    */
  def rayCast(xs: Array[Double], ys: Array[Double], x: Double, y: Double): Boolean = {
    val n = xs.length
    var inside = false
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      if (((ys(i) > y) != (ys(j) > y)) &&
        (x < (xs(j) - xs(i)) * (y - ys(i)) / (ys(j) - ys(i)) + xs(i))) {
        inside = !inside
      }
      i += 1
    }
    inside
  }

  /** Register `st_contains` in an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "st_contains",
      exprs => PointInPolygon(exprs(0), exprs(1), exprs(2), exprs(3)),
      "built-in")

  /** `st_contains(xs, ys, x, y)` — requires [[register]] (or the
    * [[GraftExtensions]] session extension) to have run.
    */
  def stContains(xs: Column, ys: Column, x: Column, y: Column): Column =
    call_function("st_contains", xs, ys, x, y)

  /** Grid-indexed spatial left join — the scale path when the polygon
    * table outgrows broadcast-BNLJ (SURVEY.md §7.5): polygons replicate
    * into every grid cell their bbox covers, points hash to their one
    * cell, candidates meet in an EQUI-join on (cellx, celly) and only
    * candidates pay the exact ray cast. Equivalent to the BNLJ join by
    * construction (a containing polygon's bbox always covers the point's
    * cell); q56's oracle is literally q39's.
    *
    * `points` must carry (`pointCols`…, x, y); `polys` (name, xs, ys).
    * Output: points columns + matched `name` (null when uncontained).
    */
  def gridSpatialJoin(points: org.apache.spark.sql.DataFrame,
      polys: org.apache.spark.sql.DataFrame, cellSize: Double)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    register(points.sparkSession)
    def cellOf(c: Column): Column = floor(c / cellSize).cast("long")
    // bbox over finite vertices only: Wkt's NaN ring separators sort as
    // the largest double, so a bare array_max would be NaN (and its cast
    // to a cell id rejected under ANSI mode)
    def finite(c: Column): Column = filter(c, v => !isnan(v))
    val polyCells = polys
      .withColumn("cellx", explode(sequence(
        cellOf(array_min(finite(col("xs")))), cellOf(array_max(finite(col("xs")))))))
      .withColumn("celly", explode(sequence(
        cellOf(array_min(finite(col("ys")))), cellOf(array_max(finite(col("ys")))))))
    // a synthetic point id keys the miss path: matches reduce to
    // (_pt_id, name) and LEFT-join back, so unmatched points surface with
    // a null name in ONE join — an all-columns left_anti here would cost
    // an extra full shuffle of the point set AND silently drop both
    // copies of a fully-duplicate point row when only one matched. The
    // localCheckpoint pins monotonically_increasing_id to ONE evaluation
    // (both join branches read the same materialized ids) without leaking
    // a cache-manager entry per call the way persist() would — checkpoint
    // blocks are released by the ContextCleaner once the returned plan is
    // unreferenced, with no unpersist obligation on the caller.
    val pts = points
      .withColumn("_pt_id", monotonically_increasing_id())
      .withColumn("cellx", cellOf(col("x")))
      .withColumn("celly", cellOf(col("y")))
      .localCheckpoint()
    val matches = pts
      .join(polyCells, Seq("cellx", "celly"))
      .filter(stContains(col("xs"), col("ys"), col("x"), col("y")))
      .select(col("_pt_id"), col("name"))
    pts.drop("cellx", "celly")
      .join(matches, Seq("_pt_id"), "left")
      .drop("_pt_id")
  }
}

/** `st_contains(xs: array<double>, ys: array<double>, x, y)` — true when
  * point (x, y) falls inside the polygon with vertex arrays xs/ys, by
  * even-odd ray casting. Codegen emits the loop inline.
  */
case class PointInPolygon(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
  extends QuaternaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_contains"

  override def checkInputDataTypes(): TypeCheckResult = {
    val got = children.map(_.dataType)
    val ok = got match {
      case Seq(ArrayType(DoubleType, _), ArrayType(DoubleType, _),
        DoubleType, DoubleType) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"st_contains expects (array<double>, array<double>, double, double), got $got")
  }

  override protected def nullSafeEval(xs: Any, ys: Any, x: Any, y: Any): Any =
    Geo.rayCast(
      xs.asInstanceOf[ArrayData].toDoubleArray(),
      ys.asInstanceOf[ArrayData].toDoubleArray(),
      x.asInstanceOf[Double], y.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys, x, y) => {
      val xa = ctx.freshName("xa")
      val ya = ctx.freshName("ya")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val in = ctx.freshName("inside")
      s"""
         |double[] $xa = $xs.toDoubleArray();
         |double[] $ya = $ys.toDoubleArray();
         |int $n = $xa.length;
         |boolean $in = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  int $j = ($i + 1) % $n;
         |  if ((($ya[$i] > $y) != ($ya[$j] > $y)) &&
         |      ($x < ($xa[$j] - $xa[$i]) * ($y - $ya[$i]) / ($ya[$j] - $ya[$i]) + $xa[$i])) {
         |    $in = !$in;
         |  }
         |}
         |${ev.value} = $in;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(first: Expression,
      second: Expression, third: Expression, fourth: Expression): Expression =
    copy(first = first, second = second, third = third, fourth = fourth)
}
