package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.geo.Geo

/** Spatial join coverage (SURVEY.md J1): synthetic points derived from
  * `customer` keys are left-joined against a broadcast polygon table on
  * the custom `st_contains` expression (BroadcastNestedLoopJoin — the
  * reference's 9-ocean sjoin shape). The DuckDB oracle runs the identical
  * ray-cast formula over the same vertex literals.
  */
object GeoQueries {

  /** Shared polygon table: convex and non-convex shapes in [0,100)². */
  val Polygons: Seq[(String, Seq[(Double, Double)])] = Seq(
    "triangle" -> Seq((0.0, 0.0), (40.0, 0.0), (20.0, 30.0)),
    "square" -> Seq((50.0, 50.0), (90.0, 50.0), (90.0, 90.0), (50.0, 90.0)),
    "lshape" -> Seq((0.0, 60.0), (30.0, 60.0), (30.0, 75.0), (15.0, 75.0),
      (15.0, 95.0), (0.0, 95.0)),
    "diamond" -> Seq((60.0, 5.0), (85.0, 25.0), (60.0, 45.0), (35.0, 25.0)))

  private def sqlList(ds: Seq[Double]): String = ds.mkString("[", ", ", "]")

  /** Shared oracle: ray-cast left join + per-region aggregate (used by
    * both the BNLJ form q39 and the grid-indexed form q56 — the two
    * plans must produce identical results).
    */
  private def spatialOracle: String = {
    val polyValues = Polygons.map { case (nm, vs) =>
      s"('$nm', ${sqlList(vs.map(_._1))}::DOUBLE[], ${sqlList(vs.map(_._2))}::DOUBLE[])"
    }.mkString(",\n  ")
    val contains =
      """len(list_filter(range(1, len(xs) + 1), i ->
        |    ((ys[i] > py) != (ys[1 + i % len(xs)] > py)) AND
        |    (px < (xs[1 + i % len(xs)] - xs[i]) * (py - ys[i]) / (ys[1 + i % len(xs)] - ys[i]) + xs[i])
        |  )) % 2 = 1""".stripMargin
    s"""WITH polys(name, xs, ys) AS (VALUES
       |  $polyValues),
       |pts AS (
       |  SELECT c_custkey,
       |    CAST((c_custkey * 7) % 1000 AS DOUBLE) / 10.0 AS px,
       |    CAST((c_custkey * 13) % 1000 AS DOUBLE) / 10.0 AS py
       |  FROM customer)
       |SELECT coalesce(name, '(none)') AS region, COUNT(*) AS n,
       |  min(c_custkey) AS min_k, max(c_custkey) AS max_k
       |FROM pts LEFT JOIN polys ON $contains
       |GROUP BY 1 ORDER BY 1"""
  }

  private def points(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.customer(s, d).select(
      col("c_custkey"),
      (((col("c_custkey") * 7) % 1000).cast("double") / 10.0).as("px"),
      (((col("c_custkey") * 13) % 1000).cast("double") / 10.0).as("py"))

  private def polyDf(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Polygons.map { case (nm, vs) => (nm, vs.map(_._1).toArray, vs.map(_._2).toArray) }
      .toDF("name", "xs", "ys")
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- broadcast BNLJ form (dimension-sized polygon tables) ------------
    QueryDef.sql("q39_spatial_join", spatialOracle) { (s, d) =>
      Geo.register(s)
      points(s, d).join(broadcast(polyDf(s)),
        Geo.stContains(col("xs"), col("ys"), col("px"), col("py")), "left")
        .groupBy(coalesce(col("name"), lit("(none)")).as("region"))
        .agg(count(lit(1)).as("n"),
          min(col("c_custkey")).as("min_k"), max(col("c_custkey")).as("max_k"))
        .orderBy("region")
    },

    // ---- grid-indexed form (the scale path) — same oracle, equi-join plan
    QueryDef.sql("q56_grid_spatial_join", spatialOracle) { (s, d) =>
      val pts = points(s, d)
        .withColumnRenamed("px", "x").withColumnRenamed("py", "y")
      Geo.gridSpatialJoin(pts, polyDf(s), cellSize = 10.0)
        .groupBy(coalesce(col("name"), lit("(none)")).as("region"))
        .agg(count(lit(1)).as("n"),
          min(col("c_custkey")).as("min_k"), max(col("c_custkey")).as("max_k"))
        .orderBy("region")
    }
  )
}
