package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FileManifest

/** FILE-level data skipping from pairing the min/max manifest with a
  * z-order layout — the complement of ZorderSkipSpec's row-group-level
  * measurement: a 64×64 grid written 16 files each way, linearly sorted
  * by x vs sorted by the Morton key. The manifest tracks BOTH
  * dimensions; a y-slice query then shows the asymmetry that justifies
  * z-ordering a 100 TB table: the linear layout cannot skip a single
  * file (every file spans all of y), the z-ordered layout keeps only
  * the tiles its y-range touches — and both return identical rows.
  */
class ZorderManifestSpec extends AnyFunSuite with SparkSpec {

  test("a y-slice skips files only under the z-order layout; results identical") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_zmanifest").toString
    val (linDir, zDir) = (s"$root/linear", s"$root/zorder")
    val grid = spark.range(64L * 64)
      .select((col("id") % 64).as("x"), expr("id div 64").as("y"))

    grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(linDir)
    val zkey = graft.queries.LayoutQueries.morton(col("x"), col("y"), 6)
    grid.withColumn("zk", zkey)
      .repartitionByRange(16, col("zk"))
      .sortWithinPartitions("zk")
      .drop("zk")
      .write.mode("overwrite").parquet(zDir)
    FileManifest.build(spark, linDir, Seq("x", "y"))
    FileManifest.build(spark, zDir, Seq("x", "y"))

    val slice = Seq(("y", lit(8L), lit(15L))) // all x, narrow y
    val (linDf, linKept, linTotal) = FileManifest.readPrunedMulti(spark, linDir, slice)
    val (zDf, zKept, zTotal) = FileManifest.readPrunedMulti(spark, zDir, slice)
    assert(linTotal == 16 && zTotal == 16)
    // linear-by-x files all span y=0..63: nothing skippable on y
    assert(linKept == 16, s"linear layout unexpectedly skipped: kept $linKept")
    // z-order tiles: only those whose 16-row band overlaps y in [8,15]
    assert(zKept <= 6, s"z-order layout kept $zKept of 16 files for a y-slice")
    val expect = grid.filter(col("y").between(8, 15))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(linDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expect)
    assert(zDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expect)

    // 2-D box: the z-order layout prunes on BOTH dimensions at once
    val box = Seq(("x", lit(8L), lit(15L)), ("y", lit(8L), lit(15L)))
    val (boxDf, boxKept, _) = FileManifest.readPrunedMulti(spark, zDir, box)
    assert(boxKept <= 2, s"2-D box kept $boxKept of 16 z-ordered files")
    assert(boxDf.count() == 64)
  }
}
