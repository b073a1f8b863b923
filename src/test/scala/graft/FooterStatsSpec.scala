package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{FileManifest, FsListing}

/** Footer-derived manifest entries must be INDISTINGUISHABLE from
  * scan-derived ones: same per-file row counts, same min/max for every
  * eligible type (integrals, date, string, boolean), NULL bounds for
  * all-null columns. Ineligible shapes (double column, partition
  * column) must silently keep the scan path and still produce correct
  * manifests through the public build/readPruned surface.
  */
class FooterStatsSpec extends AnyFunSuite with SparkSpec {

  private def freshDir(tag: String): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_io/spec/fstats_$tag"
    val p = new Path(dir)
    val hfs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (hfs.exists(p)) hfs.delete(p, true)
    dir
  }

  /** Manifest rows keyed by normalized file path, values ordered by the
    * sorted column names — comparable across the two builders whatever
    * their file-string or row order.
    */
  private def normalized(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Any]] = {
    val cols = df.columns.sorted.toSeq
    df.collect().map { r =>
      val m = r.getValuesMap[Any](cols)
      FsListing.norm(m("file").asInstanceOf[String]) ->
        cols.filterNot(_ == "file").map(m(_))
    }.toMap
  }

  test("footer bounds == scan bounds for every eligible type, nulls included") {
    import spark.implicits._
    val dir = freshDir("types")
    val df = (1 to 300).map { i =>
      (i.toLong,
        if (i % 7 == 0) None else Some(i * 3),
        if (i % 11 == 0) None else Some(f"name_$i%04d"),
        java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i)),
        i % 2 == 0,
        None: Option[Long]) // all-null column
    }.toDF("k", "i", "s", "d", "b", "z")
    df.repartitionByRange(3, col("k")).write.parquet(dir)
    val cols = Seq("k", "i", "s", "d", "b", "z")
    val paths = FsListing.listDataFiles(
      new Path(dir).getFileSystem(spark.sessionState.newHadoopConf()),
      new Path(dir))
    assert(paths.size == 3)
    val viaFooter = FileManifest.footerStats(
      spark, paths, spark.read.parquet(dir).schema, cols)
    val viaScan = FileManifest.fileStats(
      spark.read.parquet(dir), cols, Nil, 65536L, 0.01)
    assert(normalized(viaFooter) === normalized(viaScan),
      "footer-derived manifest diverged from scan-derived")
    // and the all-null column really surfaced as unknown bounds
    assert(viaFooter.filter(col("min_z").isNotNull || col("max_z").isNotNull)
      .count() === 0L)
  }

  test("public build() serves footer-backed pruning identically") {
    import spark.implicits._
    val dir = freshDir("prune")
    (1L to 1000L).toDF("ts")
      .repartitionByRange(4, col("ts")).write.parquet(dir)
    FileManifest.build(spark, dir, Seq("ts"))
    val (df, kept, total) = FileManifest.readPruned(spark, dir, "ts",
      lit(10L), lit(40L))
    assert(total === 4 && kept === 1, s"kept=$kept of $total")
    assert(df.count() === 31L)
  }

  test("ineligible shapes fall back to the scan path and stay correct") {
    import spark.implicits._
    // double column: footer-ineligible (NaN bounds ambiguity)
    val dir = freshDir("dbl")
    (1 to 100).map(i => (i.toLong, i / 10.0)).toDF("k", "v")
      .repartitionByRange(2, col("k")).write.parquet(dir)
    FileManifest.build(spark, dir, Seq("k", "v"))
    val (df, kept, total) = FileManifest.readPruned(spark, dir, "v",
      lit(0.0), lit(3.0))
    assert(total === 2 && kept === 1)
    assert(df.count() === 30L)

    // partition column: physically absent from footers
    val dir2 = freshDir("part")
    (1 to 100).map(i => (i.toLong, s"p${i % 2}")).toDF("k", "part")
      .write.partitionBy("part").parquet(dir2)
    FileManifest.build(spark, dir2, Seq("k", "part"))
    val (df2, _, _) = FileManifest.readPruned(spark, dir2, "k",
      lit(1L), lit(10L))
    assert(df2.count() === 10L)
  }
}
