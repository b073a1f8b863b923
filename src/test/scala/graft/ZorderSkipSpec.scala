package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves q88's claim at the storage layer: writing a table SORTED BY its
  * Morton key gives parquet row groups tight min/max bounds on BOTH
  * interleaved dimensions, so a selective predicate on EITHER dimension
  * skips most row groups — while the same data written in natural order
  * (both dimensions ~uniform per row group) skips none. Row-group
  * elimination off footer statistics is exactly what a 100 TB scan does
  * before reading a byte of data pages; this pins the layout's effect
  * with the parquet footer API rather than trusting the sort was enough.
  */
class ZorderSkipSpec extends AnyFunSuite with SparkSpec {

  /** Fraction of row groups whose [min,max] on `column` overlaps
    * [lo, hi] — the fraction a predicate-pushdown scan must READ.
    */
  private def overlapFraction(dir: String, column: String,
      lo: Long, hi: Long): Double = {
    val files = new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    val spans = files.toSeq.flatMap { f =>
      val rdr = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getPath), new Configuration()))
      try rdr.getFooter.getBlocks.asScala.toSeq.map { blk =>
        val st = blk.getColumns.asScala
          .find(_.getPath.toDotString == column).get.getStatistics
        (st.genericGetMin.toString.toLong, st.genericGetMax.toString.toLong)
      } finally rdr.close()
    }
    assert(spans.size >= 8, s"need enough row groups to measure, got ${spans.size}")
    spans.count { case (mn, mx) => mx >= lo && mn <= hi }.toDouble / spans.size
  }

  test("z-order-sorted layout skips row groups on both dimensions; natural order skips none") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // two independent ~uniform dimensions (the q88 key shape)
    val base = Tables.orders(spark, "/root/testdata/sf0.01")
      .select(col("o_orderkey"),
        col("o_custkey").bitwiseAND(lit(255L)).as("a"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").bitwiseAND(lit(255L)).as("b"))
    val zkeyed = base.withColumn("zkey",
      graft.queries.LayoutQueries.morton(col("a"), col("b"), 8))
    // small row groups so one file holds many; one file per layout keeps
    // the comparison clean
    def write(df: org.apache.spark.sql.DataFrame, sub: String): String = {
      df.coalesce(1).write
        .option("parquet.block.size", (16 * 1024).toString)
        .mode("overwrite").parquet(s"$dir/$sub")
      s"$dir/$sub"
    }
    val natural = write(zkeyed, "natural")
    val zsorted = write(zkeyed.sortWithinPartitions("zkey"), "zsorted")

    // same rows either way — layout must never change results
    assert(spark.read.parquet(zsorted).count() ==
      spark.read.parquet(natural).count())

    for (dim <- Seq("a", "b")) {
      val zFrac = overlapFraction(zsorted, dim, 100, 115)
      val nFrac = overlapFraction(natural, dim, 100, 115)
      // natural order: both dims are ~uniform within every row group, so
      // essentially every group overlaps any range; z-order: a 16/256
      // slice of either dimension lives in a minority of zkey blocks
      assert(nFrac > 0.9, s"$dim natural layout unexpectedly clustered: $nFrac")
      assert(zFrac < 0.5, s"$dim z-order skipped too little: $zFrac")
      assert(zFrac < nFrac, s"$dim: z-order ($zFrac) must beat natural ($nFrac)")
    }
  }
}
