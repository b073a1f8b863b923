package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Tables.estimatedScanSplits]] — the file-listing split estimate
  * that replaced the `df.rdd.getNumPartitions` probe in [[Tables.spread]]
  * — against the ACTUAL physical scan partitioning Spark produces, for
  * every testdata table. The contract is decision parity: the estimate
  * and the physical count must land on the same side of the
  * `< defaultParallelism` comparison that decides whether spread widens
  * the scan. (Exact-count parity is NOT the contract — Spark's bin
  * packing can differ by a split on boundary-straddling files.)
  */
class TablesSpreadSpec extends AnyFunSuite with SparkSpec {

  private val SfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("estimate and physical scan-split count agree on the spread decision") {
    val cores = spark.sparkContext.defaultParallelism
    for (d <- SfDirs; name <- Tables.names) {
      val df = Tables.load(spark, d, name)
      val est = Tables.estimatedScanSplits(df)
      assert(est.nonEmpty, s"$d/$name: no file relation found under a parquet read")
      val actual = df.rdd.getNumPartitions
      assert((est.get < cores) == (actual < cores),
        s"$d/$name: estimate ${est.get} vs physical $actual flip the " +
          s"spread decision at cores=$cores")
    }
  }

  test("estimate matches the physical count exactly on single-file tables") {
    for (name <- Tables.names) {
      val df = Tables.load(spark, "/root/testdata/sf0.01", name)
      val est = Tables.estimatedScanSplits(df).get
      val actual = df.rdd.getNumPartitions
      assert(est == actual,
        s"sf0.01/$name: estimate $est vs physical $actual")
    }
  }

  test("multi-file layouts (the ScaleSmoke 10x shape) keep decision parity") {
    val cores = spark.sparkContext.defaultParallelism
    val dir = java.nio.file.Files.createTempDirectory("graft_spread").toString
    Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .repartition(9).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = Tables.load(spark, dir, "documents")
    val est = Tables.estimatedScanSplits(df).get
    val actual = df.rdd.getNumPartitions
    assert((est < cores) == (actual < cores),
      s"multi-file: estimate $est vs physical $actual flip the decision")
    assert(est == actual, s"multi-file: estimate $est vs physical $actual")
  }

  test("frames with no file relation underneath report None (spread widens)") {
    import spark.implicits._
    val local = Seq(1L, 2L, 3L).toDF("x")
    assert(Tables.estimatedScanSplits(local).isEmpty)
    // and the estimate survives transforms above the scan
    val derived = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter(col("event_id") > 0).select("event_id")
    assert(Tables.estimatedScanSplits(derived).nonEmpty)
  }
}
