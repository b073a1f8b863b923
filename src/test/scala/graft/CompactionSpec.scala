package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{FileManifest, Staging}

/** Pins clustering-preserving compaction (Staging.compactSorted): the
  * rewrite keeps every row, cuts the file count to the sized target,
  * produces DISJOINT per-file key ranges (the property data skipping
  * prices in), and restores manifest skipping that the small-files
  * residue had destroyed.
  */
class CompactionSpec extends AnyFunSuite with SparkSpec {

  test("compaction keeps rows, cuts files, restores disjoint ranges and skipping") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val (small, out) = (s"$root/small", s"$root/compacted")

    // 4096 rows over a 64-wide key space, landed as 64 round-robin files
    // (each file spans ~the whole key range — the streaming-sink residue)
    val df = (0L until 4096L).map(i => (i, i % 64, s"p$i")).toDF("id", "key", "payload")
    df.repartition(64).write.mode("append").parquet(small)
    def files(dir: String) = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files(small).length == 64)

    // before: a manifest over the residue keeps ~every file for a key slice
    FileManifest.build(spark, small, Seq("key"))
    val (_, keptBefore, totBefore) = FileManifest.readPruned(spark, small, "key",
      lit(8L), lit(15L))
    assert(totBefore == 64 && keptBefore >= 60,
      s"residue should defeat skipping, kept $keptBefore")

    Staging.compactSorted(spark, small, out, Seq("key"), targetFileRows = 512)
    val outFiles = files(out)
    // ~8 files, with slack for RangePartitioner's sampling jitter: its
    // seed folds in the session-global RDD id, so on a 64-distinct-value
    // key the boundaries shift with whatever ran earlier in the session,
    // and each oversized partition costs one maxRecordsPerFile split —
    // a count wobble, never a correctness issue (disjointness and
    // row-exactness are asserted below regardless)
    assert(outFiles.length <= 13, s"expected ~8-13 files, got ${outFiles.length}")

    // rows survive exactly
    val got = spark.read.parquet(out).select("id", "key", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == want)

    // disjoint per-file key ranges (global range sort, not just local)
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("key").as("lo"), max("key").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping file ranges: $ranges")
      case _ =>
    }

    // after: the same key slice opens only the intersecting files
    FileManifest.build(spark, out, Seq("key"))
    val (sliced, keptAfter, totAfter) = FileManifest.readPruned(spark, out, "key",
      lit(8L), lit(15L))
    assert(keptAfter < totAfter / 2,
      s"compaction failed to restore skipping: kept $keptAfter of $totAfter")
    assert(sliced.count() == 4096 / 64 * 8)
  }
}
