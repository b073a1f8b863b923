package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, GreaterThanOrEqual, LessThanOrEqual, Literal}
import org.apache.spark.sql.types.LongType

import graft.sources.{FileManifest, ManifestFileIndex}

/** Dev measurement: what the DISTRIBUTED manifest planning job costs as
  * the manifest grows — construction (coverage anti-join) and a pruned
  * listFiles (bounds+bloom job) at 10³/10⁴/10⁵ manifest entries, with
  * real multi-KB bloom sidecars inflating each synthetic row, plus the
  * driver bytes the listing retained. The pre-r14 planner collected
  * every row's bounds and bloom binaries; this prints what replaced it.
  * Run: sbt "Test/runMain graft.ManifestPlanProbe"
  */
object ManifestPlanProbe {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._

    val bf = org.apache.spark.util.sketch.BloomFilter.create(1024, 0.01)
    (0 until 1000).foreach(i => bf.putLong(1000000L + i))
    val os = new java.io.ByteArrayOutputStream(); bf.writeTo(os)
    val bloomBytes = os.toByteArray

    for (n <- Seq(1000, 10000, 100000)) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_mplan_$n").toString
      (0 until 8).foreach { f =>
        (0 until 100).map(i => (f * 100L + i, s"v$i"))
          .toDF("ts", "payload").coalesce(1).write.mode("append").parquet(dir)
      }
      FileManifest.buildWithBloom(s, dir, Seq("ts"), Seq("ts"),
        expectedPerFile = 1024, fpp = 0.01)
      val mPath = s"$dir/_manifest"
      val realCols = s.read.parquet(mPath).columns.toSeq
      s.range(n).select(
          concat(lit("file:/graft_fake/f_"), col("id"), lit(".parquet")).as("file"),
          lit(100L).as("n_rows"),
          (lit(1000000L) + col("id") * lit(100L)).as("min_ts"),
          (lit(1000000L) + col("id") * lit(100L) + lit(99L)).as("max_ts"),
          lit(bloomBytes).as("bloom_ts"))
        .select(realCols.map(col): _*)
        .coalesce(4).write.mode("append").parquet(mPath)

      val t0 = System.nanoTime()
      val idx = new ManifestFileIndex(s, dir)
      val tCons = (System.nanoTime() - t0) / 1e9
      val ts = AttributeReference("ts", LongType)()
      val t1 = System.nanoTime()
      val kept = idx.listFiles(Nil, Seq(GreaterThanOrEqual(ts, Literal(250L)),
        LessThanOrEqual(ts, Literal(420L)))).map(_.files.size).sum
      val tList = (System.nanoTime() - t1) / 1e9
      val sidecarMb = s.read.parquet(mPath)
        .select(sum(length(col("bloom_ts")))).head().getLong(0) / 1048576.0
      // the vacuum verb over the same tree: two planted orphans against
      // the n-entry manifest — the orphan decision is the same
      // distributed anti-join shape, so the verb must stay ~flat as the
      // manifest grows (driver work is O(orphans), never O(entries))
      (0 until 2).foreach { k =>
        Seq((9000L + k, "orphan")).toDF("ts", "payload")
          .coalesce(1).write.mode("append").parquet(dir)
      }
      val t2 = System.nanoTime()
      val reaped = FileManifest.vacuum(s, dir, graceMs = 0L).size
      val tVac = (System.nanoTime() - t2) / 1e9
      println(f"manifest_plan n=${n + 8}%-7d construct=$tCons%6.2f s " +
        f"prune_listing=$tList%6.2f s kept=$kept driver_bytes=${idx.lastListingDriverBytes} " +
        f"sidecar_total=$sidecarMb%.1f MB vacuum=$tVac%6.2f s reaped=$reaped")
    }
    s.stop()
  }
}
