package graft

import org.apache.spark.sql.functions._

/** Throwaway profiler for the q71 connected-components pipeline: times
  * the pair-generation stage vs the CC loop separately.
  * Run: sbt "Test/runMain graft.CcDebug [sfDir]"
  */
object CcDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.range(1000000L).selectExpr("sum(id)").collect()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val q71 = SparkEntry.queries("q71_dup_clusters")
    t("q71 end-to-end")(q71(s, sfDir).queryExecution.toRdd.count())
    s.sharedState.cacheManager.clearCache()

    // pairs alone (q26 is the same LSH pipeline up to the pair list)
    val q26 = SparkEntry.queries("q26_minhash_lsh")
    t("q26 pairs only")(q26(s, sfDir).queryExecution.toRdd.count())
    s.sharedState.cacheManager.clearCache()

    // CC loop alone on a pre-materialized synthetic edge list of similar size
    val edges = t("edges materialize") {
      val e = s.range(30000).select(
        (col("id") % 7919).as("u"), (col("id") % 104729).as("v"))
        .filter(col("u") =!= col("v"))
        .localCheckpoint()
      e.count(); e
    }
    t("CC loop on synthetic")(graft.dedup.ConnectedComponents.run(edges).count())
    s.stop()
  }
}
