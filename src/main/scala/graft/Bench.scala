package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Repetitions per query; the reported number is the MEDIAN. Single-shot
    * timings of identical code were observed to swing 10× run-to-run under
    * driver-machine contention — a median of 3 makes real regressions
    * visible above the noise floor.
    */
  val Reps = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb JVM/codegen/session warmup so per-query timings are honest
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to Reps).map { _ =>
        val t0 = System.nanoTime()
        // toRdd materializes EVERY output column; a plain count() would let
        // the optimizer prune expensive projections and understate the time
        try { fn(spark, sfDir).queryExecution.toRdd.count() }
        catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        // queries persist() intermediates; the cache manager matches plans
        // across reps, so drop it or reps 2..n time a warm cache
        spark.sharedState.cacheManager.clearCache()
        dt
      }.sorted
      name -> times(Reps / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$Reps}""")
    spark.stop()
  }
}
