package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-JOB wall-clock profile of one registry query — where a
  * multi-commit lane's seconds actually go (Spark jobs vs driver-side
  * gaps between them). Usage: runMain graft.JProf <name> [reps]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object JProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    case class J(id: Int, desc: String, start: Long, var end: Long)
    val jobs = new scala.collection.mutable.ArrayBuffer[J]()
    val byId = new scala.collection.mutable.HashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        val j = J(e.jobId, d, System.nanoTime(), 0L)
        jobs += j; byId(e.jobId) = j
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
        byId.get(e.jobId).foreach(_.end = System.nanoTime())
      }
    })

    (1 to reps).foreach { rep =>
      jobs.clear(); byId.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      val total = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      Thread.sleep(300) // let listener events drain
      val snap = jobs.synchronized(jobs.toVector)
      println(f"\n===== $name rep $rep total $total%.3f s, ${snap.size} jobs =====")
      var prevEnd = t0
      snap.foreach { j =>
        val gap = (j.start - prevEnd) / 1e9
        val dur = if (j.end == 0) -1.0 else (j.end - j.start) / 1e9
        val d = if (j.desc.length > 90) j.desc.take(90) else j.desc
        println(f"  gap ${gap}%7.3f | job ${j.id}%4d ${dur}%7.3f s | $d")
        if (j.end > prevEnd) prevEnd = j.end
      }
      val tEnd = t0 + (total * 1e9).toLong
      println(f"  tail gap ${(tEnd - prevEnd) / 1e9}%7.3f s")
      val jobSum = snap.filter(_.end > 0).map(j => (j.end - j.start) / 1e9).sum
      println(f"  job time sum $jobSum%.3f s (overlaps possible); driver/other ${total - jobSum}%.3f s")
    }
    spark.stop()
  }
}
