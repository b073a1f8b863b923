package graft

/** Throwaway plan auditor: prints ReadSchema/PushedFilters lines for the
  * named queries so scan pruning is verifiable at a glance.
  * Run: sbt "Test/runMain graft.PlanAudit q85_retention_cohorts ..."
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val df = SparkEntry.queries(n)(s, "/root/testdata/sf0.001")
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val lines = plan.linesIterator.filter(l =>
        l.contains("ReadSchema") || l.contains("PushedFilters")).toSeq
      println(s"AUDIT $n")
      lines.foreach(l => println(s"  ${l.trim.take(160)}"))
    }
    s.stop()
  }
}
