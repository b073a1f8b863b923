package graft

import org.apache.spark.sql.functions._

/** Throwaway measurement main: recall@3 of every ANN variant vs the exact
  * brute-force top-3 (q30's ground truth), per scale factor. Used to pin
  * honest thresholds for AnnRecallSpec.
  * Run: sbt "Test/runMain graft.RecallProbe [sfDir]"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    val e = Tables.embeddings(s, sfDir)
    val exact = sim.Similarity.topkNeighbors(
      e.filter(col("vec_id") % 100 === 0), e, 3)
      .select(col("q_id"), col("n_id"))
    exact.cache(); val nExact = exact.count()
    println(s"exact pairs: $nExact")

    for (q <- Seq("q32_ann_ivf", "q57_ann_lsh", "q66_ann_ivf_nprobe",
      "q80_quantized_ann", "q100_ann_pq", "q106_ann_ivf_pq")) {
      val approx = SparkEntry.queries(q)(s, sfDir)
      val cols = approx.columns.toSet
      val pairs =
        if (cols.contains("q_id")) approx.select(col("q_id"), col("n_id"))
        else approx.select(col("query_id").as("q_id"), col("n_id"))
      val hit = pairs.join(exact, Seq("q_id", "n_id")).count()
      println(f"$q%-22s recall@3 = ${hit.toDouble / nExact}%.3f ($hit/$nExact)")
      s.sharedState.cacheManager.clearCache()
      exact.cache(); exact.count()
    }
    s.stop()
  }
}
