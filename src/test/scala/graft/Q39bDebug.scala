package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamOps

/** Throwaway profiler for the q39b stream-stream join: prints per-batch
  * durations and state-operator metrics so the watermark cost is visible.
  * Run: sbt "Test/runMain graft.Q39bDebug [sfDir] [oneSided]"
  */
object Q39bDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val oneSided = args.exists(_ == "oneSided")
    val rocks = args.exists(_ == "rocksdb")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    if (rocks) s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // match production q39b (StreamOps.runToBatch noDataBatches=false)
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    args.find(_.startsWith("parts=")).foreach(a =>
      s.conf.set("spark.sql.shuffle.partitions", a.stripPrefix("parts=")))
    s.range(1000000L).selectExpr("sum(id)").collect()
    val t0 = System.nanoTime()

    val purchases0 = StreamOps.eventsStream(s, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        (col("ts_ns") - col("ts_ns") % 1000).as("p_ts"))
      .withColumn("p_t", timestamp_micros(expr("p_ts div 1000")))
      .withWatermark("p_t", "30 minutes")
    val clicks0 = StreamOps.eventsStream(s, sfDir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"),
        (col("ts_ns") - col("ts_ns") % 1000).as("c_ts"))
      .withColumn("c_t", timestamp_micros(expr("c_ts div 1000")))
    val clicks = if (oneSided) clicks0 else clicks0.withWatermark("c_t", "30 minutes")
    val joined = purchases0.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_t") <= col("p_t") &&
        col("c_t") > col("p_t") - expr("INTERVAL 30 MINUTES"))

    val q = joined.writeStream.format("memory").queryName("dbg")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val n = s.table("dbg").count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"ROWS $n%d WALL $wall%.2f s oneSided=$oneSided")
    q.recentProgress.foreach { p =>
      val dur = p.durationMs
      val st = p.stateOperators.headOption
      println(s"BATCH ${p.batchId}: rows=${p.numInputRows} " +
        s"addBatch=${dur.get("addBatch")} getBatch=${dur.get("getBatch")} " +
        s"walCommit=${dur.get("walCommit")} stateCommit=${dur.get("commitOffsets")} " +
        st.map(o => s"stateRows=${o.numRowsTotal} upd=${o.numRowsUpdated} " +
          s"removed=${o.numRowsRemoved} commitMs=${o.commitTimeMs}").getOrElse(""))
    }
    s.stop()
  }
}
