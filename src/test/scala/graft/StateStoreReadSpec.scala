package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Pins OFFLINE state inspection via Spark's state data source: the
  * operational debugger for a 100 TB stream ("what is operator 0
  * holding, and why is it 2 TB") reads the checkpoint DIRECTLY — no
  * query restart, no instrumentation — as `format("statestore")`, plus
  * `format("state-metadata")` for the operator inventory. A stateful
  * query's checkpoint is thereby a queryable table, which is what makes
  * the streaming family's state auditable in production rather than a
  * black box.
  */
class StateStoreReadSpec extends AnyFunSuite with SparkSpec {

  test("checkpointed aggregation state and metadata are queryable offline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_statesrc").toString
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

    val in = MemoryStream[(java.sql.Timestamp, String)]
    val agg = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .count()
    val q = agg.writeStream.format("memory").queryName("state_src_q")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    in.addData((ts(1), "a"), (ts(4), "a"), (ts(12), "b"))
    q.processAllAvailable()
    q.stop()

    // offline read of the (stopped) query's aggregation state: watermark
    // is 10:02, so BOTH windows are still open — state must hold exactly
    // a→2 and b→1
    val state = spark.read.format("statestore").load(ckpt)
    assert(state.columns.contains("key") && state.columns.contains("value"),
      s"unexpected state source schema: ${state.columns.mkString(",")}")
    val byKey = state.select(col("key.k"),
      // the count buffer is the value struct's single numeric field —
      // addressed positionally so a buffer-naming change can't break us
      col("value").getField(state.select("value.*").columns.head))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey == Map("a" -> 2L, "b" -> 1L), s"state content: $byKey")

    // operator inventory: one stateful operator, id 0
    val meta = spark.read.format("state-metadata").load(ckpt)
    val ops = meta.select("operatorId", "operatorName").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ops.size == 1 && ops.head._1 == 0L, s"metadata: $ops")
  }
}
