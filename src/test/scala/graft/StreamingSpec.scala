package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Incremental streaming semantics that the batch-parity queries can't
  * show: watermark + append-mode windows across multiple micro-batches,
  * with late data dropped once the watermark passes.
  */
class StreamingSpec extends AnyFunSuite with SparkSpec {

  test("watermark closes event-time windows and drops late rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val windowed = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .count()
    val q = windowed.writeStream.format("memory")
      .queryName("wm_test").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

    input.addData((ts(1), "a"), (ts(4), "a"), (ts(12), "b"))
    q.processAllAvailable()
    // watermark now 10:12-10m = 10:02 → [10:00,10:10) still open in append
    input.addData((ts(35), "c")) // advances watermark to 10:25
    q.processAllAvailable()
    input.addData((ts(3), "late")) // behind watermark → dropped
    q.processAllAvailable()
    q.stop()

    val out = spark.table("wm_test")
      .select(col("window.start").cast("string"), col("k"), col("count"))
      .as[(String, String, Long)].collect().toSet
    // closed windows: [10:00,10:10)×a(2) and [10:10,10:20)×b(1); the late
    // "a" never appears; c's window is still open (not emitted)
    assert(out == Set(
      ("2024-01-01 10:00:00", "a", 2L),
      ("2024-01-01 10:10:00", "b", 1L)))
  }
}
