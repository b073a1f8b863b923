package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.IdempotentFileSink

/** Driver-restart recovery: a stateful stream stopped and restarted
  * against the same checkpoint must (a) NOT reprocess already-committed
  * input files and (b) resume its AGGREGATION STATE, not recount from
  * zero. This is the contract that makes every stateful operator here
  * operable — a 100 TB stream WILL lose its driver mid-run.
  */
class CheckpointRecoverySpec extends AnyFunSuite with SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", LongType)))

  test("restart from checkpoint: offsets skip done files, state carries over") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val (src, ckpt, out) = (s"$root/src", s"$root/ckpt", s"$root/out")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .groupBy("k").agg(count(lit(1)).as("n"))
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          IdempotentFileSink.writeBatch(df, out, id)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    Seq(("k1", 1L), ("k1", 2L), ("k2", 3L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(src)
    runOnce() // "crash" after this: the query object is gone

    Seq(("k2", 4L), ("k3", 5L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(src)
    runOnce() // fresh query, same checkpoint

    // one committed batch per run: the restart did NOT replay file 1
    val batches = IdempotentFileSink.committedBatches(out)
    assert(batches == Seq(0L, 1L), s"unexpected batches: $batches")

    // update-mode batch 1 only re-emits the keys the NEW file touched...
    val b1 = spark.read.parquet(s"$out/batch=1")
      .as[(String, Long)].collect().toMap
    assert(b1.keySet == Set("k2", "k3"), s"batch 1 reprocessed old keys: $b1")
    // ...and k2's count proves batch-0 state was RECOVERED, not rebuilt
    assert(b1("k2") == 2L, s"state lost across restart: $b1")
    assert(b1("k3") == 1L)

    // last write per key across batches = the correct final counts
    val b0 = spark.read.parquet(s"$out/batch=0")
      .as[(String, Long)].collect().toMap
    val finalCounts = b0 ++ b1
    assert(finalCounts == Map("k1" -> 2L, "k2" -> 2L, "k3" -> 1L))
  }
}
