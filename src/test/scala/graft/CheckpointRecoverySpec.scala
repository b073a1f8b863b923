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
  *
  * Exercised on BOTH state store providers: the default heap-backed one,
  * and RocksDB — native memory + local disk + incremental checkpoint,
  * the production provider at scale. RocksDbStateSpec pins provider-swap
  * output equality on uninterrupted runs; the RocksDB case here is the
  * missing composition — restart-on-checkpoint WITH the provider whose
  * recovery path (snapshot + changelog replay into a fresh native store)
  * is entirely different code from the heap provider's, which is exactly
  * the 100 TB operational path.
  */
class CheckpointRecoverySpec extends AnyFunSuite with SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", LongType)))

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val Rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Stop/restart a stateful counting stream on one checkpoint; assert
    * no input replay, recovered (not rebuilt) state, and correct final
    * counts. The provider in force is whatever the session conf says at
    * each stream start — both runs inside see the same one.
    */
  private def restartCase(): Unit = {
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

  test("restart from checkpoint: offsets skip done files, state carries over") {
    restartCase()
  }

  test("restart from checkpoint ON RocksDB: state recovers into a fresh native store") {
    val prior = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, Rocks)
    try restartCase()
    finally prior match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }
}
