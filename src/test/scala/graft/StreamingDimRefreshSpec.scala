package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Pins the DIM-REFRESH contract of stream⋈static joins — an
  * operational subtlety a long-lived 100 TB stream hits the first time
  * its dimension table grows: the static side of a stream-static join
  * is a LISTING SNAPSHOT (its file index is built once when the
  * DataFrame is constructed), so dim files appended after the stream
  * starts are INVISIBLE to every later micro-batch. The production
  * pattern for a refreshing dim is a fresh read per batch inside
  * foreachBatch — this spec pins both behaviors, so a Spark version
  * change that silently altered either would surface here.
  */
class StreamingDimRefreshSpec extends AnyFunSuite with SparkSpec {

  test("stream-static join snapshots the dim; foreachBatch re-read refreshes it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_dimrefresh").toString
    val dimDir = s"$root/dim"
    Seq((1L, "one_v1")).toDF("k", "seg").coalesce(1)
      .write.mode("append").parquet(dimDir)

    // ---- plain stream-static join: the dim is a snapshot --------------
    val in1 = MemoryStream[Long]
    val static = spark.read.parquet(dimDir) // file index fixed HERE
    val q1 = in1.toDF().toDF("k").join(static, Seq("k"))
      .writeStream.format("memory").queryName("dim_snap")
      .trigger(Trigger.ProcessingTime(0)).outputMode("append").start()
    in1.addData(1L, 2L)
    q1.processAllAvailable()
    // dim grows AFTER the stream started: k=2 lands as a NEW file
    Seq((2L, "two_v1")).toDF("k", "seg").coalesce(1)
      .write.mode("append").parquet(dimDir)
    in1.addData(1L, 2L)
    q1.processAllAvailable()
    q1.stop()
    val snap = spark.table("dim_snap").select("k", "seg")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(snap.count(_ == ((1L, "one_v1"))) == 2, s"got $snap")
    assert(!snap.exists(_._1 == 2L),
      s"snapshot semantics changed: appended dim row visible to the join — $snap")

    // ---- foreachBatch re-read: each batch sees the dim AS OF itself ---
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
    val in2 = MemoryStream[Long]
    val q2 = in2.toDF().toDF("k").writeStream
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val fresh = spark.read.parquet(dimDir) // NEW file index per batch
        batch.join(fresh, Seq("k")).select("k", "seg").collect()
          .foreach(r => seen.synchronized {
            seen += ((id, r.getLong(0), r.getString(1))) })
        ()
      }.start()
    in2.addData(1L, 2L, 3L)
    q2.processAllAvailable()
    Seq((3L, "three_v1")).toDF("k", "seg").coalesce(1)
      .write.mode("append").parquet(dimDir)
    in2.addData(1L, 2L, 3L)
    q2.processAllAvailable()
    q2.stop()
    val byBatch = seen.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    val batches = byBatch.keys.toSeq.sorted
    assert(byBatch(batches.head) == Set((1L, "one_v1"), (2L, "two_v1")),
      s"first batch: ${byBatch(batches.head)}")
    assert(byBatch(batches.last) ==
      Set((1L, "one_v1"), (2L, "two_v1"), (3L, "three_v1")),
      s"re-read batch missed the appended dim row: ${byBatch(batches.last)}")
  }
}
