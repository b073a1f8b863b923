package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.dims.Cdc
import graft.sinks.IdempotentFileSink

/** CDC arriving as a STREAM: foreachBatch applies [[Cdc.applyChanges]]
  * per micro-batch and lands the FULL next snapshot through
  * [[IdempotentFileSink]]'s batch-id protocol — each committed batch dir
  * is the snapshot AS OF that micro-batch (the sink's append semantics
  * become version history; the latest committed batch is current state).
  * Pins: sequential per-batch applies converge to the one-shot batch
  * apply of the whole feed (the equivalence that licenses replaying a
  * CDC backlog in any batching), a replayed micro-batch is a no-op
  * (exactly-once snapshots over at-least-once delivery), and earlier
  * versions stay readable (the CDC analog of ledger time travel).
  */
class StreamingCdcSpec extends AnyFunSuite with SparkSpec {

  private val Key = Seq("k")
  private val Attrs = Seq("v")

  private def emptySnap = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("k", "v")
  }

  /** Current snapshot = the latest committed batch dir (empty before
    * the first commit).
    */
  private def currentSnap(root: String): DataFrame = {
    val committed = IdempotentFileSink.committedBatches(root)
    if (committed.isEmpty) emptySnap
    else IdempotentFileSink.read(spark, root)
      .filter(col("batch") === committed.max).drop("batch")
  }

  private def applyAndLand(root: String)(batch: DataFrame, id: Long): Unit = {
    val next = Cdc.applyChanges(currentSnap(root), batch, Key, Attrs, "op", "seq")
    IdempotentFileSink.writeBatch(next, root, id)
  }

  private def snapRows(df: DataFrame): Set[(Long, String)] =
    df.select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("streamed per-batch applies ≡ one-shot apply; versions readable; replay no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_stream").toString

    val feed = MemoryStream[(Long, String, String, Long)]
    val q = feed.toDF().toDF("k", "v", "op", "seq")
      .writeStream
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation", s"$root/_ckpt")
      .foreachBatch(applyAndLand(root) _)
      .start()

    // batch 0: initial inserts
    feed.addData((1L, "a", "I", 1L), (2L, "b", "I", 2L))
    q.processAllAvailable()
    assert(snapRows(currentSnap(root)) == Set((1L, "a"), (2L, "b")))

    // batch 1: update 1, delete 2
    feed.addData((1L, "a2", "U", 3L), (2L, "", "D", 4L))
    q.processAllAvailable()
    assert(snapRows(currentSnap(root)) == Set((1L, "a2")))

    // batch 2: resurrect 2, update 1 again, insert 3
    feed.addData((2L, "b2", "I", 5L), (1L, "a3", "U", 6L), (3L, "c", "I", 7L))
    q.processAllAvailable()
    q.stop()
    val streamed = snapRows(currentSnap(root))
    assert(streamed == Set((1L, "a3"), (2L, "b2"), (3L, "c")))

    // equivalence: the one-shot apply of the WHOLE feed on an empty
    // snapshot lands on the same state — batching is semantics-free
    val all = Seq(
      (1L, "a", "I", 1L), (2L, "b", "I", 2L),
      (1L, "a2", "U", 3L), (2L, "", "D", 4L),
      (2L, "b2", "I", 5L), (1L, "a3", "U", 6L), (3L, "c", "I", 7L))
      .toDF("k", "v", "op", "seq")
    assert(snapRows(Cdc.applyChanges(emptySnap, all, Key, Attrs, "op", "seq"))
      == streamed)

    // version history: the batch-1 snapshot is still what it was
    val asOf1 = IdempotentFileSink.read(spark, root)
      .filter(col("batch") === 1L).drop("batch")
    assert(snapRows(asOf1) == Set((1L, "a2")))

    // at-least-once replay of the last micro-batch: the sink's batch-id
    // protocol makes it a no-op — same snapshot, same committed set
    val committedBefore = IdempotentFileSink.committedBatches(root)
    applyAndLand(root)(
      Seq((2L, "b2", "I", 5L), (1L, "a3", "U", 6L), (3L, "c", "I", 7L))
        .toDF("k", "v", "op", "seq"),
      committedBefore.max)
    assert(IdempotentFileSink.committedBatches(root) == committedBefore)
    assert(snapRows(currentSnap(root)) == streamed)
  }
}
