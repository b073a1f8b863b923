package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.dims.{Cdc, Scd2}
import graft.streaming.StreamOps

/** CDC feed → TYPE-2 HISTORY ([[Scd2.applyCdc]] + the streaming
  * composition [[StreamOps.scd2HistorySink]]). Laws pinned:
  *
  *  - the streamed per-batch history equals the batch-sequential fold of
  *    the same batches (foreachBatch adds nothing but delivery);
  *  - the history's CURRENT rows always equal [[Cdc.applyChanges]]
  *    folded over the same batches — the keep-history merge is a strict
  *    superset view of the current-state mirror;
  *  - replaying a batch is a no-op at BOTH layers: the idempotent sink
  *    skips a committed batch id, and a forced re-merge of the same net
  *    effects versions nothing;
  *  - deletes close without reopening (the key keeps its history, has no
  *    current row), and a later upsert resurrects as a fresh version.
  */
class CdcScd2Spec extends AnyFunSuite with SparkSpec {

  private val Key = Seq("k")
  private val Attrs = Seq("v")

  private def feedDf(rows: Seq[(Long, String, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "v", "op", "seq")
  }

  // b0: initial inserts; b1: update 1 + delete 2 (out-of-order per-key
  // seqs on 1: the U@4 must beat the stale U@3); b2: resurrect 2,
  // re-assert 1 unchanged (must NOT version), insert 3
  private val b0 = Seq((1L, "a", "I", 1L), (2L, "b", "I", 2L))
  private val b1 = Seq((1L, "stale", "U", 3L), (1L, "a2", "U", 4L),
    (2L, "", "D", 5L))
  private val b2 = Seq((2L, "back", "I", 6L), (1L, "a2", "U", 7L),
    (3L, "c", "I", 8L))

  private def histRows(df: DataFrame): Set[(Long, String, Long, Option[Long], Boolean)] =
    df.select("k", "v", "valid_from", "valid_to", "is_current").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4))).toSet

  private def currentRows(df: DataFrame): Set[(Long, String)] =
    df.filter(col("is_current")).select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("applyCdc: delete closes, resurrect reopens, unchanged never versions; current ≡ applyChanges") {
    val d0 = Scd2.applyCdc(Scd2.emptyDim(feedDf(b0), Key, Attrs),
      feedDf(b0), Key, Attrs, "op", "seq", 10L)
    val d1 = Scd2.applyCdc(d0, feedDf(b1), Key, Attrs, "op", "seq", 20L)
    val d2 = Scd2.applyCdc(d1, feedDf(b2), Key, Attrs, "op", "seq", 30L)

    assert(histRows(d2) == Set(
      (1L, "a", 10L, Some(20L), false),   // changed at 20
      (1L, "a2", 20L, None, true),        // b2's re-assert did NOT version
      (2L, "b", 10L, Some(20L), false),   // deleted at 20: closed, no reopen
      (2L, "back", 30L, None, true),      // resurrected as a fresh version
      (3L, "c", 30L, None, true)))        // plain insert

    // the mirror law, batch by batch
    var snap = feedDf(b0).select("k", "v").filter(lit(false))
    for (b <- Seq(b0, b1, b2))
      snap = Cdc.applyChanges(snap, feedDf(b), Key, Attrs, "op", "seq")
    assert(currentRows(d2) == snap.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet)

    // value-level replay idempotence: re-merging b2 at its own effTs
    // versions nothing
    val replay = Scd2.applyCdc(d2, feedDf(b2), Key, Attrs, "op", "seq", 30L)
    assert(histRows(replay) == histRows(d2))
    // and a replayed DELETE of an already-deleted key is a no-op too
    val delReplay = Scd2.applyCdc(d2,
      feedDf(Seq((2L, "", "D", 5L), (9L, "", "D", 5L))).filter(col("k") === 9L),
      Key, Attrs, "op", "seq", 40L)
    assert(histRows(delReplay) == histRows(d2))
  }

  test("streamed history ≡ batch-sequential fold; committed-batch replay writes nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_scd2").toString
    val sink = StreamOps.scd2HistorySink(root, Key, Attrs, "op", "seq",
      effTsOf = id => (id + 1) * 10)

    val feed = MemoryStream[(Long, String, String, Long)]
    val q = feed.toDF().toDF("k", "v", "op", "seq")
      .writeStream
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation", s"$root/_ckpt")
      .foreachBatch(sink)
      .start()
    for (b <- Seq(b0, b1, b2)) { feed.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val committed = graft.sinks.IdempotentFileSink.committedBatches(spark, root)
    assert(committed == Seq(0L, 1L, 2L))
    val streamed = graft.sinks.IdempotentFileSink.read(spark, root)
      .filter(col("batch") === 2L).drop("batch")

    val batchFold = Seq(b1, b2).zipWithIndex.foldLeft(
      Scd2.applyCdc(Scd2.emptyDim(feedDf(b0), Key, Attrs),
        feedDf(b0), Key, Attrs, "op", "seq", 10L)) { case (d, (b, i)) =>
      Scd2.applyCdc(d, feedDf(b), Key, Attrs, "op", "seq", (i + 2) * 10L)
    }
    assert(histRows(streamed) == histRows(batchFold))
    // earlier history versions stay readable (time travel over the history)
    assert(histRows(graft.sinks.IdempotentFileSink.read(spark, root)
      .filter(col("batch") === 0L).drop("batch")) ==
      Set((1L, "a", 10L, None, true), (2L, "b", 10L, None, true)))

    // sink-level replay: same batch id again → marker short-circuits,
    // bytes under batch=2 untouched
    val dir = new java.io.File(s"$root/batch=2")
    val before = dir.listFiles().map(f => f.getName -> f.lastModified()).toMap
    sink(feedDf(b2), 2L)
    val after = dir.listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(after == before, "replayed committed batch must write nothing")
  }
}
