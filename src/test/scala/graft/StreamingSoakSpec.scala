package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryProgress
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Steady-state soak of the stateful streaming family on one RocksDB
  * checkpoint: ~100 sustained micro-batches through a CHAINED pipeline —
  * watermarked dedup → time-interval left-outer join → tumbling-window
  * aggregation — the production shape where every stateful operator's
  * state lives in the same query's checkpoint and the watermark
  * propagates through all of them.
  *
  * CheckpointRecoverySpec proves restart; RocksDbStateSpec proves
  * provider-swap output equality on short drains. What neither proves is
  * the 100 TB OPERATIONAL mode: a stream that runs for thousands of
  * batches, where an eviction bug (state grows without bound) or a
  * commit-path bug (per-batch latency grows with accumulated state or
  * checkpoint history) only surfaces after many batches. This soak pins
  * both invariants:
  *
  *   - STATE PLATEAUS: every stateful operator's `numRowsTotal` is flat
  *     from mid-run to end-of-run and sits far below total rows ingested
  *     (= watermark eviction bounds state by the time horizon, not by
  *     stream lifetime). The input is deterministic (fixed per-batch row
  *     shape, event time advancing one minute per batch), so state
  *     volume at any batch is deterministic and the asserts can be tight.
  *   - COMMIT LATENCY STAYS FLAT: the median micro-batch duration over
  *     the last third of the run is bounded by a small multiple of the
  *     median over the first third (medians over ~30 batches ride out
  *     scheduler noise on a shared box).
  *
  * Batch count is env-tunable (`GRAFT_SOAK_BATCHES`, default 100) so a
  * longer soak needs no code change.
  */
class StreamingSoakSpec extends AnyFunSuite with SparkSpec {

  private val Batches = {
    val b = sys.env.get("GRAFT_SOAK_BATCHES").map(_.toInt).getOrElse(100)
    // below ~20 the thirds-based latency windows degenerate (empty
    // median → opaque crash); the plateau asserts need the watermark to
    // have evicted for a while anyway
    require(b >= 20, s"GRAFT_SOAK_BATCHES=$b — the soak needs >= 20 batches")
    b
  }

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("t", TimestampType),
    StructField("value", DoubleType)))

  private val Minute = 60L * 1000 * 1000 // µs

  /** Batch `i`'s rows: 8 clicks (one per user, unique ids), 4 in-batch
    * duplicate clicks (same event_id re-sent — dedup state's work), and
    * 4 purchases that land inside the join's 2-minute window. Event time
    * advances one minute per batch, so the 2-minute watermark horizon
    * covers ~3 batches of state at any moment.
    */
  private def batchRows(i: Long): Seq[(Long, Long, String, java.sql.Timestamp, Double)] = {
    val base = (i + 1) * Minute
    def ts(off: Long) = new java.sql.Timestamp((base + off) / 1000)
    val clicks = (0L until 8L).map(u =>
      (i * 100 + u, u, "click", ts(u * 1000), 1.0))
    val dups = (0L until 4L).map(u =>
      (i * 100 + u, u, "click", ts(u * 1000), 1.0))
    val purchases = (0L until 4L).map(u =>
      (i * 100 + 50 + u, u, "purchase", ts(30 * 1000 + u * 1000), 5.0))
    clicks ++ dups ++ purchases
  }

  test(s"$Batches-batch chained stateful soak on RocksDB: state plateaus, latency flat") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_soak").toString
    val (src, ckpt) = (s"$root/src", s"$root/ckpt")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))

    val confs = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      // one data batch per fed file — no watermark-only batches muddying
      // the per-batch progress series (eviction runs inside data batches
      // here, which is the continuous-operation shape anyway)
      "spark.sql.streaming.noDataMicroBatches.enabled" -> "false",
      // state-volume-sized shuffle (see StreamOps.runToBatch): state is
      // a few hundred rows; 2 store instances per operator keeps the
      // per-batch commit cost at its floor so 100 batches stay fast
      "spark.sql.shuffle.partitions" -> "2")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }

    try {
      // ---- the chained pipeline (one checkpoint, three stateful ops) ----
      val clicks = spark.readStream.schema(schema).parquet(src)
        .filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
          col("t").as("c_t"))
        .withWatermark("c_t", "2 minutes")
        .dropDuplicatesWithinWatermark(Seq("c_id"))
      val purchases = spark.readStream.schema(schema).parquet(src)
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("t").as("p_t"))
        .withWatermark("p_t", "2 minutes")
      val joined = clicks.join(purchases,
        col("c_user") === col("p_user") &&
          col("p_t") >= col("c_t") &&
          col("p_t") <= col("c_t") + expr("INTERVAL 2 MINUTES"),
        "leftOuter")
      val agg = joined
        .groupBy(window(col("c_t"), "1 minute"), col("c_user"))
        .agg(count(lit(1)).as("n"), count(col("p_id")).as("n_matched"))

      val q = agg.writeStream
        .format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()

      // ---- sustained drive: one file → one micro-batch, Batches times ----
      val progress = ArrayBuffer[StreamingQueryProgress]()
      try {
        (0L until Batches.toLong).foreach { i =>
          batchRows(i).toDF("event_id", "user_id", "event_type", "t", "value")
            .coalesce(1).write.mode("append").parquet(src)
          q.processAllAvailable()
          val p = q.lastProgress
          if (p != null && p.numInputRows > 0) progress += p
        }
      } finally q.stop()

      assert(progress.size >= Batches * 9 / 10,
        s"captured ${progress.size} data batches of $Batches — the 1 file : " +
          "1 batch drive assumption broke")

      // ---- state plateaus: flat mid-run → end, and far below ingested ----
      val mid = progress(progress.size / 2)
      val last = progress.last
      // the chain really is dedup → join → agg: three stateful operators
      // sharing the one checkpoint (names from StateOperatorProgress)
      val ops = last.stateOperators.map(_.operatorName).toSeq
      assert(ops.length == 3, s"expected 3 stateful operators, got $ops")
      assert(ops.exists(_.toLowerCase.contains("dedup")) &&
        ops.exists(_.toLowerCase.contains("join")) &&
        // streaming aggregation's state op is named stateStoreSave
        ops.exists(_.toLowerCase.contains("statestoresave")),
        s"unexpected stateful operator set: $ops")
      assert(last.stateOperators.length == mid.stateOperators.length)
      last.stateOperators.zip(mid.stateOperators).foreach { case (l, m) =>
        assert(l.numRowsTotal <= (m.numRowsTotal * 1.3).toLong + 20,
          s"${l.operatorName}: state grew ${m.numRowsTotal} -> " +
            s"${l.numRowsTotal} between mid-run and end — eviction is not " +
            "bounding state")
      }
      val finalState = last.stateOperators.map(_.numRowsTotal).sum
      val ingested = progress.map(_.numInputRows).sum
      assert(finalState * 4 < ingested,
        s"final state $finalState vs $ingested ingested — state scales " +
          "with stream lifetime, not the watermark horizon")
      // eviction actually ran in every stateful operator
      last.stateOperators.zipWithIndex.foreach { case (op, idx) =>
        val removed = progress.map(_.stateOperators(idx).numRowsRemoved).sum
        assert(removed > 0, s"${op.operatorName}: no state row was ever evicted")
      }

      // ---- commit latency flat: last third vs first third medians ----
      def median(xs: Seq[Long]): Long = {
        val s = xs.sorted
        s(s.size / 2)
      }
      val durations = progress.map(_.durationMs.get("triggerExecution").toLong).toSeq
      val third = durations.size / 3
      val (early, late) = (durations.slice(3, third), durations.takeRight(third))
      assert(median(late) <= median(early) * 3 + 100,
        s"per-batch latency grew: early median ${median(early)} ms -> " +
          s"late median ${median(late)} ms over ${durations.size} batches")
    } finally {
      prior.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
