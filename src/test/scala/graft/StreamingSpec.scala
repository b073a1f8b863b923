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

  test("watermarked interval join: in-range matches emit, expired state can't") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val left = MemoryStream[(java.sql.Timestamp, Long, Long)]  // (t, user, pid)
    val right = MemoryStream[(java.sql.Timestamp, Long, Long)] // (t, user, cid)
    val p = left.toDF().toDF("p_t", "user_id", "purchase_id")
      .withWatermark("p_t", "30 minutes")
    val c = right.toDF().toDF("c_t", "c_user", "click_id")
      .withWatermark("c_t", "30 minutes")
    val joined = p.join(c,
      col("user_id") === col("c_user") &&
        col("c_t") <= col("p_t") &&
        col("c_t") > col("p_t") - expr("INTERVAL 30 MINUTES"))
      .select("purchase_id", "click_id")
    val q = joined.writeStream.format("memory")
      .queryName("wm_ivj").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

    // batch 1: click at 10:00, purchase at 10:10 → in range, emits
    right.addData((ts(10, 0), 7L, 100L))
    left.addData((ts(10, 10), 7L, 1L))
    q.processAllAvailable()
    // batch 2: advance both watermarks far past the click's horizon
    right.addData((ts(14, 0), 8L, 101L))
    left.addData((ts(14, 0), 8L, 2L))
    q.processAllAvailable()
    // batch 3: a purchase that WOULD range-match the 10:00 click had the
    // state lived forever — but 10:25 is behind the 13:30 watermark, so
    // the evicted click cannot produce it (this is the state bound)
    left.addData((ts(10, 25), 7L, 3L))
    q.processAllAvailable()
    val got = spark.table("wm_ivj")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(got.contains((1L, 100L)))  // in-range pair emitted
    assert(got.contains((2L, 101L)))  // same-instant pair emitted
    assert(!got.contains((3L, 100L))) // expired state evicted, no match
  }

  test("streaming session_window (watermarked append) ≡ batch sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // two users, a 5-min gap: u1 {1,3 | 15,16}, u2 {2 | 30}
    val events = Seq((1L, ts(1)), (1L, ts(3)), (2L, ts(2)),
      (1L, ts(15)), (1L, ts(16)), (2L, ts(30)))
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = input.toDF().toDF("u", "t")
      .withWatermark("t", "0 seconds")
      .groupBy(col("u"), session_window(col("t"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("u"), col("session_window.start").as("start"), col("n"))
    val q = sessions.writeStream.format("memory")
      .queryName("sw_stream").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    // feed everything, then a far-future event to close all sessions
    input.addData(events: _*)
    q.processAllAvailable()
    input.addData((99L, ts(59)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sw_stream")
      .filter(col("u") =!= 99L)
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    // batch reference over the same rows
    val batch = events.toDF("u", "t")
      .groupBy(col("u"), session_window(col("t"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("u"), col("session_window.start").as("start"), col("n"))
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    assert(got === batch)
    assert(batch === Set((1L, ts(1), 2L), (1L, ts(15), 2L), (2L, ts(2), 1L),
      (2L, ts(30), 1L)))
  }

  test("StatefulSessionize carries open sessions across micro-batches") {
    import graft.streaming.{Ev, SessionRow, StatefulSessionize}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val gapNs = 30L * 60 * 1000 * 1000 * 1000
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts_ns", col("ts_ns") - col("ts_ns") % 1000)
      .as[Ev].collect().toSeq
    assert(events.nonEmpty)

    // the ground truth: one-shot batch sessionization of the same events
    val expected = StatefulSessionize
      .sessionize(events.toDS(), gapNs).collect().toSet

    // same events in global event-time order, split across 4 micro-batches
    // — sessions WILL straddle the cut points, which is the behavior under
    // test (a stateless per-batch sessionizer fragments them)
    val sorted = events.sortBy(e => (e.ts_ns, e.event_id))
    val chunks = sorted.grouped((sorted.size + 3) / 4).toSeq
    assert(chunks.size >= 3)

    val input = MemoryStream[Ev]
    val q = StatefulSessionize.sessionize(input.toDS(), gapNs)
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()

    val got = StatefulSessionize
      .compact(spark.table("sess_test").as[SessionRow]).collect().toSet
    assert(got == expected)
  }

  test("dropDuplicatesWithinWatermark caps state: in-horizon dups drop, expired keys re-emit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val dd = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("k"))
    val q = dd.writeStream.format("memory")
      .queryName("wmdd_test").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

    input.addData((ts(1), "a"), (ts(2), "a"), (ts(3), "b"))
    q.processAllAvailable()
    input.addData((ts(5), "a")) // within horizon → duplicate, dropped
    q.processAllAvailable()
    input.addData((ts(40), "x")) // advances watermark far past a's entry
    q.processAllAvailable()
    input.addData((ts(41), "a")) // a's state expired → emitted AGAIN
    q.processAllAvailable()
    q.stop()

    val ks = spark.table("wmdd_test").select("k").as[String].collect().toSeq
    // exactly-once per key within the watermark horizon; the re-emission
    // after expiry is the price of bounded state (vs q65's unbounded
    // exact dedup) — the documented trade-off, pinned here
    assert(ks.sorted == Seq("a", "a", "b", "x"))
  }

  test("StatefulSessionize absorbs a pre-start late event with exact session_start") {
    import graft.streaming.{Ev, SessionRow, StatefulSessionize}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val gapNs = 10000L
    def ev(id: Long, ts: Long) = Ev(id, ts, 1L, "x", 1.0, "")
    // batch 1 opens a session at ts=1000; batch 2 delivers a LATE event at
    // ts=500 — older than the open session's start but within gapNs of its
    // last timestamp. It must merge AND lower session_start to 500.
    val batch1 = Seq(ev(1, 1000), ev(2, 2000))
    val batch2 = Seq(ev(3, 500), ev(4, 3000))

    val input = MemoryStream[Ev]
    val q = StatefulSessionize.sessionize(input.toDS(), gapNs)
      .writeStream.format("memory").queryName("late_test")
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    Seq(batch1, batch2).foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()

    val got = StatefulSessionize
      .compact(spark.table("late_test").as[SessionRow]).collect().toSet
    // ground truth: the one-shot batch sessionization of all four events
    val expected = StatefulSessionize
      .sessionize((batch1 ++ batch2).toDS(), gapNs).collect().toSet
    assert(got == expected)
    assert(got == Set(SessionRow(1L, 1L, 500L, 4L, 4.0)))
  }
}
