package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.9: the reference is batch-
  * only, so this is the engine's forward-looking stream path; shapes mirror
  * the batch event queries so the SAME DuckDB oracles gate them).
  *
  * Batch/stream parity is the design invariant: `eventsStream` exposes the
  * events table as a file stream with the identical schema/column names the
  * batch loader produces, every transform is expressed on that shared
  * shape, and `runToBatch` drains the stream with `Trigger.AvailableNow`
  * into a memory sink — finite input, deterministic output, so streaming
  * operators sit behind the same correctness gate as batch ones.
  *
  * At scale the same code runs continuously: swap `AvailableNow` for a
  * processing-time trigger and the memory sink for kafka/parquet, and add
  * watermarks (complete-mode aggs here have no watermark requirement; the
  * append-mode + watermark path is exercised in the streaming spec).
  */
object StreamOps {

  /** `events.parquet` schema with TIMESTAMP(NANOS) read as raw nanos
    * (mirrors [[graft.Tables.events]]).
    */
  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val nameCounter = new AtomicInteger()

  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The file stream source needs a DIRECTORY basePath; select the one
    // table file with a glob filter.
    spark.readStream.schema(EventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumnRenamed("ts", "ts_ns")
  }

  /** Drain a finite stream through a memory sink and return the result as
    * a batch DataFrame (complete mode: aggregation states emitted fully).
    */
  def runToBatch(stream: DataFrame, mode: String = "complete"): DataFrame = {
    val name = s"graft_stream_${nameCounter.incrementAndGet()}"
    val q = stream.writeStream
      .format("memory").queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    stream.sparkSession.table(name)
  }
}

/** Typed event row shared by the stateful operators. */
final case class Ev(event_id: Long, ts_ns: Long, user_id: Long,
    event_type: String, value: Double, props: String)

/** One closed session: start time, event count, exact 2-dp value total. */
final case class SessionRow(user_id: Long, session_idx: Long,
    session_start: Long, n: Long, total: Double)

/** Custom state logic on `KeyValueGroupedDataset` — the
  * `flatMapGroupsWithState` sessionizer. Runs identically over a batch
  * Dataset (state starts empty, one invocation per key) and a stream
  * (incremental), so the batch window-function sessionizer (q35) oracles
  * this implementation too (q38).
  */
object StatefulSessionize {

  /** Split each user's events into sessions separated by > `gapNs`.
    * Totals use exact decimal(2) accumulation matching
    * `CAST(SUM(CAST(v AS DECIMAL(14,2))) AS DOUBLE)`.
    */
  def sessionize(events: Dataset[Ev], gapNs: Long): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, SessionRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Ev], _) =>
          val sorted = it.toVector.sortBy(e => (e.ts_ns, e.event_id))
          if (sorted.isEmpty) Iterator.empty
          else {
            val sessions = Vector.newBuilder[SessionRow]
            var idx = 0L
            var start = 0L
            var prev = Long.MinValue
            var n = 0L
            var total = BigDecimal(0)
            def close(): Unit =
              if (n > 0) sessions += SessionRow(uid, idx, start, n, total.toDouble)
            sorted.foreach { e =>
              if (prev == Long.MinValue || e.ts_ns - prev > gapNs) {
                close()
                idx += 1; start = e.ts_ns; n = 0; total = BigDecimal(0)
              }
              prev = e.ts_ns
              n += 1
              total += BigDecimal(e.value)
                .setScale(2, scala.math.BigDecimal.RoundingMode.HALF_UP)
            }
            close()
            sessions.result().iterator
          }
      }
  }
}
