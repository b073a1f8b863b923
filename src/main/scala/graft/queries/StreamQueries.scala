package graft.queries

import org.apache.spark.sql.functions._

import graft.Sizing
import graft.functions.Exact
import graft.streaming.{Ev, SessionRow, StatefulSessionize, StreamOps, TwsSessionize}

/** Streaming operators behind the same DuckDB gate as batch: the stream
  * runs to completion over the finite events table (AvailableNow + memory
  * sink), so its output must equal the batch formulation exactly.
  */
object StreamQueries {

  private val Hour = 3600L * 1000 * 1000 * 1000
  private val SessionGap = 30L * 60 * 1000 * 1000 * 1000

  val defs: Seq[QueryDef] = Seq(

    // ---- streaming tumbling-window aggregation (same oracle as q33) ------
    QueryDef.sql(
      "q36_stream_tumbling",
      s"""SELECT (epoch_ns(ts) // $Hour) * $Hour AS win_start, event_type,
         |  COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
      val agg = StreamOps.eventsStream(s, d)
        .groupBy(
          (col("ts_ns") - col("ts_ns") % Hour).as("win_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), Exact.dsum(col("value"), 14, 2).as("total"))
      // state = live windows × types, tiny: 8 state partitions (see
      // runToBatch scaladoc for the measured per-store commit cost)
      StreamOps.runToBatch(agg, statePartitions = Some(8))
        .orderBy("win_start", "event_type")
    },

    // ---- stream ⋈ static broadcast dimension + aggregation ---------------
    QueryDef.sql(
      "q37_stream_join_static",
      """SELECT event_type, CAST(length(event_type) AS BIGINT) AS weight,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1""") { (s, d) =>
      val dim = graft.Tables.events(s, d)
        .select("event_type").distinct()
        .withColumn("weight", length(col("event_type")).cast("long"))
      val joined = StreamOps.eventsStream(s, d)
        .join(broadcast(dim), "event_type")
        .groupBy("event_type", "weight")
        .agg(count(lit(1)).as("n"), Exact.dsum(col("value"), 14, 2).as("total"))
      StreamOps.runToBatch(joined, statePartitions = Some(8)).orderBy("event_type")
    },

    // ---- stream ⋈ stream interval join (attribution shape) ---------------
    // every purchase joined to the same user's clicks in the preceding
    // 30 minutes; finite input + AvailableNow ⇒ deterministic inner join
    QueryDef.sql(
      "q39b_stream_stream_join",
      s"""SELECT p.event_id AS purchase_id, c.event_id AS click_id,
         |       p.user_id,
         |       epoch_ns(p.ts) AS p_tus, epoch_ns(c.ts) AS c_tus
         |FROM events p JOIN events c
         |  ON p.user_id = c.user_id
         | AND p.event_type = 'purchase' AND c.event_type = 'click'
         | AND epoch_ns(c.ts) <= epoch_ns(p.ts)
         | AND epoch_ns(c.ts) > epoch_ns(p.ts) - ${30L * 60 * 1000 * 1000 * 1000}
         |ORDER BY purchase_id, click_id""") { (s, d) =>
      // truncate to µs BEFORE joining so boundary comparisons happen in
      // the same domain DuckDB sees (its reader truncates nanos). The
      // join range condition runs on WATERMARKED event-time columns, not
      // raw longs: an interval join whose range Spark can't tie to a
      // watermark keeps BOTH sides' state forever — the one unbounded-
      // state shape in the repo before this. With both sides watermarked
      // 30 min, clicks older than (watermark − 30 min) are evicted every
      // batch; inner interval joins emit eagerly, so on a time-ordered
      // replay (this source: one AvailableNow batch) the result equals
      // the unwatermarked join's. Under multi-batch replay, events behind
      // the 30-min horizon are dropped — that loss bound IS the contract
      // that keeps state finite (pinned by the 3-batch StreamingSpec
      // case); an unbounded exact join of out-of-order history is a
      // batch job, not a stream. µs → timestamp via timestamp_micros is
      // 1:1 (integer div of the already-µs-truncated ns; never `/` —
      // double division corrupts epoch nanos above 2^53).
      val purchases = StreamOps.eventsStream(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          (col("ts_ns") - col("ts_ns") % 1000).as("p_ts"))
        .withColumn("p_t", timestamp_micros(expr("p_ts div 1000")))
        .withWatermark("p_t", "30 minutes")
      val clicks = StreamOps.eventsStream(s, d)
        .filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("c_user"),
          (col("ts_ns") - col("ts_ns") % 1000).as("c_ts"))
        .withColumn("c_t", timestamp_micros(expr("c_ts div 1000")))
        .withWatermark("c_t", "30 minutes")
      val joined = purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_t") <= col("p_t") &&
          col("c_t") > col("p_t") - expr("INTERVAL 30 MINUTES"))
      // inner interval joins emit eagerly — the trailing no-data batch
      // would only evict state the finite drain is about to discard
      // (measured: +4 s, see StreamOps.runToBatch)
      StreamOps.runToBatch(joined, mode = "append", noDataBatches = false,
          statePartitions = Some(8)) // ~40k state keys: commit cost, not CPU, dominates
        .select(col("purchase_id"), col("click_id"), col("user_id"),
          col("p_ts").as("p_tus"), col("c_ts").as("c_tus"))
        .orderBy("purchase_id", "click_id")
    },

    // ---- stream ⋈ stream LEFT OUTER interval join ------------------------
    // q39b's attribution join, outer form: every purchase emits, clicks
    // or not. The hard streaming part is the NULL side: an unmatched
    // purchase can only be declared unmatched once the joint watermark
    // (min over both inputs of max-event-time − 30 min) passes its
    // timestamp — before that, a matching click could still arrive. So
    // the null rows emit from state EVICTION, not from the join itself,
    // and the trailing no-data batch must run (noDataBatches = true
    // here, unlike inner q39b) to advance the watermark and flush them.
    // Purchases inside the last 30 min of the stream are never
    // finalized by an AvailableNow drain; the query therefore DECLARES
    // a finalization horizon — only purchases ≥ 31 min behind the joint
    // max are reported — and the oracle applies the identical cut. The
    // 1-min margin keeps the gate off the exact eviction boundary
    // (strict `<` vs `<=` at the watermark line); rows are filtered,
    // never re-derived, so everything reported came through the
    // streaming state machine. The horizon itself is 1-row metadata
    // from a batch scan (like q37's static dim), not a stream action.
    QueryDef.sql(
      "q99_stream_outer_join",
      s"""WITH p AS (SELECT event_id, user_id, epoch_ns(ts) AS tns
         |           FROM events WHERE event_type = 'purchase'),
         |c AS (SELECT event_id, user_id, epoch_ns(ts) AS tns
         |      FROM events WHERE event_type = 'click'),
         |h AS (SELECT LEAST((SELECT max(tns) FROM p),
         |                   (SELECT max(tns) FROM c))
         |             - ${31L * 60 * 1000 * 1000 * 1000} AS cut)
         |SELECT p.event_id AS purchase_id, c.event_id AS click_id,
         |       p.user_id, p.tns AS p_tus, c.tns AS c_tus
         |FROM p LEFT JOIN c
         |  ON p.user_id = c.user_id
         | AND c.tns <= p.tns
         | AND c.tns > p.tns - ${30L * 60 * 1000 * 1000 * 1000}
         |WHERE p.tns <= (SELECT cut FROM h)
         |ORDER BY purchase_id, click_id NULLS FIRST""") { (s, d) =>
      import s.implicits._
      // joint-watermark horizon: µs-truncated to match the join's time
      // domain (see q39b's truncation note). The same one-pass scan also
      // counts the join-state rows (an AvailableNow drain holds every
      // purchase+click in state until the eviction batch), so the
      // stateful shuffle below is sized from MEASURED volume.
      val h = graft.Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .groupBy("event_type")
        .agg(max(col("ts_ns") - col("ts_ns") % 1000).as("mx"),
          count(lit(1)).as("n"))
        .agg(min("mx").as("mx"), sum("n").as("n")).head()
      val cut = h.getLong(0) - 31L * 60 * 1000 * 1000 * 1000
      val stateRows = h.getLong(1)
      val purchases = StreamOps.eventsStream(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          (col("ts_ns") - col("ts_ns") % 1000).as("p_ts"))
        .withColumn("p_t", timestamp_micros(expr("p_ts div 1000")))
        .withWatermark("p_t", "30 minutes")
      val clicks = StreamOps.eventsStream(s, d)
        .filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("c_user"),
          (col("ts_ns") - col("ts_ns") % 1000).as("c_ts"))
        .withColumn("c_t", timestamp_micros(expr("c_ts div 1000")))
        .withWatermark("c_t", "30 minutes")
      val joined = purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_t") <= col("p_t") &&
          col("c_t") > col("p_t") - expr("INTERVAL 30 MINUTES"),
        "leftOuter")
      // State-volume-sized via the shared graft.Sizing.measuredWidth rule
      // (the CC loop's measured-size rule, stateful edition): the outer
      // join pays TWO stateful batches (data + watermark-advance
      // eviction, which must run here — the null rows emit from
      // eviction), so per-store commit fixed costs count double.
      // Measured at sf0.1, summed commit times per batch: ~3.0 s at 8
      // partitions, ~1.1 s at 4, ~0.5 s at 2, for the same 39,947 state
      // rows — ~20k state rows per store amortizes the commit without
      // starving the join (2.80 -> 2.54 s quiet at sf0.1), and a 10x
      // corpus gets 10x stores instead of 10x-deeper ones, capped at the
      // session's (cluster-sized) shuffle width.
      StreamOps.runToBatch(joined, mode = "append",
          statePartitions = Some(Sizing.measuredWidth(s, stateRows, 20000L)))
        .filter(col("p_ts") <= cut)
        .select(col("purchase_id"), col("click_id"), col("user_id"),
          col("p_ts").as("p_tus"), col("c_ts").as("c_tus"))
        .orderBy("purchase_id", "click_id")
    },

    // ---- streaming exact dedup (training-pipeline shape) -----------------
    // Stateful key dedup over the stream: each (user_id, event_type) key
    // is emitted exactly once, on first sight — the streaming twin of the
    // batch DISTINCT the oracle runs. At scale the state store holds one
    // entry per key (keys, not rows); with event-time bounds the
    // watermarked variant (`dropDuplicatesWithinWatermark`) caps state.
    QueryDef.sql(
      "q65_stream_dedup",
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""") { (s, d) =>
      val dd = StreamOps.eventsStream(s, d)
        .select("user_id", "event_type")
        .dropDuplicates(Seq("user_id", "event_type"))
      // first-sight emission is eager; unwatermarked dedup state never
      // evicts, so the no-data batch is pure commit overhead
      StreamOps.runToBatch(dd, mode = "append", noDataBatches = false,
          statePartitions = Some(8))
        .orderBy("user_id", "event_type")
    },

    // ---- stateful sessionization (same oracle as q35's window form) ------
    QueryDef.sql(
      "q38_stateful_sessionize",
      sessionOracle) { (s, d) =>
      import s.implicits._
      // µs truncation for oracle parity (DuckDB reads TIMESTAMP(NANOS)
      // truncated to micros); the operator itself is precision-agnostic.
      val evs = graft.Tables.events(s, d)
        .withColumn("ts_ns", col("ts_ns") - col("ts_ns") % 1000)
        .as[Ev]
      StatefulSessionize.sessionize(evs, SessionGap)
        .toDF()
        .orderBy("user_id", "session_idx")
    },

    // ---- the same sessionizer on transformWithState (Spark 4 API) --------
    // q38's fold on the successor stateful API: named typed state
    // (ValueState[OpenSession]) instead of one monolithic state object,
    // per-state TTL available, and the RocksDB provider REQUIRED — so
    // this runs as a real stream on the production state path end to
    // end. Same fold function, same oracle: identical by construction.
    QueryDef.sql(
      "q103_tws_sessionize",
      sessionOracle) { (s, d) =>
      import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
      import s.implicits._
      val evs = StreamOps.eventsStream(s, d)
        .withColumn("ts_ns", col("ts_ns") - col("ts_ns") % 1000)
        .as[Ev]
      val sess = evs.groupByKey(_.user_id)
        .transformWithState(new TwsSessionize(SessionGap),
          TimeMode.None(), OutputMode.Update())
      val drained = StreamOps.runToBatch(sess.toDF(), mode = "update",
        statePartitions = Some(8),
        extraConfs = Seq("spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
      StatefulSessionize.compact(drained.as[SessionRow])
        .toDF()
        .orderBy("user_id", "session_idx")
    },

    // ---- streaming quantile state (q137 maintained by foreachBatch) ------
    // The q137 mergeable histogram driven from the event STREAM: each
    // micro-batch folds its own (type, bin, cnt) rows through the
    // idempotent batch-id sink — exactly-once state over at-least-once
    // delivery — and the read-time merge + interpolation is IDENTICAL to
    // the batch form, because exact long addition is batching-invariant
    // (QuantileHistSpec pins multi-batch ≡ one-shot; this gate shares
    // q137's oracle verbatim). Histogram bounds are fixed a priori (here
    // derived once from the static table — what a deployment pins in
    // config), which is what makes per-batch sketches mergeable at all.
    // No stateful operator: the stream side is a pure map + partial agg
    // per batch, the state lives in the sink.
    QueryDef.sql(
      "q138_stream_quantile_state",
      """WITH b AS (SELECT min(value) AS vlo, max(value) AS vhi FROM events),
        |prm AS (SELECT vlo, (vhi - vlo) / 256 AS w FROM b),
        |bins AS (
        |  SELECT event_type,
        |    LEAST(255, CAST(floor((value - vlo) / w) AS BIGINT)) AS bin,
        |    COUNT(*) AS cnt
        |  FROM events, prm GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, bin, cnt,
        |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        |    SUM(cnt) OVER (PARTITION BY event_type) AS total
        |  FROM bins),
        |qs AS (SELECT CAST(p AS DOUBLE) AS p
        |       FROM (VALUES (0.5), (0.9), (0.99)) t(p)),
        |hit AS (
        |  SELECT event_type, p, bin, cnt, cum, total,
        |    ROW_NUMBER() OVER (PARTITION BY event_type, p ORDER BY bin) AS rn
        |  FROM cum CROSS JOIN qs WHERE cum >= p * total)
        |SELECT event_type, p, CAST(total AS BIGINT) AS n,
        |  vlo + (bin + (p * total - (cum - cnt)) / cnt) * w AS est
        |FROM hit, prm WHERE rn = 1 ORDER BY event_type, p""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.streaming.Trigger
      import graft.sinks.IdempotentFileSink
      val b = graft.Tables.events(s, d).agg(min("value"), max("value")).head()
      val (lo, hi) = (b.getDouble(0), b.getDouble(1))
      val w = (hi - lo) / 256
      val root = QueryDef.scratch(d, "stream_hist")
      // fresh state per run: committed batches from an earlier code
      // version must not leak into this run's merge
      val rootP = new org.apache.hadoop.fs.Path(root)
      val hfs = rootP.getFileSystem(s.sessionState.newHadoopConf())
      if (hfs.exists(rootP)) hfs.delete(rootP, true)
      val q = StreamOps.eventsStream(s, d)
        .select(col("event_type"), col("value"))
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/_ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          IdempotentFileSink.writeBatch(
            batch.groupBy(col("event_type"),
              least(lit(255L), floor((col("value") - lo) / w).cast("long")).as("bin"))
              .agg(count(lit(1)).as("cnt")),
            s"$root/sink", id)
        }
        .start()
      q.awaitTermination()
      val merged = IdempotentFileSink.read(s, s"$root/sink")
        .groupBy("event_type", "bin").agg(sum(col("cnt")).as("cnt"))
      val wCum = Window.partitionBy("event_type").orderBy("bin")
      val wTot = Window.partitionBy("event_type")
      val wHit = Window.partitionBy("event_type", "p").orderBy("bin")
      merged
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("total", sum(col("cnt")).over(wTot))
        .select(col("event_type"), col("bin"), col("cnt"), col("cum"),
          col("total"), explode(array(lit(0.5), lit(0.9), lit(0.99))).as("p"))
        .filter(col("cum") >= col("p") * col("total"))
        .withColumn("rn", row_number().over(wHit))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("p"), col("total").as("n"),
          (lit(lo) + (col("bin") +
            (col("p") * col("total") - (col("cum") - col("cnt"))) / col("cnt"))
            * w).as("est"))
        .orderBy("event_type", "p")
    },

    // ---- streaming count-min state (q141 maintained by foreachBatch) -----
    // The q141 frequency sketch driven from the event STREAM: each
    // micro-batch folds its own (r, c, cnt) counter rows through the
    // idempotent batch-id sink, and the read-time merge + probe is
    // IDENTICAL to the batch form because exact long addition is
    // batching-invariant (CmsSketchSpec pins multi-batch ≡ one-shot;
    // this gate shares q141's oracle verbatim). Like q138, no stateful
    // operator: the stream side is a pure ×d explode + partial agg per
    // batch; the state lives in the sink. Probe exactness is checked
    // against the static table the stream replays.
    QueryDef.sql(
      "q142_stream_cms_state",
      graft.functions.Cms.eventsOracleSql) { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      import graft.functions.Cms
      import graft.sinks.IdempotentFileSink
      val root = QueryDef.scratch(d, "stream_cms")
      // fresh state per run: committed batches from an earlier code
      // version must not leak into this run's merge
      val rootP = new org.apache.hadoop.fs.Path(root)
      val hfs = rootP.getFileSystem(s.sessionState.newHadoopConf())
      if (hfs.exists(rootP)) hfs.delete(rootP, true)
      val q = StreamOps.eventsStream(s, d)
        .select(col("user_id"))
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/_ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          IdempotentFileSink.writeBatch(
            Cms.state(batch, col("user_id"), Nil), s"$root/sink", id)
        }
        .start()
      q.awaitTermination()
      val merged = Cms.merge(IdempotentFileSink.read(s, s"$root/sink"))
      val ev = graft.Tables.events(s, d).select(col("user_id"))
      val est = Cms.estimate(ev.distinct(), merged, "user_id")
      ev.groupBy("user_id").agg(count(lit(1)).as("n_exact"))
        .join(est, "user_id")
        .select(col("user_id"), col("n_exact"), col("est"),
          (col("est") >= col("n_exact")).as("no_undercount"))
        .orderBy("user_id")
    }
  )

  /** Session statistics ground truth (q35's window form) — shared by the
    * flatMapGroupsWithState (q38) and transformWithState (q103) gates.
    */
  private def sessionOracle: String =
    s"""WITH g AS (
       |  SELECT user_id, epoch_ns(ts) AS tns, value,
       |    CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts))
       |           OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
       |           > $SessionGap
       |         OR lag(epoch_ns(ts))
       |           OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) IS NULL
       |         THEN 1 ELSE 0 END AS is_new,
       |    event_id
       |  FROM events),
       |s AS (
       |  SELECT user_id, tns, value,
       |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY tns, event_id
       |                      ROWS UNBOUNDED PRECEDING) AS session_idx
       |  FROM g)
       |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       |  min(tns) AS session_start, COUNT(*) AS n,
       |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total
       |FROM s GROUP BY 1, 2 ORDER BY 1, 2"""
}
