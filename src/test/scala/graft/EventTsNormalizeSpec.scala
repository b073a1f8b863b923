package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Tables.normalizeEventTs]] — the event-time ingestion contract.
  *
  * Driver testdata has shipped `events.ts` as parquet TIMESTAMP(NANOS)
  * (surfaced as a raw ns BIGINT under the legacy conf) and as
  * TIMESTAMP(MICROS)/timestamp_ntz; a user table could also carry a
  * zoned TIMESTAMP. All three must land on the same epoch-ns `ts_ns`,
  * and the ntz conversion must not depend on the session time zone —
  * the exact property that distinguishes `timestampdiff` from an
  * ntz→ltz cast, which silently shifts by the zone offset.
  */
class EventTsNormalizeSpec extends AnyFunSuite with SparkSpec {

  // 2024-01-01T00:09:58.778549 UTC — the first sf0.001 event's instant
  private val Us = 1704067798778549L
  private val Ns = Us * 1000L

  private def frame(tsExpr: org.apache.spark.sql.Column) = {
    import spark.implicits._
    Seq((7L, "click")).toDF("event_id", "event_type")
      .select(col("event_id"), tsExpr.as("ts"), col("event_type"))
  }

  test("BIGINT, timestamp_ntz, and zoned timestamp all normalize to the same epoch-ns") {
    val asLong = frame(lit(Ns))
    val asNtz = frame(expr(s"to_timestamp_ntz('2024-01-01 00:09:58.778549')"))
    val asLtz = frame(timestamp_micros(lit(Us)))
    for ((df, label) <- Seq((asLong, "long"), (asNtz, "ntz"), (asLtz, "ltz"))) {
      val out = Tables.normalizeEventTs(df)
      assert(out.columns.toSeq == Seq("event_id", "ts_ns", "event_type"),
        s"$label: ts must be replaced in place, preserving column order")
      assert(out.schema("ts_ns").dataType ==
        org.apache.spark.sql.types.LongType, s"$label: ts_ns must be BIGINT")
      assert(out.select("ts_ns").head().getLong(0) == Ns, s"$label: wrong instant")
    }
  }

  test("the ntz conversion is independent of spark.sql.session.timeZone") {
    val prior = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (tz <- Seq("UTC", "America/New_York", "Asia/Tokyo")) {
        spark.conf.set("spark.sql.session.timeZone", tz)
        val out = Tables.normalizeEventTs(
          frame(expr(s"to_timestamp_ntz('2024-01-01 00:09:58.778549')")))
        assert(out.select("ts_ns").head().getLong(0) == Ns,
          s"ntz ts_ns shifted under session tz $tz")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }

  test("eventsStream cold-starts over an empty events directory (schema fallback, no probe crash)") {
    // the file-stream pattern an explicit schema exists for: the
    // directory exists but no file has landed yet — stream construction
    // must succeed (probe falls back to the current ntz encoding) and a
    // drain must yield zero rows, not throw
    val dir = java.nio.file.Files.createTempDirectory("evts_cold_")
    try {
      java.nio.file.Files.createDirectory(dir.resolve("events.parquet"))
      val s = graft.streaming.StreamOps.eventsStream(spark, dir.toString)
      assert(s.isStreaming, "eventsStream must return a streaming frame")
      assert(s.schema("ts_ns").dataType ==
        org.apache.spark.sql.types.LongType, "fallback must still expose ts_ns BIGINT")
      val out = graft.streaming.StreamOps.runToBatch(
        s.groupBy("event_type").count(), statePartitions = Some(2))
      assert(out.isEmpty, "empty directory must drain to zero rows")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  test("a REAL TIMESTAMP(NANOS) parquet file reads through Tables.events as epoch-ns") {
    // Spark can't author TIMESTAMP(NANOS) itself, so the LongType branch
    // of normalizeEventTs was previously only reachable via a synthetic
    // lit() column. Author a genuine NANOS file with parquet-mr's example
    // writer — the exact physical shape the driver's pyarrow testdata
    // shipped in earlier rounds — and assert the whole ingestion path:
    // schema inference resolves BIGINT (build-time nanosAsLong conf, see
    // SparkSpec), and Tables.events lands on the same instant.
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    import org.apache.parquet.schema.MessageTypeParser
    val dir = java.nio.file.Files.createTempDirectory("evts_nanos_")
    try {
      val schema = MessageTypeParser.parseMessageType(
        """message events {
          |  optional int64 event_id;
          |  optional int64 ts (TIMESTAMP(NANOS,false));
          |  optional binary event_type (STRING);
          |}""".stripMargin)
      val conf = new Configuration()
      val file = dir.resolve("events.parquet").resolve("part-00000.parquet")
      java.nio.file.Files.createDirectories(file.getParent)
      val w = ExampleParquetWriter
        .builder(HadoopOutputFile.fromPath(new Path(file.toString), conf))
        .withConf(conf).withType(schema).build()
      val gf = new SimpleGroupFactory(schema)
      try Seq((7L, Ns, "click"), (8L, Ns + 1L, "view")).foreach { case (id, ns, et) =>
        val g = gf.newGroup()
        g.add("event_id", id); g.add("ts", ns); g.add("event_type", et)
        w.write(g)
      } finally w.close()
      val raw = spark.read.parquet(s"$dir/events.parquet")
      assert(raw.schema("ts").dataType == org.apache.spark.sql.types.LongType,
        "NANOS must surface as BIGINT under the build-time legacy conf")
      val out = Tables.events(spark, dir.toString)
        .orderBy("event_id").collect()
      assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
        Seq((7L, Ns, "click"), (8L, Ns + 1L, "view")),
        "NANOS file must normalize to the exact epoch-ns instants")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  test("a parquet round trip of the current testdata encoding reads back the same ts_ns") {
    val d = "/root/testdata/sf0.001"
    val base = Tables.events(spark, d).select("event_id", "ts_ns")
    // write the RAW frame (ts still in its on-disk type) the way a user
    // staging job would, then re-normalize the copy: the two reads must
    // agree exactly — this is the eventsStream-over-a-Spark-written-dir
    // shape (ScaleSmoke's replicated events) in miniature
    val dir = java.nio.file.Files.createTempDirectory("evts_norm_")
    try {
      spark.read.parquet(s"$d/events.parquet").write.mode("overwrite")
        .parquet(s"$dir/events.parquet")
      val copy = Tables.events(spark, dir.toString).select("event_id", "ts_ns")
      // count + null gates first: an empty copy or a null-producing
      // conversion would sail through a join-shrink or a null-swallowing
      // =!= predicate
      val n = base.count()
      assert(n > 0 && copy.count() == n, "round trip changed the row count")
      assert(copy.filter(col("ts_ns").isNull).isEmpty, "round trip produced null ts_ns")
      assert(copy.join(base, "event_id")
        .filter(!(base("ts_ns") <=> copy("ts_ns"))).isEmpty,
        "round-tripped ts_ns differs from the source read")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }
}
