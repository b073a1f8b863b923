package graft

import java.sql.DriverManager

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.JdbcStreamSink

/** Exactly-once streaming → JDBC against embedded Derby: the replay
  * contracts of `foreachBatch` (duplicate batch id, partial-landing
  * retry) plus an end-to-end multi-batch stream.
  */
class JdbcStreamSinkSpec extends AnyFunSuite with SparkSpec {

  private val url = "jdbc:derby:memory:graftstream;create=true"

  private def exec(sql: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try { val st = conn.createStatement(); try st.execute(sql) finally st.close() }
    finally conn.close()
  }

  private def rows(table: String): Seq[(Long, String)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement()
        .executeQuery(s"SELECT id, v FROM $table ORDER BY id")
      val b = Seq.newBuilder[(Long, String)]
      while (rs.next()) b += ((rs.getLong(1), rs.getString(2)))
      b.result()
    } finally conn.close()
  }

  test("duplicate batchId replay writes nothing the second time") {
    import spark.implicits._
    exec("CREATE TABLE facts1 (id BIGINT PRIMARY KEY, v VARCHAR(20))")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    JdbcStreamSink.writeBatch(df, url, "facts1", Seq("id"), "s1", batchId = 0)
    // full replay of the same batch id: ledger short-circuits — even a
    // DIFFERENT payload is ignored, proving the data path never ran
    val changed = Seq((1L, "XXX")).toDF("id", "v")
    JdbcStreamSink.writeBatch(changed, url, "facts1", Seq("id"), "s1", batchId = 0)
    assert(rows("facts1") == Seq((1L, "a"), (2L, "b")))
    assert(JdbcStreamSink.committedBatches(url, "facts1", "s1") == Seq(0L))
  }

  test("partially-landed batch converges on retry (keyed-merge idempotence)") {
    import spark.implicits._
    exec("CREATE TABLE facts2 (id BIGINT PRIMARY KEY, v VARCHAR(20))")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    // simulate a crash AFTER some rows landed but BEFORE the ledger
    // commit: upsert a prefix directly, no ledger row
    graft.sinks.JdbcUpsert.upsert(Seq((1L, "a")).toDF("id", "v"),
      url, "facts2", Seq("id"))
    assert(JdbcStreamSink.committedBatches(url, "facts2", "s2").isEmpty)
    // the replay re-runs the WHOLE batch; merge-by-key absorbs the
    // already-landed prefix and the ledger records exactly one commit
    JdbcStreamSink.writeBatch(df, url, "facts2", Seq("id"), "s2", batchId = 0)
    assert(rows("facts2") == Seq((1L, "a"), (2L, "b")))
    assert(JdbcStreamSink.committedBatches(url, "facts2", "s2") == Seq(0L))
  }

  test("driver restart on the same checkpoint: replayed batch short-circuits, ledger completes") {
    import spark.implicits._
    exec("CREATE TABLE facts4 (id BIGINT PRIMARY KEY, v VARCHAR(20))")
    val inDir = java.nio.file.Files.createTempDirectory("graft_jdbc_restart_in")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_jdbc_restart_ck")
    // three single-row files; maxFilesPerTrigger=1 → one file per batch.
    // Distinct mtimes (seconds apart) pin the source's processing order:
    // FileStreamSource sorts by modification time, and same-ms files
    // would tie-break by FS listing order — the batch-0-contains-id-1
    // assumption below would then be filesystem-dependent
    for ((n, i) <- Seq("a", "b", "c").zipWithIndex) {
      val f = inDir.resolve(s"f$i.json")
      java.nio.file.Files.write(f, s"""{"id": ${i + 1}, "v": "$n"}""".getBytes)
      java.nio.file.Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 10000L))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").json(inDir.toString)
        .writeStream
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          JdbcStreamSink.writeBatch(df, url, "facts4", Seq("id"), "s4", id)
          // die in the exactly-once protocol's hard window: AFTER the
          // sink committed its ledger row, BEFORE the streaming
          // checkpoint commits batch 0 — the restart MUST replay batch 0
          if (id == 0 && !crashed.getAndSet(true))
            throw new RuntimeException("injected crash after sink commit")
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](run())
    assert(e.getMessage.contains("injected crash"), e.getMessage)
    // the sink committed batch 0 even though the CHECKPOINT didn't
    assert(JdbcStreamSink.committedBatches(url, "facts4", "s4") == Seq(0L))
    // poison the landed row: if the restart re-ran batch 0's DATA path
    // the upsert would silently restore "a" — the ledger short-circuit
    // must keep this marker untouched
    exec("UPDATE facts4 SET v = 'KEEP' WHERE id = 1")
    run() // restart on the same checkpoint: replays batch 0, then 1 and 2
    assert(rows("facts4") == Seq((1L, "KEEP"), (2L, "b"), (3L, "c")))
    assert(JdbcStreamSink.committedBatches(url, "facts4", "s4") == Seq(0L, 1L, 2L))
  }

  test("end-to-end: multi-batch stream lands exactly once, updates win") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    exec("CREATE TABLE facts3 (id BIGINT PRIMARY KEY, v VARCHAR(20))")
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "v").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        JdbcStreamSink.writeBatch(df, url, "facts3", Seq("id"), "s3", id)
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    input.addData((2L, "b2"), (3L, "c")) // second batch updates id=2
    q.processAllAvailable()
    q.stop()
    assert(rows("facts3") == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    assert(JdbcStreamSink.committedBatches(url, "facts3", "s3") == Seq(0L, 1L))
  }
}
