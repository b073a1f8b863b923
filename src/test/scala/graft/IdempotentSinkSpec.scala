package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.IdempotentFileSink

/** Replay contract of the exactly-once foreachBatch file sink: the same
  * batchId delivered twice (the at-least-once crash/replay case) must
  * not duplicate rows, and a half-written scratch dir must be repaired.
  */
class IdempotentSinkSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def freshDir(tag: String): String = {
    val p = Files.createTempDirectory(s"graft-idem-$tag")
    p.toString
  }

  test("duplicate batchId delivery writes nothing the second time") {
    val root = freshDir("dup")
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    IdempotentFileSink.writeBatch(b0, root, batchId = 0)
    // crash-after-commit replay: same id, different (replayed) content
    IdempotentFileSink.writeBatch(b0.union(b0), root, batchId = 0)
    val got = IdempotentFileSink.read(spark, root)
    assert(got.count() === 2)
    // the batch partition column surfaces through read() (basePath)
    assert(got.columns.contains("batch"))
    assert(IdempotentFileSink.committedBatches(root) === Seq(0L))
  }

  test("half-written scratch from a mid-write crash is repaired on replay") {
    val root = freshDir("crash")
    // simulate a crash mid-step-2: scratch exists, no target, no marker
    val scratch = Paths.get(root, "_tmp_0")
    Files.createDirectories(scratch)
    Files.writeString(scratch.resolve("part-garbage"), "not parquet")
    val b0 = Seq((1L, "a")).toDF("id", "v")
    IdempotentFileSink.writeBatch(b0, root, batchId = 0)
    assert(IdempotentFileSink.read(spark, root).select("id", "v")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a")))
  }

  test("orphan target without marker (crash between rename and marker) is retried") {
    val root = freshDir("orphan")
    val target = Paths.get(root, "batch=0")
    Files.createDirectories(target)
    Files.writeString(target.resolve("part-stale"), "stale")
    // reader must NOT see the orphan...
    assert(IdempotentFileSink.committedBatches(root).isEmpty)
    // ...and the replay replaces it wholesale
    IdempotentFileSink.writeBatch(Seq((7L, "z")).toDF("id", "v"), root, 0)
    assert(IdempotentFileSink.read(spark, root).select("id", "v")
      .as[(Long, String)].collect().toSeq === Seq((7L, "z")))
  }

  test("end-to-end: a real stream lands once through foreachBatch") {
    val root = freshDir("e2e")
    val src = freshDir("src-data")
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "x")
      .write.mode("overwrite").parquet(src)
    val q = spark.readStream
      .schema("k LONG, x DOUBLE")
      .parquet(src)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        IdempotentFileSink.writeBatch(df, root, id)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", freshDir("ckpt"))
      .start()
    q.awaitTermination()
    val got = IdempotentFileSink.read(spark, root)
    assert(got.count() === 3)
    assert(got.agg(sum("x")).head().getDouble(0) === 60.0)
  }
}
