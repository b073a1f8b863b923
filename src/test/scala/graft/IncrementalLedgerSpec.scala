package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.IncrementalLedger

/** Pins the batch-incremental ledger contract: each run consumes ONLY
  * unprocessed input files, folds their partial aggregate into persisted
  * state, commits atomically, and converges after torn attempts — the
  * batch analog of streaming offsets (+ state store).
  */
class IncrementalLedgerSpec extends AnyFunSuite with SparkSpec {

  private def agg(df: DataFrame): DataFrame =
    df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))

  private def merge(state: DataFrame, partial: DataFrame): DataFrame =
    state.unionByName(partial).groupBy("k")
      .agg(sum("n").as("n"), sum("s").as("s"))

  private def stateMap(df: DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("runs consume only new files; state merges; no-op and crash replay converge") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ledger").toString
    val (src, led) = (s"$root/src", s"$root/ledger")

    def land(rows: (String, Long)*): Unit =
      rows.toSeq.toDF("k", "v").coalesce(1).write.mode("append").parquet(src)

    // run 1: two segments land, both consumed
    land("a" -> 1L, "b" -> 2L)
    land("a" -> 10L)
    val r1 = IncrementalLedger.run(spark, src, led, agg, merge)
    assert(r1.newFiles.size == 2)
    assert(stateMap(r1.state) == Map("a" -> (2L, 11L), "b" -> (1L, 2L)))

    // run 2: ONE new segment lands; only it is consumed, state folds
    land("b" -> 5L, "c" -> 7L)
    val r2 = IncrementalLedger.run(spark, src, led, agg, merge)
    assert(r2.newFiles.size == 1, s"reprocessed old files: ${r2.newFiles}")
    val full = Map("a" -> (2L, 11L), "b" -> (2L, 7L), "c" -> (1L, 7L))
    assert(stateMap(r2.state) == full)

    // no-op run: nothing new → nothing consumed, state unchanged
    val r3 = IncrementalLedger.run(spark, src, led, agg, merge)
    assert(r3.newFiles.isEmpty)
    assert(stateMap(r3.state) == full)

    // torn attempt: a predecessor crashed after writing a garbage v_2
    // but BEFORE the LATEST rename — the committed pointer still says
    // v_1, so the next run re-reads the same delta and clobbers v_2
    land("d" -> 3L)
    val garbage = s"$led/v_2/state.parquet"
    Seq(("zzz", 999L, 999L)).toDF("k", "n", "s")
      .write.mode("overwrite").parquet(garbage)
    val r4 = IncrementalLedger.run(spark, src, led, agg, merge)
    assert(r4.newFiles.size == 1)
    assert(stateMap(r4.state) == full + ("d" -> (1L, 3L)),
      "torn v_2 leaked into the committed state")

    // lost LATEST (crash inside the delete+rename window): the pointer
    // RECOVERS to the highest complete version — nothing reprocessed,
    // nothing recomputed, same state (a rebuild from the listing would
    // silently undercount any input file archived since consumption)
    java.nio.file.Files.delete(java.nio.file.Paths.get(led, "LATEST"))
    val r5 = IncrementalLedger.run(spark, src, led, agg, merge)
    assert(r5.newFiles.isEmpty, "pointer recovery must not reprocess input")
    assert(stateMap(r5.state) == full + ("d" -> (1L, 3L)))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(led, "LATEST")),
      "recovery should rewrite the pointer")

    // three more runs push the version counter past the keep window —
    // old versions must actually be pruned, so the ledger footprint is
    // bounded by the window, not by ingest lifetime
    var expect = full + ("d" -> (1L, 3L))
    for ((k, v) <- Seq("e" -> 4L, "f" -> 6L, "g" -> 8L)) {
      land(k -> v)
      val r = IncrementalLedger.run(spark, src, led, agg, merge)
      assert(r.newFiles.size == 1)
      expect += (k -> (1L, v))
      assert(stateMap(r.state) == expect)
    }
    val vdirs = new java.io.File(led).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v_")).map(_.getName)
    assert(vdirs.length <= 3, s"ledger grew unbounded: ${vdirs.sorted.mkString(",")}")
    assert(!vdirs.contains("v_0"), "v_0 escaped the prune window")
  }

  test("time travel: stateAt serves immutable earlier versions, fails loud past the window") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ledger_tt").toString
    val (src, led) = (s"$root/src", s"$root/ledger")
    def land(rows: (String, Long)*): Unit =
      rows.toSeq.toDF("k", "v").coalesce(1).write.mode("append").parquet(src)

    land("a" -> 1L)
    IncrementalLedger.run(spark, src, led, agg, merge)
    land("a" -> 10L, "b" -> 2L)
    IncrementalLedger.run(spark, src, led, agg, merge)
    assert(IncrementalLedger.versions(spark, led) == Seq(0L, 1L))
    // v_0 still serves exactly what its reader observed at commit time
    assert(stateMap(IncrementalLedger.stateAt(spark, led, 0L)) == Map("a" -> (1L, 1L)))
    assert(stateMap(IncrementalLedger.stateAt(spark, led, 1L)) ==
      Map("a" -> (2L, 11L), "b" -> (1L, 2L)))

    // a torn attempt (state but no files.txt) is NOT a committed version
    Seq(("zzz", 9L, 9L)).toDF("k", "n", "s")
      .write.mode("overwrite").parquet(s"$led/v_7/state.parquet")
    assert(IncrementalLedger.versions(spark, led) == Seq(0L, 1L))
    val torn = intercept[IllegalArgumentException] {
      IncrementalLedger.stateAt(spark, led, 7L)
    }
    assert(torn.getMessage.contains("missing or incomplete"))

    // push v_0 out of the keep window → loud failure, never a neighbor
    for ((k, v) <- Seq("c" -> 3L, "d" -> 4L)) {
      land(k -> v)
      IncrementalLedger.run(spark, src, led, agg, merge)
    }
    assert(!IncrementalLedger.versions(spark, led).contains(0L))
    val pruned = intercept[IllegalArgumentException] {
      IncrementalLedger.stateAt(spark, led, 0L)
    }
    assert(pruned.getMessage.contains("keep window"))
  }

  test("input trees with URI-special characters (spaces) stay readable") {
    import spark.implicits._
    // the listing keys must be spark.read-able DECODED paths: a
    // URI-encoded key (%20) handed back to spark.read resolves to a
    // literal "%20" directory and wedges the ledger forever
    val root = java.nio.file.Files.createTempDirectory("graft ledger sp").toString
    val (src, led) = (s"$root/src dir", s"$root/ledger")
    Seq(("a", 1L)).toDF("k", "v").coalesce(1).write.mode("append").parquet(src)
    val r1 = IncrementalLedger.run(spark, src, led, agg, merge)
    assert(r1.newFiles.size == 1 && stateMap(r1.state) == Map("a" -> (1L, 1L)))
    Seq(("a", 2L)).toDF("k", "v").coalesce(1).write.mode("append").parquet(src)
    val r2 = IncrementalLedger.run(spark, src, led, agg, merge)
    assert(r2.newFiles.size == 1, s"delta misread under the space path: ${r2.newFiles}")
    assert(stateMap(r2.state) == Map("a" -> (2L, 3L)))
    // and a no-op run stays a no-op (key format is stable across runs)
    val r3 = IncrementalLedger.run(spark, src, led, agg, merge)
    assert(r3.newFiles.isEmpty)
  }

  test("partitioned input trees are consumed (recursive listing)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ledger_part").toString
    val (src, led) = (s"$root/src", s"$root/ledger")
    // hive-style partitioned landing: files live in day=... SUBDIRS — a
    // top-level listing would see no files and run every post-commit
    // batch as a silent no-op
    Seq(("a", 1L)).toDF("k", "v").withColumn("day", lit("d1"))
      .write.partitionBy("day").mode("append").parquet(src)
    val r1 = IncrementalLedger.run(spark, src, led, agg, merge)
    assert(r1.newFiles.size == 1 && stateMap(r1.state) == Map("a" -> (1L, 1L)))
    Seq(("a", 2L)).toDF("k", "v").withColumn("day", lit("d2"))
      .write.partitionBy("day").mode("append").parquet(src)
    val r2 = IncrementalLedger.run(spark, src, led, agg, merge)
    assert(r2.newFiles.size == 1, s"new partition's file not consumed: ${r2.newFiles}")
    assert(stateMap(r2.state) == Map("a" -> (2L, 3L)))
  }
}
