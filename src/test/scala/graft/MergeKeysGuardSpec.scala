package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FileManifest

/** MERGE batch preconditions and the measured-count guard: a batch with
  * two rows for one key must fail LOUD (the anti-join-then-append would
  * silently insert both, violating replace-exactly-one MERGE semantics —
  * Delta fails the same way), NULL keys must fail loud (they match
  * nothing), and a batch whose distinct-key count exceeds
  * `maxCollectedKeys` must take the bounds-only candidate path — zero
  * driver-resident key state — and still produce the exact same table
  * as the collected-probe path.
  */
class MergeKeysGuardSpec extends AnyFunSuite with SparkSpec {

  private def freshDir(tag: String): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_io/spec/mguard_$tag"
    val p = new Path(dir)
    val hfs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (hfs.exists(p)) hfs.delete(p, true)
    dir
  }

  private def table(dir: String): Unit = {
    import spark.implicits._
    FileManifest.writeThrough(
      (1L to 100L).map(k => (k, k * 10L)).toDF("k", "v")
        .repartitionByRange(4, col("k")),
      dir, Seq("k"), bloomCols = Seq("k"), mode = "overwrite")
  }

  test("duplicate keys in the update batch fail loud, naming a key") {
    import spark.implicits._
    val dir = freshDir("dup")
    table(dir)
    val e = intercept[IllegalArgumentException] {
      FileManifest.mergeKeys(spark, dir,
        Seq((7L, -1L), (7L, -2L), (9L, -3L)).toDF("k", "v"),
        "k", Seq("k"), bloomCols = Seq("k"))
    }
    assert(e.getMessage.contains("k=7"))
    // nothing committed: table unchanged, still version 1
    assert(FileManifest.versions(spark, dir) === Seq(1L))
    assert(graft.sources.ManifestFileIndex.read(spark, dir).count() === 100L)
  }

  test("NULL keys in the update batch fail loud") {
    import spark.implicits._
    val dir = freshDir("null")
    table(dir)
    val e = intercept[IllegalArgumentException] {
      FileManifest.mergeKeys(spark, dir,
        Seq(Some(7L), None).map(k => (k, -1L)).toDF("k", "v"),
        "k", Seq("k"), bloomCols = Seq("k"))
    }
    assert(e.getMessage.contains("NULL"))
  }

  test("above maxCollectedKeys: bounds-only path, identical final table") {
    import spark.implicits._
    val dir1 = freshDir("cap_small")
    val dir2 = freshDir("cap_big")
    table(dir1); table(dir2)
    // 30 distinct keys: updates to 20 existing (41..60 -> v=-k) plus 10
    // inserts (201..210) — a range that overlaps files 2-3 of the 4
    val updates = ((41L to 60L) ++ (201L to 210L)).map(k => (k, -k)).toDF("k", "v")
    val (rw1, ca1) = FileManifest.mergeKeys(spark, dir1, updates, "k", Seq("k"),
      bloomCols = Seq("k")) // default cap: collected-probe path
    val (rw2, ca2) = FileManifest.mergeKeys(spark, dir2, updates, "k", Seq("k"),
      bloomCols = Seq("k"), maxCollectedKeys = 8) // forced bounds-only path
    // same file universe either way (bounds-only may rewrite a different
    // — typically larger — subset; a bloom false positive can also tip
    // the collected path, so only the partition size is pinned)
    assert(rw1 + ca1 === rw2 + ca2)
    def rows(dir: String) = graft.sources.ManifestFileIndex.read(spark, dir)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(rows(dir1) === rows(dir2), "cap path changed MERGE results")
    val expected = ((1L to 40L) ++ (61L to 100L)).map(k => (k, k * 10L)) ++
      ((41L to 60L) ++ (201L to 210L)).map(k => (k, -k))
    assert(rows(dir1) === expected.sorted)
  }
}
