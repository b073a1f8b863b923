package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Staging

/** Pins `Staging.overwritePartitions` — the idempotent-backfill sink:
  * a partition-scoped overwrite must replace EXACTLY the partitions the
  * incoming frame names and leave every sibling partition's files
  * byte-identical (same names, sizes, modification times — not
  * rewritten, not deleted-and-restored).
  */
class PartitionBackfillSpec extends AnyFunSuite with SparkSpec {

  private def lsFiles(dir: String): Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    val walk = java.nio.file.Files.walk(root)
    try walk.iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        !p.getFileName.toString.startsWith("_") &&
        !p.getFileName.toString.startsWith("."))
      .map(p => root.relativize(p).toString ->
        (java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis))
      .toMap
    finally walk.close()
  }

  test("backfill replaces named partitions only; sibling files stay byte-identical") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_backfill").toString
    val v0 = Seq((1L, "en", 10.0), (2L, "en", 20.0), (3L, "de", 30.0),
      (4L, "fr", 40.0)).toDF("id", "lang", "v")
    Staging.writePartitioned(v0, Seq("lang"), path)
    val before = lsFiles(path)
    assert(before.keys.exists(_.startsWith("lang=de")) &&
      before.keys.exists(_.startsWith("lang=fr")))

    // backfill: recompute ONLY lang=en (correcting v), land it
    val fix = Seq((1L, "en", 11.0), (2L, "en", 21.0)).toDF("id", "lang", "v")
    Staging.overwritePartitions(fix, Seq("lang"), path)

    val after = lsFiles(path)
    // siblings: identical file sets with identical size + mtime
    def part(m: Map[String, (Long, Long)], p: String) = m.filter(_._1.startsWith(p))
    assert(part(after, "lang=de") == part(before, "lang=de"),
      "lang=de files were touched by an en-only backfill")
    assert(part(after, "lang=fr") == part(before, "lang=fr"),
      "lang=fr files were touched by an en-only backfill")
    // the named partition was actually replaced
    assert(part(after, "lang=en") != part(before, "lang=en"),
      "lang=en backfill landed no new files")

    val got = Staging.readPartitioned(spark, path)
      .select("id", "lang", "v").as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "en", 11.0), (2L, "en", 21.0),
      (3L, "de", 30.0), (4L, "fr", 40.0)))

    // idempotence: re-landing the same backfill converges to the same table
    Staging.overwritePartitions(fix, Seq("lang"), path)
    val again = Staging.readPartitioned(spark, path)
      .select("id", "lang", "v").as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq
    assert(again == got)
  }
}
