package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[SchemaDiff]] — the round-start testdata drift gate. */
class SchemaDiffSpec extends AnyFunSuite with SparkSpec {

  test("pinned fingerprint matches the live testdata (all sf dirs)") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val d = SchemaDiff.diff(spark, s"/root/testdata/$sf")
      assert(d.isEmpty,
        s"$sf drifted from the pinned snapshot — if the driver regenerated " +
          s"testdata intentionally, re-pin via `runMain graft.SchemaDiff --dump`:\n" +
          d.mkString("\n"))
    }
  }

  test("a type change is reported as drift; the NANOS events shape as known-alternate") {
    // simulate drift by diffing a doctored dir: write events with ts as
    // bigint (the NANOS-read shape) and documents with n_chars as int
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("schemadrift_")
    try {
      val src = "/root/testdata/sf0.001"
      for (t <- Tables.names) {
        val df = spark.read.parquet(s"$src/$t.parquet")
        val out = t match {
          case "events" => df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000)
          case "documents" => df.withColumn("n_chars", col("n_chars").cast("int"))
          case _ => df
        }
        out.limit(5).write.parquet(s"$dir/$t.parquet")
      }
      val d = SchemaDiff.diff(spark, dir.toString)
      assert(d.exists(l => l.startsWith("events:") && l.contains("KNOWN-ALTERNATE")),
        s"bigint events.ts must be labeled known-alternate, got:\n${d.mkString("\n")}")
      assert(d.exists(l => l.startsWith("documents:") && l.contains("SCHEMA DRIFT")),
        "an int n_chars must be reported as drift")
      assert(d.size == 2, s"only the two doctored tables may differ, got:\n${d.mkString("\n")}")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }
}
