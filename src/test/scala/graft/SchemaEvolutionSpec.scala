package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Staging

/** Pins `Staging.readEvolved`'s reconciliation contract class by class:
  * one declared target schema over a staging area written under several
  * physical schema versions (the 100 TB operational reality), as ONE
  * multi-path scan — no per-version union, no mergeSchema footer sweep.
  */
class SchemaEvolutionSpec extends AnyFunSuite with SparkSpec {

  private lazy val root = {
    import spark.implicits._
    val r = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    // v1: the old contract — INT32 id, FLOAT score, a since-retired
    // column, `lang` not yet invented
    Seq((1, 1.5f, "a"), (2, 2.5f, "b")).toDF("id", "score", "legacy")
      .coalesce(1).write.parquet(s"$r/v1")
    // v2: the current contract — types widened, lang added, legacy
    // retired, and a DIFFERENT column order
    Seq(("en", 3L, 3.5), ("de", 4L, 4.5)).toDF("lang", "id", "score")
      .coalesce(1).write.parquet(s"$r/v2")
    r
  }

  private val target = StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType),
    StructField("lang", StringType)))

  test("added → null, removed → pruned, widened → promoted, order → by name") {
    val rows = Staging.readEvolved(spark, target, Seq(s"$root/v1", s"$root/v2"))
      .orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1),
      if (r.isNullAt(2)) null else r.getString(2))).toSeq == Seq(
      (1L, 1.5, null), (2L, 2.5, null), // v1: widened id/score, lang nulled
      (3L, 3.5, "en"), (4L, 4.5, "de"))) // v2: read as declared
  }

  test("the evolved scan stays one pruned, pushdown-capable file source") {
    val df = Staging.readEvolved(spark, target, Seq(s"$root/v1", s"$root/v2"))
      .filter(col("id") > 2).select("id", "lang")
    val plan = df.queryExecution.sparkPlan.toString
    // one FileScan over both version dirs, reading only target columns
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan)
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(read.contains("id") && read.contains("lang") && !read.contains("legacy"),
      s"evolved scan reads retired/unneeded columns: $read")
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,2)"),
      s"filter not pushed through the evolved read:\n$plan")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
  }

  test("narrowing drift fails the scan loudly instead of corrupting silently") {
    val narrow = StructType(Seq(StructField("id", IntegerType)))
    val e = intercept[Exception] {
      spark.read.schema(narrow).parquet(s"$root/v2").collect()
    }
    assert(e.getMessage != null)
  }
}
