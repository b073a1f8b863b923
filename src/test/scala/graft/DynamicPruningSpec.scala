package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Staging

/** Pins DYNAMIC partition pruning over the engine's partitioned staging
  * layout: when a partitioned fact joins a small dimension whose
  * selective filter only materializes at runtime, Spark must inject a
  * dynamic-pruning subquery into the fact scan's partition filters —
  * at 100 TB this is the difference between scanning 2 partitions and
  * scanning 2,000 because the filter lived on the dim side of the join.
  * q42 pins STATIC partition pruning (literal predicate); this is the
  * join-driven half, kept under a test so a conf or layout change that
  * silently disables DPP fails here.
  */
class DynamicPruningSpec extends AnyFunSuite with SparkSpec {

  test("a selective dim filter prunes fact partitions through the join") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Staging.writePartitioned(
      Tables.documents(spark, "/root/testdata/sf0.01"), Seq("lang"), path)
    val langs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select("lang").distinct().as[String].collect().sorted
    assert(langs.length >= 3, s"need several lang partitions, got ${langs.toSeq}")

    // the dim: tiny but a REAL parquet table, with a filter on a
    // NON-join column — the surviving langs are only known at runtime,
    // so static pruning cannot apply and only DPP can keep the fact
    // scan partition-pruned. (A local in-memory dim won't do: Catalyst
    // folds its filter into the LocalRelation, and with no Filter node
    // left on the build side DPP sees no selective predicate.)
    val dimPath = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    langs.zipWithIndex.map { case (l, i) => (l, i % 3) }.toSeq
      .toDF("lang", "shard").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("shard") === 0)
    val fact = Staging.readPartitioned(spark, path)
    val joined = fact.join(dim, "lang")
      .groupBy("lang").agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic-pruning subquery in the fact scan:\n$plan")

    // and the pruned result equals the unpruned formulation
    val keep = langs.zipWithIndex.filter(_._2 % 3 == 0).map(_._1).toSet
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.documents(spark, "/root/testdata/sf0.01")
      .filter(col("lang").isin(keep.toSeq: _*))
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
