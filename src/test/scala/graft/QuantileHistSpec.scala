package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q137's mergeable histogram-quantile state: the estimate's accuracy
  * is STRUCTURAL — it interpolates inside the bin whose cumulative
  * count crosses p·total, so |est − exact percentile| ≤ one bin width
  * (hi−lo)/256 by construction. Pinned here against Spark's exact
  * `percentile` (the q64 contract style, but with a deterministic
  * bound instead of a rank tolerance); the bit-exact estimate replay
  * itself is the q137 oracle's job.
  */
class QuantileHistSpec extends AnyFunSuite with SparkSpec {

  test("merged-histogram estimates sit within one bin width of exact percentiles") {
    val sf = "/root/testdata/sf0.01"
    val ev = Tables.events(spark, sf)
    val b = ev.agg(min("value"), max("value")).head()
    val binW = (b.getDouble(1) - b.getDouble(0)) / 256

    val est = graft.SparkEntry.queries("q137_quantile_hist_merge")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3)).toMap
    val exact = ev.groupBy("event_type")
      .agg(expr("percentile(value, array(0.5, 0.9, 0.99))").as("ex"))
      .collect().flatMap { r =>
        val ex = r.getSeq[Double](1)
        Seq(0.5, 0.9, 0.99).zip(ex).map { case (p, v) => (r.getString(0), p) -> v }
      }.toMap
    assert(est.keySet == exact.keySet && est.size == 15)
    est.foreach { case (k, e) =>
      assert(math.abs(e - exact(k)) <= binW + 1e-9,
        s"$k: sketch $e vs exact ${exact(k)} exceeds bin width $binW")
    }
  }

  test("histogram state maintained incrementally across batches equals the one-shot sketch") {
    import spark.implicits._
    // the q137 state under incremental ingest: three disjoint batches
    // each contribute their own (type, bin, cnt) rows; because the
    // merge is exact long addition, summing the landed batch rows must
    // equal the one-shot histogram over the union — the property that
    // lets a deployment keep percentiles current without rescans
    val root = java.nio.file.Files.createTempDirectory("graft_hist_inc").toString
    val lo = 0.0; val w = 100.0 / 256
    def hist(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("t"), least(lit(255L),
        floor((col("v") - lo) / w).cast("long")).as("bin"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("cnt"))
    val all = (0 until 3000).map(i => (s"t${i % 3}", (i * 37 % 1000) / 10.0))
      .toDF("t", "v")
    Seq(0, 1, 2).foreach { b =>
      graft.sinks.IdempotentFileSink.writeBatch(
        hist(all.filter(abs(hash(col("v"))) % 3 === b)), root, b)
    }
    // replay of a committed batch adds nothing (exactly-once state)
    graft.sinks.IdempotentFileSink.writeBatch(hist(all.limit(10)), root, 1)
    val merged = graft.sinks.IdempotentFileSink.read(spark, root)
      .groupBy("t", "bin").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val oneShot = hist(all)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == oneShot)
  }
}
