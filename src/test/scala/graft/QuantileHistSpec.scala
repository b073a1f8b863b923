package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q137's mergeable histogram-quantile state: the STRUCTURAL accuracy
  * guarantee is a RANK bound — the estimate sits inside the bin whose
  * cumulative count crosses p·total, so the number of values at or
  * below it can miss p·total by at most that bin's own count. (A VALUE
  * bound against an interpolated exact percentile does NOT hold in
  * general: on gapped/bimodal data the exact percentile interpolates
  * across an empty region the histogram never enters — e.g. values
  * {0, 0.2, 99, 100} put p50's crossing in bin 0 while `percentile`
  * answers 49.6. Equi-width sketches promise ranks, not values.)
  * The bit-exact estimate replay itself is the q137 oracle's job.
  */
class QuantileHistSpec extends AnyFunSuite with SparkSpec {

  test("merged-histogram estimates satisfy the structural rank bound") {
    val sf = "/root/testdata/sf0.01"
    val ev = Tables.events(spark, sf)

    val est = graft.SparkEntry.queries("q137_quantile_hist_merge")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(est.size == 15)
    val b = ev.agg(min("value"), max("value")).head()
    val binW = (b.getDouble(1) - b.getDouble(0)) / 256
    est.foreach { case ((t, p), (n, e)) =>
      // rank of the estimate vs the target rank, bounded by the mass of
      // the estimate's own bin (recomputed from raw data)
      val binLo = b.getDouble(0) + math.floor((e - b.getDouble(0)) / binW) * binW
      val hitMass = ev.filter(col("event_type") === t &&
        col("value") >= binLo && col("value") < binLo + binW).count()
      val atOrBelow = ev.filter(col("event_type") === t && col("value") <= e).count()
      assert(math.abs(atOrBelow - p * n) <= hitMass + 1e-6,
        s"($t, $p): rank of est $e is $atOrBelow vs target ${p * n}, " +
          s"hit-bin mass $hitMass")
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
