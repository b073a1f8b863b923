package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global sequential row numbering in `key` order WITHOUT a partition-less
  * window (reference semantics: cleaner.py:66-69 numbers null-id rows
  * "-1","-2",… in encounter order).
  *
  * A bare `row_number() OVER (ORDER BY key)` collapses the whole input
  * onto one partition — at 100 TB that is a single-task sort of the full
  * slice. This is the classic two-pass replacement:
  *
  *  1. Deterministic range bucketing: bucket boundaries come from
  *     `approxQuantile` (a cheap scan of just the key column), so the
  *     bucket of a row is a pure function of its key — unlike
  *     `repartitionByRange`, whose sampled boundaries can differ between
  *     re-executions of the same plan.
  *  2. Per-bucket counts → cumulative offsets. At most `buckets` rows
  *     reach the driver; the offset table broadcasts back.
  *  3. Per-bucket `row_number` (a PARTITIONED window — each sort is
  *     ~n/buckets rows) + the bucket's offset = the exact global rank.
  *
  * Buckets are monotonic in `key`, so `offset + local rank` reproduces
  * the global ordering bit-for-bit. Scale knob: `buckets` should track
  * cluster parallelism (32 here to match local[32]).
  */
object GlobalRowNumber {

  /** Append `outCol`: the 1-based global rank of each row under ascending
    * `key` order. `key` must be numeric (quantile-sketchable) and is
    * expected unique (ties get distinct arbitrary ranks within the tie).
    */
  def byKeyOrder(df: DataFrame, key: String, outCol: String,
      buckets: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds = df.stat.approxQuantile(key, probs, 0.001).distinct.sorted
    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(key) > lit(b), 1).otherwise(0)
    }

    val bucketed = df.withColumn("_bkt", bucket)
    val counts = bucketed.groupBy("_bkt").agg(count(lit(1)).as("_c"))
      .as[(Int, Long)].collect().sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (b, c) => val o = (b, acc); acc += c; o }

    bucketed
      .join(broadcast(offsets.toSeq.toDF("_bkt", "_off")), "_bkt")
      .withColumn(outCol,
        row_number().over(Window.partitionBy("_bkt").orderBy(key)) + col("_off"))
      .drop("_bkt", "_off")
  }

  /** Append `outCol` = `cume_dist() OVER (PARTITION BY stratum ORDER BY
    * key)` WITHOUT a per-stratum whole-stratum sort — the two-pass
    * treatment applied to PERCENTILES: a skewed giant stratum (one crawl
    * source holding most of a 100 TB corpus) makes the naive window sort
    * that entire stratum in ONE reducer; here its rows spread across all
    * `buckets` range-buckets and every sort is ~n/buckets rows.
    *
    *  1. Bucket boundaries from a global `approxQuantile(key)` — bucket
    *     is a pure monotone function of `key` (equal keys → equal
    *     bucket), so earlier-bucket rows of a stratum have strictly
    *     smaller keys and later-bucket rows strictly larger.
    *  2. Per-(stratum, bucket) counts → per-stratum running offsets and
    *     totals, computed by windows over the TINY counts frame
    *     (|strata|·buckets rows).
    *  3. Per-(stratum, bucket) RANGE-frame count — `count(*) OVER
    *     (... ORDER BY key RANGE UNBOUNDED PRECEDING)` counts the rows
    *     with key ≤ current INCLUDING ties (the range frame's peer
    *     group), so `(offset + in-bucket count≤) / total` reproduces
    *     cume_dist bit-for-bit: both are one IEEE division of the same
    *     exact longs, and ties get the identical percentile regardless
    *     of bucket-internal order.
    *
    * NULL keys land in bucket 0 as the lowest peer group — the same
    * placement Spark's own `cume_dist` gives them (nulls-first
    * ascending). NULL stratum values form their own stratum (window
    * PARTITION BY semantics), preserved by the null-safe join back.
    * The offsets side broadcasts only while small (≤ `hintMaxGroups`
    * rows); a pathological strata×buckets explosion degrades to an
    * AQE-planned join instead of a forced-broadcast OOM.
    */
  def cumeDistByKey(df: DataFrame, stratum: Seq[String], key: String,
      outCol: String, buckets: Int = 32,
      hintMaxGroups: Long = 1000000L): DataFrame = {
    val reserved = Seq("_bkt", "_off", "_tot")
    require(!df.columns.exists(reserved.contains),
      s"input may not carry the operator's internal columns ${reserved.mkString(", ")}")
    // three consumers read the input (quantile sketch, counts, the
    // ranked join) — checkpoint once so an expensive upstream (q127's
    // per-doc quality score) never computes three times; the
    // materialized slice is just (stratum, key) wide. Measured: q127 at
    // the 100x documents tier 48.0 s → 17.6 s.
    val in = graft.Materialize.checkpoint(df)
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds = in.stat.approxQuantile(key, probs, 0.001).distinct.sorted
    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(key) > lit(b), 1).otherwise(0)
    }
    val bucketed = in.withColumn("_bkt", bucket)

    val sCols = stratum.map(col)
    val counts = graft.Materialize.checkpoint(
      bucketed.groupBy(sCols :+ col("_bkt"): _*).agg(count(lit(1)).as("_c")))
    val wOff = Window.partitionBy(sCols: _*).orderBy("_bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(sCols: _*)
    val offsets = counts
      .withColumn("_off", sum(col("_c")).over(wOff) - col("_c"))
      .withColumn("_tot", sum(col("_c")).over(wTot))
      .drop("_c")

    // null-safe join back on (stratum, bucket): every input row has
    // exactly one offsets row by construction
    val o = (if (counts.count() <= hintMaxGroups) broadcast(offsets)
      else offsets).alias("__cd_o")
    val b = bucketed.alias("__cd_b")
    val cond = (stratum.map(c => col(s"__cd_b.$c") <=> col(s"__cd_o.$c")) :+
      (col("__cd_b._bkt") === col("__cd_o._bkt"))).reduce(_ && _)
    val wLeq = Window.partitionBy(sCols :+ col("_bkt"): _*).orderBy(key)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    b.join(o, cond)
      .select(df.columns.map(c => col(s"__cd_b.$c")) ++
        Seq(col("__cd_b._bkt").as("_bkt"), col("__cd_o._off").as("_off"),
          col("__cd_o._tot").as("_tot")): _*)
      .withColumn(outCol,
        (col("_off") + count(lit(1)).over(wLeq)).cast("double") / col("_tot"))
      .drop("_bkt", "_off", "_tot")
  }
}
