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
}
