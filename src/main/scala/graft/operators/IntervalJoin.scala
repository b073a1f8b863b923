package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch interval (range) join: probe rows match build rows with the same
  * key whose timestamp falls in `(probe.ts - width, probe.ts]` — the
  * attribution shape ("purchases joined to the same user's clicks in the
  * preceding 30 minutes"; q39b runs it streaming).
  *
  * Spark has no native range join: the naive formulation
  * `p.join(c, key && c.ts > p.ts - w && c.ts <= p.ts)` has no equi-width
  * conjunct beyond the key, so a skewed or hot key degenerates to a
  * per-key cross product. The scalable shape buckets time by the window
  * width: a build row in bucket `b = ts div width` can only match probe
  * rows in buckets `b` or `b + 1`, so replicating the BUILD side twice
  * (bucket, bucket+1) turns the range join into an ordinary shuffled
  * equi-join on `(key, bucket)` with the exact range predicate applied
  * after — 2× the smaller side's shuffle, zero cross products, and the
  * per-task work is bounded by events-per-(key, window), not
  * events-per-key. (This is the classic bucketized range-join rewrite;
  * Databricks' range-join hint does the same under the hood.)
  */
object IntervalJoin {

  /** @param probe  rows to attribute (keeps all its columns)
    * @param build  rows to search (keeps all its columns); REPLICATED 2×
    *               — pass the smaller side here
    * @param probeKey/buildKey equi-key columns
    * @param probeTs/buildTs   long timestamps in the same unit
    * @param width  window width: match when
    *               `buildTs ∈ (probeTs - width, probeTs]`
    */
  def preceding(probe: DataFrame, build: DataFrame,
      probeKey: Column, buildKey: Column,
      probeTs: Column, buildTs: Column, width: Long): DataFrame = {
    require(width > 0, "interval width must be positive")
    val p = probe.withColumn("__pbucket", intDiv(probeTs, width))
    val b = build.withColumn("__bbucket",
      explode(array(intDiv(buildTs, width), intDiv(buildTs, width) + 1)))
    p.join(b,
        probeKey === buildKey && col("__pbucket") === col("__bbucket") &&
          buildTs > probeTs - width && buildTs <= probeTs)
      .drop("__pbucket", "__bbucket")
  }

  /** Exact floor division for epoch-scale longs. `/` on columns is DOUBLE
    * division and a long → double cast rounds above 2^53 (nanosecond
    * epochs are ~2^60) — so divide in decimal, where the already-pmod-
    * aligned dividend is exact.
    */
  private def intDiv(c: Column, w: Long): Column =
    ((c.cast("decimal(38,0)") - pmod(c, lit(w)).cast("decimal(38,0)")) /
      lit(w).cast("decimal(38,0)")).cast("long")
}
