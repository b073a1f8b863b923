package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join over a single keyed event stream: for every row matching
  * `probe`, attach the most recent PRIOR row matching `reference` within
  * the same key (classic "each purchase → last preceding click").
  *
  * Implemented as one pass — tag the reference timestamps, then
  * `last(_, ignoreNulls)` over a running window per key — rather than a
  * per-pair range join: one shuffle on the key, no cross product, scales
  * linearly in events. (DuckDB's native ASOF JOIN is the oracle shape;
  * the window formulation is used on both sides for bit parity.)
  *
  * Skew caveat, shared with [[PitJoin.atTime]]: the window partitions
  * by key, so ONE key owning a large fraction of all events serializes
  * into one reducer sort. The escape is the same range-bucketed
  * carry-in rewrite [[PitJoin.atTimeBucketed]] implements (bucket on
  * event-time quantiles, replicate each reference row into its home
  * bucket and every later one); apply that pattern here if an event
  * stream ever grows a dominant key.
  */
object AsOf {

  /** @param orderCols total order within a key (e.g. ts, id) */
  def lastPrior(df: DataFrame, keyCol: Column, orderCols: Seq[Column],
      probe: Column, reference: Column, attach: Column,
      outName: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__ref", when(reference, attach))
      .withColumn(outName, last(col("__ref"), ignoreNulls = true).over(w))
      .filter(probe)
      .drop("__ref")
  }
}
