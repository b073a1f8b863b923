package graft

import org.apache.spark.sql.SparkSession

/** Measured-volume shuffle sizing — ONE rule for every operator that
  * re-partitions to data it has already counted (the CC loop's edge
  * count, q99's state-row count), instead of the session default.
  *
  * The shape: `min(session, max(2, measured / rowsPerPartition + 1))`.
  * The session width (the cluster-sized setting) is the HARD CAP — it
  * binds even below the floor, so a deliberately single-partition
  * session (shuffle.partitions=1 in a tiny local test) is never
  * silently widened past its configured width; a 100 TB input keeps
  * its parallelism. Inside the cap, the measured term keeps a small
  * input from paying per-task launch / per-store commit overhead
  * across mostly-empty partitions, and the floor of 2 (not a
  * "reasonable parallelism" 8) keeps converged-in-one-round loops and
  * tiny state stores from multiplying fixed costs — the measured term
  * dominates on any input that actually needs width.
  *
  * Callers pick `rowsPerPartition` from what a partition pays for: ~2M
  * edges keeps a CC round's groupBy hash map in executor memory; ~20k
  * state rows amortizes a state store's per-batch commit without
  * starving the join.
  */
object Sizing {
  def measuredWidth(spark: SparkSession, measuredRows: Long,
      rowsPerPartition: Long): Int =
    math.min(
      spark.conf.getOption("spark.sql.shuffle.partitions")
        .flatMap(_.toLongOption).getOrElse(200L),
      math.max(2L, measuredRows / rowsPerPartition + 1L)).toInt
}
