package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** POINT-IN-TIME join: attach to every fact row the dimension VERSION
  * that was valid at the fact's timestamp — the temporal join that makes
  * an SCD-2 dimension ([[graft.dims.Scd2]]) queryable ("price the order
  * at the customer's segment AS OF the order date", the
  * feature-store-correctness join every training pipeline needs to
  * avoid label leakage).
  *
  * Dim contract: the Scd2 shape — `key..., attrs..., valid_from,
  * valid_to` (NULL `valid_to` = open version; versions per key
  * non-overlapping). A fact at `ts` matches the version with the
  * greatest `valid_from ≤ ts` still covering it (`ts < valid_to` unless
  * open); a fact before the key's first version — or inside a coverage
  * gap — gets NULL attributes, never a neighboring version.
  *
  * Execution shape: the naive formulation is a range theta-join
  * (`valid_from ≤ ts < valid_to`) — a BNLJ unless bucketized. This is
  * the UNION-WINDOW rewrite instead (the [[AsOf]] idea pointed at
  * version boundaries): dim versions and facts union into ONE keyed
  * stream ordered by (time, dim-first), a running `last(_, ignoreNulls)`
  * carries the latest version struct onto every fact, and the
  * `valid_to` guard nulls out gap hits. One shuffle on the key, ZERO
  * join operators in the plan, linear in |facts| + |versions| — at
  * 100 TB that is the difference between a window and a fact-wide range
  * join. Dim-before-fact ordering at equal timestamps makes a version
  * opening at `t` cover a fact at `t` (Scd2 closes the predecessor at
  * the same instant — close is exclusive, open inclusive).
  */
object PitJoin {

  def atTime(facts: DataFrame, dim: DataFrame, key: Seq[String],
      tsCol: String, attrs: Seq[String]): DataFrame = {
    val factCols = facts.columns.toSeq
    val reserved = Seq("__ord", "__tag", "__ver", "__last")
    require(!factCols.exists(reserved.contains),
      s"facts may not carry the operator's internal columns ${reserved.mkString(", ")}")
    require(!attrs.exists(factCols.contains),
      "dim attribute names must not collide with fact columns " +
        s"(rename before joining): ${attrs.filter(factCols.contains).mkString(", ")}")
    // SQL join semantics for NULL keys (a NULL matches NOTHING): drop
    // null-key dim versions up front — Window.partitionBy groups NULLs
    // TOGETHER (GROUP BY semantics), which would otherwise attach a
    // null-key version to null-key facts, diverging from the range
    // theta-join this rewrite replaces (and from Scd2's own MERGE
    // semantics, whose dims CAN carry null-key rows). Null-key FACTS
    // still flow through and emit with NULL attributes.
    val d = dim
      .filter(key.map(col(_).isNotNull).reduce(_ && _))
      .select(
        key.map(col) ++ Seq(
          col("valid_from").as("__ord"), lit(0).as("__tag"),
          struct((col("valid_to").as("__vto") +: attrs.map(col)): _*).as("__ver")): _*)
    val f = facts
      .withColumn("__ord", col(tsCol))
      .withColumn("__tag", lit(1))
    // allowMissingColumns: fact payload columns null on dim rows, __ver
    // null on fact rows — exactly what last(ignoreNulls) skips
    val unioned = f.unionByName(d, allowMissingColumns = true)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__ord"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val covered = col("__last").isNotNull &&
      (col("__last.__vto").isNull || col("__ord") < col("__last.__vto"))
    unioned
      .withColumn("__last", last(col("__ver"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(factCols.map(col) ++
        attrs.map(a => when(covered, col(s"__last.$a")).as(a)): _*)
  }

  /** [[atTime]] with a RANGE-BUCKETED skew escape: `atTime` partitions
    * the union window by the dim key, so ONE pathological hot key (a
    * single entity receiving a large fraction of all facts — the
    * "default user" / null-object row every production fact table
    * grows) serializes its entire fact slice into one reducer sort.
    * Here the window partitions by (key, ts-bucket):
    *
    *  1. bucket boundaries from a global `approxQuantile` over the FACT
    *     timestamps (the hot key dominates the facts, so its rows spread
    *     ~evenly across all `buckets`); the bucket is a pure monotone
    *     function of ts, shared by both sides;
    *  2. per-bucket version CARRY-IN by replication: a version opening
    *     at `valid_from` is present in its home bucket AND every later
    *     bucket (≤ |versions|·buckets extra rows — dim-sized, never
    *     fact-sized), so a fact always finds its governing version
    *     inside its own bucket — the boundary-handoff idea without a
    *     second pass;
    *  3. the same union-window/last(ignoreNulls)/valid_to guard per
    *     (key, bucket) — every sort is ~|facts|/buckets rows even when
    *     one key owns everything.
    *
    * Output is row-identical to [[atTime]] (PitJoinSpec pins equality
    * under a one-key-owns-all workload plus the bucketed plan shape).
    * `tsCol` must be numeric (quantile-sketchable) — the epoch-ns shape
    * every fact table here uses. Choose this variant when a dominant
    * key is known or detected; the plain window is one shuffle cheaper
    * for dimension-shaped keys.
    */
  def atTimeBucketed(facts: DataFrame, dim: DataFrame, key: Seq[String],
      tsCol: String, attrs: Seq[String], buckets: Int = 32): DataFrame = {
    val factCols = facts.columns.toSeq
    val reserved = Seq("__ord", "__tag", "__ver", "__last", "__bkt", "__home")
    require(!factCols.exists(reserved.contains),
      s"facts may not carry the operator's internal columns ${reserved.mkString(", ")}")
    require(!attrs.exists(factCols.contains),
      "dim attribute names must not collide with fact columns " +
        s"(rename before joining): ${attrs.filter(factCols.contains).mkString(", ")}")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds = facts.stat.approxQuantile(tsCol, probs, 0.001).distinct.sorted
    def bucketOf(c: org.apache.spark.sql.Column) =
      bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(c > lit(b), 1).otherwise(0)
      }
    val nb = bounds.length + 1

    val d = dim
      .filter(key.map(col(_).isNotNull).reduce(_ && _))
      .select(
        key.map(col) ++ Seq(
          col("valid_from").as("__ord"), lit(0).as("__tag"),
          struct((col("valid_to").as("__vto") +: attrs.map(col)): _*).as("__ver")): _*)
      // carry-in replication: home bucket and every later one
      .withColumn("__bkt",
        explode(sequence(bucketOf(col("__ord")), lit(nb - 1))))
    val f = facts
      .withColumn("__ord", col(tsCol))
      .withColumn("__tag", lit(1))
      .withColumn("__bkt", bucketOf(col(tsCol)))
    val unioned = f.unionByName(d, allowMissingColumns = true)
    val w = Window.partitionBy((key.map(col) :+ col("__bkt")): _*)
      .orderBy(col("__ord"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val covered = col("__last").isNotNull &&
      (col("__last.__vto").isNull || col("__ord") < col("__last.__vto"))
    unioned
      .withColumn("__last", last(col("__ver"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(factCols.map(col) ++
        attrs.map(a => when(covered, col(s"__last.$a")).as(a)): _*)
  }
}
