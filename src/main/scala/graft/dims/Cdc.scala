package graft.dims

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC APPLY: fold an insert/update/delete change feed into a snapshot —
  * the MERGE that keeps a warehouse mirror of an OLTP table current (the
  * reference's load path only ever upserts; a real replication feed also
  * deletes, and arrives out of order). [[Scd2]] is the keep-history
  * sibling; this is the current-state one.
  *
  * Feed contract: key columns + the snapshot's attribute columns + an op
  * column (`'I' | 'U' | 'D'`) + a per-key monotone sequence column
  * (commit LSN / binlog position). Global order across keys is
  * irrelevant; within a key the highest sequence is the key's NET
  * effect — an out-of-order `U@5, D@3` arrival means the delete happened
  * BEFORE the update, so the row survives. Several ops per key per
  * batch are collapsed by [[Scd2.latestPerKey]] (deterministic
  * tie-break), so applying one batch ≡ applying its net effects.
  *
  * Apply semantics per key (upsert flavor — `I` and `U` are
  * interchangeable, as binlog-style feeds replayed from a snapshot
  * boundary require):
  *   - net op I/U, key in snapshot     → row replaced by feed attributes;
  *   - net op I/U, key not in snapshot → row inserted;
  *   - net op D, key in snapshot       → row removed;
  *   - net op D, key not in snapshot   → no-op (idempotent delete);
  *   - key absent from feed            → snapshot row carried untouched.
  *
  * Replaying a batch onto its own output is a NO-OP (deletes stay
  * deleted, upserts re-assert the same values) — the property that makes
  * at-least-once feed delivery safe. NULL keys get SQL MERGE semantics
  * (a NULL key matches nothing): null-key snapshot rows always carry,
  * null-key I/U feed rows insert on every apply — divert them upstream
  * (the [[graft.validate]] layer) if the feed can produce them.
  *
  * Execution shape at scale: ONE window over the feed (tiny next to the
  * snapshot) to collapse to net effects, then ONE full-outer join
  * snapshot ⋈ net on the key — both sides hash-partition on it, no
  * second pass, no per-op scans. The result is the full next snapshot;
  * land it atomically (or via [[graft.sources.Staging.overwritePartitions]]
  * when only some partitions' keys changed).
  */
object Cdc {

  def applyChanges(snapshot: DataFrame, feed: DataFrame, key: Seq[String],
      attrs: Seq[String], opCol: String, seqCol: String): DataFrame = {
    val net = Scd2.latestPerKey(feed, key, seqCol)

    // side-presence MARKERS + string-qualified references, exactly the
    // Scd2.merge hazards: null-key rows must classify by side presence
    // (not key nullness), and a replay apply joins a snapshot whose
    // lineage CONTAINS the feed frame — captured references would
    // resolve into the wrong side of that self-join.
    val snap = snapshot.withColumn("__snap_present", lit(true)).alias("__cdc_snap")
    val chg = net.withColumn("__feed_present", lit(true)).alias("__cdc_feed")
    def sn(c: String) = col(s"__cdc_snap.$c")
    def fd(c: String) = col(s"__cdc_feed.$c")

    val keyEq = key.map(k => sn(k) === fd(k)).reduce(_ && _)
    val feedPresent = fd("__feed_present").isNotNull
    // coalesce: a NULL op must not poison the filter into three-valued
    // row-dropping — treat it as the upsert default
    val isDelete = feedPresent && coalesce(fd(opCol), lit("U")) === "D"

    snap.join(chg, keyEq, "full_outer")
      .filter(!isDelete) // matched-D drops the row; feed-only-D emits nothing
      .select(
        key.map(k => coalesce(fd(k), sn(k)).as(k)) ++
          // when(...) not coalesce: an upsert legitimately setting an
          // attribute to NULL must win over the snapshot's old value
          attrs.map(a => when(feedPresent, fd(a)).otherwise(sn(a)).as(a)): _*)
  }

  /** The INVERSE of [[applyChanges]]: derive the minimal I/U/D feed that
    * transforms snapshot `from` into snapshot `to` — the change-data
    * FEED a system emits when downstream consumers replicate it (the
    * producing half of the CDC contract; table formats call this the
    * change data feed). One full-outer join; unchanged keys emit
    * nothing, so the feed is diff-sized. Round-trip law (CdcSpec pins
    * it): `applyChanges(from, deriveFeed(from, to, …)) ≡ to` for keyed
    * rows.
    */
  def deriveFeed(from: DataFrame, to: DataFrame, key: Seq[String],
      attrs: Seq[String], seqVal: Long): DataFrame = {
    val f = from.withColumn("__from_present", lit(true)).alias("__cdc_from")
    val t = to.withColumn("__to_present", lit(true)).alias("__cdc_to")
    def fr(c: String) = col(s"__cdc_from.$c")
    def tc(c: String) = col(s"__cdc_to.$c")

    val keyEq = key.map(k => fr(k) === tc(k)).reduce(_ && _)
    val both = fr("__from_present").isNotNull && tc("__to_present").isNotNull
    val changed = attrs.map(a => !(fr(a) <=> tc(a))).reduce(_ || _)
    val op = when(fr("__from_present").isNull, lit("I"))
      .when(tc("__to_present").isNull, lit("D"))
      .otherwise(lit("U"))

    f.join(t, keyEq, "full_outer")
      .filter(!both || changed) // unchanged keys emit nothing
      .select(
        key.map(k => coalesce(tc(k), fr(k)).as(k)) ++
          attrs.map(a => when(tc("__to_present").isNotNull, tc(a)).as(a)) ++
          Seq(op.as("op"), lit(seqVal).as("seq")): _*)
  }
}
