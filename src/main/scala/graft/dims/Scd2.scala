package graft.dims

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension MERGE: fold an update batch into a
  * versioned dimension — the warehouse operation behind "keep history
  * when an attribute changes" (the reference's dimensions are type-1
  * overwrites; this is the production-grade upgrade path).
  *
  * Dimension contract: one row per (key, version) carrying the tracked
  * attributes plus `valid_from` / `valid_to` / `is_current`
  * (`valid_to` NULL on the open version). Batch contract: one row per
  * key with the same attribute types (a batch is one effective instant;
  * when upstream emits several updates per key, [[latestPerKey]]
  * collapses to the final one — batch-granularity SCD, intermediate
  * flickers inside one batch don't version).
  *
  * Merge semantics per key:
  *   - new key → one open version at `effTs`;
  *   - existing key, any tracked attribute changed (NULL-SAFE compare:
  *     NULL→value and value→NULL are changes, NULL→NULL is not) →
  *     close the current version at `effTs`, open a new one;
  *   - attributes identical → NO-OP (re-merging the same batch is
  *     idempotent — no version churn from replayed feeds);
  *   - key absent from the batch → untouched.
  *
  * NULL-keyed rows get SQL MERGE semantics, which bounds what
  * idempotence can promise: a NULL key matches nothing, so a null-key
  * dim row always carries through untouched, and a null-key BATCH row
  * inserts as a fresh open version on EVERY merge — replaying such a
  * batch appends duplicates, exactly as MERGE INTO would. The
  * idempotence guarantee above therefore holds for keyed rows; feeds
  * that can carry null keys should repair or divert them upstream
  * (the [[graft.validate]] layer's job) before merging.
  *
  * Execution shape at scale: history rows pass through UNTOUCHED (no
  * join — they're closed, nothing can change them), and the whole merge
  * is ONE full-outer join of current-versions ⋈ batch on the key (both
  * sides hash-partition on it) followed by a map-side struct explode
  * that emits 0–2 output rows per joined row (close + reopen for a
  * change) — the Delta/Iceberg MERGE shape, never N passes over the
  * join (Scd2Spec pins the single-join plan). The result is a full new
  * dimension frame — land it with an atomic rewrite (or
  * [[graft.sources.Staging.overwritePartitions]] when the dim is
  * key-bucket partitioned).
  */
object Scd2 {

  /** Collapse a multi-update batch to the last update per key, ordered
    * by `orderCol` (ties broken by the remaining columns for
    * determinism).
    */
  def latestPerKey(batch: DataFrame, key: Seq[String], orderCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tieBreak = batch.columns.filterNot(key.contains).sorted.map(col).toSeq
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy((col(orderCol).desc +: tieBreak.map(_.desc)): _*)
    batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  def merge(dim: DataFrame, batch: DataFrame, key: Seq[String],
      attrs: Seq[String], effTs: Long): DataFrame =
    mergeCore(dim, batch, key, attrs, opCol = None, effTs)

  /** The one merge kernel [[merge]] and [[applyCdc]] share — their
    * semantics differ ONLY in the delete predicate (`opCol = None` ⇒
    * nothing is ever a delete, and every applyCdc emit leg reduces to
    * merge's), so the replay-self-join and NULL-key hazards are encoded
    * exactly once.
    */
  private def mergeCore(dim: DataFrame, batch: DataFrame, key: Seq[String],
      attrs: Seq[String], opCol: Option[String], effTs: Long): DataFrame = {
    val outNames = key ++ attrs ++ Seq("valid_from", "valid_to", "is_current")

    val history = dim.filter(!col("is_current"))
    // string-QUALIFIED references throughout, never df("col"): a replay
    // merge joins a dim whose lineage CONTAINS the batch frame (the
    // idempotence case), and captured attribute references would then
    // resolve into the wrong side of the self-join.
    // Side-presence MARKERS, not key nullability: a row with a NULL (or
    // partially NULL) key never joins, and classifying the legs by
    // key-column nullness would then put it in NO leg — silently
    // deleting a current dimension row. The markers are non-null by
    // construction, so null-key dim rows carry through untouched and
    // null-key batch rows insert as their own open versions (SQL join
    // semantics: NULL keys match nothing).
    val current = dim.filter(col("is_current"))
      .withColumn("__cur_present", lit(true)).alias("__scd_cur")
    val bat = batch.withColumn("__bat_present", lit(true)).alias("__scd_bat")
    def cur(c: String) = col(s"__scd_cur.$c")
    def upd(c: String) = col(s"__scd_bat.$c")

    val keyEq = key.map(k => cur(k) === upd(k)).reduce(_ && _)
    val joined = current.join(bat, keyEq, "full_outer")

    val matched = cur("__cur_present").isNotNull && upd("__bat_present").isNotNull
    val dimOnly = cur("__cur_present").isNotNull && upd("__bat_present").isNull
    val batchOnly = upd("__bat_present").isNotNull && cur("__cur_present").isNull
    // coalesce: a NULL op is the upsert default, never a three-valued
    // filter poison (the Cdc.applyChanges rule)
    val isDel = opCol.map(c => coalesce(upd(c), lit("U")) === "D")
      .getOrElse(lit(false))
    // null-safe inequality on ANY tracked attribute = a real change
    val changed = attrs.map(a => !(cur(a) <=> upd(a))).reduce(_ || _)

    def row(keyCols: Seq[Column], attrCols: Seq[Column],
        vf: Column, vt: Column, isCur: Column): Column =
      struct((key.zip(keyCols).map { case (n, c) => c.as(n) } ++
        attrs.zip(attrCols).map { case (n, c) => c.as(n) } ++ Seq(
          vf.cast("long").as("valid_from"),
          vt.cast("long").as("valid_to"),
          isCur.as("is_current"))): _*)

    val closedRow = row(key.map(cur(_)), attrs.map(cur(_)),
      cur("valid_from"), lit(effTs), lit(false))
    val carriedRow = row(key.map(cur(_)), attrs.map(cur(_)),
      cur("valid_from"), cur("valid_to"), cur("is_current"))
    val openedRow = row(key.map(upd(_)), attrs.map(upd(_)),
      lit(effTs), lit(null), lit(true))

    val emitted = joined.select(explode(filter(array(
      when(matched && (isDel || changed), closedRow),
      when(dimOnly || (matched && !isDel && !changed), carriedRow),
      when((batchOnly || (matched && changed)) && !isDel, openedRow)),
      c => c.isNotNull)).as("r"))
      .select(outNames.map(n => col(s"r.$n")): _*)

    history.select(outNames.map(col): _*).unionByName(emitted)
  }

  /** CDC feed → TYPE-2 HISTORY: fold one I/U/D change batch into the
    * versioned dimension — the composition of [[Cdc.applyChanges]]'s
    * feed contract (op + per-key monotone sequence, out-of-order safe)
    * with [[merge]]'s keep-history semantics, so a replication feed
    * maintains the full version history instead of just the current
    * mirror. Per key, after the [[latestPerKey]] net-effect collapse:
    *
    *   - net I/U, current version exists, attributes changed (null-safe)
    *     → close current at `effTs`, open a new version;
    *   - net I/U, unchanged → NO-OP (replayed feeds never version);
    *   - net I/U, no current version (new key, or a key DELETED by an
    *     earlier batch) → open a version at `effTs` — the resurrect
    *     case, upsert semantics exactly as `applyChanges`;
    *   - net D, current exists → close it at `effTs`, open NOTHING (the
    *     key's history survives; it simply has no current row);
    *   - net D, no current → no-op (idempotent delete);
    *   - key absent from the feed → untouched.
    *
    * The laws CdcScd2Spec pins: replaying a batch onto its own output
    * is a no-op (deletes stay closed, upserts re-assert — at-least-once
    * delivery is safe), and the CURRENT rows of any batch-sequential
    * fold equal [[Cdc.applyChanges]] applied to the same batches (the
    * history is a strict superset view of the mirror). Execution shape
    * unchanged from [[merge]]: history rows pass through untouched, one
    * full-outer join current ⋈ net, 0–2 emitted rows per joined row.
    * NULL keys get MERGE semantics exactly as [[merge]] documents.
    */
  def applyCdc(dim: DataFrame, feed: DataFrame, key: Seq[String],
      attrs: Seq[String], opCol: String, seqCol: String, effTs: Long): DataFrame =
    mergeCore(dim, latestPerKey(feed, key, seqCol), key, attrs,
      Some(opCol), effTs)

  /** An empty dimension with the merge's schema, for first-load merges
    * (every batch row becomes an open version).
    */
  def emptyDim(batch: DataFrame, key: Seq[String], attrs: Seq[String]): DataFrame =
    batch.select((key ++ attrs).map(col) :+ lit(0L).as("valid_from"): _*)
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
      .filter(lit(false))
}
