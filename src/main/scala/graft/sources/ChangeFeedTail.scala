package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** DECOUPLED change-feed consumer: an independent reader tailing a
  * [[FileManifest]] MVCC table's version chain through a durable
  * cursor — the production CDC topology (Delta's `readChangeFeed`
  * stream, a Kafka consumer group's committed offset), where the
  * consumer is a SEPARATE process from the writer: it polls
  * `versions()`, consumes `changesBetween(cursor, head)` — possibly
  * spanning several commits in one feed — applies it, and commits the
  * cursor. Contrast q171, where view maintenance runs inside the
  * writer's own foreachBatch; q173 gates this consumer.
  *
  * Delivery contract: AT-LEAST-ONCE. The cursor commits strictly AFTER
  * `apply` returns, so a crash between the two re-delivers the same
  * `(from, head]` range on the next poll. Consumers make replay safe
  * the same way q171's view does — keying their output by the feed's
  * `toV` (a replayed range overwrites its own snapshot with identical
  * content) — or by applying through an idempotent keyed MERGE.
  *
  * Cursor durability is the ledger protocol in miniature: the version
  * number is written to a tmp file and RENAMED over `cursor` (atomic on
  * HDFS/local semantics via delete+rename — a crash inside the window
  * leaves no cursor, and [[cursor]] then falls back to the newest
  * `cursor.v{N}` backup, which always names the last committed value).
  *
  * Retention coupling: the feed is resolvable only while BOTH endpoint
  * versions are retained — a consumer lagging past the table's
  * `vacuum(keepVersions)` window fails LOUD in changesBetween (named
  * retained range) rather than silently skipping changes; size
  * retention above the longest consumer outage, exactly Delta's
  * documented CDF/VACUUM contract.
  *
  * Single consumer group per cursor dir: rival polls of one cursor
  * serialize on a [[CommitLock]], so two workers sharing a cursor can't
  * interleave apply/commit (each sees the other's committed cursor).
  * Distinct consumer groups use distinct cursor dirs.
  */
object ChangeFeedTail {

  private def cursorFile(dir: Path) = new Path(dir, "cursor")

  private def readSmall(fs: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val in = fs.open(p)
    try in.readFully(buf) finally in.close()
    new String(buf, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def fsOf(spark: SparkSession, dir: String) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** The committed cursor — the table version through which this
    * consumer has durably applied changes — or None before [[init]].
    * A crash inside the commit's delete+rename window leaves no
    * `cursor` file; the newest `cursor.v{N}` tmp (written complete
    * before the rename was attempted) recovers the committed value.
    */
  def cursor(spark: SparkSession, cursorDir: String): Option[Long] = {
    val (fs, dir) = fsOf(spark, cursorDir)
    if (!fs.exists(dir)) return None
    // exists→read is TOCTOU against a rival's delete+rename commit
    // window (this read is deliberately lock-free — a status probe must
    // not serialize behind a worker's apply): a vanished cursor file
    // falls through to the backup scan, which always names the last
    // committed value
    val direct =
      try {
        if (fs.exists(cursorFile(dir)))
          Some(readSmall(fs, cursorFile(dir)).trim.toLong)
        else None
      } catch { case _: java.io.FileNotFoundException => None }
    direct.orElse(
      fs.listStatus(dir).iterator.map(_.getPath.getName)
        .collect { case n if n.startsWith("cursor.v") =>
          n.stripPrefix("cursor.v").toLong }
        .maxOption)
  }

  /** Start (or restart) a consumer group at `version`: the next poll
    * consumes `(version, head]`. Callers snapshot their derived state
    * (materialize the view, copy the table) AS OF this version first —
    * init is the "I have fully absorbed everything through v" claim.
    */
  def init(spark: SparkSession, cursorDir: String, version: Long): Unit = {
    val (fs, dir) = fsOf(spark, cursorDir)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    // same lock as poll: a restart-time re-init racing a live worker's
    // commit would otherwise interleave two unserialized delete+rename
    // sequences on the same cursor file (the worker's rename could
    // silently overwrite the freshly committed restart version)
    CommitLock.withLock(fs, new Path(dir, ".lock")) {
      commitCursor(fs, dir, version)
    }
  }

  private def commitCursor(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path, v: Long): Unit = {
    val tmp = new Path(dir, s"cursor.v$v")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // every OTHER backup is superseded the moment this one is complete —
    // sweep BEFORE the rename so the fallback in [[cursor]] can only
    // ever see the value being committed. Sweeping != v, not just < v:
    // a BACKWARD init (restarting the group at an older version after a
    // torn commit left a high cursor.v{N}) must remove the stale higher
    // backup too, or a later torn commit would "recover" forward past
    // changes the restarted consumer never re-applied.
    fs.listStatus(dir).iterator
      .filter { s =>
        val n = s.getPath.getName
        n.startsWith("cursor.v") && n != s"cursor.v$v"
      }
      .foreach(s => fs.delete(s.getPath, false))
    fs.delete(cursorFile(dir), false)
    if (!fs.rename(tmp, cursorFile(dir)))
      throw new java.io.IOException(s"cursor commit rename failed at $dir (v$v)")
  }

  /** ONE poll: if the table's head version moved past the cursor, hand
    * `apply` the netted change feed for the WHOLE gap `(cursor, head]`
    * (one feed however many commits landed — file-set diffing makes a
    * multi-commit span no more work than its touched files), then
    * commit the cursor at `head`. Returns the consumed `(from, to)`
    * range, or None when already caught up (the idle tick is two
    * metadata listings — no Spark job).
    */
  def poll(spark: SparkSession, tableDir: String, cursorDir: String,
      lockWaitMs: Long = 600000L)(
      apply: (DataFrame, Long, Long) => Unit): Option[(Long, Long)] = {
    val (fs, dir) = fsOf(spark, cursorDir)
    require(fs.exists(dir),
      s"no cursor under $cursorDir — init(version) first (and snapshot " +
        "your derived state as of that version)")
    CommitLock.withLock(fs, new Path(dir, ".lock"), waitMs = lockWaitMs) {
      val from = cursor(spark, cursorDir).getOrElse(
        throw new IllegalStateException(
          s"cursor dir $cursorDir exists but holds no committed cursor"))
      val head = FileManifest.versions(spark, tableDir).lastOption.getOrElse(
        throw new IllegalArgumentException(
          s"no manifest versions under $tableDir"))
      if (head <= from) None
      else {
        val feed = FileManifest.changesBetween(spark, tableDir, from, head)
        apply(feed, from, head)
        commitCursor(fs, dir, head)
        Some((from, head))
      }
    }
  }

  /** Poll until caught up with the head observed at each iteration —
    * the drain loop a scheduled consumer runs. Returns every consumed
    * range, oldest first.
    */
  def drain(spark: SparkSession, tableDir: String, cursorDir: String)(
      apply: (DataFrame, Long, Long) => Unit): Seq[(Long, Long)] = {
    val out = Seq.newBuilder[(Long, Long)]
    var advanced = true
    while (advanced) {
      advanced = poll(spark, tableDir, cursorDir)(apply) match {
        case Some(r) => out += r; true
        case None => false
      }
    }
    out.result()
  }

  /** Retention sweep for version-keyed consumer snapshots (`prefix{N}`
    * dirs, e.g. `mv/v{N}`): delete all but the newest `keep`. The
    * replay window only ever re-reads the snapshot at the feed's
    * `fromV` — one behind head — so any `keep >= 2` is safe; snapshots
    * otherwise accumulate one dir per table commit forever.
    */
  def pruneSnapshots(spark: SparkSession, snapDir: String, prefix: String,
      keep: Int = 3): Seq[Long] = {
    require(keep >= 2, s"keep=$keep: the replay window needs the previous snapshot")
    val (fs, dir) = fsOf(spark, snapDir)
    if (!fs.exists(dir)) return Nil
    val vs = fs.listStatus(dir).iterator.map(_.getPath.getName)
      .collect { case n if n.startsWith(prefix) &&
          n.stripPrefix(prefix).nonEmpty &&
          n.stripPrefix(prefix).forall(_.isDigit) =>
        n.stripPrefix(prefix).toLong }
      .toSeq.sorted
    val doomed = vs.dropRight(keep)
    doomed.foreach(v => fs.delete(new Path(dir, s"$prefix$v"), true))
    doomed
  }
}
