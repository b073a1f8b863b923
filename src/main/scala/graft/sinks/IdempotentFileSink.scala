package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Exactly-once file sink for `foreachBatch` — the standard pattern when
  * a stream writes files without a transactional table format.
  *
  * Structured Streaming's `foreachBatch` contract is at-least-once: after
  * a crash between the user function and the checkpoint commit, the SAME
  * `batchId` is replayed. Exactly-once therefore needs the sink itself to
  * be idempotent per batch id. Protocol (one directory per batch):
  *
  *  1. already committed? (`_COMMITTED_<id>` marker exists) → skip — the
  *     replay after a post-write crash lands here and writes nothing.
  *  2. write the batch to a scratch dir (`_tmp_<id>`), overwrite mode —
  *     a HALF-written scratch from a mid-write crash is simply rewritten.
  *  3. rename scratch → `batch=<id>` and create the marker. The rename
  *     is the commit point; readers list only `batch=*` dirs whose
  *     marker exists.
  *
  * At scale the writes are ordinary distributed parquet jobs; only the
  * marker/rename bookkeeping is driver-side, O(1) per batch — and it
  * runs through the Hadoop `FileSystem` API resolved from the ROOT's
  * scheme, never `java.nio.file`: the root may live on hdfs:// or
  * s3a://, where a driver-local filesystem probe is always wrong (the
  * same rule [[graft.streaming.StreamOps]] and
  * [[graft.sources.IncrementalLedger]] follow). Downstream reads the
  * sink as a partitioned table (`batch=` is a partition column prefix,
  * so pruning works — [[read]] sets `basePath` so the column actually
  * surfaces). The same protocol is what Delta/Iceberg do
  * transactionally — this is the dependency-free version with the same
  * replay contract, pinned by IdempotentSinkSpec (duplicate batchId →
  * no duplicate rows; half-written scratch → repaired on replay).
  */
object IdempotentFileSink {

  private def fsFor(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** `foreachBatch` body: write `df` under `root/batch=<batchId>`
    * exactly once. Safe to call repeatedly with the same id, AND safe
    * against CONCURRENT writers racing the same (root, batchId):
    *
    *  - each attempt stages into its own nonce-suffixed scratch dir, so
    *    rival write jobs can never tear one another's files;
    *  - the commit section (orphan sweep → rename → marker) runs under
    *    the [[graft.sources.CommitLock]] for this batch id — atomic
    *    create-no-overwrite, the primitive HDFS/local guarantee — and
    *    RE-CHECKS the marker inside the lock, so exactly one rival
    *    publishes and the rest observe the marker and discard their
    *    scratch. First-writer-wins (same batch id ⇒ same logical
    *    content by the foreachBatch replay contract, so which attempt
    *    lands is immaterial; MultiWriterSpec pins one-winner/no-torn).
    *  - a writer that crashes INSIDE the commit section leaves a lock
    *    a rival breaks after the staleness window, plus at worst an
    *    unmarked target dir the winner's sweep replaces. A loser that
    *    crashes BEFORE its lock turn leaves only its own `_tmp_*`
    *    scratch — invisible to readers (underscore-hidden) and safe to
    *    GC by age out-of-band; it is deliberately NOT swept here, since
    *    a live rival may still be staging into its scratch while we
    *    hold the commit lock.
    */
  def writeBatch(df: DataFrame, root: String, batchId: Long): Unit = {
    val (fs, rootP) = fsFor(df.sparkSession, root)
    fs.mkdirs(rootP)
    val marker = new Path(rootP, s"_COMMITTED_$batchId")
    if (fs.exists(marker)) return // replayed batch: already committed

    val scratch = new Path(rootP,
      s"_tmp_${batchId}_${java.util.UUID.randomUUID().toString.take(8)}")
    val target = new Path(rootP, s"batch=$batchId")
    df.write.mode(SaveMode.Overwrite).parquet(scratch.toString)

    graft.sources.CommitLock.withLock(fs, new Path(rootP, s"_LOCK_$batchId")) {
      if (fs.exists(marker)) {
        fs.delete(scratch, true) // a rival committed while we staged
      } else {
        // commit point: rename then marker. A crash between the two
        // leaves a committed-looking dir without a marker — readers
        // ignore it, and the next attempt sweeps the orphan here.
        if (fs.exists(target)) fs.delete(target, true)
        if (!fs.rename(scratch, target))
          throw new java.io.IOException(
            s"commit rename failed for batch $batchId under $root")
        fs.create(marker, true).close()
      }
    }
  }

  /** Committed batch ids under `root` (marker-gated), resolved through
    * `spark`'s Hadoop conf — the SAME session the caller reads/writes
    * with, so a multi-session JVM (or a foreachBatch worker whose active
    * session differs) can't list one store and read another.
    */
  def committedBatches(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, rootP) = fsFor(spark, root)
    if (!fs.exists(rootP)) Seq.empty
    else fs.listStatus(rootP).iterator
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("_COMMITTED_") =>
        n.stripPrefix("_COMMITTED_").toLong }
      .toSeq.sorted
  }

  /** [[committedBatches]] against the active session — for callers with
    * no session in hand (single-session deployments).
    */
  def committedBatches(root: String): Seq[Long] =
    committedBatches(SparkSession.active, root)

  /** Read the sink as one DataFrame — only marker-committed batches.
    * `basePath` keeps `batch` a real partition column on the leaf-dir
    * read, so consumers can select and prune by batch id.
    */
  def read(spark: SparkSession, root: String): DataFrame = {
    val dirs = committedBatches(spark, root).map(id => s"$root/batch=$id")
    require(dirs.nonEmpty, s"no committed batches under $root")
    spark.read.option("basePath", root).parquet(dirs: _*)
  }
}
