package graft.sinks

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode}

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
  *  3. atomically rename scratch → `batch=<id>` and create the marker.
  *     The rename is the commit point; readers list only `batch=*` dirs
  *     whose marker exists.
  *
  * At scale the writes are ordinary distributed parquet jobs; only the
  * marker/rename bookkeeping is driver-side, O(1) per batch. Downstream
  * reads the sink as a partitioned table (`batch=` is a partition column
  * prefix, so pruning works). The same protocol is what Delta/Iceberg do
  * transactionally — this is the dependency-free version with the same
  * replay contract, pinned by IdempotentSinkSpec (duplicate batchId →
  * no duplicate rows; half-written scratch → repaired on replay).
  */
object IdempotentFileSink {

  /** `foreachBatch` body: write `df` under `root/batch=<batchId>`
    * exactly once. Safe to call repeatedly with the same id.
    */
  def writeBatch(df: DataFrame, root: String, batchId: Long): Unit = {
    val rootP = Paths.get(root)
    Files.createDirectories(rootP)
    val marker = rootP.resolve(s"_COMMITTED_$batchId")
    if (Files.exists(marker)) return // replayed batch: already committed

    val scratch = rootP.resolve(s"_tmp_$batchId")
    val target = rootP.resolve(s"batch=$batchId")
    df.write.mode(SaveMode.Overwrite).parquet(scratch.toString)

    // commit point: rename then marker. A crash between the two leaves a
    // committed-looking dir without a marker — readers ignore it, and the
    // replay overwrites scratch and retries the rename path after
    // deleting the orphan.
    if (Files.exists(target)) deleteRecursively(target)
    Files.move(scratch, target, StandardCopyOption.ATOMIC_MOVE)
    Files.createFile(marker)
  }

  /** Committed batch directories under `root` (marker-gated). */
  def committedBatches(root: String): Seq[Long] = {
    val rootP = Paths.get(root)
    if (!Files.exists(rootP)) Seq.empty
    else {
      val names = listNames(rootP)
      names.collect {
        case n if n.startsWith("_COMMITTED_") => n.stripPrefix("_COMMITTED_").toLong
      }.sorted
    }
  }

  private def listNames(p: java.nio.file.Path): Seq[String] = {
    val s = Files.list(p)
    try s.toArray.map(_.asInstanceOf[java.nio.file.Path].getFileName.toString).toSeq
    finally s.close()
  }

  /** Read the sink as one DataFrame — only marker-committed batches. */
  def read(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame = {
    val dirs = committedBatches(root).map(id => s"$root/batch=$id")
    require(dirs.nonEmpty, s"no committed batches under $root")
    spark.read.parquet(dirs: _*)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) listNames(p).foreach(n => deleteRecursively(p.resolve(n)))
    Files.deleteIfExists(p)
  }
}
