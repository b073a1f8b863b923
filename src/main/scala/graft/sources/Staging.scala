package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Staging-layer sources/sinks (SURVEY.md §2.1 S4/S5/S7/S8): fixed-schema
  * CSV/JSON readers and writers, plus date/species-partitioned staging.
  *
  * The reference stages API responses as pretty JSON files per
  * (species, date-window) (`whalefinder/obis.py:149-164`) and prunes files
  * by date-window regex before validation (`whalefinder/validate.py:85-143`).
  * Here staging is written `partitionBy(...)` so that pruning is Catalyst
  * partition pruning — the filter reaches the file listing, no regex over
  * file names, and the layout scales to any number of partitions.
  *
  * All readers take an explicit `StructType`: schema is DECLARED, never
  * inferred (the pydantic model is a declared schema — SURVEY.md §1.3),
  * which also avoids the extra inference scan at 100 TB.
  */
object Staging {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** Columnar ORC sink/source — the second columnar format Spark ships
    * natively. Same declared-schema discipline as CSV/JSON; ORC carries
    * its own types so the read is a schema CHECK, not a parse, and scans
    * get predicate pushdown + column pruning like parquet.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Partitioned staging sink: one directory per partition-column value
    * (the reference's per-species staging dirs, made prunable).
    */
  def writePartitioned(df: DataFrame, partitionCols: Seq[String], path: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Partition BACKFILL sink: overwrite exactly the partitions present
    * in `df`, leaving every sibling partition's files untouched — the
    * idempotent-backfill pattern (recompute one bad day/lang/source and
    * land it atomically per partition) that at 100 TB replaces "rewrite
    * the whole table because Tuesday was wrong". Implemented with
    * Spark's dynamic partition-overwrite mode, set per-WRITE here (the
    * DataFrameWriter option wins over the session conf, so the engine
    * never flips global state): static mode would first DELETE every
    * partition under `path`, dynamic replaces only the partitions the
    * incoming rows name. PartitionBackfillSpec pins both halves of the
    * contract — replaced content AND byte-identical sibling files.
    */
  def overwritePartitions(df: DataFrame, partitionCols: Seq[String], path: String): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Schema-EVOLVED staging read: one declared target schema over a
    * staging area whose parquet files were written under several schema
    * versions — the operational reality of a 100 TB staging tree written
    * over months. Per evolution class, the declared read reconciles:
    *
    *   - column ADDED since a file was written (missing in the file) →
    *     null, vectorized, no per-file branching;
    *   - column REMOVED from the contract (extra in old files) → never
    *     read (column pruning — the scan reads only target columns);
    *   - type WIDENED (int32→int64, float→double, the
    *     backward-compatible promotions) → widened at scan time by the
    *     vectorized parquet reader's type promotion;
    *   - column ORDER differences → irrelevant (parquet resolves by
    *     name).
    *
    * This stays a SINGLE multi-path scan — no per-version read + union,
    * no `mergeSchema` footer sweep over every file (which at 100 TB is a
    * listing-scale job before any data is read, and rejects exactly the
    * int→long widening evolution ships). The declared target IS the
    * contract; SchemaEvolutionSpec pins each reconciliation class, and
    * incompatible drift (a NARROWING, a renamed column) fails the scan
    * loudly rather than nulling silently — narrowing errors at read,
    * renames read as the add+remove they physically are.
    */
  def readEvolved(spark: SparkSession, target: StructType, paths: Seq[String]): DataFrame =
    spark.read.schema(target).parquet(paths: _*)

  /** Compacting sink: writes `df` as ⌈rows / targetFileRows⌉ similarly-
    * sized parquet files. The small-files problem is an operational
    * failure mode at scale — a 32-partition shuffle writing hourly for a
    * year is ~280k files whose LISTING dominates downstream scan setup.
    * One count action sizes the layout; `repartition(n)` (round-robin)
    * balances rows across writers, and `maxRecordsPerFile` caps any
    * writer that still ends up oversized.
    */
  def writeCompacted(df: DataFrame, path: String, targetFileRows: Long): Unit = {
    // checkpoint before the sizing count, or the full upstream plan
    // (possibly an expensive join/aggregate) executes twice — once for
    // count(), again for the write
    val snap = graft.Materialize.checkpoint(df)
    val rows = snap.count()
    val files = math.max(1L, (rows + targetFileRows - 1) / targetFileRows).toInt
    snap.repartition(files)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetFileRows)
      .parquet(path)
  }

  /** CLUSTERING-PRESERVING compaction — the `OPTIMIZE … ZORDER BY`
    * shape: rewrite a directory of many small files (the residue every
    * streaming/incremental sink leaves) as few right-sized files
    * GLOBALLY SORTED on `sortCols`, so file-level manifests and parquet
    * row-group stats skip again afterwards. [[writeCompacted]]'s
    * round-robin balance is the wrong tool here — it destroys exactly
    * the clustering that data skipping prices in; this one pays a
    * range shuffle (repartitionByRange → disjoint per-file key ranges)
    * plus in-partition sorts (tight row-group bounds within each file).
    *
    * Rewrite-then-repoint: output lands in `outDir` — a directory swap
    * is not atomic on object stores, so the caller repoints readers (or
    * the table pointer) after the rewrite, the same reason table
    * formats version their manifests. Rebuild the [[FileManifest]] on
    * the new directory as part of the repoint.
    */
  def compactSorted(spark: SparkSession, inDir: String, outDir: String,
      sortCols: Seq[String], targetFileRows: Long): Unit = {
    val df = spark.read.parquet(inDir)
    val rows = df.count()
    val files = math.max(1L, (rows + targetFileRows - 1) / targetFileRows).toInt
    val keys = sortCols.map(col)
    df.repartitionByRange(files, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetFileRows)
      .parquet(outDir)
  }
}
