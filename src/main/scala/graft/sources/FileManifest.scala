package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max MANIFEST over a staging directory — the
  * table-format-lite skipping layer (Iceberg/Delta keep the same
  * per-file column bounds in their metadata): one small parquet of
  * `(file, n_rows, min_c, max_c, ...)` per tracked column, stored
  * UNDER the data directory as `_manifest` (the underscore prefix makes
  * every Spark/parquet reader skip it as metadata, so the data dir
  * stays directly readable).
  *
  * Why it matters at 100 TB: parquet row-group statistics prune WITHIN
  * a file, but the scan still opens every footer, and the LISTING alone
  * is metadata-scale work. A range query over a time-laid-out staging
  * tree (repartitionByRange writes, or natural arrival order) should
  * never touch files whose [min,max] can't intersect — the manifest
  * answers that from ONE tiny read, and the driver plans a scan over
  * only the surviving files.
  *
  * The skip decision must be SOUND, not just effective: a file is kept
  * when its bounds intersect the range OR its bounds are unknown
  * (all-NULL column → null min/max — never silently skipped), and rows
  * with a NULL predicate column never satisfy a range predicate, so
  * pruning by bounds loses no qualifying row. FileManifestSpec pins
  * full-scan equivalence and the actual file-skip count; q115
  * hash-gates a range query through the manifest path.
  *
  * Staleness: the manifest is rebuilt by the writer that lands files
  * ([[build]] after a batch of appends — the `IncrementalLedger` commit
  * point is the natural hook). `readPruned` fails LOUD when a live data
  * file is missing from the manifest (files landed since the last
  * build) rather than returning silently-partial results.
  */
object FileManifest {

  private def manifestPath(dataDir: String) = s"$dataDir/_manifest"

  /** One pass over the directory: per-file row count + min/max of each
    * tracked column, written as the `_manifest` parquet (overwrite).
    */
  def build(spark: SparkSession, dataDir: String, cols: Seq[String]): Unit = {
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dataDir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestPath(dataDir))
  }

  /** Range scan planned through the manifest: read only the files whose
    * `[min_c, max_c]` intersects `[lo, hi]` (unknown bounds kept, never
    * skipped). Returns the pruned-and-filtered frame plus the
    * (kept, total) manifest file counts so callers/specs observe the
    * skip.
    */
  def readPruned(spark: SparkSession, dataDir: String, c: String,
      lo: Column, hi: Column): (DataFrame, Int, Int) =
    readPrunedMulti(spark, dataDir, Seq((c, lo, hi)))

  /** Conjunctive multi-column range scan: a file is kept only when EVERY
    * `(col, lo, hi)` bound intersects its tracked `[min, max]` — the
    * payoff of pairing the manifest with a Z-ORDER layout
    * (LayoutQueries.morton, q88): a z-ordered write gives every file
    * tight bounds on BOTH interleaved dimensions, so a 2-D box query
    * skips at FILE granularity on both — a linearly-sorted layout can
    * only ever skip on its sort dimension (ZorderManifestSpec measures
    * exactly that asymmetry). Unknown bounds still keep the file.
    */
  def readPrunedMulti(spark: SparkSession, dataDir: String,
      bounds: Seq[(String, Column, Column)]): (DataFrame, Int, Int) = {
    require(bounds.nonEmpty, "readPrunedMulti with no bounds")
    val mdf = spark.read.parquet(manifestPath(dataDir))
    val total = mdf.count().toInt
    require(total > 0, s"empty manifest under $dataDir — build() first")

    // the manifest must COVER the directory: a file landed after the
    // last build would otherwise be silently absent from every range
    // query — fail loud, the writer owes a rebuild
    val hfs = new org.apache.hadoop.fs.Path(dataDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // both sides normalized through Path.toString: input_file_name()
    // emits file:///x URIs (PERCENT-ENCODED — a space is %20) while
    // Hadoop's listing prints file:/x with literal characters; decode
    // URI-shaped strings first or a data dir containing a space would
    // flag every file as unmanifested forever
    def norm(s: String) = {
      val p =
        try new org.apache.hadoop.fs.Path(new java.net.URI(s))
        catch { case _: Exception => new org.apache.hadoop.fs.Path(s) }
      p.toString
    }
    // RECURSIVE listing: build() reads through spark.read.parquet, which
    // descends into partition subdirectories — a top-level listStatus
    // would list nothing for a partitioned layout and reduce this guard
    // to a no-op. A file is metadata (excluded) when ANY path segment
    // under dataDir is underscore/dot-prefixed (_manifest's own files
    // must not count as unmanifested data).
    val rootUri = new org.apache.hadoop.fs.Path(dataDir)
      .makeQualified(hfs.getUri, hfs.getWorkingDirectory).toString
    def hiddenUnderRoot(p: org.apache.hadoop.fs.Path): Boolean = {
      var cur = p
      while (cur != null && cur.toString != rootUri) {
        if (cur.getName.startsWith("_") || cur.getName.startsWith(".")) return true
        cur = cur.getParent
      }
      false
    }
    val it = hfs.listFiles(new org.apache.hadoop.fs.Path(dataDir), true)
    val liveB = Set.newBuilder[String]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && !hiddenUnderRoot(st.getPath))
        liveB += norm(st.getPath.toString)
    }
    val live = liveB.result()
    val manifested = mdf.select("file").collect()
      .map(r => norm(r.getString(0))).toSet
    val unknown = live -- manifested
    require(unknown.isEmpty,
      s"manifest under $dataDir is stale: ${unknown.size} unmanifested " +
        s"files (e.g. ${unknown.headOption.getOrElse("")}) — rebuild")

    // bound test in Spark expression semantics (same coercions the data
    // filter gets), on the tiny manifest frame
    val keepFile = bounds.map { case (c, lo, hi) =>
      col(s"min_$c").isNull || col(s"max_$c").isNull ||
        (col(s"min_$c") <= hi && col(s"max_$c") >= lo)
    }.reduce(_ && _)
    // decoded through norm for the read as well: spark.read treats its
    // path strings literally, so a percent-encoded %20 from
    // input_file_name would be looked up as a literal "%20" directory
    val kept = mdf.filter(keepFile)
      .select("file").collect().map(r => norm(r.getString(0))).toSeq
    // basePath pins schema parity with the unpruned read: without it, a
    // leaf-file read under hive-style partition dirs drops the partition
    // columns, so the pruned frame's schema would diverge from the full
    // scan (and from the kept-empty branch below)
    val df =
      if (kept.isEmpty)
        spark.read.parquet(dataDir).filter(lit(false)) // schema-stable empty
      else spark.read.option("basePath", dataDir).parquet(kept: _*)
    val rowPred = bounds.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi }.reduce(_ && _)
    (df.filter(rowPred), kept.size, total)
  }
}
