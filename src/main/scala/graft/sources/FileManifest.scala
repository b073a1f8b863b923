package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** Label the Spark jobs `body` submits (guide §1.5: a multi-commit
    * verb schedules many small actions — plan collects, staging writes,
    * manifest writes — and an unlabeled UI/profiler can't attribute
    * them). Thread-local, restores the caller's description on exit so
    * nesting and user-set labels compose.
    */
  private def labeled[T](spark: SparkSession, desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }

  private def manifestPath(dataDir: String) = s"$dataDir/_manifest"
  private def histPath(dataDir: String, v: Long) = s"$dataDir/_manifest_v$v"

  /** Version stamped inside a manifest dir as an empty `_v{N}` marker
    * file — underscore-prefixed, so every parquet/Spark reader ignores
    * it, and it RIDES THE RENAME when a manifest becomes history.
    * Manifests written before versioning carry no marker and read as
    * version 1.
    */
  private def versionOf(hfs: org.apache.hadoop.fs.FileSystem,
      mdir: org.apache.hadoop.fs.Path): Long = {
    // Hadoop's local listStatus is NOT atomic: it lists child NAMES,
    // then stats each child BY PATH, silently DROPPING children whose
    // stat races a concurrent swap-rename (the per-child FNFE is
    // swallowed) — so a listing taken mid-swap can come back EMPTY or
    // PARTIAL instead of throwing (measured ~1% of tight polls against
    // a rename-churn loop). A FOUND `_v{N}` marker is always
    // trustworthy: listings never fabricate entries, and both dirs a
    // racing path can resolve to are legitimate versions of this table
    // (returning the just-renamed-away version is linearizable — it WAS
    // current an instant ago). A MISSING marker is ambiguous — legacy
    // pre-versioning manifest (legitimately reads as 1) vs torn view —
    // so it is re-probed until stable; only a marker-less answer that
    // survives the backoff is accepted as legacy. Documented trade-off:
    // a genuinely LEGACY (pre-versioning) manifest pays the full ~30 ms
    // backoff on EVERY probe — acceptable because every manifest this
    // library has ever written carries a marker; cache the legacy
    // determination per path if foreign marker-less tables ever matter.
    var attempt = 0
    while (true) {
      val found = hfs.listStatus(mdir).iterator.map(_.getPath.getName)
        .collectFirst {
          case n if n.startsWith("_v") && n.length > 2 &&
            n.drop(2).forall(_.isDigit) => n.drop(2).toLong
        }
      found match {
        case Some(v) => return v
        case None =>
          attempt += 1
          if (attempt > 3) return 1L
          Thread.sleep(5L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** True when `t` (or any link of its cause chain) has the shape a
    * concurrent manifest swap-rename leaves behind on a lock-free
    * reader: the directory vanished between the reader's exists/open
    * probe and its listing. HDFS and the object-store connectors throw
    * FileNotFoundException there, but Hadoop's RawLocalFileSystem
    * (local disk, NFS — exactly what CI and dev boxes run on) throws a
    * BARE `IOException("Invalid directory or I/O error occurred for
    * dir: …")` when `java.io.File.list()` returns null inside its own
    * exists→list gap — and, third flavor (SwapRaceSpec's churn stress
    * caught it), `java.nio.file.AccessDeniedException("Permission
    * denied")` from Hadoop's `FileUtil.list`, which re-probes
    * `exists()` after a null `list()` and, when the dir has already
    * been renamed BACK IN by the swap's second rename, misdiagnoses
    * the transient as a permission problem. Every swap-tolerance site
    * must treat all three as "not found"; matching only the FNFE shape
    * leaves lock-free readers (change-feed polls, DESCRIBE HISTORY,
    * version probes) a small per-commit crash window on local
    * filesystems — the exact failure ChangeFeedTailSpec caught
    * intermittently. Trade-off, documented: a GENUINELY
    * permission-broken manifest dir now resolves like a half-swap
    * (bounded retries, then history fallback / loud downstream
    * retention errors) instead of surfacing AccessDenied from a
    * read-only probe — acceptable because every writer path still
    * fails loud on its own create/rename syscalls.
    */
  private[sources] def isVanishedDir(t: Throwable): Boolean = {
    var c = t
    while (c != null) {
      c match {
        case _: java.io.FileNotFoundException => return true
        case _: java.nio.file.AccessDeniedException => return true
        case e: java.io.IOException
            if e.getMessage != null && e.getMessage.contains(
              "Invalid directory or I/O error occurred") => return true
        case _ =>
      }
      c = c.getCause
    }
    false
  }

  /** Union of every retained history manifest's file paths (normed,
    * one column `h_file`) — None when the table has no history. The
    * set of files that are PRIOR-SNAPSHOT members rather than current
    * data or fresh appends; refresh, coverage, and vacuum all consult
    * it so MVCC leftovers are never re-manifested, never flagged
    * uncovered, and never reaped while their version is retained.
    */
  private def historyFiles(spark: SparkSession, dataDir: String,
      hfs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Option[DataFrame] = {
    val hs = historyVersions(hfs, root)
    if (hs.isEmpty) None
    // ONE multi-path read, not one read per version: each spark.read
    // pays driver-side schema inference and plan analysis, so a deep
    // history made every coverage check O(versions) in fixed overhead.
    // Only `file` is selected — present in every manifest whatever
    // tracked-column drift the versions carry — and the schema is
    // passed EXPLICITLY, so the read both skips footer inference
    // entirely and is immune to min_/max_ type drift across versions.
    else Some(spark.read
      .schema(StructType(Seq(StructField("file", StringType))))
      .parquet(hs.map(histPath(dataDir, _)): _*)
      .select(ManifestFileIndex.normPath(col("file")).as("h_file"))
      .distinct())
  }

  /** Retained HISTORY versions under `dataDir` (ascending) — the
    * manifests a [[readAsOf]] can still plan from, current excluded.
    */
  private def historyVersions(hfs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[Long] =
    historyDirs(hfs, root).keysIterator.toSeq.sorted

  /** ONE root listing → every `_manifest_v{N}` history entry, version →
    * FileStatus. The single enumeration both [[versions]] and
    * [[opsOfVersions]] derive from — CDC callers thread this map
    * through so a poll pays one root listStatus, not two (on a large
    * FLAT table the data files live in the root, so each listing is
    * O(files) driver RPCs). Name match is LITERAL, never a glob: a
    * dataDir containing glob metacharacters like `[1]` must not
    * pattern-match a SIBLING table's history.
    */
  private def historyDirs(hfs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path)
      : Map[Long, org.apache.hadoop.fs.FileStatus] =
    hfs.listStatus(root).iterator.flatMap { st =>
      val n = st.getPath.getName
      val d = n.stripPrefix("_manifest_v")
      if (n.startsWith("_manifest_v") && d.nonEmpty && d.forall(_.isDigit))
        Some(d.toLong -> st)
      else None
    }.toMap

  /** The `_manifest` parquet as a (lazy, distributed) DataFrame — the
    * ONE way planning code touches manifest CONTENT. Bounds and bloom
    * binaries stay in scan partitions; callers filter/join this frame
    * with Spark jobs and collect only what is per-query driver-sized
    * (surviving paths, counts).
    */
  private[sources] def manifestFrame(spark: SparkSession, dataDir: String): DataFrame = {
    // the refresh swap is rename(dst, hist) → rename(tmp, dst): readers
    // take no lock, so planning that lands in that gap sees a healthy
    // table with a momentarily-absent `_manifest`. Tolerate-and-retry
    // bridges the window (metadata-rename-sized, not job-sized) — but
    // ONLY when the directory actually carries manifest machinery (a
    // history version, the writer lock, or an in-flight tmp): a read of
    // a dir with none of those is a REAL absence — an unmanifested or
    // nonexistent table — and must fail immediately rather than pay the
    // full backoff on every such probe. A manifest that stays missing
    // through the backoff still fails loud on the last attempt.
    def swapMaybeInFlight(): Boolean = {
      val root = new org.apache.hadoop.fs.Path(dataDir)
      val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
      hfs.exists(root) && hfs.listStatus(root).exists { s =>
        val n = s.getPath.getName
        // "_manifest" itself: the swap COMPLETED in the gap between the
        // failed read and this probe — on a table whose very first build
        // leaves no lock/history/tmp sibling visible (direct
        // buildWithBloom), the machinery test alone would misread the
        // transient as a real absence and propagate it un-retried
        n == "_manifest" || n == "_manifest.lock" ||
          n.startsWith("_manifest_v") || n.startsWith("_manifest_tmp_")
      }
    }
    var attempt = 0
    while (attempt < 5) {
      try return readManifestDir(spark, manifestPath(dataDir))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if (e.getErrorClass == "PATH_NOT_FOUND" ||
              e.getMessage.contains("Path does not exist") ||
              // a TORN local listing (names listed from the renamed-away
              // dir, per-child stats silently dropped) can resolve to
              // ZERO parquet files instead of an absent path — Spark
              // then fails schema inference, not path resolution
              e.getErrorClass == "UNABLE_TO_INFER_SCHEMA") &&
              swapMaybeInFlight() =>
          attempt += 1
          Thread.sleep(20L << attempt)
        // local-FS flavor of the same gap: the dir vanished between
        // Spark's own exists probe and its listing (isVanishedDir)
        case t: java.io.IOException
            if isVanishedDir(t) && swapMaybeInFlight() =>
          attempt += 1
          Thread.sleep(20L << attempt)
      }
    }
    readManifestDir(spark, manifestPath(dataDir))
  }

  /** ONE manifest entry's `file` path, read DRIVER-side (parquet-hadoop
    * projected to the one column) — no Spark job. Three per-commit
    * probes need exactly one data-file path from the manifest (schema
    * anchoring, column-type resolution): each used to pay a full
    * `limit(1).collect()` — an analyzed, optimized, scheduled Spark job
    * of fixed ~0.1 s driver latency per surgery commit, to move one
    * string. Row-group projection keeps the read to one column chunk of
    * one part file; zero-row parts (a repartitioned shard can be empty)
    * fall through to the next. Returns the [[FsListing.norm]] canonical
    * form, exactly like the normPath-projected collect it replaces.
    * Callers wrap in [[withSwapRetry]]: a swap mid-read surfaces as the
    * same vanished-path shapes the retry already handles.
    */
  private def firstManifestFilePath(spark: SparkSession,
      dataDir: String): Option[String] =
    firstFileInManifestDir(spark.sessionState.newHadoopConf(),
      new org.apache.hadoop.fs.Path(manifestPath(dataDir)))

  /** The per-directory core of [[firstManifestFilePath]] — also probes a
    * specific immutable `_manifest_v{N}` dir (the CDC empty-span anchor).
    */
  private def firstFileInManifestDir(conf: org.apache.hadoop.conf.Configuration,
      md: org.apache.hadoop.fs.Path): Option[String] = {
    val hfs = md.getFileSystem(conf)
    val parts = hfs.listStatus(md).iterator
      .filter { s =>
        val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith(".") && s.getLen > 0
      }
    while (parts.hasNext) {
      val p = parts.next().getPath
      // projection built from the part's OWN footer field (repetition
      // must match exactly — a hand-written `optional` projection fails
      // checkContains against the `required` field Spark writes)
      val fileField = {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
        val fr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          import scala.jdk.CollectionConverters._
          fr.getFooter.getFileMetaData.getSchema.getFields.asScala
            .find(_.getName == "file")
        } finally fr.close()
      }
      if (fileField.nonEmpty) {
        val rconf = new org.apache.hadoop.conf.Configuration(conf)
        rconf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
          new org.apache.parquet.schema.MessageType("graft_anchor",
            fileField.get).toString)
        val reader = org.apache.parquet.hadoop.ParquetReader
          .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), p)
          .withConf(rconf).build()
        try {
          var g = reader.read()
          while (g != null) {
            if (g.getFieldRepetitionCount("file") > 0)
              return Some(FsListing.norm(g.getString("file", 0)))
            g = reader.read()
          }
        } finally reader.close()
      }
    }
    None
  }

  /** CONTENT STAMP of a manifest dir: first data part's name and length
    * plus the part count, from ONE `listStatus`. Part names carry
    * Spark's job-unique UUIDs, so two INCARNATIONS of the same logical
    * version — a delete-and-rebuild recycling the version number, even
    * inside one coarse-filesystem mtime tick — can never share a stamp.
    * This is the memo key both the schema memo below and
    * [[historyFileSets]] key their immutable-dir caches on (the r20
    * mtime stamp narrowed but did not close the same-tick aliasing
    * window; the part-name stamp closes it). None when the dir has no
    * data part (torn listing mid-swap, or genuinely empty) — callers
    * must then take their uncached path, whose failure shapes the swap
    * retries already understand.
    */
  private def manifestDirStamp(hfs: org.apache.hadoop.fs.FileSystem,
      mdir: org.apache.hadoop.fs.Path): Option[String] =
    try {
      val parts = hfs.listStatus(mdir).iterator.filter { s =>
        val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }.toSeq
      if (parts.isEmpty) None
      else {
        val f = parts.minBy(_.getPath.getName)
        Some(s"${f.getPath.getName}:${f.getLen}:${parts.size}")
      }
    } catch { case t: java.io.IOException if isVanishedDir(t) => None }

  /** Schema memo for manifest dirs, keyed (normed dir, content stamp).
    * Every `spark.read.parquet(manifest)` used to pay driver-side footer
    * schema inference (~30 ms) — the single largest sampled driver cost
    * across the MVCC lanes (JProf r21: 0.5-0.7 s/lane in
    * ParquetUtils.inferSchema), multiplied by the several manifest
    * resolutions each commit/CDC-poll performs. A manifest dir's
    * contents are immutable per incarnation (swaps rename whole dirs),
    * so the stamp-keyed schema can be served forever; cap-and-clear
    * bounds a long session over many tables.
    */
  private val manifestSchemaMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), StructType]()

  /** Read a manifest dir with the memoized schema when its content
    * stamp is resolvable — one listStatus replaces footer inference —
    * and VERIFY after construction that the read's own (independently
    * listed) file set still carries the stamped part: a swap landing in
    * the stamp→construction window would otherwise pair the OLD
    * incarnation's schema with the NEW incarnation's files, a silent
    * misread where today's uncached path at worst crashes and retries.
    * On any mismatch or unstampable dir, fall back to the plain
    * inference read — byte-identical behavior (and failure shapes) to
    * the pre-memo code.
    */
  private def readManifestDir(spark: SparkSession, mdirStr: String): DataFrame = {
    val mdir = new org.apache.hadoop.fs.Path(mdirStr)
    val stampOpt =
      try manifestDirStamp(
        mdir.getFileSystem(spark.sessionState.newHadoopConf()), mdir)
      catch { case _: java.io.IOException => None }
    stampOpt match {
      case Some(stamp) =>
        val key = (FsListing.norm(mdirStr), stamp)
        var sch = manifestSchemaMemo.get(key)
        if (sch == null) {
          sch = spark.read.parquet(mdirStr).schema
          if (manifestSchemaMemo.size >= 4096) manifestSchemaMemo.clear()
          manifestSchemaMemo.put(key, sch)
        }
        val df = spark.read.schema(sch).parquet(mdirStr)
        val stampName = stamp.takeWhile(_ != ':')
        if (df.inputFiles.exists(_.endsWith("/" + stampName))) df
        else spark.read.parquet(mdirStr) // incarnation moved mid-resolve
      case None => spark.read.parquet(mdirStr)
    }
  }

  /** The manifest frame of a specific RETAINED version — history-first
    * resolution (a history manifest is immutable once renamed, so the
    * read can never tear), falling back to the current manifest when it
    * carries the requested version. A version that moved current→history
    * between the probe and the read (a rival surgery committed) is
    * re-resolved once — the rename window is metadata-sized. Fails loud
    * with the retained range when the version was vacuumed.
    */
  private[sources] def manifestFrameAt(spark: SparkSession, dataDir: String,
      version: Long): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def notRetained() = new IllegalArgumentException(
      s"requirement failed: version $version not retained under " +
        s"$dataDir (readable: ${versions(spark, dataDir).mkString(", ")})")
    var attempt = 0
    while (true) {
      val h = new org.apache.hadoop.fs.Path(histPath(dataDir, version))
      if (hfs.exists(h)) return readManifestDir(spark, h.toString)
      val cur = new org.apache.hadoop.fs.Path(manifestPath(dataDir))
      // the CURRENT manifest is mutable (a swap renames it away), so
      // every probe of it can race: versionOf's listStatus and the read
      // itself tolerate a concurrent rename by falling through to a
      // fresh re-probe rather than crashing the consumer
      val curV: Option[Long] =
        try { if (hfs.exists(cur)) Some(versionOf(hfs, cur)) else None }
        catch { case t: java.io.IOException if isVanishedDir(t) => None }
      curV match {
        case Some(v) if v == version =>
          try return readManifestDir(spark, cur.toString)
          catch {
            case e: org.apache.spark.sql.AnalysisException
                if e.getErrorClass == "PATH_NOT_FOUND" ||
                  e.getMessage.contains("Path does not exist") ||
                  e.getErrorClass == "UNABLE_TO_INFER_SCHEMA" =>
              // renamed to history in the gap (or the listing tore to
              // zero files) — next loop probes hist
            case t: java.io.IOException if isVanishedDir(t) =>
              // same gap, local-FS flavor: dir vanished mid-listing
          }
        case Some(_) =>
          // cur holds a DIFFERENT version: the target, if it exists at
          // all, is an immutable history dir — ONE fresh hist re-probe
          // decides (it may have just been renamed in after our first
          // miss). No backoff: a genuinely vacuumed/never-created
          // version must fail fast, not after 280 ms of sleeps.
          if (!hfs.exists(h)) throw notRetained()
          // else loop re-reads hist immediately
        case None =>
          // no current manifest visible: mid-swap rename window (wait it
          // out) or a manifest-less dir (the attempt cap makes it loud)
          attempt += 1
          if (attempt > 4) throw notRetained()
          Thread.sleep(20L << attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Run an ACTION over a frame resolved from a manifest dir, retrying
    * once when the underlying manifest was swap-renamed between
    * resolution and execution — the frame is lazy, so a rename landing
    * after `manifestFrameAt` returned surfaces as a task-level
    * FileNotFound (or a lazily-analyzed PATH_NOT_FOUND) at collect
    * time. `body` must RE-RESOLVE internally (build its frame again),
    * so the retry reads the renamed — now immutable — history dir. Any
    * failure that isn't rename-shaped propagates untouched, and a
    * second rename-shaped failure does too (loud, never a spin).
    */
  private[sources] def withSwapRetry[T](body: => T): T = {
    def swapRaced(t: Throwable): Boolean = {
      if (isVanishedDir(t)) return true // FNFE + RawLocalFS null-list IOE
      var c = t
      while (c != null) {
        val m = c.getMessage
        if (m != null && (m.contains("PATH_NOT_FOUND") ||
          m.contains("Path does not exist") || m.contains("FileNotFound") ||
          // a torn local listing can resolve a swap-racing manifest to
          // zero files — surfacing as failed schema inference rather
          // than an absent path; a genuinely empty dir fails the retry
          m.contains("UNABLE_TO_INFER_SCHEMA")))
          return true
        c = c.getCause
      }
      false
    }
    try body
    catch { case t: Throwable if swapRaced(t) => body }
  }

  /** Version stamped on the CURRENT manifest — 0 when the table has no
    * manifest yet. The optimistic-concurrency token every write-surgery
    * verb validates under the commit lock before publishing.
    *
    * Writers call this under the commit lock, where no swap can race
    * them and the first probe always decides. Lock-free READERS
    * (change-feed head probes, as-of pinning) can land inside the swap
    * window — rename(`_manifest`→`_manifest_vN`) then
    * rename(tmp→`_manifest`) — where the dir is briefly absent or
    * vanishes between the exists probe and `versionOf`'s listing. The
    * bare exists→listStatus here used to be a TOCTOU crash on exactly
    * that window; now both race shapes ([[isVanishedDir]]) retry with
    * backoff. Disambiguation from REAL absence is by history: a table
    * with no `_manifest` and no `_manifest_v*` dirs is genuinely
    * unversioned → 0 immediately, no backoff. History present but the
    * current manifest still absent after the backoff means a writer
    * died between its two renames — the newest history dir holds the
    * last state that was ever current, so its version is the
    * linearizable answer (and what this probe returned moments before
    * that half-swap).
    */
  private def currentVersion(hfs: org.apache.hadoop.fs.FileSystem,
      dataDir: String): Long = {
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val cur = new org.apache.hadoop.fs.Path(manifestPath(dataDir))
    def hist(): Seq[Long] =
      try historyVersions(hfs, root)
      catch { case t: java.io.IOException if isVanishedDir(t) => Seq.empty }
    var attempt = 0
    while (attempt <= 5) {
      try {
        if (hfs.exists(cur)) return versionOf(hfs, cur)
        if (hist().isEmpty) return 0L // real absence: fail-fast, no backoff
      } catch { case t: java.io.IOException if isVanishedDir(t) => }
      attempt += 1
      if (attempt <= 5) Thread.sleep(10L << attempt) // ≤ ~630 ms total
    }
    hist().lastOption.getOrElse(0L)
  }

  /** TEST SEAM: invoked once per write-surgery call (deleteRange /
    * mergeKeys / publishVia) after staging completes and right before
    * the commit lock is taken — specs inject a rival committer here to
    * pin the optimistic-concurrency conflict path deterministically.
    * No-op in production; mutated only by single-threaded specs.
    */
  private[graft] var beforeCommitHook: () => Unit = () => ()

  /** Validate the optimistic token under the commit lock: the surgery's
    * plan read manifest version `plannedV`; a different current version
    * means a rival committed in between and the staged output was built
    * from a stale snapshot — publishing it would silently discard the
    * rival's committed work (lost update). Fail loud; the caller re-runs
    * the surgery against the new version (Delta's conflict-and-retry
    * protocol). `stg` is this writer's private staging dir, cleaned up
    * before the throw.
    */
  private def requireUnchanged(hfs: org.apache.hadoop.fs.FileSystem,
      dataDir: String, plannedV: Long,
      stg: org.apache.hadoop.fs.Path): Unit = {
    val cur = currentVersion(hfs, dataDir)
    if (cur != plannedV) {
      hfs.delete(stg, true)
      throw new ConcurrentWriteException(
        s"table $dataDir moved v$plannedV -> v$cur while this surgery " +
          "was planned/staged — a rival writer committed; re-run the " +
          "surgery against the current version")
    }
  }

  /** One pass over the directory: per-file row count + min/max of each
    * tracked column, written as the `_manifest` parquet (overwrite).
    */
  def build(spark: SparkSession, dataDir: String, cols: Seq[String]): Unit =
    buildWithBloom(spark, dataDir, cols, Nil)

  /** [[build]] plus a per-file BLOOM FILTER sidecar over each of
    * `bloomCols` (long-typed key columns) — the skipping layer min/max
    * bounds can't provide: a POINT lookup on a high-cardinality key that
    * is uncorrelated with file layout (an id probe over an
    * arrival-ordered tree) intersects every file's [min,max], but a
    * per-file Bloom answers "definitely not here" for all but the
    * files actually holding the key (+ the fpp's false positives).
    * Delta's bloom-filter index / Iceberg puffin blobs are the same
    * idea; here the serialized filter (Spark's `util.sketch.BloomFilter`,
    * `expectedPerFile`/`fpp`-sized) rides as a binary column in the one
    * `_manifest` parquet. No false negatives ever — Bloom semantics —
    * so pruning stays SOUND; a false positive only costs one extra file
    * read under the exact row filter.
    */
  def buildWithBloom(spark: SparkSession, dataDir: String, cols: Seq[String],
      bloomCols: Seq[String], expectedPerFile: Long = 65536L,
      fpp: Double = 0.01, versionFloor: Long = 0L): Unit = {
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // a from-scratch rebuild re-stats the RAW files: live deletion
    // vectors would be dropped and every DV-deleted row silently
    // RESURRECTED — the failure mode the DV stack must never allow
    require(!hasLiveDv(spark, dataDir),
      s"table $dataDir carries live deletion vectors — a manifest " +
        "rebuild would resurrect DV-deleted rows; purgeDv(...) first")
    val paths = FsListing.listDataFiles(hfs, root)
    val stats =
      if (paths.isEmpty) // surface the same empty-dir failure a scan would
        fileStats(spark.read.parquet(dataDir), cols, bloomCols,
          expectedPerFile, fpp)
      else statsForFiles(spark, dataDir, paths, cols, bloomCols,
        expectedPerFile, fpp)
    // land beside, then swap — NOT an in-place overwrite: (a) the version
    // token must stay MONOTONIC even across a from-scratch rebuild (a
    // marker-less overwrite would read as v1 again, and a surgery that
    // planned at v1 could then false-pass its commit check and publish
    // stale staging over the rebuild — the OCC ABA hole), and (b) the
    // reader-facing gap shrinks from a whole stats job (Spark overwrite
    // deletes the dir first) to one delete→rename window that leaves a
    // `_manifest_tmp_` sibling visible, which is exactly what
    // manifestFrame's retry gate looks for.
    val tmp = new org.apache.hadoop.fs.Path(
      s"${manifestPath(dataDir)}_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    writeManifest(stats, tmp, math.max(1, paths.size).toLong)
    val dst = new org.apache.hadoop.fs.Path(manifestPath(dataDir))
    // versionFloor carries monotonicity ACROSS a rebuild that destroyed
    // the previous manifest (writeThrough overwrite records the version
    // before clearing the tree): without it the fresh manifest would
    // stamp v1 again and a surgery planned at v1 could false-pass its
    // commit check — the OCC ABA hole
    hfs.create(new org.apache.hadoop.fs.Path(tmp,
      s"_v${math.max(currentVersion(hfs, dataDir), versionFloor) + 1}"),
      true).close()
    hfs.create(new org.apache.hadoop.fs.Path(tmp, "_op_build"), true).close()
    if (hfs.exists(dst)) hfs.delete(dst, true) // reset: no history rename
    require(hfs.rename(tmp, dst), s"manifest swap rename failed under $dataDir")
  }

  /** Spark types whose parquet footer statistics are BOTH trustworthy
    * and exactly convertible back to the values a Spark `min`/`max`
    * aggregate over the data would produce — the eligibility gate for
    * [[footerStats]]. Float/Double are excluded: a writer that saw NaN
    * may have persisted NaN-free bounds, and under Spark's
    * NaN-is-largest comparison semantics a range probe (`col >= lo` IS
    * true for NaN) could then skip a file whose NaN rows qualify.
    * Timestamp is excluded (Spark's default INT96 layout carries no
    * usable footer stats); Decimal for scale/precision re-encoding
    * complexity. Ineligible types simply keep the data-scan path.
    */
  private def footerEligible(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         StringType | BooleanType => true
    case _ => false
  }

  /** Per-file `(n_rows, min_c, max_c, ...)` manifest entries read from
    * PARQUET FOOTER row-group statistics — metadata-sized reads instead
    * of re-scanning every data page the writer just finished writing.
    * This removes the avoidable half of a publish's read amplification:
    * [[publishVia]]/[[refresh]] used to land files and then re-READ
    * them wholesale just to re-derive bounds parquet had already
    * persisted per column chunk (Iceberg/Delta commit the same way —
    * per-file stats come off the write tasks' footers, never a second
    * scan).
    *
    * Soundness: row counts come from block metadata — always present,
    * exact. A column chunk with absent or unusable statistics (stats
    * dropped by parquet's corrupt-stats quarantine, physical type not
    * matching the expected Spark type, a partition column absent from
    * the file) makes that file's bound NULL, which every read-side
    * consumer already treats as unknown-never-skip. An all-null chunk
    * (no non-null value, numNulls == valueCount) contributes nothing,
    * matching `min(col)` over NULLs. String bounds merge in unsigned
    * UTF-8 byte order — the same ordering Spark's UTF8String comparison
    * and parquet's UNSIGNED_LEXICOGRAPHICAL comparator use.
    * FooterStatsSpec pins footer ≡ scan equality per eligible type and
    * the null-bound degradation cases.
    *
    * Distribution: the footers are opened in a Spark job over the path
    * list (a task reads only its partition's footers); the driver holds
    * the path strings it already had, never stats.
    */
  private[graft] def footerStats(spark: SparkSession, paths: Seq[String],
      schema: StructType, cols: Seq[String]): DataFrame = {
    val fields = cols.map(c => schema(c)).toIndexedSeq
    val outSchema = StructType(
      StructField("file", StringType, nullable = false) +:
        StructField("n_rows", LongType, nullable = false) +:
        fields.flatMap(f => Seq(
          StructField(s"min_${f.name}", f.dataType),
          StructField(s"max_${f.name}", f.dataType))))
    // Hadoop Configuration is Writable, not Serializable — ship it to
    // tasks as its own wire format
    val confBytes = {
      val baos = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(baos)
      spark.sessionState.newHadoopConf().write(dos)
      dos.close()
      baos.toByteArray
    }
    val colNames = fields.map(_.name)
    val colTypes = fields.map(_.dataType)
    val rdd = spark.sparkContext
      .parallelize(paths, math.max(1,
        math.min(paths.size, spark.sparkContext.defaultParallelism)))
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        conf.readFields(new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(confBytes)))
        it.map { p =>
          // scheme-QUALIFY before storing: callers hand over bare
          // "/tmp/..." rename targets, but manifest entries must compare
          // against the qualified ("file:/...") live listing
          val p0 = new org.apache.hadoop.fs.Path(p)
          val tfs = p0.getFileSystem(conf)
          val qualified = p0.makeQualified(tfs.getUri, tfs.getWorkingDirectory)
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(qualified, conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val blocks = reader.getFooter.getBlocks
            var nRows = 0L
            val iter0 = blocks.iterator()
            while (iter0.hasNext) nRows += iter0.next().getRowCount
            // per tracked column: merge chunk stats in an internal rep
            // (Long for integrals/date/boolean, bytes for strings)
            val mins = new Array[Any](colNames.length)
            val maxs = new Array[Any](colNames.length)
            val unknown = new Array[Boolean](colNames.length)
            val biter = blocks.iterator()
            while (biter.hasNext) {
              val b = biter.next()
              var i = 0
              while (i < colNames.length) {
                if (!unknown(i)) {
                  var chunk: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData = null
                  val citer = b.getColumns.iterator()
                  while (citer.hasNext && chunk == null) {
                    val c = citer.next()
                    if (c.getPath.size() == 1 &&
                      c.getPath.toDotString == colNames(i)) chunk = c
                  }
                  if (chunk == null) unknown(i) = true
                  else {
                    val stats = chunk.getStatistics
                    if (stats == null) unknown(i) = true
                    else if (stats.isNumNullsSet &&
                      stats.getNumNulls == chunk.getValueCount) {
                      // proven all-null chunk: contributes nothing (some
                      // writers still populate zeroed min/max here, so
                      // this test must run BEFORE trusting hasNonNullValue)
                    } else if (!stats.hasNonNullValue) unknown(i) = true
                    else {
                      footerValue(colTypes(i), stats) match {
                        case Some((mn, mx)) =>
                          if (mins(i) == null ||
                            internalCompare(colTypes(i), mn, mins(i)) < 0)
                            mins(i) = mn
                          if (maxs(i) == null ||
                            internalCompare(colTypes(i), mx, maxs(i)) > 0)
                            maxs(i) = mx
                        case None => unknown(i) = true
                      }
                    }
                  }
                }
                i += 1
              }
            }
            val vals = (0 until colNames.length).flatMap { i =>
              // mins(i) == null: every chunk was all-null — bounds are
              // NULL exactly like min() over an all-NULL column
              if (unknown(i) || mins(i) == null) Seq(null, null)
              else Seq(internalFinish(colTypes(i), mins(i)),
                internalFinish(colTypes(i), maxs(i)))
            }
            Row.fromSeq(FsListing.norm(qualified.toString) +: nRows +: vals)
          } finally reader.close()
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Chunk min/max in the internal merge representation, or None when
    * the physical type doesn't match the expected Spark type (schema
    * evolution — bounds go unknown, never wrong).
    */
  private def footerValue(dt: DataType,
      stats: org.apache.parquet.column.statistics.Statistics[_]): Option[(Any, Any)] = {
    import org.apache.parquet.column.statistics._
    (dt, stats) match {
      case (ByteType | ShortType | IntegerType | DateType, s: IntStatistics) =>
        Some((s.getMin.toLong, s.getMax.toLong))
      case (LongType, s: LongStatistics) => Some((s.getMin, s.getMax))
      case (BooleanType, s: BooleanStatistics) =>
        Some((if (s.getMin) 1L else 0L, if (s.getMax) 1L else 0L))
      case (StringType, s: BinaryStatistics) =>
        Some((s.genericGetMin.getBytes, s.genericGetMax.getBytes))
      case _ => None
    }
  }

  private def internalCompare(dt: DataType, a: Any, b: Any): Int = dt match {
    case StringType => java.util.Arrays.compareUnsigned(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    case _ => java.lang.Long.compare(
      a.asInstanceOf[Long], b.asInstanceOf[Long])
  }

  private def internalFinish(dt: DataType, v: Any): Any = dt match {
    case ByteType => v.asInstanceOf[Long].toByte
    case ShortType => v.asInstanceOf[Long].toShort
    case IntegerType => v.asInstanceOf[Long].toInt
    case LongType => v.asInstanceOf[Long]
    case BooleanType => v.asInstanceOf[Long] != 0L
    case DateType => java.sql.Date.valueOf(
      java.time.LocalDate.ofEpochDay(v.asInstanceOf[Long]))
    case StringType => new String(v.asInstanceOf[Array[Byte]],
      java.nio.charset.StandardCharsets.UTF_8)
    case other => throw new IllegalStateException(s"not footer-eligible: $other")
  }

  /** Stats for exactly `paths`: FOOTER-derived when no bloom sidecars
    * are requested (blooms must see every key value, so they pay the
    * scan anyway) and every tracked column is [[footerEligible]] and
    * physically present in the files (a partition column lives in the
    * directory name, not the footer); the [[fileStats]] data-scan
    * aggregation otherwise. Both paths produce the identical manifest
    * schema, so callers never care which ran.
    */
  private[graft] def statsForFiles(spark: SparkSession, dataDir: String,
      paths: Seq[String], cols: Seq[String], bloomCols: Seq[String],
      expectedPerFile: Long, fpp: Double): DataFrame = {
    val df = spark.read.option("basePath", dataDir).parquet(paths: _*)
    // short-circuit order matters: the physical-presence probe opens a
    // footer on the driver — skip it entirely when blooms or an
    // ineligible type already force the scan path
    if (bloomCols.isEmpty &&
        cols.forall(c => footerEligible(df.schema(c).dataType)) && {
          val physical = physicalFields(spark, paths.head)
          cols.forall(physical.contains)
        })
      footerStats(spark, paths, df.schema, cols)
    else {
      val scanned = fileStats(df, cols, bloomCols, expectedPerFile, fpp)
      // MATERIALIZE the per-file aggregation ONCE (eager localCheckpoint):
      // the zero-row completion below used to ride a distributed
      // anti-join against a second reference to `scanned`, so every
      // bloom-bearing commit's manifest write re-planned the aggregate
      // subtree (no exchange reuse once column pruning specialized the
      // anti side) and AQE split the write into 3-4 scheduled stage-jobs
      // — pure per-commit scheduling overhead. Checkpointed, the caller's
      // manifest write is exchange-free (one job), and the completion is
      // a driver-side set difference over the path strings this verb
      // already holds.
      val mat = labeled(spark, "graft: file-stats scan") {
        scanned.localCheckpoint()
      }
      // a ZERO-ROW part file produces no group (input_file_name never
      // fires) but IS live data — an all-rows-deleted rewrite lands one
      // schema-preserving empty file, and without an explicit
      // n_rows=0/null-stats entry the coverage guard bricks every later
      // read as "stale". The footer path emits these naturally; complete
      // the scan path to match. Null bounds/blooms keep the file on
      // every probe — sound, and the exact row filter reads nothing.
      val schema = mat.schema
      // scheme-QUALIFY like the footer path: callers hand bare "/tmp/..."
      // rename targets, but these entries must join against
      // input_file_name's qualified form and the qualified live listing
      val conf = spark.sessionState.newHadoopConf()
      def qualified(p: String): String = {
        val pp = new org.apache.hadoop.fs.Path(p)
        val pfs = pp.getFileSystem(conf)
        FsListing.norm(
          pp.makeQualified(pfs.getUri, pfs.getWorkingDirectory).toString)
      }
      val present = labeled(spark, "graft: file-stats names") {
        mat.select(ManifestFileIndex.normPath(col("file"))).collect()
      }.map(_.getString(0)).toSet
      val missing = paths.map(qualified).filterNot(present)
      if (missing.isEmpty) mat
      else mat.unionByName(spark.createDataFrame(
        spark.sparkContext.parallelize(missing.map(p =>
          Row.fromSeq(p +: 0L +:
            Seq.fill(schema.length - 2)(null))), 1),
        schema))
    }
  }

  /** Top-level primitive field names of ONE file's parquet footer — the
    * physical-presence probe for [[statsForFiles]] (batches are
    * single-writer uniform; a straggler that differs anyway just
    * degrades to null bounds inside the footer job).
    */
  private def physicalFields(spark: SparkSession, path: String): Set[String] = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path),
      spark.sessionState.newHadoopConf())
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val s = reader.getFooter.getFileMetaData.getSchema
      import scala.jdk.CollectionConverters._
      s.getFields.asScala.filter(_.isPrimitive).map(_.getName).toSet
    } finally reader.close()
  }

  /** The one per-file stats aggregation both [[buildWithBloom]] and the
    * incremental [[refresh]] use — including the bloom-key type guard,
    * so the two paths can never drift: INTEGRAL key columns only (the
    * sidecar stores `cast(long)` and the probe compares Catalyst
    * literal values — a timestamp's cast yields SECONDS while equality
    * literals carry MICROS, so a non-integral bloomCol would prune with
    * silent false NEGATIVES, the one failure Bloom semantics must never
    * allow; fail loud at build time instead).
    */
  private[graft] def fileStats(data: DataFrame, cols: Seq[String],
      bloomCols: Seq[String], expectedPerFile: Long, fpp: Double): DataFrame = {
    bloomCols.foreach { c =>
      val dt = data.schema(c).dataType
      require(FsListing.isIntegral(dt) || dt == StringType,
        s"bloom sidecar column '$c' is $dt — only integral (cast-to-long " +
          "must be value-preserving) or string key columns are " +
          "bloom-trackable")
    }
    val bloomAgg = udaf(new BloomAgg(expectedPerFile, fpp),
      org.apache.spark.sql.Encoders.LONG)
    // string keys hash UTF-8 bytes (BloomFilter.putString/
    // mightContainString) — no cast, so probe-side literals agree with
    // build-side storage by construction; the sidecar's ENCODING is
    // keyed to the column dtype on both sides
    val strBloomAgg = udaf(new StringBloomAgg(expectedPerFile, fpp),
      org.apache.spark.sql.Encoders.STRING)
    val aggs = count(lit(1)).as("n_rows") +:
      (cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) ++
        bloomCols.map { c =>
          if (data.schema(c).dataType == StringType)
            strBloomAgg(col(c)).as(s"bloom_$c")
          else bloomAgg(col(c).cast("long")).as(s"bloom_$c")
        })
    data.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Mergeable per-file Bloom accumulation: one filter per group, built
    * executor-side (null keys skipped — a NULL never equals a point
    * probe, so leaving it out of the filter is exact, and a file of only
    * NULL keys correctly yields an empty filter every probe misses).
    * One base, two key encodings: `putLong` for integral keys,
    * `putString` (UTF-8 bytes, matching `mightContainString` on every
    * probe path) for string keys — the put function is the ONLY
    * difference, kept in one place so the encodings can't drift.
    */
  private sealed class BloomAggBase[T](expected: Long, fpp: Double,
      put: (org.apache.spark.util.sketch.BloomFilter, T) => Unit)
      extends org.apache.spark.sql.expressions.Aggregator[
        T, org.apache.spark.util.sketch.BloomFilter, Array[Byte]] {
    import org.apache.spark.util.sketch.BloomFilter
    def zero: BloomFilter = BloomFilter.create(expected, fpp)
    def reduce(b: BloomFilter, k: T): BloomFilter = {
      if (k != null) put(b, k)
      b
    }
    def merge(a: BloomFilter, b: BloomFilter): BloomFilter = a.mergeInPlace(b)
    def finish(b: BloomFilter): Array[Byte] = {
      val os = new java.io.ByteArrayOutputStream()
      b.writeTo(os)
      os.toByteArray
    }
    def bufferEncoder: org.apache.spark.sql.Encoder[BloomFilter] =
      org.apache.spark.sql.Encoders.javaSerialization[BloomFilter]
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  private final class BloomAgg(expected: Long, fpp: Double)
      extends BloomAggBase[java.lang.Long](expected, fpp, _ putLong _)

  private final class StringBloomAgg(expected: Long, fpp: Double)
      extends BloomAggBase[String](expected, fpp, _ putString _)

  /** Write-through sink: land `df` under `dataDir` AND refresh the
    * `_manifest` (+ bloom sidecars) in the same call — the writer-owns-
    * the-manifest discipline table formats enforce (data and metadata
    * commit together), so readers never hit the stale-manifest guard
    * after a routine append. The refresh is INCREMENTAL via [[refresh]]:
    * an append stats only the files it just landed.
    */
  /** MULTI-WRITER: the whole write-through (append + refresh) runs
    * under the manifest [[CommitLock]] — concurrent Spark jobs writing
    * one directory race each other's `_temporary/0` staging (the
    * default FileOutputCommitter keys staging by an appID-local job id,
    * not a global one), so the data append itself must serialize with
    * rival writeThrough calls, not just the manifest swap. Each locked
    * refresh re-lists the live tree, so whichever writer commits last
    * leaves a manifest covering every rival's files — MultiWriterSpec
    * races two writers and pins coverage + readability.
    */
  def writeThrough(df: DataFrame, dataDir: String, cols: Seq[String],
      bloomCols: Seq[String] = Nil, mode: String = "append",
      partitionCols: Seq[String] = Nil,
      expectedPerFile: Long = 65536L, fpp: Double = 0.01): Unit = {
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val hfs = root.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    CommitLock.withLock(hfs,
      new org.apache.hadoop.fs.Path(root, "_manifest.lock")) {
      // overwrite must NOT go through Spark's Overwrite mode: that
      // recursively deletes the root — including the _manifest.lock
      // file THIS writer is holding — so a rival would re-create the
      // lock and enter the critical section mid-overwrite (and this
      // writer's unlock would then delete the rival's live lock,
      // cascading the violation). Clear the tree manually, sparing the
      // lock, and land the data as an append into the emptied root.
      // the version token must stay MONOTONIC across the reset: record
      // the outgoing version before the clear and floor the rebuild one
      // past it, or a surgery planned pre-overwrite would see the same
      // version again at commit and publish stale staging (OCC ABA)
      val prevV =
        if (mode == "overwrite") currentVersion(hfs, dataDir) else 0L
      val effMode =
        if (mode == "overwrite") {
          if (hfs.exists(root))
            hfs.listStatus(root).iterator
              .filterNot(_.getPath.getName == "_manifest.lock")
              .foreach(s => hfs.delete(s.getPath, true))
          "append"
        } else mode
      val w = df.write.mode(effMode)
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(dataDir)
      refreshLocked(df.sparkSession, dataDir, root, hfs, cols, bloomCols,
        expectedPerFile, fpp, versionFloor = prevV)
    }
  }

  /** MVCC publish — replace the table's CURRENT version with `df`
    * without touching prior versions' bytes (index compaction rewriting
    * its base in place, OPTIMIZE-style file rewrites): `df` first
    * materializes into a sibling staging dir — the write job scans the
    * untouched target freely even when it READS `dataDir` — then, under
    * the target's writer lock, the staged part-files MOVE in (renames,
    * job-unique names, no data copy), a manifest covering EXACTLY the
    * published file set is stamped and version-swapped, and the
    * outgoing snapshot's files are left on disk: still readable through
    * [[readAsOf]] until [[vacuum]]'s `keepVersions` retention reaps
    * them. Readers are snapshot-isolated — [[ManifestFileIndex]] plans
    * membership from the current manifest, never the raw directory, so
    * a query planned mid-publish sees wholly the old version or wholly
    * the new one.
    */
  def publishVia(df: DataFrame, stagingDir: String, dataDir: String,
      cols: Seq[String], bloomCols: Seq[String] = Nil,
      expectedPerFile: Long = 65536L, fpp: Double = 0.01,
      opName: String = "publish",
      expectedVersion: Option[Long] = None): Unit = {
    // opName is not just display metadata: [[changesBetween]] SKIPS
    // single-commit hops stamped 'optimize'/'purge' as multiset-invariant
    // reorganizations (Delta's dataChange=false). A caller stamping a
    // DATA-CHANGING publish with one of those names would silently drop
    // its changes from every CDC span — reserve the reorg verbs for the
    // internal operators that actually guarantee invariance
    // (optimizeTable/optimizePartitioned/purgeDv).
    require(!ReorgOps.contains(opName),
      s"publishVia opName '$opName' is reserved: it asserts the commit " +
        "is multiset-invariant to the change feed (changesBetween skips " +
        "such hops); use optimizeTable/optimizePartitioned/purgeDv for " +
        "reorganizations, or any other opName for data changes")
    publishViaUnchecked(df, stagingDir, dataDir, cols, bloomCols,
      expectedPerFile, fpp, opName, expectedVersion)
  }

  /** [[publishVia]] minus the reorg-opName guard — for the INTERNAL
    * reorganization verbs whose output is multiset-equal to their input
    * by construction.
    */
  private[sources] def publishViaUnchecked(df: DataFrame,
      stagingDir: String, dataDir: String,
      cols: Seq[String], bloomCols: Seq[String] = Nil,
      expectedPerFile: Long = 65536L, fpp: Double = 0.01,
      opName: String = "publish",
      expectedVersion: Option[Long] = None): Unit = {
    val spark = df.sparkSession
    // WRITER-PRIVATE staging: `stagingDir` names the caller's staging
    // LOCATION (its filesystem/volume), but the dir actually written is
    // suffixed per-call — two concurrent publishes sharing the
    // conventional fixed name must never delete each other's in-progress
    // staging (the clobber the version token alone can't see; same rule
    // as deleteRange/mergeKeys)
    val stg = new org.apache.hadoop.fs.Path(
      s"${stagingDir}_${java.util.UUID.randomUUID().toString.take(8)}")
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // staging must live OUTSIDE the table tree entirely (qualified-path
    // prefix test, not bare equality): a staging dir under the root is
    // non-underscore, so its in-progress part files would list as live
    // data — tripping coverage for concurrent readers mid-publish
    locally {
      val rootQ = root.makeQualified(hfs.getUri, hfs.getWorkingDirectory).toString
      val stgQ = new org.apache.hadoop.fs.Path(stagingDir)
        .makeQualified(hfs.getUri, hfs.getWorkingDirectory).toString
      require(stgQ != rootQ && !stgQ.startsWith(rootQ + "/"),
        s"staging dir must be outside the target table: $stagingDir is " +
          s"at or under $dataDir")
    }
    if (hfs.exists(root)) requireFlatTable(hfs, root, "publishVia")
    // optimistic token: `df` is typically a read-modify-write of the
    // current snapshot (compaction), so a rival commit between this
    // point and the locked publish would be silently overwritten —
    // validate under the lock, fail loud on movement. A caller whose
    // `df` EAGERLY pinned an earlier version (optimizeTable's
    // ManifestFileIndex.read collects its file set + dv rows at frame
    // construction) passes that version as `expectedVersion` — reading
    // the token here would otherwise observe a rival commit landing
    // AFTER the caller's resolution and publish stale content right
    // over it (lost update with a passing version check).
    val plannedV = expectedVersion.getOrElse(currentVersion(hfs, dataDir))
    try {
    labeled(spark, s"graft: $opName stage") {
      df.write.parquet(stg.toString) // may read dataDir: still untouched
    }
    beforeCommitHook()
    CommitLock.withLock(hfs,
      new org.apache.hadoop.fs.Path(root, "_manifest.lock")) {
      requireUnchanged(hfs, dataDir, plannedV, stg)
      if (!hfs.exists(root)) hfs.mkdirs(root)
      val moved = hfs.listStatus(stg).iterator
        .filterNot { s =>
          val n = s.getPath.getName
          n.startsWith("_") || n.startsWith(".")
        }
        .map { s =>
          val dst = new org.apache.hadoop.fs.Path(root, s.getPath.getName)
          require(hfs.rename(s.getPath, dst),
            s"publish rename failed: ${s.getPath} -> $dataDir")
          dst.toString
        }.toSeq
      hfs.delete(stg, true)
      require(moved.nonEmpty, s"publish produced no data files for $dataDir")
      val stats = statsForFiles(spark, dataDir, moved,
        cols, bloomCols, expectedPerFile, fpp)
      val tmp = new org.apache.hadoop.fs.Path(
        s"${manifestPath(dataDir)}_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
      writeManifest(stats, tmp, moved.size.toLong)
      swapVersioned(hfs, dataDir, tmp, opName)
      spark.catalog.refreshByPath(dataDir)
    }
    } finally { if (hfs.exists(stg)) hfs.delete(stg, true) }
  }

  /** Incremental manifest refresh: stat ONLY files not yet manifested
    * (delta-sized work — at 100 TB a daily append must never re-scan
    * the whole table for metadata), drop entries for files no longer
    * live (partition overwrites), carry every other entry byte-for-byte
    * (per-file stats and blooms never change once a file is immutable).
    * A manifest whose tracked-column set differs from `cols`/`bloomCols`
    * (or none at all) falls back to a full [[buildWithBloom]].
    */
  def refresh(spark: SparkSession, dataDir: String, cols: Seq[String],
      bloomCols: Seq[String] = Nil, expectedPerFile: Long = 65536L,
      fpp: Double = 0.01): Unit = {
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // MULTI-WRITER: refreshes SERIALIZE on an advisory lock — two
    // concurrent writeThrough calls would otherwise interleave part
    // files in one tmp dir and race the delete+rename swap. Each locked
    // refresh re-LISTS the live tree, so the last refresh to run covers
    // every rival's appended files (and every append is followed by its
    // own refresh, so the final manifest always covers the final tree —
    // MultiWriterSpec races two writeThrough threads and pins coverage).
    // The data appends themselves need no lock: Spark part-file names
    // carry job-unique UUIDs.
    CommitLock.withLock(hfs, new org.apache.hadoop.fs.Path(root, "_manifest.lock")) {
      refreshLocked(spark, dataDir, root, hfs, cols, bloomCols, expectedPerFile, fpp)
    }
  }

  /** All readable versions under `dataDir`, ascending — retained history
    * plus the current manifest's stamped version.
    *
    * History and current are probed as a SNAPSHOT: a rival swap landing
    * between the two listings used to either (a) crash `versionOf` on
    * the vanished `_manifest` (the [[isVanishedDir]] local-FS shape),
    * or (b) silently DROP the mid version — history listed before the
    * rename added v_N, current already stamped v_N+1 — which a CDC
    * consumer would see as one merged hop with the wrong op
    * attribution (an intervening reorg's file churn misread as data
    * change). Both interleavings are detected — current must be newest
    * history + 1 whenever history is non-empty (rebuilds clear
    * history; vacuum keeps a contiguous suffix) — and retried with
    * both listings refreshed. Retries are bounded and SHORT (two, ≤45
    * ms total — the rename window is microseconds) because the gap
    * shape can also be legitimate: a from-scratch [[build]] over a
    * table that kept older history dirs stamps current+1 without
    * renaming, and such a table must converge to today's as-observed
    * answer on every call instead of spinning or paying a long backoff
    * per poll.
    */
  def versions(spark: SparkSession, dataDir: String): Seq[Long] =
    versionsSnapshot(spark, dataDir)._1

  /** [[versions]] plus the history-dir statuses from the SAME root
    * listing the versions came from — CDC callers ([[changesBetween]],
    * [[history]]) thread the map into [[opsOfVersions]] so one poll
    * pays ONE root enumeration.
    */
  private def versionsSnapshot(spark: SparkSession, dataDir: String)
      : (Seq[Long], Map[Long, org.apache.hadoop.fs.FileStatus]) = {
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val cur = new org.apache.hadoop.fs.Path(manifestPath(dataDir))
    var attempt = 0
    var last: (Seq[Long], Map[Long, org.apache.hadoop.fs.FileStatus]) =
      (Seq.empty, Map.empty)
    while (attempt <= 2) {
      // probe CURRENT first, history second — the same order
      // [[currentVersion]] uses, and load-bearing for a table taking its
      // FIRST surgery (no history dirs yet): with history listed first,
      // a poll could list an empty history just before rename#1 and find
      // `_manifest` absent inside the rename#1→#2 window, and the
      // "no history + no current" arm would declare a LIVE table empty
      // with no retry. Current-first closes it: a None current means
      // rename#1 already ran, so the history listing that FOLLOWS
      // necessarily sees the just-renamed v1 dir and takes the retry arm.
      val curV: Option[Long] =
        try { if (hfs.exists(cur)) Some(versionOf(hfs, cur)) else None }
        catch { case t: java.io.IOException if isVanishedDir(t) => None }
      val histD =
        try historyDirs(hfs, root)
        catch {
          case t: java.io.IOException if isVanishedDir(t) =>
            Map.empty[Long, org.apache.hadoop.fs.FileStatus]
        }
      val hist = histD.keysIterator.toSeq.sorted
      last = ((hist ++ curV).distinct.sorted, histD)
      val consistent = curV match {
        case Some(v) => hist.isEmpty || v == hist.max + 1
        case None => hist.isEmpty // hist-but-no-current = mid-swap window
      }
      if (consistent) return last
      attempt += 1
      if (attempt <= 2) Thread.sleep(15L * attempt)
    }
    last // bounded: a real (build-created) gap returns as observed
  }

  /** The CURRENT manifest's stamped version, for read-side pinning. */
  private[sources] def currentVersionOf(spark: SparkSession,
      dataDir: String): Long = {
    val root = new org.apache.hadoop.fs.Path(dataDir)
    currentVersion(root.getFileSystem(spark.sessionState.newHadoopConf()),
      dataDir)
  }

  /** The operation marker of a manifest dir (`_op_<verb>`), or
    * "unknown" for manifests written before operation stamping.
    */
  private def opOf(hfs: org.apache.hadoop.fs.FileSystem,
      mdir: org.apache.hadoop.fs.Path): String =
    hfs.listStatus(mdir).iterator.map(_.getPath.getName)
      .collectFirst { case n if n.startsWith("_op_") => n.stripPrefix("_op_") }
      .getOrElse("unknown")

  /** The operation marker of a specific VERSION, resolved history-first
    * like [[manifestFrameAt]] (a history dir is immutable once renamed;
    * the current `_manifest` can be swap-renamed between the version
    * probe and the listing — a FileNotFound there falls back to the
    * now-history dir instead of crashing a read-only consumer). A
    * version retained by neither dir reads as "unknown" — the safe
    * answer for every caller (history display; the change-feed reorg
    * skip treats unknown as NOT-reorganization, so it never skips a
    * hop it can't prove).
    */
  private[sources] def opOfVersion(hfs: org.apache.hadoop.fs.FileSystem,
      dataDir: String, v: Long): String = {
    opOfVersionCalls.incrementAndGet() // spec probe (OpBatch regression pin)
    val h = new org.apache.hadoop.fs.Path(histPath(dataDir, v))
    def histOp(): Option[String] =
      try { if (hfs.exists(h)) Some(opOf(hfs, h)) else None }
      catch { case t: java.io.IOException if isVanishedDir(t) => None }
    histOp().getOrElse {
      val cur = new org.apache.hadoop.fs.Path(manifestPath(dataDir))
      try {
        if (hfs.exists(cur) && versionOf(hfs, cur) == v) opOf(hfs, cur)
        else histOp().getOrElse("unknown")
      } catch {
        // swap-renamed away mid-listing: the target is now history
        case t: java.io.IOException if isVanishedDir(t) =>
          histOp().getOrElse("unknown")
      }
    }
  }

  /** Per-version listing counter — a SPEC PROBE ONLY: the batched
    * [[opsOfVersions]] exists precisely so a long-lag CDC poll never
    * pays a listStatus per mid version; OpBatchSpec pins that
    * changesBetween leaves this counter untouched however many commits
    * the span covers.
    */
  private[graft] val opOfVersionCalls =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Operation stamps for the `wanted` versions, resolved in BATCH: ONE
    * root listing discovers every history dir (by literal name match —
    * never a glob: a dataDir containing glob metacharacters like `[1]`
    * must not pattern-match a SIBLING table's history, which would map
    * foreign op stamps onto this table's version numbers and silently
    * skip data-changing hops), then one listing per wanted history dir
    * for its marker, plus one listing of the current manifest (whose
    * `_v{N}` stamp and `_op_` marker come from the SAME listing, so the
    * pair is consistent). Versus [[opOfVersion]]'s exists + listStatus +
    * current-fallback per version this is ~3× fewer calls and, crucially,
    * SCOPED: a short-lag poll on a deep-retention table pays ~3 listings
    * (only its span's dirs), a 10³-commit-lag poll pays 10³+2 — the
    * markers live inside the dirs, so per-dir listings are inherent; the
    * batch removes every redundant call around them. A version a rival
    * swap moves mid-batch simply resolves to no entry — and every
    * consumer treats a missing entry as "unknown" = NOT-reorganization:
    * the safe direction (a hop is never skipped on unproven evidence).
    */
  private[graft] def opsOfVersions(hfs: org.apache.hadoop.fs.FileSystem,
      dataDir: String, wanted: Set[Long],
      histListing: Option[Map[Long, org.apache.hadoop.fs.FileStatus]] = None)
      : Map[Long, String] = {
    if (wanted.isEmpty) return Map.empty
    val root = new org.apache.hadoop.fs.Path(dataDir)
    def opIn(dir: org.apache.hadoop.fs.Path): Option[String] =
      try hfs.listStatus(dir).iterator.map(_.getPath.getName)
        .collectFirst { case n if n.startsWith("_op_") => n.stripPrefix("_op_") }
      catch { case t: java.io.IOException if isVanishedDir(t) => None }
    // reuse the caller's root enumeration when it has one (history and
    // changesBetween just paid it inside versionsSnapshot — re-listing
    // the root would double every CDC poll's O(files) flat-table cost)
    val dirs: Map[Long, org.apache.hadoop.fs.FileStatus] =
      histListing.getOrElse(
        try historyDirs(hfs, root)
        catch {
          case t: java.io.IOException if isVanishedDir(t) =>
            Map.empty[Long, org.apache.hadoop.fs.FileStatus]
        })
    val hist = dirs.iterator
      .filter { case (v, st) => wanted(v) && st.isDirectory }
      .flatMap { case (v, st) => opIn(st.getPath).map(v -> _) }
      .toMap
    val cur: Option[(Long, String)] =
      try {
        val names = hfs.listStatus(
          new org.apache.hadoop.fs.Path(manifestPath(dataDir)))
          .map(_.getPath.getName)
        for {
          v <- names.collectFirst {
            case n if n.startsWith("_v") && n.length > 2 &&
              n.drop(2).forall(_.isDigit) => n.drop(2).toLong
          }
          if wanted(v) && !hist.contains(v) // history-first, like opOfVersion
          op <- names.collectFirst {
            case n if n.startsWith("_op_") => n.stripPrefix("_op_") }
        } yield (v, op)
      } catch {
        // swap-renamed away mid-listing: it is history now (covered or
        // resolves "unknown" — the conservative answer either way)
        case t: java.io.IOException if isVanishedDir(t) => None
      }
    hist ++ cur
  }

  /** DESCRIBE HISTORY: one row per readable version — (version, op,
    * n_files, n_rows live) — from the retained manifests alone
    * (metadata-scale, no data page). The op is the verb that PRODUCED
    * the version (build / refresh / publish / optimize / delete /
    * dv-delete / merge / merge-dv / purge); versions written before
    * stamping read as "unknown".
    *
    * ONE aggregation job over every retained version, not one per
    * version: all immutable `_manifest_v{N}` dirs go through a single
    * multi-path read (version recovered from the dir name — the same
    * rename that froze the dir stamped it), the mutable current
    * `_manifest` unions in under its own version tag, and the per-dir
    * (count, live-row sum) pairs come back in one collect. A
    * 100-commit table's DESCRIBE HISTORY was 100 scheduled jobs + 100
    * driver schema inferences of fixed overhead; now it is two reads
    * and one job. Schema drift across versions (dv columns appear when
    * the first vector lands) is bridged with mergeSchema +
    * allowMissingColumns; a version whose manifest holds ZERO entries
    * (delete-everything snapshot) produces no group and fills in as
    * (0 files, 0 rows) exactly like the old per-version agg.
    */
  def history(spark: SparkSession, dataDir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // batched op resolution (one root listing + one per version); a
    // version the batch missed (concurrent swap) falls back to the
    // per-version resolver rather than displaying a wrong "unknown"
    // for a version whose manifest read below succeeds
    val rows = withSwapRetry {
      val (vs, histD) = versionsSnapshot(spark, dataDir)
      val ops = opsOfVersions(hfs, dataDir, vs.toSet, Some(histD))
      val histVs = vs.filter(histD.contains)
      val curV = vs.filterNot(histD.contains) match {
        case Seq() => None
        case Seq(v) => Some(v)
        case many => Some(many.max) // defensive: current is the newest
      }
      def liveAgg(df: DataFrame): DataFrame = {
        val del =
          if (df.columns.contains(DvDelCol)) coalesce(col(DvDelCol), lit(0L))
          else lit(0L)
        df.groupBy(col("_v")).agg(count(lit(1)).as("nf"),
          sum(col("n_rows") - del).as("nr"))
      }
      // history dirs are IMMUTABLE once renamed — one multi-path read is
      // race-free (a concurrent vacuum reaping a dir mid-read surfaces
      // as the same vanished-path shapes the outer retry handles).
      // EXPLICIT minimal schema, not mergeSchema: only n_rows and the dv
      // del count feed the aggregate, and a mergeSchema read (a) pays a
      // distributed footer-merge job per DESCRIBE HISTORY and (b) throws
      // 'Failed to merge incompatible data types' the moment two
      // versions' tracked min_/max_ columns drifted type (a rebuild
      // after a column's int→long evolution) — full-schema merge over
      // columns the aggregate never touches. A version missing the dv
      // column reads it as NULL, which the coalesce below already treats
      // as zero.
      val histSchema = StructType(Seq(
        StructField("n_rows", LongType), StructField(DvDelCol, LongType)))
      val histAgg: Option[DataFrame] =
        if (histVs.isEmpty) None
        else Some(liveAgg(
          spark.read.schema(histSchema)
            .parquet(histVs.map(histPath(dataDir, _)): _*)
            .withColumn("_v", regexp_extract(
              input_file_name(), "_manifest_v(\\d+)/[^/]*$", 1).cast("long"))))
      // the CURRENT manifest is mutable: probe-then-read exactly like
      // manifestFrameAt (a swap landing in the gap vanishes the dir —
      // the outer retry re-resolves; the brand-new version it published
      // is newer than this call's snapshot either way)
      val curAgg: Option[DataFrame] = curV.map { v =>
        liveAgg(manifestFrameAt(spark, dataDir, v).withColumn("_v", lit(v)))
      }
      val agg: Option[DataFrame] = (histAgg, curAgg) match {
        case (Some(h), Some(c)) =>
          Some(h.unionByName(c, allowMissingColumns = true))
        case (h, c) => h.orElse(c) // None: no retained version at all
      }
      val byV = agg.map { a =>
        labeled(spark, "graft: history agg") { a.collect() }
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      }.getOrElse(Map.empty[Long, (Long, Long)])
      vs.map { v =>
        // an EMPTY snapshot (delete-everything publish) has no group —
        // 0 files, 0 live rows, same as the old per-version aggregate
        val (nf, nr) = byV.getOrElse(v, (0L, 0L))
        (v, ops.getOrElse(v, opOfVersion(hfs, dataDir, v)), nf, nr)
      }
    }
    import spark.implicits._
    rows.toDF("version", "op", "n_files", "n_rows").orderBy("version")
  }

  /** Surgery guard: file rewrites land at the table ROOT, so a
    * hive-partitioned tree would silently migrate its partition column
    * into file data (and double it against the directory-inferred
    * one) — fail loud instead; partitioned trees compact/delete
    * per-partition directory.
    */
  private def requireFlatTable(hfs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, verb: String): Unit = {
    val sub = hfs.listStatus(root).filter(s => s.isDirectory && {
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    })
    require(sub.isEmpty,
      s"$verb requires a FLAT table: $root has partition subdirs (e.g. " +
        s"${if (sub.nonEmpty) sub.head.getPath.getName else ""}) — a root-level " +
        "rewrite would flatten the partition column into file data; use " +
        "optimizePartitioned/deleteRangePartitioned (partition-aware, one " +
        s"atomic commit) or run the $verb per partition directory")
  }

  /** TIME TRAVEL: plan the table as it stood at `version`. Every
    * versioned manifest is a complete snapshot of the file set live at
    * its refresh, so an as-of read is just "read exactly those paths" —
    * append-only file immutability (parquet files never rewrite in
    * place) makes the old bytes still correct. Validity window: a
    * version is readable until [[vacuum]]'s `keepVersions` retention
    * reaps its manifest (resolution then fails loud here, naming the
    * retained range) or reaps data files no newer version references.
    *
    * RETENTION/READ RACE (the same contract Delta documents for
    * VACUUM): resolution pins the file PATHS, not the bytes — a reader
    * that resolved an as-of frame and is still scanning (or has not yet
    * scanned) when vacuum reaps that version fails MID-SCAN with the
    * task's FileNotFound/PATH_NOT_FOUND error, not with this method's
    * named resolution failure. That failure is loud, never silent
    * partial results; the operational remedy is retention sizing —
    * keepVersions/graceMs longer than the longest reader —
    * VacuumReaderRaceSpec pins the failure mode.
    *
    * The driver holds one path string per file of that version — the
    * same O(listing) any FileIndex already holds, never manifest
    * payload (bounds/blooms stay unread).
    */
  def readAsOf(spark: SparkSession, dataDir: String, version: Long): DataFrame =
    // PRUNED time travel: plan through a version-pinned
    // [[ManifestFileIndex]], so an as-of read gets the SAME bounds/bloom
    // file skipping a current-version read gets — the retained manifest
    // carries identical per-file stats, and the common audit query
    // ("yesterday's slice of one key range") should never open the whole
    // snapshot. Membership comes from the version's manifest; pushed
    // filters prune within it; a vacuumed file fails loud at index
    // construction (liveness check) instead of silently thinning the
    // snapshot. AsOfPrunedSpec pins result-equality with the raw
    // path-list read and the actual file-skip count.
    ManifestFileIndex.read(spark, dataDir, asOf = Some(version))

  /** The file set of a retained `version`, resolved loud (named retained
    * range) when the version has been vacuumed — the shared resolution
    * step of [[readAsOf]] and [[changesBetween]].
    */
  private def filesOfVersion(spark: SparkSession, dataDir: String,
      version: Long): Seq[String] =
    // manifestFrameAt owns resolution (history-first, swap-tolerant);
    // withSwapRetry covers the LAZY gap it can't — a rename landing
    // between resolution and this collect — by re-resolving once, so a
    // concurrent consumer (ChangeFeedTail polling while a writer
    // commits) never sees a transient not-found from either window
    withSwapRetry {
      manifestFrameAt(spark, dataDir, version)
        .select(ManifestFileIndex.normPath(col("file")))
        .collect().map(_.getString(0)).sorted.toSeq
    }

  /** Run a write surgery with optimistic-conflict retries — the caller
    * loop the OCC protocol assumes (Delta's retry-on-
    * ConcurrentModification): each attempt re-plans against the CURRENT
    * version, so a retry never republishes stale staging; any other
    * failure propagates untouched. Backoff is short — the conflict
    * window is commit-sized, not job-sized.
    */
  def withConflictRetry[T](attempts: Int = 3)(body: => T): T = {
    require(attempts >= 1, s"attempts=$attempts")
    var i = 0
    while (true) {
      try return body
      catch {
        case e: ConcurrentWriteException =>
          i += 1
          if (i >= attempts) throw e
          Thread.sleep(50L << i)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** CHANGE DATA FEED between two retained versions — the incremental-
    * consumer verb beside append/compact/delete/merge/time-travel/
    * vacuum (Delta's table_changes, Iceberg's incremental read): emit
    * every row-level change that takes the table from `fromV` to `toV`
    * as the data columns plus a `change_type` of 'insert' or 'delete'
    * (an update surfaces as delete-of-old + insert-of-new, the
    * primitive CDC shape any downstream MERGE can re-apply).
    *
    * The diff is FILE-level first — versioned manifests are complete
    * file-set snapshots, so files present in both versions are PROVABLY
    * unchanged (parquet files are immutable) and are never opened; only
    * the file-set difference is read, O(touched files) I/O however
    * large the table. Row-level netting then cancels the carried rows a
    * file surgery rewrote byte-identically: multiset EXCEPT in both
    * directions (a row rewritten unchanged appears on both sides and
    * vanishes; a doubled row that lost one copy nets to exactly one
    * delete). The shuffle is over changed-file rows only.
    *
    * Both versions must still be retained — resolution fails loud with
    * the named retained range otherwise (same contract as [[readAsOf]],
    * including the mid-scan vacuum race documented there).
    *
    * REORGANIZATION hops (OPTIMIZE/purge commits, stamped `_op_`) are
    * SKIPPED: the span decomposes into runs of data-changing commits
    * and the feed composes from those alone — Delta's
    * `dataChange=false` semantics, so CDC across a nightly compaction
    * costs zero data I/O (see the decomposition comment in the body).
    */
  def changesBetween(spark: SparkSession, dataDir: String,
      fromV: Long, toV: Long): DataFrame = {
    require(fromV < toV,
      s"changesBetween needs fromV < toV, got $fromV >= $toV")
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // endpoint retention fails loud UP FRONT (the ChangeFeedTail
    // lag-past-retention contract) — the reorg decomposition below can
    // otherwise collapse the whole span without ever resolving an
    // endpoint manifest
    val (retainedSeq, histD) = versionsSnapshot(spark, dataDir)
    val retained = retainedSeq.toSet
    Seq(fromV, toV).foreach { v =>
      if (!retained.contains(v)) throw new IllegalArgumentException(
        s"requirement failed: version $v not retained under $dataDir " +
          s"(readable: ${retained.toSeq.sorted.mkString(", ")})")
    }
    // REORGANIZATION-AWARE span decomposition (the dataChange=false
    // analog Delta stamps on OPTIMIZE commits): a hop v-1 → v whose
    // `_op_` verb is optimize/purge is a pure PHYSICAL reorganization —
    // its row-level net is ZERO by contract (CdfSpec, q176, q180 pin
    // it) — so the span's netted feed composes from the non-reorg RUNS
    // alone and the rewritten files are never opened. A consumer
    // polling across a nightly OPTIMIZE of a 100 TB table pays zero
    // data I/O to learn nothing changed, instead of two full scans.
    // Soundness: a hop is skipped only when it is EXACTLY one commit
    // (v == prev+1 among retained versions) and the stamp proves
    // reorganization; vacuumed gaps and unknown/legacy stamps stay
    // inside a run — a run diff between any two retained versions is
    // exact regardless of what happened between. Multiset telescoping
    // makes the composition exact: Σ_runs (state(b)−state(a)) =
    // state(toV)−state(fromV) when every skipped hop is
    // multiset-invariant.
    val runs: Seq[(Long, Long)] = {
      val mids = retained.toSeq.filter(v => v > fromV && v <= toV).sorted
      // ops for ALL mid versions from ONE span-scoped batched pass (see
      // opsOfVersions) — a lagging consumer's span may cover thousands
      // of commits, and exists+listStatus+fallback per mid would
      // triple the driver round-trips before any planning, while a
      // SHORT-lag poll must not pay for the table's whole retention
      // depth either (the batch lists only its span's dirs). A version
      // the batch missed reads "unknown" = not-reorganization — sound.
      val ops = opsOfVersions(hfs, dataDir, mids.toSet, Some(histD))
      val out = Seq.newBuilder[(Long, Long)]
      var runStart = fromV
      var prev = fromV
      mids.foreach { v =>
        if (v == prev + 1 && ReorgOps(ops.getOrElse(v, "unknown"))) {
          if (runStart < prev) out += ((runStart, prev))
          runStart = v
        }
        prev = v
      }
      if (runStart < toV) out += ((runStart, toV))
      out.result()
    }
    // file-identity is (path, deletion vector): a DV-delete changes a
    // file's LIVE rows without touching its bytes, so the "present in
    // both versions ⇒ provably unchanged" rule extends to "present with
    // an IDENTICAL dv". A file whose dv changed is read on BOTH sides —
    // each side under its own version's dv — and the signed net below
    // emits exactly the newly-dead rows as deletes. Only the diff FLAG
    // is collected (O(files) path strings + booleans); dv binaries stay
    // on executors.
    // per-run file diff — (changed@from read at a, changed@to read at b,
    // dv-carrying files per side). ONE resolution pass per run hands the
    // downstream reads their dv-file sets too, so readSide never
    // re-resolves a manifest it was already diffed from. The common
    // dv-less case (neither side's manifest carries a dv column —
    // provable from schema alone) diffs the two path lists driver-side
    // with two plain collects: the full-outer join exists only to
    // compare dv binaries exactly, and scheduling it on a dv-less pair
    // is pure per-commit overhead for a CDC consumer.
    val runDiffs: Seq[(Long, Long, Seq[String], Seq[String],
        Set[String], Set[String])] =
      runs.map { case (a, b) =>
        labeled(spark, s"graft: cdf diff v$a..v$b") { withSwapRetry {
          val ma = manifestFrameAt(spark, dataDir, a)
          val mb = manifestFrameAt(spark, dataDir, b)
          val hasDvA = ma.columns.contains(DvCol)
          val hasDvB = mb.columns.contains(DvCol)
          if (!hasDvA && !hasDvB) {
            // ONE job for both sides (side-tagged union), not a collect
            // per endpoint: the diff is pure per-commit overhead on a
            // CDC poll, and each scheduled job is fixed driver latency
            val both = ma
              .select(ManifestFileIndex.normPath(col("file")).as("f"),
                lit(false).as("isB"))
              .unionByName(mb.select(
                ManifestFileIndex.normPath(col("file")).as("f"),
                lit(true).as("isB")))
              .collect()
            val (rb, ra) = both.partition(_.getBoolean(1))
            val fa = ra.map(_.getString(0))
            val fb = rb.map(_.getString(0))
            val (faSet, fbSet) = (fa.toSet, fb.toSet)
            (a, b, fa.filterNot(fbSet).sorted.toSeq,
              fb.filterNot(faSet).sorted.toSeq,
              Set.empty[String], Set.empty[String])
          } else {
            def side(m: DataFrame, hasDv: Boolean, fn: String,
                dvn: String): DataFrame = {
              val dvc = if (hasDv) col(DvCol) else lit(null).cast(BinaryType)
              m.select(ManifestFileIndex.normPath(col("file")).as(fn),
                dvc.as(dvn))
            }
            val diff = side(ma, hasDvA, "fa", "dva")
              .join(side(mb, hasDvB, "fb", "dvb"),
                col("fa") === col("fb"), "full_outer")
              .select(col("fa"), col("fb"),
                (!(col("dva") <=> col("dvb"))).as("dvDiff"),
                col("dva").isNotNull.as("hasA"),
                col("dvb").isNotNull.as("hasB"))
              .collect()
            val changedTo = diff.filter(r =>
              !r.isNullAt(1) && (r.isNullAt(0) || r.getBoolean(2)))
              .map(_.getString(1)).sorted.toSeq
            val changedFrom = diff.filter(r =>
              !r.isNullAt(0) && (r.isNullAt(1) || r.getBoolean(2)))
              .map(_.getString(0)).sorted.toSeq
            val dvA = diff.filter(r => !r.isNullAt(0) && r.getBoolean(3))
              .map(_.getString(0)).toSet
            val dvB = diff.filter(r => !r.isNullAt(1) && r.getBoolean(4))
              .map(_.getString(1)).toSet
            (a, b, changedFrom, changedTo, dvA, dvB)
          }
        } }
      }
    val anyChanged = runDiffs.flatMap(d => d._3 ++ d._4)
    if (anyChanged.isEmpty) {
      // nothing changed anywhere in the span (pure-reorg span, or
      // refresh no-ops): return an EMPTY LOCAL frame — no file scan in
      // the plan at all (the zero-data-I/O guarantee CdfSpec pins). The
      // schema anchors on one file of an endpoint snapshot (a footer
      // read, metadata-sized); both endpoints empty has no schema to
      // derive and no changes to emit — fail loud as before.
      val anchor = Seq(toV, fromV).iterator.flatMap { v =>
        withSwapRetry {
          // DRIVER-side probe of the (immutable) history dir first — the
          // pure-reorg span pays no Spark job for its schema anchor; the
          // version living in the mutable current manifest (or a dir
          // vacuumed mid-read) falls back to the collect-based resolve,
          // which is also what keeps the vacuumed-version error loud.
          val h = new org.apache.hadoop.fs.Path(histPath(dataDir, v))
          val conf = spark.sessionState.newHadoopConf()
          val viaDriver =
            try {
              if (h.getFileSystem(conf).exists(h))
                firstFileInManifestDir(conf, h)
              else None
            } catch { case _: java.io.IOException => None }
          viaDriver.orElse {
            manifestFrameAt(spark, dataDir, v)
              .select(ManifestFileIndex.normPath(col("file")))
              .limit(1).collect().headOption.map(_.getString(0))
          }
        }
      }.nextOption()
      require(anchor.nonEmpty,
        s"changesBetween: versions $fromV and $toV of $dataDir are both " +
          "empty snapshots — no schema to derive and no changes to emit")
      val sch = spark.read.option("basePath", dataDir).parquet(anchor.get)
        .schema.add(StructField("change_type", StringType, nullable = false))
      return spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), sch)
    }
    val anchor = anyChanged.head
    def readSet(fs: Seq[String]): DataFrame =
      if (fs.isEmpty)
        spark.read.option("basePath", dataDir).parquet(anchor)
          .filter(lit(false))
      else spark.read.option("basePath", dataDir).parquet(fs: _*)
    // split-by-side like every other DV read: only a side's DV-carrying
    // changed files pay the position join (readSet keeps the anchored
    // empty-frame shape for the no-changes case). The dv-file set comes
    // from the SAME per-run resolution that produced the diff — one
    // snapshot per (run, side), never a second resolve that a rival
    // swap could land between. applyDv's dv-row resolver still
    // re-resolves inside its own retry (history-first), so a swap
    // landing mid-collect recovers.
    def readSide(fs: Seq[String], v: Long, dvFiles: Set[String]): DataFrame =
      if (fs.isEmpty) readSet(fs)
      else {
        val (withDv, plain) = fs.partition(dvFiles)
        if (withDv.isEmpty) readSet(plain)
        else {
          val dvd = applyDv(readSet(withDv),
            () => manifestFrameAt(spark, dataDir, v),
            spill = Some((dataDir, v)))
          if (plain.isEmpty) dvd else readSet(plain).unionByName(dvd)
        }
      }
    // ONE signed-net pass over ALL runs, not two directional EXCEPT
    // ALLs per run (which would read each side twice and shuffle
    // twice): tag rows ±1, group by the full row, keep the nonzero nets
    // and expand |net| copies with the sign's change_type. Multiset-
    // identical to insEXCEPTdel ∪ delEXCEPTins composed across runs —
    // a row appearing i times inserted and d times deleted nets to
    // max(i−d,0) inserts / max(d−i,0) deletes either way — and float
    // grouping normalizes NaN/−0.0 exactly as EXCEPT ALL does.
    val tagged = runDiffs.iterator.flatMap {
      case (a, b, chFrom, chTo, dvA, dvB) =>
        val side = Seq.newBuilder[DataFrame]
        if (chTo.nonEmpty)
          side += readSide(chTo, b, dvB).withColumn("_sgn", lit(1L))
        if (chFrom.nonEmpty)
          side += readSide(chFrom, a, dvA).withColumn("_sgn", lit(-1L))
        side.result()
    }.reduce(_ unionByName _)
    val dataCols = tagged.columns.filterNot(_ == "_sgn").toIndexedSeq
    val net = tagged
      .groupBy(dataCols.map(col): _*)
      .agg(sum("_sgn").as("_net"))
      .filter(col("_net") =!= 0L)
    // BOUNDED expansion: a single explode(sequence(1, abs(_net)))
    // materializes one O(|net|) array per group inside one task — a row
    // value duplicated millions of times and deleted in one surgery
    // would build a multi-million-element array and risk executor OOM.
    // Two nested generators instead: an outer one over ≤ B-sized chunk
    // ids, an inner one over the within-chunk count — identical multiset
    // output, per-task array never larger than B. The common |net| = 1
    // case costs two one-element generators (generator rows are
    // streamed, not buffered — negligible).
    val B = 65536L
    net
      .select(dataCols.map(col) :+ col("_net") :+
        explode(expr(s"sequence(0L, (abs(_net) - 1L) div ${B}L)"))
          .as("_chunk"): _*)
      .select(dataCols.map(col) :+ col("_net") :+
        explode(expr(s"sequence(1L, least(${B}L, abs(_net) - _chunk * ${B}L))"))
          .as("_i"): _*)
      .select(dataCols.map(col) :+
        when(col("_net") > 0, lit("insert")).otherwise(lit("delete"))
          .as("change_type"): _*)
  }

  /** [[changesBetween]] with UPDATE PAIRING (Delta's
    * update_preimage/update_postimage): a key that lost exactly one row
    * and gained exactly one row across the span was UPDATED — relabel
    * its delete/insert pair so a consumer reconstructing per-key
    * updates doesn't join the two sides itself. Any other multiplicity
    * (pure insert, pure delete, a key that went from two rows to one —
    * no unambiguous pairing exists) keeps the primitive labels, and
    * NULL keys never pair (NULL matches nothing, the same rule as
    * MERGE). One hash shuffle by key over the netted delta only — the
    * pairing adds O(changed rows), never O(table).
    */
  def changesBetweenKeyed(spark: SparkSession, dataDir: String,
      fromV: Long, toV: Long, key: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(key))
    changesBetween(spark, dataDir, fromV, toV)
      .withColumn("_ins", sum(
        when(col("change_type") === "insert", lit(1L)).otherwise(lit(0L))).over(w))
      .withColumn("_del", sum(
        when(col("change_type") === "delete", lit(1L)).otherwise(lit(0L))).over(w))
      .withColumn("change_type",
        when(col(key).isNotNull && col("_ins") === 1L && col("_del") === 1L,
          when(col("change_type") === "insert", lit("update_postimage"))
            .otherwise(lit("update_preimage")))
          .otherwise(col("change_type")))
      .drop("_ins", "_del")
  }

  // ---- deletion vectors ---------------------------------------------------

  /** Manifest column holding a file's [[DeletionVectors]] sidecar bytes
    * (nullable binary; absent entirely on tables never DV-deleted) and
    * its deleted-row count twin. `n_rows` stays the PHYSICAL row count
    * — `n_rows - n_del` is the live count — and min/max bounds stay
    * physical too (a deleted row can only WIDEN them: conservative,
    * so bounds/bloom pruning over a DV-carrying file remains sound).
    */
  private[sources] val DvCol = "dv"
  private[sources] val DvDelCol = "n_del"

  /** Version stamps that assert MULTISET-INVARIANCE to the change feed
    * (Delta's dataChange=false): [[changesBetween]] skips single-commit
    * hops carrying one of these, so only the internal reorganization
    * verbs may stamp them — [[publishVia]] rejects them from callers.
    */
  private[sources] val ReorgOps = Set("optimize", "purge")

  /** Manifest `file` entry → the exact `_metadata.file_path`
    * representation (a percent-encoded URI — verified equal to
    * `new Path(norm(s)).toUri.toString`, space/# cases included). The
    * DV join runs once per DATA row, so the per-row side must carry
    * ZERO transformation: this UDF runs on the metadata-sized manifest
    * side only, and the data side joins on the raw `_metadata`
    * attribute (codegen string hash against a tiny broadcast).
    */
  private[sources] val metaPathOf =
    udf { (s: String) =>
      new org.apache.hadoop.fs.Path(FsListing.norm(s)).toUri.toString }

  /** Anti-filter a parquet-backed frame against per-file deletion
    * vectors: tag each row with its file + row position (parquet's
    * `_metadata` constant columns — exactly the hook Delta's DV reads
    * use), broadcast-join the manifest's (file → dv) rows, and drop the
    * positions the DV marks. No-op (plan untouched, zero overhead) when
    * the manifest has no `dv` column — the common never-DV-deleted
    * table. Files without a DV entry miss the join → null dv →
    * `dv_contains` is total-false → every row kept, no null guard.
    */
  private[sources] def applyDv(df: DataFrame, mkM: () => DataFrame,
      spill: Option[(String, Long)] = None): DataFrame =
    applyDvOn(df, mkM, col("_metadata.file_path"), col("_metadata.row_index"),
      spill)

  /** [[applyDv]] core with caller-supplied position columns — for
    * frames that already materialized `_metadata` into named columns
    * (metadata attributes don't survive a join, so a pipeline that
    * needs them downstream must capture them on the raw scan first).
    *
    * The dv rows MATERIALIZE EAGERLY into a LocalRelation (driver-side
    * rows, metadata-sized — exactly what the broadcast would collect at
    * execution anyway): a lazy plan over the mutable `_manifest` path
    * would crash with FileNotFound when a rival swap renames it while
    * the returned frame is held, and a retry could never recover
    * because the captured relation pins the old part files. `mkM` is a
    * RESOLVER, invoked inside the swap retry, so a swap landing between
    * resolution and collect re-resolves (history-first) instead of
    * re-reading the renamed-away path. Zero live DVs → the frame is
    * returned untouched.
    */
  /** SIZE GATE for the dv broadcast: per-file DVs are bounded by
    * `maxDvFraction` (4 B/deleted row), but nothing bounds the NUMBER
    * of DV-carrying files — 10⁵ lightly-deleted files would make the
    * LocalRelation collect + broadcast multi-GB driver state. Above
    * this many estimated bytes (Σ n_del × 4 + per-file overhead, one
    * column-pruned metadata agg that never reads a dv binary), the dv
    * rows SPILL to an immutable version-keyed parquet under the table
    * (`_dv_spill/v{N}` — underscore-prefixed: invisible to data
    * listings/coverage) and the read joins it shuffle-side instead of
    * broadcasting; the spill is written once per (table, version) and
    * reused, and [[vacuum]] reaps spills of unretained versions.
    * PER-SESSION conf (`graft.dv.broadcastMaxBytes`) — a JVM-global
    * mutable field would race two sessions sharing the process with
    * different needs; specs override the conf to force the fallback at
    * toy scale.
    */
  private[graft] val DvBroadcastMaxBytesKey = "graft.dv.broadcastMaxBytes"
  private[graft] def dvBroadcastMaxBytes(spark: SparkSession): Long =
    spark.conf.get(DvBroadcastMaxBytesKey, (64L << 20).toString).toLong

  private def dvSpillDir(dataDir: String, v: Long): String =
    s"$dataDir/_dv_spill/v$v"

  /** Materialize version `v`'s dv rows to the spill parquet if not
    * already there; idempotent and concurrency-safe (tmp + rename; the
    * loser of a rename race verifies the winner's completion marker and
    * reuses it). The spill is immutable once renamed — exactly the
    * property the returned lazy plan needs that the swap-mutable
    * `_manifest` dir can't give.
    *
    * Completion is proven by an EXPLICIT `_GRAFT_SPILL_OK` marker this
    * code creates inside tmp before the rename — not by the committer's
    * `_SUCCESS`, whose emission is a cluster conf
    * (mapreduce.fileoutputcommitter.marksuccessfuljobs=false produces
    * none, which would make every over-threshold DV read hard-fail
    * here). `_SUCCESS` is still ACCEPTED when present (pre-marker spill
    * dirs stay reusable).
    */
  private def ensureDvSpill(spark: SparkSession, dataDir: String, v: Long,
      mkM: () => DataFrame): String = {
    val dir = new org.apache.hadoop.fs.Path(dvSpillDir(dataDir, v))
    val hfs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    def complete() =
      hfs.exists(new org.apache.hadoop.fs.Path(dir, "_GRAFT_SPILL_OK")) ||
        hfs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))
    if (complete()) return dir.toString
    val tmp = new org.apache.hadoop.fs.Path(
      s"$dataDir/_dv_spill/.tmp_v${v}_${java.util.UUID.randomUUID().toString.take(8)}")
    withSwapRetry {
      mkM().filter(col(DvCol).isNotNull)
        .select(metaPathOf(col("file")).as("__graft_dv_file"),
          col(DvCol).as("__graft_dv"))
        .write.mode("overwrite").parquet(tmp.toString)
    }
    // the marker lands in tmp BEFORE the rename, so the published dir is
    // born complete — there is no window where a rival's complete() can
    // observe the dir without its marker
    hfs.create(new org.apache.hadoop.fs.Path(tmp, "_GRAFT_SPILL_OK"), true)
      .close()
    if (!hfs.rename(tmp, dir)) {
      // dir already exists: a complete winner (reuse it), or a
      // marker-less leftover — a pre-marker-era spill on a cluster whose
      // committer emits no _SUCCESS, or a crashed writer's torn dir.
      // REPAIR the latter by replacing it with our proven-complete tmp;
      // without this, every over-threshold read would re-spill into tmp
      // and fail here forever (nothing else ever adds a marker to an
      // existing dir). Deleting is safe: a marker-less dir is never
      // served (only complete() dirs are returned), and the race of two
      // repairers resolves like the original race — one rename wins.
      if (!complete()) {
        // rename the torn dir ASIDE (doomed temp) rather than deleting
        // in place: a rival repairer can publish a COMPLETE spill
        // between the outer complete() check and here, and an in-place
        // delete would destroy that just-published dir while it is the
        // only complete copy — yanking files from under a reader's lazy
        // plan for longer than the swap window. The aside-rename is
        // atomic and our own proven-complete (equivalent) tmp is
        // installed immediately after, so any reader-visible absence is
        // two metadata renames wide — inside what the read path's
        // withSwapRetry already tolerates; the doomed dir (torn, or a
        // rival's superseded-but-equivalent spill) is then reaped from
        // its dot-prefixed (listing-invisible) aside name.
        val doomed = new org.apache.hadoop.fs.Path(
          s"$dataDir/_dv_spill/.doomed_v${v}_" +
            java.util.UUID.randomUUID().toString.take(8))
        val aside = hfs.rename(dir, doomed)
        hfs.rename(tmp, dir)
        if (aside) hfs.delete(doomed, true)
        // a rival repairer can re-create dir between our aside-rename
        // and rename(tmp, dir) — Hadoop then nests tmp INSIDE it
        // (returning true); remove the nesting exactly as the
        // first-publish branch does
        val nested = new org.apache.hadoop.fs.Path(dir, tmp.getName)
        if (hfs.exists(nested)) hfs.delete(nested, true)
      }
      if (hfs.exists(tmp)) hfs.delete(tmp, true)
      require(complete(), s"dv spill publish failed under $dir")
    } else {
      // Hadoop rename semantics move src INTO an existing dst DIRECTORY
      // (returning true) instead of failing — so the loser of a
      // concurrent-spill race doesn't take the branch above, it nests
      // its whole tmp dir inside the winner's published spill. Results
      // stay correct (dot-prefixed dirs are invisible to parquet
      // listings) but the duplicate bytes would be unreachable by the
      // vacuum reaper forever; detect the nesting and remove it.
      val nested = new org.apache.hadoop.fs.Path(dir, tmp.getName)
      if (hfs.exists(nested)) hfs.delete(nested, true)
      require(complete(), s"dv spill publish incomplete under $dir")
    }
    dir.toString
  }

  /** Size-estimate memo for the gate below, keyed (table, version):
    * the dv state of a retained version is immutable, so repeated
    * DV-reads of one version (the dominant pattern — every split read,
    * pruned read, and CDF side of a version runs the gate) pay the
    * metadata agg once. A build()-reset recycling version numbers can
    * alias a key — [[swapVersioned]] evicts the recycled entry (and
    * the matching stale spill dir) at every publish, and a stale HIT
    * could anyway only mis-route the threshold decision, never change
    * results. Cap-and-clear like every planner memo here.
    */
  private val dvEstMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), java.lang.Long]()

  private def applyDvOn(df: DataFrame, mkM: () => DataFrame,
      fileCol: Column, idxCol: Column,
      spill: Option[(String, Long)] = None): DataFrame = {
    val spark = df.sparkSession
    // gate FIRST, with a column-pruned metadata agg (n_del + a file
    // count — dv binaries unread), so an over-threshold dv set is never
    // collected to the driver at all; memoized per (table, version) so
    // the gate adds no per-read job on repeated reads of one version
    def estOnce(): Long = withSwapRetry {
      val m = mkM()
      if (!m.columns.contains(DvCol)) 0L
      else {
        val r = m.filter(col(DvCol).isNotNull)
          .agg(sum(coalesce(col(DvDelCol), lit(0L))).as("nd"),
            count(lit(1)).as("nf")).head()
        if (r.isNullAt(1) || r.getLong(1) == 0L) 0L
        else r.getLong(0) * 4L + r.getLong(1) * 64L
      }
    }
    val est = spill match {
      case Some((dataDir, v)) =>
        val key = (FsListing.norm(dataDir), v)
        val hit = dvEstMemo.get(key)
        if (hit != null) hit.longValue()
        else {
          val e = estOnce()
          if (dvEstMemo.size >= 256) dvEstMemo.clear()
          dvEstMemo.put(key, e)
          e
        }
      case None => estOnce()
    }
    if (est == 0L) return df
    graft.functions.DvContains.register(spark)
    val overCap = est > dvBroadcastMaxBytes(spark)
    val dvSide: (DataFrame, Boolean) = spill match {
      case Some((dataDir, v)) if overCap =>
        // shuffle-side fallback: the dv table reads from the immutable
        // version-keyed spill — executor-side bytes, zero driver
        // collect — and the join builds its hash side from it
        // (shuffle_hash hint: the dv side is always the small side
        // relative to the data rows being filtered; only DV-carrying
        // files' rows reach this join at all, per the split read)
        (spark.read.parquet(ensureDvSpill(spark, dataDir, v, mkM))
          .hint("shuffle_hash"), false)
      case _ =>
        // in-bounds (or no spill context): eager LocalRelation — the
        // rows a broadcast would collect at execution anyway, pinned
        // driver-side so no plan ever depends on the mutable
        // `_manifest` path (see the class doc above)
        val rows = withSwapRetry {
          val m = mkM()
          m.filter(col(DvCol).isNotNull)
            .select(metaPathOf(col("file")).as("__graft_dv_file"),
              col(DvCol).as("__graft_dv"))
            .collect()
        }
        (spark.createDataFrame(
          java.util.Arrays.asList(rows: _*),
          StructType(Seq(
            StructField("__graft_dv_file", StringType, nullable = false),
            StructField("__graft_dv", BinaryType, nullable = false)))), true)
    }
    val joined = df.withColumn("__graft_dv_file", fileCol)
      .withColumn("__graft_dv_idx", idxCol)
    (if (dvSide._2)
      joined.join(broadcast(dvSide._1), Seq("__graft_dv_file"), "left")
    else joined.join(dvSide._1, Seq("__graft_dv_file"), "left"))
      .filter(!expr("dv_contains(__graft_dv, __graft_dv_idx)"))
      .drop("__graft_dv_file", "__graft_dv_idx", "__graft_dv")
  }

  /** Scan exactly `kept` with per-file DVs applied, SPLIT by side:
    * files without a DV read on the plain fast path; only DV-carrying
    * files pay the position join — same cost shape as
    * [[ManifestFileIndex.read]]'s split. One extra metadata-sized
    * collect (the dv file list) on DV tables; zero change otherwise.
    *
    * `pinnedV` is the version the CALLER planned `kept` from — the dv
    * file set and the dv rows both resolve at that same version
    * (history-first, so the reads survive a mid-flight swap). Un-pinned
    * this served a MIXED snapshot: version-N kept files anti-filtered
    * by version-N+1 DVs, the isolation hole [[ManifestFileIndex.read]]'s
    * split explicitly pins v0 to prevent.
    */
  private def readKeptDv(spark: SparkSession, dataDir: String,
      kept: Seq[String], pinnedV: Long): DataFrame = {
    def mm() = manifestFrameAt(spark, dataDir, pinnedV)
    val dvFiles = withSwapRetry {
      val mf = mm()
      if (!mf.columns.contains(DvCol)) Set.empty[String]
      else mf.filter(col(DvCol).isNotNull)
        .select(ManifestFileIndex.normPath(col("file")))
        .collect().map(_.getString(0)).toSet
    }
    val (withDv, plain) = kept.partition(dvFiles)
    if (withDv.isEmpty) readKept(spark, dataDir, plain)
    else {
      val dvd = applyDv(readKept(spark, dataDir, withDv), () => mm(),
        spill = Some((dataDir, pinnedV)))
      if (plain.isEmpty) dvd
      else readKept(spark, dataDir, plain).unionByName(dvd)
    }
  }

  /** Align fresh per-file stats to an existing manifest's column set:
    * a just-written file carries no deletion vector (`dv` NULL,
    * `n_del` 0). Shared by every surgery that unions carried manifest
    * entries with [[statsForFiles]] output.
    */
  private def alignStats(stats: DataFrame, target: Seq[String]): DataFrame =
    stats.select(target.map {
      case DvCol if !stats.columns.contains(DvCol) =>
        lit(null).cast(BinaryType).as(DvCol)
      case DvDelCol if !stats.columns.contains(DvDelCol) => lit(0L).as(DvDelCol)
      case c => col(c)
    }.toIndexedSeq: _*)

  /** Does the CURRENT manifest carry any live deletion vector? The
    * rebuild guard: [[build]]/[[buildWithBloom]] re-stat raw files and
    * would silently RESURRECT DV-deleted rows — they fail loud instead
    * (purge first). One tiny manifest job, only on rebuild paths.
    */
  private def hasLiveDv(spark: SparkSession, dataDir: String): Boolean = {
    val hfs = new org.apache.hadoop.fs.Path(dataDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    hfs.exists(new org.apache.hadoop.fs.Path(manifestPath(dataDir))) &&
      withSwapRetry {
        val m = manifestFrame(spark, dataDir)
        m.columns.contains(DvCol) &&
          m.filter(col(DvCol).isNotNull).limit(1).count() > 0
      }
  }

  /** Range DELETE via DELETION VECTORS — the row-level form of
    * [[deleteRange]] (Delta's deletion vectors / Iceberg's positional
    * deletes): instead of rewriting every intersecting file, mark the
    * matched ROW POSITIONS deleted in a per-file DV carried by the
    * manifest. The write cost is one COLUMN-PRUNED scan of the
    * intersecting files (just `c` + the metadata position — no
    * full-width read, NO data-file write at all) plus a manifest swap,
    * so deleting a sliver from a table of GB-sized files costs
    * metadata, not I/O proportional to file width. Readers anti-filter
    * positions via [[applyDv]] on every path (current, as-of, pruned,
    * point-lookup, CDF), and the bytes physically leave disk at
    * [[purgeDv]]/rewrite + [[vacuum]] — the same two-phase purge
    * contract as the rewrite form.
    *
    * HYBRID threshold (what production formats do): a file whose
    * cumulative deleted fraction would exceed `maxDvFraction` is
    * REWRITTEN instead (reading it pays mostly-dead rows forever, and
    * an unbounded DV defeats the metadata-sized story) — both shapes
    * can land in one call, atomically in one version. DVs merge across
    * calls (union of positions); a second delete of an already-dead row
    * is idempotent. MVCC/OCC protocol identical to [[deleteRange]].
    *
    * Returns (files DV-marked, files rewritten, files untouched).
    */
  def deleteRangeDV(spark: SparkSession, dataDir: String, c: String,
      lo: Column, hi: Column, cols: Seq[String],
      bloomCols: Seq[String] = Nil, expectedPerFile: Long = 65536L,
      fpp: Double = 0.01, maxDvFraction: Double = 0.5): (Int, Int, Int) = {
    val m = manifestFrame(spark, dataDir)
    require(m.columns.contains(s"min_$c") && m.columns.contains(s"max_$c"),
      s"deleteRangeDV needs tracked bounds for $c under $dataDir")
    // candidates by bounds — same soundness rule as deleteRange
    val candidate = !coalesce(
      col(s"max_$c") < lo || col(s"min_$c") > hi, lit(false))
    deleteDvCore(spark, dataDir, m, candidate,
      scanCols = Seq(c),
      matchRows = _.filter(col(c) >= lo && col(c) <= hi),
      // NULL never satisfies a range predicate — NULL-c rows survive: a
      // bare !(between) evaluates to NULL for them and the filter would
      // silently delete every NULL row in a rewritten file
      keepRows = _.filter(col(c).isNull || !(col(c) >= lo && col(c) <= hi)),
      cols, bloomCols, expectedPerFile, fpp, maxDvFraction)
  }

  /** Keyed DELETE via DELETION VECTORS — the right-to-be-forgotten verb
    * in its production shape (a batch of record ids to erase): mark the
    * matched rows' positions in per-file DVs, planning candidates
    * through the same bounds + bloom key probes [[mergeKeys]] uses
    * (binary-searched key slices per file), so a spread key batch
    * against a huge table opens only the files that might hold a key.
    * Hybrid threshold, merge-across-calls, idempotence, and read-side
    * application are all [[deleteRangeDV]]'s. Keys must be integral
    * (same cast-to-long soundness rule as mergeKeys); duplicates are
    * collapsed; a key present nowhere deletes nothing. Returns
    * (files DV-marked, files rewritten, files untouched).
    */
  def deleteKeysDV(spark: SparkSession, dataDir: String, key: String,
      keys: Seq[Long], cols: Seq[String],
      bloomCols: Seq[String] = Nil, expectedPerFile: Long = 65536L,
      fpp: Double = 0.01, maxDvFraction: Double = 0.5,
      maxKeys: Int = 100000): (Int, Int, Int) =
    deleteKeysDVImpl(spark, dataDir, key, keys, cols, bloomCols,
      expectedPerFile, fpp, maxDvFraction, maxKeys, partitioned = false)

  /** [[deleteKeysDV]] for a HIVE-PARTITIONED manifest table — the
    * right-to-be-forgotten erase batch in its production layout (a
    * date-partitioned fact tree): candidates are bounds/bloom-pruned
    * per FILE exactly as on a flat table (sidecars are partition-
    * agnostic), DV marks stay metadata-only, and any over-threshold
    * rewrites stage as ONE dynamic-partition job into their own
    * partition dirs — the partition column never flattens into file
    * data — publishing under ONE manifest swap (single-version
    * atomicity tree-wide, same contract as [[optimizePartitioned]]).
    * The key must be a physical column; erasing BY the partition
    * column fails loud toward the directory-drop path.
    */
  def deleteKeysDVPartitioned(spark: SparkSession, dataDir: String,
      key: String, keys: Seq[Long], cols: Seq[String],
      bloomCols: Seq[String] = Nil, expectedPerFile: Long = 65536L,
      fpp: Double = 0.01, maxDvFraction: Double = 0.5,
      maxKeys: Int = 100000): (Int, Int, Int) =
    deleteKeysDVImpl(spark, dataDir, key, keys, cols, bloomCols,
      expectedPerFile, fpp, maxDvFraction, maxKeys, partitioned = true)

  private def deleteKeysDVImpl(spark: SparkSession, dataDir: String,
      key: String, keys: Seq[Long], cols: Seq[String],
      bloomCols: Seq[String], expectedPerFile: Long,
      fpp: Double, maxDvFraction: Double, maxKeys: Int,
      partitioned: Boolean): (Int, Int, Int) = {
    require(keys.nonEmpty, "deleteKeysDV with no keys")
    require(keys.size <= maxKeys,
      s"deleteKeysDV batch of ${keys.size} keys exceeds maxKeys=$maxKeys " +
        "— the key set rides the plan (InSet) and the candidate probes; " +
        "split the erasure into batches or use deleteRangeDV for ranges")
    val m = manifestFrame(spark, dataDir)
    val dt = resolveColumnType(spark, dataDir, key,
      if (partitioned) "deleteKeysDVPartitioned" else "deleteKeysDV")
    require(FsListing.isIntegral(dt),
      s"deleteKeysDV key '$key' is $dt — only integral key columns " +
        "(cast-to-long must be value- and order-preserving)")
    val keyArr = keys.distinct.sorted.toArray
    deleteDvCore(spark, dataDir, m, keyCandidate(m, key, keyArr),
      scanCols = Seq(key),
      matchRows = _.filter(col(key).isin(keyArr: _*)),
      keepRows = _.filter(col(key).isNull || !col(key).isin(keyArr: _*)),
      cols, bloomCols, expectedPerFile, fpp, maxDvFraction,
      partitioned = partitioned)
  }

  /** [[deleteKeysDV]] for STRING keys — the UUID/document-id erasure
    * batch in its native type (real right-to-be-forgotten payloads key
    * on string ids, not surrogate longs). Candidate planning runs
    * through [[keyCandidateStr]]: bounds compare as Catalyst string
    * literals, the per-file slice binary-searches in UTF-8 order, and
    * the bloom probe hashes the same UTF-8 bytes the build side stored
    * — no cast anywhere, so the skipping stack stays exactly as sound
    * as the long-key path. Separate name (not an overload): Seq[Long]
    * and Seq[String] erase to the same JVM signature.
    */
  def deleteKeysDVString(spark: SparkSession, dataDir: String, key: String,
      keys: Seq[String], cols: Seq[String],
      bloomCols: Seq[String] = Nil, expectedPerFile: Long = 65536L,
      fpp: Double = 0.01, maxDvFraction: Double = 0.5,
      maxKeys: Int = 100000): (Int, Int, Int) =
    deleteKeysDVStringImpl(spark, dataDir, key, keys, cols, bloomCols,
      expectedPerFile, fpp, maxDvFraction, maxKeys, partitioned = false)

  /** [[deleteKeysDVString]] on a HIVE-PARTITIONED tree — the GDPR
    * erase batch in both its production dimensions at once: string
    * (UUID/document-id) keys AND a date-partitioned table. Planning and
    * atomicity as [[deleteKeysDVPartitioned]]; encoding/ordering as the
    * flat string verb (UTF-8 end to end).
    */
  def deleteKeysDVStringPartitioned(spark: SparkSession, dataDir: String,
      key: String, keys: Seq[String], cols: Seq[String],
      bloomCols: Seq[String] = Nil, expectedPerFile: Long = 65536L,
      fpp: Double = 0.01, maxDvFraction: Double = 0.5,
      maxKeys: Int = 100000): (Int, Int, Int) =
    deleteKeysDVStringImpl(spark, dataDir, key, keys, cols, bloomCols,
      expectedPerFile, fpp, maxDvFraction, maxKeys, partitioned = true)

  private def deleteKeysDVStringImpl(spark: SparkSession, dataDir: String,
      key: String, keys: Seq[String], cols: Seq[String],
      bloomCols: Seq[String], expectedPerFile: Long,
      fpp: Double, maxDvFraction: Double, maxKeys: Int,
      partitioned: Boolean): (Int, Int, Int) = {
    require(keys.nonEmpty, "deleteKeysDVString with no keys")
    require(keys.size <= maxKeys,
      s"deleteKeysDVString batch of ${keys.size} keys exceeds " +
        s"maxKeys=$maxKeys — the key set rides the plan (InSet) and the " +
        "candidate probes; split the erasure into batches")
    require(!keys.contains(null),
      "deleteKeysDVString: NULL key in batch — a NULL key matches no row")
    val m = manifestFrame(spark, dataDir)
    val dt = resolveColumnType(spark, dataDir, key,
      if (partitioned) "deleteKeysDVStringPartitioned" else "deleteKeysDVString")
    require(dt == StringType,
      s"deleteKeysDVString key '$key' is $dt — use deleteKeysDV for " +
        "integral keys")
    val keyArr = keys.distinct.sorted(utf8Ordering).toArray
    deleteDvCore(spark, dataDir, m, keyCandidateStr(m, key, keyArr),
      scanCols = Seq(key),
      matchRows = _.filter(col(key).isin(keyArr.toIndexedSeq: _*)),
      keepRows =
        _.filter(col(key).isNull || !col(key).isin(keyArr.toIndexedSeq: _*)),
      cols, bloomCols, expectedPerFile, fpp, maxDvFraction,
      partitioned = partitioned)
  }

  /** Keyed DELETE with the erase batch as a DataFrame COLUMN instead of
    * a driver Seq — and therefore UNCAPPED: the production GDPR sweep
    * ships millions of ids selected by a query, not a hand-held list.
    * A batch of at most `maxCollectedKeys` DISTINCT keys collects once
    * and takes the precise per-key bounds+bloom candidate path of
    * [[deleteKeysDV]]/[[deleteKeysDVString]] (long vs string dispatched
    * on the column's type); a larger batch never lands on the driver —
    * NULL guards run as aggregates, candidates fall back to global-
    * bounds overlap (a batch past the cap is dense over its range, and
    * zero-match candidates are carried untouched by the count pass),
    * and matched positions / rewrite survivors become exact key JOINS.
    * Duplicates in the batch are collapsed (erasure is idempotent per
    * key); NULL keys fail loud (they match no row). Returns
    * (files DV-marked, files rewritten, files untouched).
    */
  def deleteKeysDVFrame(spark: SparkSession, dataDir: String, key: String,
      keys: DataFrame, cols: Seq[String],
      bloomCols: Seq[String] = Nil, expectedPerFile: Long = 65536L,
      fpp: Double = 0.01, maxDvFraction: Double = 0.5,
      maxCollectedKeys: Int = 100000): (Int, Int, Int) =
    deleteKeysDVFrameImpl(spark, dataDir, key, keys, cols, bloomCols,
      expectedPerFile, fpp, maxDvFraction, maxCollectedKeys,
      partitioned = false)

  /** [[deleteKeysDVFrame]] on a HIVE-PARTITIONED tree — the uncapped
    * right-to-be-forgotten verb in both production dimensions at once:
    * query-selected keys of any cardinality AND a partitioned fact
    * tree, one dynamic-partition staging job, one-swap atomicity
    * (same contract as [[deleteKeysDVPartitioned]]).
    */
  def deleteKeysDVFramePartitioned(spark: SparkSession, dataDir: String,
      key: String, keys: DataFrame, cols: Seq[String],
      bloomCols: Seq[String] = Nil, expectedPerFile: Long = 65536L,
      fpp: Double = 0.01, maxDvFraction: Double = 0.5,
      maxCollectedKeys: Int = 100000): (Int, Int, Int) =
    deleteKeysDVFrameImpl(spark, dataDir, key, keys, cols, bloomCols,
      expectedPerFile, fpp, maxDvFraction, maxCollectedKeys,
      partitioned = true)

  private def deleteKeysDVFrameImpl(spark: SparkSession, dataDir: String,
      key: String, keys: DataFrame, cols: Seq[String],
      bloomCols: Seq[String], expectedPerFile: Long,
      fpp: Double, maxDvFraction: Double, maxCollectedKeys: Int,
      partitioned: Boolean): (Int, Int, Int) = {
    val verb =
      if (partitioned) "deleteKeysDVFramePartitioned" else "deleteKeysDVFrame"
    require(keys.columns.contains(key),
      s"$verb: key frame has no column '$key' (has: " +
        s"${keys.columns.mkString(", ")})")
    val keyDt = keys.schema(key).dataType
    val strKey = keyDt == StringType
    require(FsListing.isIntegral(keyDt) || strKey,
      s"$verb key '$key' is $keyDt — only integral (cast-to-long must " +
        "be value- and order-preserving) or string key columns erase")
    val tableDt = resolveColumnType(spark, dataDir, key, verb)
    require(if (strKey) tableDt == StringType else FsListing.isIntegral(tableDt),
      s"$verb: batch key type $keyDt does not probe table key type " +
        s"$tableDt under $dataDir — bloom/bounds encodings must match")
    val nullMsg = s"$verb: NULL key in batch — a NULL key matches no row"
    // PERSISTED for the whole verb: the probe, the guards, and the
    // matcher joins must all see ONE evaluation of the caller's key
    // query — a re-evaluated non-deterministic query (or one racing a
    // concurrent append to its source) would erase file A's positions
    // against a different key set than file B's survivors, a silent
    // partial right-to-be-forgotten erase (see keyJoinMatchers)
    val kDistinct = keys
      .select((if (strKey) col(key) else col(key).cast("long")).as("k"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // measured-size decision, one job in the common case (mergeKeys'
      // cap-probe pattern): cap+1 rows decide the path AND, below the
      // cap, already ARE the complete key set
      val capped = kDistinct.limit(maxCollectedKeys + 1).collect()
      require(capped.nonEmpty, s"$verb with no keys")
      if (capped.length <= maxCollectedKeys) {
        require(!capped.exists(_.isNullAt(0)), nullMsg)
        return (
          if (strKey)
            deleteKeysDVStringImpl(spark, dataDir, key,
              capped.toIndexedSeq.map(_.getString(0)), cols, bloomCols,
              expectedPerFile, fpp, maxDvFraction,
              maxKeys = capped.length, partitioned = partitioned)
          else
            deleteKeysDVImpl(spark, dataDir, key,
              capped.toIndexedSeq.map(_.getLong(0)), cols, bloomCols,
              expectedPerFile, fpp, maxDvFraction,
              maxKeys = capped.length, partitioned = partitioned))
      }
      // UNCAPPED path: aggregate-only guards + global key bounds from
      // one job (which also materializes the persisted key set in full)
      // — zero driver-resident key state however large the batch
      val st = kDistinct.agg(
        sum(when(col("k").isNull, lit(1L)).otherwise(lit(0L))).as("nulls"),
        min("k").as("kmin"), max("k").as("kmax")).head()
      require(st.getLong(0) == 0L, nullMsg)
      val m = manifestFrame(spark, dataDir)
      val kcol = kDistinct.filter(col("k").isNotNull).select(col("k").as(key))
      val (matchRows, keepRows) = keyJoinMatchers(kcol, key)
      deleteDvCore(spark, dataDir, m,
        globalBoundsCandidate(m, key, strKey, st.get(1), st.get(2)),
        scanCols = Seq(key),
        matchRows = matchRows,
        keepRows = keepRows,
        cols, bloomCols, expectedPerFile, fpp, maxDvFraction,
        partitioned = partitioned)
    } finally kDistinct.unpersist(false)
  }

  /** The shared DV-delete engine behind [[deleteRangeDV]] and
    * [[deleteKeysDV]]: plan candidates via `candidate` (a boolean over
    * MANIFEST rows), find matched row positions via `matchRows` (keeps
    * exactly the MATCHED data rows, reading only `scanCols` — a
    * predicate filter for driver-sized key sets, a key semi-join for
    * uncapped batches), split by the dead-fraction threshold, write DVs
    * for the light side and rewrite the heavy side (`keepRows` keeps a
    * rewrite file's live rows — the complement filter, or an anti-join),
    * and commit both shapes atomically as one MVCC version under the
    * usual OCC protocol. matchRows/keepRows MUST be exact complements
    * over non-null match columns (an approximate matcher would mark
    * wrong positions dead); both may be invoked more than once, each
    * time on a fresh scan. Returns (dv files, rewritten files,
    * untouched files).
    */
  private def deleteDvCore(spark: SparkSession, dataDir: String,
      m: DataFrame, candidate: Column, scanCols: Seq[String],
      matchRows: DataFrame => DataFrame,
      keepRows: DataFrame => DataFrame, cols: Seq[String],
      bloomCols: Seq[String], expectedPerFile: Long, fpp: Double,
      maxDvFraction: Double,
      appendDf: Option[DataFrame] = None,
      op: String = "dv-delete",
      partitioned: Boolean = false): (Int, Int, Int) = {
    require(maxDvFraction > 0 && maxDvFraction <= 1,
      s"maxDvFraction must be in (0, 1], got $maxDvFraction")
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // PARTITIONED mode (the *Partitioned keyed verbs): candidate
    // planning, the matched-position passes, and the DV/manifest shapes
    // are all partition-agnostic already (bounds/bloom sidecars are
    // per-FILE, DV writes are metadata); only the REWRITE/APPEND staging
    // must keep the partition encoding directory-only, which the
    // dynamic-partition staged write below does. Flat mode keeps the
    // loud guard — a root-level rewrite on a partitioned tree would
    // flatten the partition column into file data.
    if (!partitioned) requireFlatTable(hfs, root, op)
    val plannedV = currentVersion(hfs, dataDir)
    val hasDvCols = m.columns.contains(DvCol)
    // ONE metadata job for plan + tally: candidate flag evaluated in the
    // same collect that brings back per-file counts (a separate
    // carried-count job is pure scheduling overhead per surgery)
    val allMeta = labeled(spark, s"graft: $op plan") {
      m.select(
        ManifestFileIndex.normPath(col("file")).as("f"),
        col("n_rows"),
        (if (hasDvCols) coalesce(col(DvDelCol), lit(0L)) else lit(0L)).as("nd0"),
        // NULL proves nothing → CANDIDATE (examined, at worst a wasted
        // scan — the sound direction; callers' predicates are non-null
        // by construction today)
        coalesce(candidate, lit(true)).as("c"))
        .collect()
    }.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    // partition layout (names of the hive `k=v` dir levels) from the
    // already-collected manifest paths — zero extra I/O. The key/scan
    // columns must be PHYSICAL: erasing BY the partition column is a
    // directory drop, not a row surgery (same guard as
    // deleteRangePartitioned), and a partition-column matchPred would
    // rewrite every file of the matched dirs for nothing.
    val partCols: Seq[String] =
      if (!partitioned) Nil
      else {
        require(allMeta.nonEmpty, s"$op on empty table $dataDir")
        val rootQ = FsListing.norm(root.makeQualified(
          hfs.getUri, hfs.getWorkingDirectory).toString)
        val pc = partitionColsOf(rootQ, allMeta.map(_._1).toSeq, op)
        scanCols.find(pc.contains).foreach { c =>
          throw new IllegalArgumentException(
            s"$op column '$c' is a PARTITION column under $dataDir — " +
              "drop the matching partition directories and refresh " +
              "instead of a row-level surgery")
        }
        pc
      }
    val candMeta = allMeta.filter(_._4).map(t => (t._1, t._2, t._3)).sortBy(_._1)
    val nCarriedBounds = allMeta.length - candMeta.length
    // pure-delete with no candidates: no version bump (an appendDf —
    // the merge-on-read shape — must still commit its insert-only batch)
    if (candMeta.isEmpty && appendDf.isEmpty) return (0, 0, nCarriedBounds)
    val candPaths = candMeta.map(_._1)

    // PASS 1 — per-file matched count, column-pruned (scanCols + the
    // metadata position only — no full-width read). Rows a prior DV
    // already killed must not count toward this delete (idempotence):
    // DV-filter first, on positions captured from the raw scan.
    def matchedRows(paths: Seq[String]): DataFrame = {
      // "f" stays the RAW `_metadata.file_path` — no per-row UDF; keys
      // normalize at per-FILE granularity (driver-side for counts,
      // manifest-side via metaPathOf for the dv join)
      val tagged = spark.read.option("basePath", dataDir)
        .parquet(paths.toIndexedSeq: _*)
        .select(col("_metadata.file_path").as("f") +:
          col("_metadata.row_index").as("i") +:
          scanCols.map(col): _*)
      // a dv-less plan-time manifest proves no positions to anti-filter.
      // Resolver PINNED to plannedV: the spill cache is keyed by that
      // version and is immutable once written — an unpinned resolver
      // racing a rival commit would materialize the RIVAL's dv rows
      // under this version's key (the surgery itself then fails the
      // version check, but the poisoned spill would outlive it and
      // serve every later pinned reader of plannedV)
      matchRows(
        if (hasDvCols)
          applyDvOn(tagged, () => manifestFrameAt(spark, dataDir, plannedV),
            col("f"), col("i"), spill = Some((dataDir, plannedV)))
        else tagged)
    }
    val counts =
      if (candPaths.isEmpty) Map.empty[String, Long]
      else labeled(spark, s"graft: $op matched-count") {
        matchedRows(candPaths.toIndexedSeq)
          .groupBy("f").agg(count(lit(1)).as("nd"))
          .collect()
      }.map(r => (FsListing.norm(r.getString(0)), r.getLong(1))).toMap
    // split: files whose CUMULATIVE dead fraction stays under the
    // threshold get a DV; the rest rewrite (a fully-matched file always
    // rewrites — to zero survivors, i.e. drops from the version)
    val split = candMeta.filter(f => counts.contains(f._1)).partition {
      case (f, nRows, nd0) =>
        (nd0 + counts(f)).toDouble <= maxDvFraction * nRows
    }
    val dvSet = split._1.map(_._1).toSet
    val rwSet = split._2.map(_._1).toSet
    val zeroMatch = candMeta.map(_._1).filterNot(counts.contains) // carried as-is
    // nothing matched anywhere and nothing to append: no version bump
    if (counts.isEmpty && appendDf.isEmpty)
      return (0, 0, nCarriedBounds + zeroMatch.size)
    // dv columns enter the manifest only when a vector is actually
    // written — a pure-insert merge on a DV-less table must not push
    // every future read onto the split path for nothing
    val targetCols =
      if (hasDvCols || dvSet.nonEmpty)
        (if (hasDvCols) m.columns.toSeq
         else m.columns.toSeq ++ Seq(DvCol, DvDelCol))
      else m.columns.toSeq

    // PASS 2 — positions for DV-eligible files only (bounded by the
    // threshold: collect_list per file holds <= maxDvFraction*n_rows
    // ints, never a fully-matched file's whole index space)
    val serDv = udf { (ps: Seq[Long]) => DeletionVectors.serialize(ps.toArray) }
    val mergeDv = udf { (a: Array[Byte], b: Array[Byte]) =>
      DeletionVectors.merge(a, b) }
    val newDvs =
      if (dvSet.isEmpty) null
      else matchedRows(dvSet.toSeq.sorted)
        .groupBy("f")
        .agg(serDv(sort_array(collect_list(col("i")))).as("__dv_new"),
          count(lit(1)).as("__nd_new"))

    // staging for rewrites (survivors of rewrite files, DVs + predicate
    // applied)
    val stg = new org.apache.hadoop.fs.Path(
      s"${dataDir}_stg_${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      val rwPaths = rwSet.toSeq.sorted
      // one staged write carries BOTH publish shapes: rewrite survivors
      // (live rows of over-threshold files) and the merge-on-read
      // append batch — they land as one version's fresh files
      val rewriteSurvivors =
        if (rwPaths.isEmpty) None
        else Some {
          val cand = spark.read.option("basePath", dataDir)
            .parquet(rwPaths.toIndexedSeq: _*)
          // dv-lessness is provable from the plan-time schema (rival
          // commits fail the version check) — skip the resolver; the
          // resolver itself pins plannedV (spill-poisoning guard)
          keepRows(
            if (hasDvCols)
              applyDv(cand, () => manifestFrameAt(spark, dataDir, plannedV),
                spill = Some((dataDir, plannedV)))
            else cand)
        }
      val staged = (rewriteSurvivors, appendDf) match {
        case (Some(s), Some(a)) => Some(s.unionByName(a))
        case (s, a) => s.orElse(a)
      }
      // ONE staging job either way. Partitioned: a dynamic-partition
      // write — the basePath read above resolved the partition columns
      // as data columns, and partitionBy moves them back to directories,
      // so the encoding stays directory-only in the staged files; every
      // touched partition stages in this single job (no per-partition
      // job loop), and rewrite tasks are file-aligned so output files
      // land in their own partition dir.
      staged.foreach { df =>
        labeled(spark, s"graft: $op stage") {
          if (partCols.nonEmpty)
            df.write.partitionBy(partCols: _*).parquet(stg.toString)
          else df.write.parquet(stg.toString)
        }
      }
      beforeCommitHook()
      CommitLock.withLock(hfs,
        new org.apache.hadoop.fs.Path(root, "_manifest.lock")) {
        requireUnchanged(hfs, dataDir, plannedV, stg)
        val moved =
          if (staged.isEmpty) Seq.empty[String]
          else {
            val mv =
              if (partitioned) movePartitionTree(hfs, stg, root)
              else hfs.listStatus(stg).iterator
                .filterNot { s =>
                  val n = s.getPath.getName
                  n.startsWith("_") || n.startsWith(".")
                }
                .map { s =>
                  val dst = new org.apache.hadoop.fs.Path(root, s.getPath.getName)
                  require(hfs.rename(s.getPath, dst),
                    s"dv-delete publish rename failed: ${s.getPath} -> $dataDir")
                  dst.toString
                }.toSeq
            hfs.delete(stg, true)
            mv
          }
        // new manifest: carried entries (non-candidates + zero-match
        // candidates) byte-for-byte, DV-updated entries with merged
        // vectors, fresh stats for rewritten output
        val mAligned = alignStats(m, targetCols)
        val fNorm = ManifestFileIndex.normPath(col("file"))
        val carriedOut = mAligned
          .filter(!fNorm.isin((dvSet ++ rwSet).toSeq: _*))
        val dvOut =
          if (newDvs == null) null
          else mAligned.filter(fNorm.isin(dvSet.toSeq: _*))
            .join(newDvs, metaPathOf(col("file")) === col("f"), "inner")
            .withColumn(DvCol, mergeDv(col(DvCol), col("__dv_new")))
            .withColumn(DvDelCol, coalesce(col(DvDelCol), lit(0L)) + col("__nd_new"))
            .drop("f", "__dv_new", "__nd_new")
            .select(targetCols.map(col).toIndexedSeq: _*)
        val freshOut =
          if (moved.isEmpty) null
          else alignStats(statsForFiles(spark, dataDir, moved, cols,
            bloomCols, expectedPerFile, fpp), targetCols)
        val merged = Seq(Option(carriedOut), Option(dvOut), Option(freshOut))
          .flatten.reduce(_ unionByName _)
        val tmp = new org.apache.hadoop.fs.Path(
          s"${manifestPath(dataDir)}_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
        writeManifest(merged, tmp, (allMeta.length + moved.size).toLong)
        swapVersioned(hfs, dataDir, tmp, op)
        spark.catalog.refreshByPath(dataDir)
        (dvSet.size, rwSet.size, nCarriedBounds + zeroMatch.size)
      }
    } finally { if (hfs.exists(stg)) hfs.delete(stg, true) }
  }

  /** MATERIALIZE deletion vectors (Delta's `REORG TABLE ... APPLY
    * (PURGE)`): rewrite every DV-carrying file with its dead rows
    * dropped and publish a version whose manifest has NO `dv` columns —
    * reads return to the zero-overhead fast path, and the deleted bytes
    * leave disk once [[vacuum]] retention reaps the pre-purge files.
    * Logical content is unchanged: [[changesBetween]] across a purge
    * nets to zero rows. Returns the number of files rewritten.
    */
  def purgeDv(spark: SparkSession, dataDir: String, cols: Seq[String],
      bloomCols: Seq[String] = Nil, expectedPerFile: Long = 65536L,
      fpp: Double = 0.01): Int = {
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    requireFlatTable(hfs, root, "purgeDv")
    val plannedV = currentVersion(hfs, dataDir)
    val m = manifestFrame(spark, dataDir)
    if (!m.columns.contains(DvCol)) return 0
    val fNorm = ManifestFileIndex.normPath(col("file"))
    // one metadata collect serves BOTH the dv file list and the entry
    // tally the sharded manifest write sizes itself by
    val allFlags = m.select(fNorm.as("f"), col(DvCol).isNotNull.as("d"))
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    val nTotal = allFlags.length
    val dvPaths = allFlags.filter(_._2).map(_._1).sorted
    val bareCols = m.columns.toSeq.filterNot(c => c == DvCol || c == DvDelCol)
    val stg = new org.apache.hadoop.fs.Path(
      s"${dataDir}_stg_${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      if (dvPaths.nonEmpty)
        applyDv(spark.read.option("basePath", dataDir)
          .parquet(dvPaths.toIndexedSeq: _*),
          () => manifestFrameAt(spark, dataDir, plannedV), // spill-poison guard
          spill = Some((dataDir, plannedV)))
          .write.parquet(stg.toString)
      beforeCommitHook()
      CommitLock.withLock(hfs,
        new org.apache.hadoop.fs.Path(root, "_manifest.lock")) {
        requireUnchanged(hfs, dataDir, plannedV, stg)
        val moved =
          if (dvPaths.isEmpty) Seq.empty[String]
          else {
            val mv = hfs.listStatus(stg).iterator
              .filterNot { s =>
                val n = s.getPath.getName
                n.startsWith("_") || n.startsWith(".")
              }
              .map { s =>
                val dst = new org.apache.hadoop.fs.Path(root, s.getPath.getName)
                require(hfs.rename(s.getPath, dst),
                  s"purge publish rename failed: ${s.getPath} -> $dataDir")
                dst.toString
              }.toSeq
            hfs.delete(stg, true)
            mv
          }
        val carried = m.filter(col(DvCol).isNull)
          .select(bareCols.map(col).toIndexedSeq: _*)
        val merged =
          if (moved.isEmpty) carried
          else carried.unionByName(alignStats(
            statsForFiles(spark, dataDir, moved, cols, bloomCols,
              expectedPerFile, fpp), bareCols))
        val tmp = new org.apache.hadoop.fs.Path(
          s"${manifestPath(dataDir)}_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
        writeManifest(merged, tmp,
          (nTotal - dvPaths.length + moved.size).toLong)
        swapVersioned(hfs, dataDir, tmp, "purge")
        spark.catalog.refreshByPath(dataDir)
        dvPaths.length
      }
    } finally { if (hfs.exists(stg)) hfs.delete(stg, true) }
  }

  /** Range DELETE with FILE-LEVEL SURGERY (the Delta/Iceberg DELETE
    * shape — also the retention/right-to-be-forgotten verb a
    * training-data table needs): delete every row with `c` in
    * `[lo, hi]` by rewriting ONLY the files whose manifest `[min, max]`
    * bounds intersect the range (files with unknown bounds are
    * conservatively rewritten). Untouched files are CARRIED BY
    * REFERENCE — their manifest entries, per-file stats and bloom
    * binaries ride into the new version byte-for-byte, so the cost is
    * O(intersecting files), never a table rewrite. Publishes as an MVCC
    * version swap: the pre-delete snapshot stays readable through
    * [[readAsOf]] until [[vacuum]]'s retention reaps it — which is when
    * the deleted bytes actually leave disk (the compliance purge point,
    * exactly Delta's VACUUM contract).
    *
    * Returns (files rewritten, files carried).
    */
  def deleteRange(spark: SparkSession, dataDir: String, c: String,
      lo: Column, hi: Column, cols: Seq[String],
      bloomCols: Seq[String] = Nil, expectedPerFile: Long = 65536L,
      fpp: Double = 0.01): (Int, Int) = {
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    requireFlatTable(hfs, root, "deleteRange")
    // optimistic token: plan + staging run OUTSIDE the lock (long Spark
    // jobs must not serialize rival readers/writers); the locked commit
    // validates the version is still the one this plan read
    val plannedV = currentVersion(hfs, dataDir)
    val m = manifestFrame(spark, dataDir)
    require(m.columns.contains(s"min_$c") && m.columns.contains(s"max_$c"),
      s"deleteRange needs tracked bounds for $c under $dataDir")
    // a file is a rewrite candidate unless its bounds PROVE disjointness
    // (NULL bounds prove nothing → candidate) — the same soundness rule
    // as read-side pruning, pointed the other way
    val disjoint = coalesce(
      col(s"max_$c") < lo || col(s"min_$c") > hi, lit(false))
    // ONE metadata job for plan + tally (flag evaluated in the same
    // collect; a separate carried-count job is pure scheduling overhead)
    val flags = labeled(spark, "graft: deleteRange plan") {
      m.select(ManifestFileIndex.normPath(col("file")).as("f"),
        disjoint.as("d")).collect()
    }.map(r => (r.getString(0), r.getBoolean(1)))
    val candPaths = flags.filter(!_._2).map(_._1).sorted
    val carried = m.filter(disjoint)
    val nCarried = flags.count(_._2)
    if (candPaths.isEmpty) return (0, nCarried)
    val survivors = locally {
      val cand = spark.read.option("basePath", dataDir)
        .parquet(candPaths.toIndexedSeq: _*)
      // DV'd rows must not resurrect; dv-lessness is provable from the
      // plan-time schema (rival commits fail the version check), so the
      // common dv-less table skips the resolver round-trip
      if (m.columns.contains(DvCol))
        applyDv(cand, () => manifestFrameAt(spark, dataDir, plannedV),
          spill = Some((dataDir, plannedV))) // pinned: spill-poison guard
      else cand
    } // NULL-c rows SURVIVE: a NULL never satisfies the range predicate
      // (the same rule that makes read-side bound pruning sound), but a
      // bare !(between) evaluates to NULL for them and the filter would
      // silently delete every NULL row in a rewritten file
      .filter(col(c).isNull || !(col(c) >= lo && col(c) <= hi))
    // WRITER-PRIVATE staging (UUID dir): two concurrent surgeries on one
    // table must never clobber each other's in-progress staging — the
    // fixed-name dir a rival would delete is exactly the lost-update
    // race the version token then can't even see
    val stg = new org.apache.hadoop.fs.Path(
      s"${dataDir}_stg_${java.util.UUID.randomUUID().toString.take(8)}")
    try {
    labeled(spark, "graft: deleteRange stage") {
      survivors.write.parquet(stg.toString) // reads the CURRENT files: untouched
    }
    beforeCommitHook()
    CommitLock.withLock(hfs,
      new org.apache.hadoop.fs.Path(root, "_manifest.lock")) {
      requireUnchanged(hfs, dataDir, plannedV, stg)
      val moved = hfs.listStatus(stg).iterator
        .filterNot { s =>
          val n = s.getPath.getName
          n.startsWith("_") || n.startsWith(".")
        }
        .map { s =>
          val dst = new org.apache.hadoop.fs.Path(root, s.getPath.getName)
          require(hfs.rename(s.getPath, dst),
            s"delete publish rename failed: ${s.getPath} -> $dataDir")
          dst.toString
        }.toSeq
      hfs.delete(stg, true)
      val merged =
        if (moved.isEmpty) carried
        else carried.unionByName(alignStats(
          statsForFiles(spark, dataDir, moved, cols, bloomCols,
            expectedPerFile, fpp), carried.columns.toIndexedSeq))
      val tmp = new org.apache.hadoop.fs.Path(
        s"${manifestPath(dataDir)}_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
      // `merged` reads the manifest it replaces — land beside, then swap
      writeManifest(merged, tmp, (flags.length + moved.size).toLong)
      swapVersioned(hfs, dataDir, tmp, "delete")
      spark.catalog.refreshByPath(dataDir)
      (candPaths.length, nCarried)
    }
    } finally { if (hfs.exists(stg)) hfs.delete(stg, true) }
  }

  /** MERGE-ON-READ keyed upsert (Delta's DV-backed MERGE / Iceberg's
    * merge-on-read mode): instead of REWRITING every file that might
    * hold a matched key ([[mergeKeys]]'s copy-on-write shape), mark the
    * matched rows' old versions dead in per-file DELETION VECTORS and
    * append the whole update batch as fresh file(s) — one column-pruned
    * scan of the candidate files plus a batch-sized write, however wide
    * the table's rows. Both land atomically as one MVCC version; files
    * whose dead fraction would cross `maxDvFraction` rewrite instead
    * (same hybrid as [[deleteRangeDV]]). The read-side contract is
    * identical to mergeKeys' output — matched keys have exactly their
    * new row, inserts appear once — because every read path
    * anti-filters the DVs.
    *
    * Same preconditions as mergeKeys (integral key, no NULL/duplicate
    * keys in the batch, schema equality via unionByName). A batch
    * larger than `maxCollectedKeys` falls back to [[mergeKeys]]'s
    * bounds-only copy-on-write path — the DV position pass needs the
    * key set on the executors, and a batch that dense rewrites most
    * candidates anyway. Returns (files DV-marked, files rewritten,
    * files untouched); the appended batch files ride in whichever
    * version commits.
    */
  def mergeKeysDV(spark: SparkSession, dataDir: String, updates: DataFrame,
      key: String, cols: Seq[String], bloomCols: Seq[String] = Nil,
      expectedPerFile: Long = 65536L, fpp: Double = 0.01,
      maxDvFraction: Double = 0.5,
      maxCollectedKeys: Int = 100000): (Int, Int, Int) =
    mergeKeysDVImpl(spark, dataDir, updates, key, cols, bloomCols,
      expectedPerFile, fpp, maxDvFraction, maxCollectedKeys,
      partitioned = false)

  /** [[mergeKeysDV]] for a HIVE-PARTITIONED manifest table: a
    * cross-partition keyed upsert (long or string keys) as ONE atomic
    * commit. The update batch must carry the partition column(s) as
    * data columns — the staged append re-encodes them directory-side
    * via a dynamic-partition write, so each upserted row lands in its
    * key's partition dir and the partition column never flattens into
    * file data. Matched old rows retire by DV (metadata) wherever the
    * dead fraction allows, exactly as on a flat table; candidates are
    * bounds/bloom-pruned per file. NOTE a matched key whose update row
    * carries a DIFFERENT partition value than the old row MOVES
    * partitions — the old row dies in its old dir (DV), the new row
    * lands in the new dir; both are one commit, so readers never see
    * the row doubled or missing. A batch larger than `maxCollectedKeys`
    * stays UNCAPPED here (no flat-CoW fallback is possible on a tree):
    * the guards run as aggregates, candidates fall back to global-
    * bounds overlap, and matched positions / rewrite survivors become
    * exact key JOINS — zero driver-resident key state however many
    * millions of keys the batch carries (the 100 TB GDPR sweep's shape).
    */
  def mergeKeysDVPartitioned(spark: SparkSession, dataDir: String,
      updates: DataFrame, key: String, cols: Seq[String],
      bloomCols: Seq[String] = Nil,
      expectedPerFile: Long = 65536L, fpp: Double = 0.01,
      maxDvFraction: Double = 0.5,
      maxCollectedKeys: Int = 100000): (Int, Int, Int) =
    mergeKeysDVImpl(spark, dataDir, updates, key, cols, bloomCols,
      expectedPerFile, fpp, maxDvFraction, maxCollectedKeys,
      partitioned = true)

  private def mergeKeysDVImpl(spark: SparkSession, dataDir: String,
      updates: DataFrame, key: String, cols: Seq[String],
      bloomCols: Seq[String], expectedPerFile: Long, fpp: Double,
      maxDvFraction: Double, maxCollectedKeys: Int,
      partitioned: Boolean): (Int, Int, Int) = {
    val keyDt = updates.schema(key).dataType
    val strKey = keyDt == StringType
    require(FsListing.isIntegral(keyDt) || strKey,
      s"mergeKeysDV key '$key' is $keyDt — only integral (cast-to-long " +
        "must be value- and order-preserving) or string key columns merge")
    // ONE exchange-free job in the common case (raw cap+2-row take, all
    // guards driver-side) — same probe shape as [[mergeKeys]]; see its
    // comment for why the grouped probe was two stage-jobs per commit
    val kSel = updates
      .select((if (strKey) col(key) else col(key).cast("long")).as("k"))
    lazy val keyStats = kSel.groupBy("k").agg(count(lit(1)).as("c"))
    val raw = labeled(spark, "graft: mergeKeysDV key-guard") {
      kSel.limit(maxCollectedKeys + 2).collect()
    }
    require(raw.nonEmpty, "mergeKeysDV: empty update batch")
    val nullMsgEarly =
      s"mergeKeysDV: update batch has NULL '$key' keys — a NULL key " +
        "matches no row and cannot MERGE; filter or fill the batch first"
    def dupMsgEarly(k: Any) =
      s"mergeKeysDV: update batch has multiple rows for key $key=$k — " +
        "MERGE replaces exactly one row per matched key; dedup the " +
        "batch (e.g. keep-last by an ordering column) before merging"
    val keysOpt: Option[Array[org.apache.spark.sql.Row]] =
      if (raw.length > maxCollectedKeys + 1) None
      else {
        raw.find(_.isNullAt(0)).foreach { _ =>
          throw new IllegalArgumentException(nullMsgEarly) }
        val seen = new java.util.HashSet[Any](raw.length * 2)
        raw.foreach { r =>
          if (!seen.add(r.get(0)))
            throw new IllegalArgumentException(dupMsgEarly(r.get(0))) }
        if (seen.size > maxCollectedKeys) None else Some(raw)
      }
    val bigBatch = keysOpt.isEmpty
    if (bigBatch && !partitioned) {
      // flat fallback unchanged: the CoW verb has its own uncapped
      // bounds-only path, and a batch this dense rewrites most
      // candidates anyway
      val (rw, car) = mergeKeys(spark, dataDir, updates, key, cols,
        bloomCols, expectedPerFile, fpp, maxCollectedKeys)
      return (0, rw, car)
    }
    // UNCAPPED partitioned batch (the GDPR/CDC sweep at 100 TB carries
    // millions of keys): guards run as AGGREGATES and the global key
    // bounds come back from the same job — ZERO driver-resident key
    // state, mirroring mergeKeys' measured-count fallback. Candidate
    // precision drops from per-key bloom slices to global-bounds
    // overlap (a batch past the cap is dense over its range, so per-key
    // precision would rescue few files — and zero-match candidates are
    // carried untouched by the count pass anyway); matched positions
    // and rewrite survivors become EXACT key joins instead of InSet
    // predicates. (The small/complete path's null+dup guards already ran
    // driver-side on the raw take above.)
    val bigBounds: Option[(Any, Any)] =
      if (!bigBatch) None
      else {
        val st = keyStats.agg(max("c").as("maxc"),
          sum(when(col("k").isNull, lit(1L)).otherwise(lit(0L))).as("nulls"),
          min("k").as("kmin"), max("k").as("kmax")).head()
        require(st.getLong(1) == 0L, nullMsgEarly)
        if (st.getLong(0) > 1L)
          throw new IllegalArgumentException(dupMsgEarly(
            keyStats.filter(col("c") > 1).select("k").head().get(0)))
        Some((st.get(2), st.get(3)))
      }
    val m = manifestFrame(spark, dataDir)
    // the batch appends VERBATIM on the common no-rewrite path, so the
    // unionByName schema check mergeKeys gets for free must run here
    // explicitly: a batch MISSING table columns would land rows whose
    // missing fields read as NULL — silent corruption where the CoW twin
    // fails loud. Extra batch columns are allowed (schema evolution).
    locally {
      val missing = withSwapRetry {
        // driver-side single-entry probe — no Spark job per commit
        val anchor = firstManifestFilePath(spark, dataDir)
        anchor.map { a =>
          // the table schema a merged row must cover is the PHYSICAL
          // anchor schema plus, on a partitioned tree, the directory-
          // encoded partition columns — an update batch missing those
          // couldn't be routed to a partition dir at all
          val partNames =
            if (!partitioned) Set.empty[String]
            else {
              val root = new org.apache.hadoop.fs.Path(dataDir)
              val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
              val rootQ = FsListing.norm(root.makeQualified(
                hfs.getUri, hfs.getWorkingDirectory).toString)
              partitionColsOf(rootQ, Seq(a), "mergeKeysDVPartitioned").toSet
            }
          (spark.read.parquet(a).schema.fieldNames.toSet ++ partNames)
            .diff(updates.columns.toSet)
        }.getOrElse(Set.empty[String])
      }
      require(missing.isEmpty,
        s"mergeKeysDV: update batch lacks table column(s) " +
          s"${missing.mkString(", ")} — merged keys would silently read " +
          "NULL for them; align the batch schema (unionByName semantics)")
    }
    val (cand, matchRows, keepRows, persistedKeys) = bigBounds match {
      case Some((kmin, kmax)) =>
        // key column PERSISTED and materialized ONCE — the matcher pair
        // runs on several independent scans and must see one key set
        // even when `updates` is an expensive or non-deterministic query
        // (see keyJoinMatchers). `updates` itself stays lazy for the
        // append, same determinism contract as mergeKeys' CoW survivors.
        val kcol = updates.select(col(key)).persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        kcol.count()
        val (mr, kr) = keyJoinMatchers(kcol, key)
        (globalBoundsCandidate(m, key, strKey, kmin, kmax), mr, kr,
          Some(kcol))
      case None if strKey =>
        val keyArr = keysOpt.get.map(_.getString(0)).sorted(utf8Ordering)
        (keyCandidateStr(m, key, keyArr),
          (df: DataFrame) => df.filter(col(key).isin(keyArr.toIndexedSeq: _*)),
          (df: DataFrame) => df.filter(
            col(key).isNull || !col(key).isin(keyArr.toIndexedSeq: _*)),
          None)
      case None =>
        val keyArr = keysOpt.get.map(_.getLong(0)).sorted
        (keyCandidate(m, key, keyArr),
          (df: DataFrame) => df.filter(col(key).isin(keyArr.toIndexedSeq: _*)),
          (df: DataFrame) => df.filter(
            col(key).isNull || !col(key).isin(keyArr.toIndexedSeq: _*)),
          None)
    }
    try deleteDvCore(spark, dataDir, m, cand,
      scanCols = Seq(key),
      matchRows = matchRows,
      keepRows = keepRows,
      cols, bloomCols, expectedPerFile, fpp, maxDvFraction,
      appendDf = Some(updates), op = "merge-dv",
      partitioned = partitioned)
    finally persistedKeys.foreach(_.unpersist(false))
  }

  /** The TRACKED TYPE of column `c` under `dataDir`: from the manifest's
    * `min_<c>` bounds when present (exact — the bound carries the
    * column's own type), else ONE manifest-anchored footer — never a
    * raw-directory inference, which lists every retained leftover and
    * may anchor a pre-evolution file. Shared by every keyed verb and
    * bloom probe whose ENCODING must match the sidecar's build encoding
    * (putLong vs putString): probing a string-built bloom with long
    * hashes would silently false-negative files out of the kept set —
    * the one failure mode bloom semantics must never allow — so callers
    * fail loud on a type mismatch instead.
    *
    * A column absent from the anchor's PHYSICAL schema that names one of
    * its hive partition dir levels fails with the directory-drop
    * guidance instead of "missing column": the partitioned keyed verbs
    * route "erase BY the partition column" here with zero extra I/O
    * (the anchor path is already in hand). A partition column whose
    * bounds ARE tracked resolves a type here and is caught by
    * [[deleteDvCore]]'s scanCols-vs-partCols guard instead — loud either
    * way.
    */
  private def resolveColumnType(spark: SparkSession, dataDir: String,
      c: String, verb: String): DataType = withSwapRetry {
    val mf = manifestFrame(spark, dataDir)
    mf.schema.find(_.name == s"min_$c").map(_.dataType).getOrElse {
      // driver-side single-entry probe — no Spark job per resolution
      val anchor = firstManifestFilePath(spark, dataDir)
        .getOrElse(throw new IllegalArgumentException(
          s"$verb: empty manifest under $dataDir"))
      val sch = spark.read.parquet(anchor).schema
      if (!sch.fieldNames.contains(c)) {
        val root = new org.apache.hadoop.fs.Path(dataDir)
        val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
        val rootQ = FsListing.norm(root.makeQualified(
          hfs.getUri, hfs.getWorkingDirectory).toString)
        val rel = relPartitionDir(rootQ, anchor)
        val isPartCol = rel.nonEmpty &&
          rel.split('/').exists(_.takeWhile(_ != '=') == c)
        if (isPartCol) throw new IllegalArgumentException(
          s"$verb column '$c' is a PARTITION column under $dataDir — " +
            "drop the matching partition directories and refresh " +
            "instead of a row-level surgery")
        throw new IllegalArgumentException(
          s"requirement failed: $verb column '$c' not in table schema " +
            s"under $dataDir (anchored on $anchor)")
      }
      sch(c).dataType
    }
  }

  /** Candidate-file predicate over MANIFEST rows for a SORTED DISTINCT
    * long key array — shared by [[mergeKeys]] and [[deleteKeysDV]].
    * PRE-FILTER BY BOUNDS INTERSECTION before any per-file probe: (a) a
    * pure-column test against the batch's global [kmin, kmax] — And
    * short-circuits, so a file whose bounds prove disjointness never
    * pays the bloom UDF (deserialize + probes); (b) inside the probe,
    * BINARY SEARCH restricts the key set to the slice inside that
    * file's own bounds — O(log keys + keys-in-file-range) per file
    * instead of keyArr.exists over the whole batch, which on a
    * range-laid-out tree (each file covering a sliver of the key space)
    * turns candidate selection O(files × keys). Sound: unknown
    * bounds/sidecars keep the file.
    */
  private def keyCandidate(m: DataFrame, key: String,
      keyArr: Array[Long]): Column = {
    val (kmin, kmax) = (keyArr.head, keyArr.last)
    val hasBounds = m.columns.contains(s"min_$key")
    val hasBloom = m.columns.contains(s"bloom_$key")
    val boundsPre: Column =
      if (hasBounds)
        coalesce(!(col(s"max_$key").cast("long") < kmin ||
          col(s"min_$key").cast("long") > kmax), lit(true))
      else lit(true)
    // [from, until) of sorted keyArr inside [mn, mx]; keys are distinct
    // (callers dedup/guard first), so a binarySearch hit is unique
    def keySlice(mn: Long, mx: Long): (Int, Int) = {
      val i = java.util.Arrays.binarySearch(keyArr, mn)
      val from = if (i >= 0) i else -i - 1
      val j = java.util.Arrays.binarySearch(keyArr, mx)
      val until = if (j >= 0) j + 1 else -j - 1
      (from, until)
    }
    val bloomProbe = udf {
      (bytes: Array[Byte], mn: java.lang.Long, mx: java.lang.Long) =>
        bytes == null || {
          // unknown bounds → probe every key (sound); known bounds →
          // only the slice they admit; an empty slice means the bounds
          // already prove no key matches — skip without even
          // deserializing the filter
          val (from, until) =
            if (mn == null || mx == null) (0, keyArr.length)
            else keySlice(mn, mx)
          from < until && {
            val bf = org.apache.spark.util.sketch.BloomFilter
              .readFrom(new java.io.ByteArrayInputStream(bytes))
            var i = from
            var hit = false
            while (i < until && !hit) {
              hit = bf.mightContainLong(keyArr(i)); i += 1
            }
            hit
          }
        }
    }
    val boundsProbe = udf { (mn: java.lang.Long, mx: java.lang.Long) =>
      mn == null || mx == null || {
        val (from, until) = keySlice(mn, mx)
        from < until
      }
    }
    if (hasBloom)
      boundsPre && bloomProbe(col(s"bloom_$key"),
        (if (hasBounds) col(s"min_$key") else lit(null)).cast("long"),
        (if (hasBounds) col(s"max_$key") else lit(null)).cast("long"))
    else if (hasBounds)
      boundsPre &&
        boundsProbe(col(s"min_$key").cast("long"), col(s"max_$key").cast("long"))
    else lit(true)
  }

  /** [[keyCandidate]] for STRING keys — same bounds-prefilter +
    * bounds-sliced bloom probe, in the string key space. ORDERING is
    * the one soundness trap: the per-file slice binary-searches the
    * sorted key array against the file's min/max bounds, and those
    * bounds come from Spark's min/max agg, which ranks strings by
    * UTF-8 BINARY order (UTF8String) — NOT Java's UTF-16 code-unit
    * order (they disagree beyond the BMP: U+FFFF sorts above U+10000
    * in UTF-16, below it in UTF-8). Every comparison here — the sort
    * the caller must apply ([[utf8Ordering]]) and the slice search —
    * uses UTF8String, so a supplementary-plane key can never be
    * sliced out of a file whose bounds admit it (StringKeySpec pins
    * exactly that pair). The bounds PRE-filter runs as a Catalyst
    * expression on the manifest frame — Catalyst's own string order,
    * trivially consistent.
    */
  private def keyCandidateStr(m: DataFrame, key: String,
      keyArr: Array[String]): Column = {
    val (kmin, kmax) = (keyArr.head, keyArr.last)
    val hasBounds = m.columns.contains(s"min_$key")
    val hasBloom = m.columns.contains(s"bloom_$key")
    val boundsPre: Column =
      if (hasBounds)
        coalesce(!(col(s"max_$key") < lit(kmin) ||
          col(s"min_$key") > lit(kmax)), lit(true))
      else lit(true)
    // ONE definition of the string order ([[utf8Ordering]] — the same
    // Ordering the caller sorted keyArr with), so the slice search can
    // never diverge from the sort. LOCAL copy: referencing the object
    // member inside the UDF closure would capture the (non-serializable)
    // enclosing object; the Ordering value itself is a captureless
    // serializable lambda.
    val ord = utf8Ordering
    def lowerBound(x: String): Int = {
      var lo = 0; var hi = keyArr.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ord.compare(keyArr(mid), x) < 0) lo = mid + 1 else hi = mid
      }
      lo
    }
    def upperBound(x: String): Int = {
      var lo = 0; var hi = keyArr.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ord.compare(keyArr(mid), x) <= 0) lo = mid + 1 else hi = mid
      }
      lo
    }
    val bloomProbe = udf { (bytes: Array[Byte], mn: String, mx: String) =>
      bytes == null || {
        val (from, until) =
          if (mn == null || mx == null) (0, keyArr.length)
          else (lowerBound(mn), upperBound(mx))
        from < until && {
          val bf = org.apache.spark.util.sketch.BloomFilter
            .readFrom(new java.io.ByteArrayInputStream(bytes))
          var i = from
          var hit = false
          while (i < until && !hit) {
            hit = bf.mightContainString(keyArr(i)); i += 1
          }
          hit
        }
      }
    }
    val boundsProbe = udf { (mn: String, mx: String) =>
      mn == null || mx == null || lowerBound(mn) < upperBound(mx)
    }
    if (hasBloom)
      boundsPre && bloomProbe(col(s"bloom_$key"),
        if (hasBounds) col(s"min_$key") else lit(null).cast(StringType),
        if (hasBounds) col(s"max_$key") else lit(null).cast(StringType))
    else if (hasBounds)
      boundsPre && boundsProbe(col(s"min_$key"), col(s"max_$key"))
    else lit(true)
  }

  /** Global-bounds candidate for the UNCAPPED keyed verbs: a file is a
    * candidate unless its tracked [min,max] provably excludes the whole
    * batch range [kmin,kmax] — compared in the key's NATIVE type (the
    * agg min/max arrive as Catalyst values and compare as literals; one
    * ordering end to end for longs and strings alike). NULL bounds
    * prove nothing → candidate, the sound direction. ONE definition
    * shared by the uncapped merge and the frame erase so a bounds-type
    * edge fix can never land in one and miss the other.
    */
  private def globalBoundsCandidate(m: DataFrame, key: String,
      strKey: Boolean, kmin: Any, kmax: Any): Column =
    if (!m.columns.contains(s"min_$key")) lit(true)
    else if (strKey)
      coalesce(!(col(s"max_$key") < lit(kmin.asInstanceOf[String]) ||
        col(s"min_$key") > lit(kmax.asInstanceOf[String])), lit(true))
    else
      coalesce(!(col(s"max_$key").cast("long") < kmin.asInstanceOf[Long] ||
        col(s"min_$key").cast("long") > kmax.asInstanceOf[Long]), lit(true))

  /** The exact matched/survivor pair for the uncapped keyed verbs: a
    * key semi-join (matched rows) and its anti-join complement
    * (survivors — anti keeps NULL-key rows, the `isNull || !isin`
    * rule of the capped path). `kcol` MUST be a one-column frame named
    * `key`, PERSISTED AND MATERIALIZED by the caller before use: the
    * pair is applied to several independent scans (count pass, DV
    * position pass, rewrite staging), and an unpersisted
    * non-deterministic key query would re-evaluate per pass — marking
    * file A's dead positions with a different key set than the one
    * file B's survivors were kept against, a silent partial erase.
    */
  private def keyJoinMatchers(kcol: DataFrame, key: String)
      : (DataFrame => DataFrame, DataFrame => DataFrame) =
    ((df: DataFrame) => df.join(kcol, Seq(key), "left_semi"),
      (df: DataFrame) => df.join(kcol, Seq(key), "left_anti"))

  /** Catalyst's string order (UTF-8 binary) as a driver-side Ordering —
    * the sort every string key array MUST use before binary-searching
    * against manifest bounds (see [[keyCandidateStr]]).
    */
  private[sources] val utf8Ordering: Ordering[String] =
    (a: String, b: String) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  /** Keyed MERGE (upsert) with bloom/bounds-pruned FILE SURGERY — the
    * table-format MERGE verb: rows of `updates` REPLACE same-key rows
    * and insert the rest, rewriting only the files that might hold a
    * matched key. Candidate selection is the skipping stack pointed at
    * a write: a file whose bloom sidecar rejects EVERY update key (no
    * false negatives — skipping is sound), or whose `[min, max]` bounds
    * exclude them all, carries BY REFERENCE with its stats and bloom
    * bytes intact; unknown evidence → conservatively rewritten. The
    * update batch's key set is operationally bounded (a CDC/upsert
    * payload), collected once for the executor-side probes — the same
    * contract as the bloom point-lookup read path. Publishes as an MVCC
    * version: the pre-merge snapshot stays readable until vacuum
    * retention. Integral or string keys (each probes in its native
    * order/encoding — see keyCandidate / keyCandidateStr).
    *
    * Returns (files rewritten, files carried).
    */
  def mergeKeys(spark: SparkSession, dataDir: String, updates: DataFrame,
      key: String, cols: Seq[String], bloomCols: Seq[String] = Nil,
      expectedPerFile: Long = 65536L, fpp: Double = 0.01,
      maxCollectedKeys: Int = 100000): (Int, Int) = {
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // key-type contract is ENFORCED, not just documented: integral keys
    // probe as cast-to-long (value- and order-preserving), STRING keys
    // (UUIDs, document ids — the right-to-be-forgotten batch's natural
    // shape) probe in the native string order/encoding via
    // keyCandidateStr. Anything else (a timestamp whose cast drops
    // micros, a double whose bounds order diverges from its long cast)
    // could false-negative a file out of the rewrite set — the silent
    // lost update Bloom/bounds semantics must never allow.
    val keyDt = updates.schema(key).dataType
    val strKey = keyDt == StringType
    require(FsListing.isIntegral(keyDt) || strKey,
      s"mergeKeys key '$key' is $keyDt — only integral (cast-to-long " +
        "must be value- and order-preserving) or string key columns merge")
    requireFlatTable(hfs, root, "mergeKeys")
    val plannedV = currentVersion(hfs, dataDir)
    val m = manifestFrame(spark, dataDir)
    // Preconditions — per-key multiplicity (MERGE replaces exactly one
    // row per key: Delta fails loud on multiple matches, and so do we —
    // the anti-join-then-append would otherwise silently insert BOTH
    // rows of a doubled key) and null keys (match nothing — reject) —
    // plus the measured-size decision, all from ONE EXCHANGE-FREE job
    // in the common case: pull at most cap+2 RAW key rows (executeTake
    // short-circuits the scan, no groupBy shuffle stage — the old
    // grouped probe was two AQE stage-jobs per commit); a complete
    // result (≤ cap+1 rows) is the whole key multiset, so every guard
    // derives driver-side. Only a genuinely huge batch pays a second,
    // aggregate-only pass for its guards and global bounds.
    val kSel = updates
      .select((if (strKey) col(key) else col(key).cast("long")).as("k"))
    val raw = labeled(spark, "graft: mergeKeys key-guard") {
      kSel.limit(maxCollectedKeys + 2).collect()
    }
    require(raw.nonEmpty, "mergeKeys: empty update batch")
    val nullMsg =
      s"mergeKeys: update batch has NULL '$key' keys — a NULL key " +
        "matches no row and cannot MERGE; filter or fill the batch first"
    def dupMsg(k: Any) =
      s"mergeKeys: update batch has multiple rows for key $key=$k — " +
        "MERGE replaces exactly one row per matched key; dedup the " +
        "batch (e.g. keep-last by an ordering column) before merging"
    // complete + clean + under-cap ⇒ the distinct keys, driver-derived;
    // None ⇒ truncated sample or over-cap — decide via the agg pass
    val keysOpt: Option[Array[org.apache.spark.sql.Row]] =
      if (raw.length > maxCollectedKeys + 1) None
      else {
        raw.find(_.isNullAt(0)).foreach { _ =>
          throw new IllegalArgumentException(nullMsg) }
        val seen = new java.util.HashSet[Any](raw.length * 2)
        raw.foreach { r =>
          if (!seen.add(r.get(0)))
            throw new IllegalArgumentException(dupMsg(r.get(0))) }
        if (seen.size > maxCollectedKeys) None else Some(raw)
      }
    // MEASURED-COUNT GUARD: the per-key probes below capture the
    // collected key set in a closure — operationally bounded for a
    // CDC/upsert payload, but nothing enforced it. Above the cap, fall
    // back to bounds-only candidate selection against the batch's global
    // key range: zero driver key state, still sound (a file disjoint
    // from [kmin, kmax] holds no matched key), and a batch that large is
    // dense over its range anyway, so per-key bloom precision would
    // rescue few files while the probe cost itself turns O(files × keys).
    val isCand: Column = keysOpt match {
      case None =>
        val keyStats = kSel.groupBy("k").agg(count(lit(1)).as("c"))
        val st = keyStats.agg(max("c").as("maxc"),
          sum(when(col("k").isNull, lit(1L)).otherwise(lit(0L))).as("nulls"),
          min("k").as("kmin"), max("k").as("kmax")).head()
        require(st.getLong(1) == 0L, nullMsg)
        if (st.getLong(0) > 1L)
          throw new IllegalArgumentException(dupMsg(
            keyStats.filter(col("c") > 1).select("k").head().get(0)))
        // global-bounds fallback in the key's NATIVE type: the min/max
        // came from a Spark agg and compare here as Catalyst literals —
        // one ordering end-to-end for longs and strings alike
        if (m.columns.contains(s"min_$key")) {
          if (strKey)
            coalesce(!(col(s"max_$key") < lit(st.getString(2)) ||
              col(s"min_$key") > lit(st.getString(3))), lit(true))
          else
            coalesce(!(col(s"max_$key").cast("long") < st.getLong(2) ||
              col(s"min_$key").cast("long") > st.getLong(3)), lit(true))
        } else lit(true)
      case Some(keyRows) =>
        if (strKey)
          keyCandidateStr(m, key,
            keyRows.map(_.getString(0)).sorted(utf8Ordering))
        else keyCandidate(m, key, keyRows.map(_.getLong(0)).sorted)
    }
    // ONE metadata job for plan + tally (same fold as deleteRange)
    val mFlags = labeled(spark, "graft: mergeKeys plan") {
      m.select(ManifestFileIndex.normPath(col("file")).as("f"),
        isCand.as("c")).collect()
    }.map(r => (r.getString(0), r.getBoolean(1)))
    val candPaths = mFlags.filter(_._2).map(_._1).sorted
    val carried = m.filter(!isCand)
    val nCarried = mFlags.count(!_._2)
    val survivors =
      if (candPaths.isEmpty) updates
      else {
        val cand = spark.read.option("basePath", dataDir)
          .parquet(candPaths.toIndexedSeq: _*)
        // DV'd rows must not resurrect — but the plan-time manifest `m`
        // PROVES dv-lessness from its schema alone (the whole surgery
        // is consistent at plannedV: a rival adding a DV fails the
        // commit's version check), so the common dv-less table skips
        // applyDv's resolver round-trip instead of re-reading the
        // manifest only to find no dv column (measured ~0.1 s of pure
        // per-commit driver overhead in the q171 CDC loop)
        val live =
          if (m.columns.contains(DvCol))
            applyDv(cand, () => manifestFrameAt(spark, dataDir, plannedV),
              spill = Some((dataDir, plannedV))) // pinned: spill-poison guard
          else cand
        // capped batch: the driver already holds the COMPLETE key set, so
        // prune survivors with a predicate instead of a distributed
        // anti-join — the staged write loses its join exchanges entirely
        // (guide §2.4; AQE was scheduling the join as two stage-jobs per
        // commit) and `updates` is computed once (the append arm) instead
        // of twice. NULL-keyed live rows survive, exactly as the anti
        // join kept them (a NULL key matches no update). The uncapped
        // fallback keeps the exact semi-structure join — zero driver key
        // state, same rule as the DV twin's keyJoinMatchers.
        val pruned = keysOpt match {
          case Some(keyRows) if strKey =>
            val ks = keyRows.map(_.getString(0)).toIndexedSeq
            live.filter(col(key).isNull || !col(key).isin(ks: _*))
          case Some(keyRows) =>
            val ks = keyRows.map(_.getLong(0)).toIndexedSeq
            live.filter(col(key).isNull || !col(key).cast("long").isin(ks: _*))
          case None =>
            live.join(updates.select(col(key)), Seq(key), "left_anti")
        }
        pruned.unionByName(updates)
      }
    // writer-private UUID staging + locked version validation: see
    // [[deleteRange]] — same optimistic-concurrency commit protocol
    val stg = new org.apache.hadoop.fs.Path(
      s"${dataDir}_stg_${java.util.UUID.randomUUID().toString.take(8)}")
    try {
    labeled(spark, "graft: mergeKeys stage") {
      survivors.write.parquet(stg.toString) // reads the CURRENT files: untouched
    }
    beforeCommitHook()
    CommitLock.withLock(hfs,
      new org.apache.hadoop.fs.Path(root, "_manifest.lock")) {
      requireUnchanged(hfs, dataDir, plannedV, stg)
      val moved = hfs.listStatus(stg).iterator
        .filterNot { s =>
          val n = s.getPath.getName
          n.startsWith("_") || n.startsWith(".")
        }
        .map { s =>
          val dst = new org.apache.hadoop.fs.Path(root, s.getPath.getName)
          require(hfs.rename(s.getPath, dst),
            s"merge publish rename failed: ${s.getPath} -> $dataDir")
          dst.toString
        }.toSeq
      hfs.delete(stg, true)
      val merged =
        if (moved.isEmpty) carried
        else carried.unionByName(alignStats(
          statsForFiles(spark, dataDir, moved, cols, bloomCols,
            expectedPerFile, fpp), carried.columns.toIndexedSeq))
      val tmp = new org.apache.hadoop.fs.Path(
        s"${manifestPath(dataDir)}_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
      writeManifest(merged, tmp, (mFlags.length + moved.size).toLong)
      swapVersioned(hfs, dataDir, tmp, "merge")
      spark.catalog.refreshByPath(dataDir)
      (candPaths.length, nCarried)
    }
    } finally { if (hfs.exists(stg)) hfs.delete(stg, true) }
  }

  /** METADATA-ONLY live row count: `Σ n_rows − Σ n_del` over the
    * manifest — the Delta/Iceberg "answer COUNT(*) from the snapshot
    * stats" move, no data page touched however large the table. Runs
    * the same coverage guard as any planned read (a stale manifest
    * must fail loud, not undercount).
    */
  def fastCount(spark: SparkSession, dataDir: String): Long = {
    loadCovering(spark, dataDir) // the guard; the agg re-resolves below
    withSwapRetry {
      val mdf = manifestFrame(spark, dataDir)
      val del =
        if (mdf.columns.contains(DvDelCol)) coalesce(col(DvDelCol), lit(0L))
        else lit(0L)
      val r = mdf.agg(sum(col("n_rows") - del)).head()
      if (r.isNullAt(0)) 0L else r.getLong(0) // empty snapshot sums NULL
    }
  }

  /** OPTIMIZE (bin-packing compaction) for the MVCC table: read the
    * CURRENT live rows (deletion vectors applied), rewrite them as
    * `ceil(liveRows / targetRowsPerFile)` right-sized files, and
    * publish as one MVCC version — small-file debt and DV debt retire
    * together (the post-optimize manifest carries no dv columns), the
    * pre-optimize snapshot stays readable until vacuum retention, and
    * the change feed across the optimize nets to ZERO rows (physical
    * reorganization is invisible to CDC consumers — the q165/q176
    * contract). For clustering-preserving compaction of a sort layout
    * use [[Staging.compactSorted]]; this verb is the generic
    * OPTIMIZE shape. FLAT TABLES ONLY: the rewrite lands root-level
    * files, so a hive-partitioned tree would migrate its partition
    * column into file data — compact such trees per-partition instead.
    * Returns the number of files written.
    */
  def optimizeTable(spark: SparkSession, dataDir: String, cols: Seq[String],
      bloomCols: Seq[String] = Nil, targetRowsPerFile: Long = 1L << 20,
      expectedPerFile: Long = 65536L, fpp: Double = 0.01): Int = {
    require(targetRowsPerFile > 0, s"targetRowsPerFile=$targetRowsPerFile")
    // PIN the version BEFORE resolving any frame: ManifestFileIndex.read
    // collects its file set and dv rows eagerly at construction, so the
    // OCC token must be captured no later — a rival commit between the
    // frame's resolution and a late token read would make requireUnchanged
    // validate against the RIVAL's version and publish v0-derived content
    // over it (silently reverting the rival's delete/merge). The live
    // count, the read, and publishVia's token all pin to v0; a rival
    // commit anywhere in the window now fails loud as
    // ConcurrentWriteException (withConflictRetry replans).
    loadCovering(spark, dataDir) // the staleness guard fastCount ran
    val v0 = currentVersionOf(spark, dataDir)
    val live = withSwapRetry {
      val mdf = manifestFrameAt(spark, dataDir, v0)
      val del =
        if (mdf.columns.contains(DvDelCol)) coalesce(col(DvDelCol), lit(0L))
        else lit(0L)
      val r = mdf.agg(sum(col("n_rows") - del)).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    require(live > 0, s"optimizeTable on empty table $dataDir")
    val nFiles = ((live + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    publishViaUnchecked(
      ManifestFileIndex.read(spark, dataDir, asOf = Some(v0))
        .repartition(nFiles),
      s"${dataDir}_optstg", dataDir, cols, bloomCols, expectedPerFile, fpp,
      opName = "optimize", expectedVersion = Some(v0))
    nFiles
  }

  /** The staged→live move for partition-aware surgeries: every data
    * file under `src`'s partition tree renames into the SAME relative
    * partition dir under the table root (no copy), committer metadata
    * skipped. Returns the moved files' destination paths.
    *
    * CRASH WINDOW: the walk renames one file at a time, so a failure
    * mid-walk (or between the walk and the manifest swap) leaves
    * already-moved files under the live tree unmanifested — the
    * coverage guard then fails EVERY read loud (never silent partials)
    * until [[vacuum]] reaps the orphans, which is the documented
    * recovery path (same shape as a crashed publishVia, with a window
    * widened by O(partition dirs)). The swap itself stays atomic: no
    * reader ever plans from a half-moved file set.
    */
  private def movePartitionTree(hfs: org.apache.hadoop.fs.FileSystem,
      src: org.apache.hadoop.fs.Path,
      dstDir: org.apache.hadoop.fs.Path): Seq[String] = {
    val moved = Seq.newBuilder[String]
    def walk(s: org.apache.hadoop.fs.Path,
        d: org.apache.hadoop.fs.Path): Unit = {
      if (!hfs.exists(d)) hfs.mkdirs(d)
      hfs.listStatus(s).foreach { st =>
        val n = st.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) {
          if (st.isDirectory) walk(st.getPath, new org.apache.hadoop.fs.Path(d, n))
          else {
            val dst = new org.apache.hadoop.fs.Path(d, n)
            require(hfs.rename(st.getPath, dst),
              s"partitioned publish rename failed: ${st.getPath} -> $dst")
            moved += dst.toString
          }
        }
      }
    }
    walk(src, dstDir)
    moved.result()
  }

  /** Bounded-concurrency submitter for per-partition STAGING jobs (the
    * partition-aware surgeries): each partition's staged write is its
    * own Spark job — at 10⁴ partitions a sequential loop pays 10⁴ job-
    * scheduling latencies for work the cluster could overlap, turning a
    * minutes-long I/O into tens of minutes of pure scheduling. Spark's
    * scheduler is thread-safe (concurrent action submission is the
    * documented fair-scheduling pattern), and every structure these
    * jobs share (the dv estimate memo, the spill publish, the UDF
    * registry) is already concurrency-safe, so a small pool submits
    * partitions in parallel; `graft.surgery.maxConcurrentStaging`
    * (default 8) bounds it — enough to hide scheduling latency, small
    * enough that per-job shuffle memory stays bounded. The FIRST
    * failure propagates (its cause, not the ExecutionException wrapper)
    * and cancels the remainder — the caller's staging-dir cleanup and
    * the untouched manifest make a partial stage invisible.
    */
  private[graft] val MaxConcurrentStagingKey =
    "graft.surgery.maxConcurrentStaging"
  private def stageConcurrently[T](spark: SparkSession, items: Seq[T])(
      f: T => Unit): Unit = {
    val maxC = spark.conf.get(MaxConcurrentStagingKey, "8").toInt
    require(maxC >= 1, s"$MaxConcurrentStagingKey=$maxC")
    if (items.size <= 1 || maxC == 1) items.foreach(f)
    else {
      // per-call job group: on failure the surviving IN-FLIGHT staging
      // jobs must be CANCELLED, not just their threads interrupted — a
      // thread interrupt does not stop an already-submitted Spark job,
      // and a job still writing would re-create staging files AFTER the
      // caller's cleanup deleted the staging dir (bytes outside the
      // table root that no vacuum ever reaps)
      val group =
        s"graft_stage_${java.util.UUID.randomUUID().toString.take(8)}"
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(maxC, items.size))
      val aborted = new java.util.concurrent.atomic.AtomicBoolean(false)
      try {
        val futs = items.map(it => pool.submit(
          new java.util.concurrent.Callable[Unit] {
            override def call(): Unit = {
              // a QUEUED task starting after the abort must not submit a
              // fresh job — the group cancel only reaches jobs already
              // submitted when it fires
              if (aborted.get()) return
              // the group tag is per-thread state — set it in the worker
              spark.sparkContext.setJobGroup(group,
                "graft partitioned-surgery staging", interruptOnCancel = true)
              // re-check under the tag: a worker that passed the first
              // check while the abort was firing now has its jobs
              // covered by the finally-loop's re-issued group cancel;
              // this check just avoids starting doomed work at all
              try { if (!aborted.get()) f(it) }
              finally spark.sparkContext.clearJobGroup()
            }
          }))
        var firstErr: Throwable = null
        futs.foreach { fu =>
          try fu.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              if (firstErr == null) {
                firstErr = e.getCause
                aborted.set(true)
                spark.sparkContext.cancelJobGroup(group)
              }
          }
        }
        if (firstErr != null) throw firstErr
      } finally {
        pool.shutdownNow()
        // the caller's cleanup deletes the staging dir next — wait for
        // every worker to actually exit. cancelJobGroup is ONE-SHOT: a
        // worker that passed its abort check while the first cancel was
        // firing submits its job AFTER it, and that job would re-create
        // the staging dir post-cleanup (unreapable bytes outside the
        // table root). Re-issue the cancel on every wait tick until the
        // pool drains, so no straggler job can outlive this method. On
        // the success path the first await returns immediately and no
        // cancel is ever issued.
        var waitedMs = 0L
        while (!pool.awaitTermination(
            2, java.util.concurrent.TimeUnit.SECONDS) && waitedMs < 120000L) {
          spark.sparkContext.cancelJobGroup(group)
          waitedMs += 2000L
        }
      }
    }
  }

  /** Relative partition dir of a manifest `file` entry ("" for a
    * root-level file) — the grouping key of the partition-aware verbs.
    */
  private def relPartitionDir(rootQ: String, f: String): String = {
    require(f == rootQ || f.startsWith(rootQ + "/"),
      s"manifest entry outside table root $rootQ: $f")
    val rel = f.stripPrefix(rootQ).stripPrefix("/")
    val i = rel.lastIndexOf('/')
    if (i < 0) "" else rel.substring(0, i)
  }

  /** The hive partition COLUMN NAMES of a manifest table, derived from
    * its (already collected, metadata-scale) file paths: each `k=v` dir
    * level contributes its `k`, in tree order. Empty for a flat table.
    * Fails loud on a non-hive segment or a layout that differs between
    * files — the partition-aware verbs need ONE consistent column
    * sequence to re-encode staged rewrites with partitionBy.
    */
  private def partitionColsOf(rootQ: String, files: Seq[String],
      verb: String): Seq[String] = {
    require(files.nonEmpty, s"$verb: no manifest entries under $rootQ")
    def colsOf(f: String): Seq[String] = {
      val rel = relPartitionDir(rootQ, f)
      if (rel.isEmpty) Nil
      else rel.split('/').toSeq.map { seg =>
        val i = seg.indexOf('=')
        require(i > 0,
          s"$verb: non-hive partition dir segment '$seg' under $rootQ")
        seg.substring(0, i)
      }
    }
    val first = colsOf(files.head)
    files.find(colsOf(_) != first).foreach { f =>
      throw new IllegalArgumentException(
        s"$verb: inconsistent partition layout under $rootQ — " +
          s"${files.head} vs $f")
    }
    first
  }

  /** OPTIMIZE for a HIVE-PARTITIONED manifest table — the partition-
    * aware twin of [[optimizeTable]] (which guards itself FLAT-only,
    * since a root-level rewrite would flatten the partition column into
    * file data). Each partition directory's live rows (DVs applied)
    * rewrite into `ceil(live / targetRowsPerFile)` files INSIDE that
    * directory — read without basePath, so only physical columns land
    * in the files and the partition encoding stays directory-only —
    * and, crucially, ALL partitions stage first and publish under ONE
    * manifest swap: single-version atomicity across the whole tree,
    * where a per-partition loop of N optimizeTable calls would be N
    * commits with readers seeing intermediate states. DV debt retires
    * tree-wide (the post-optimize manifest carries no dv columns), the
    * pre-optimize snapshot stays readable until vacuum retention, and
    * the change feed across it nets to zero — same contract as the
    * flat verb, q180. Partitions stage CONCURRENTLY under a bounded
    * pool (`graft.surgery.maxConcurrentStaging`, default 8 — see
    * [[stageConcurrently]]): the job count is still O(partition dirs)
    * but the per-job scheduling latency overlaps instead of summing.
    * Works on flat tables too (one "" partition ≡ optimizeTable).
    * Returns the number of files written.
    */
  def optimizePartitioned(spark: SparkSession, dataDir: String,
      cols: Seq[String], bloomCols: Seq[String] = Nil,
      targetRowsPerFile: Long = 1L << 20,
      expectedPerFile: Long = 65536L, fpp: Double = 0.01): Int = {
    require(targetRowsPerFile > 0, s"targetRowsPerFile=$targetRowsPerFile")
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    loadCovering(spark, dataDir) // staleness guard
    // pin BEFORE any frame resolution — same OCC discipline as
    // optimizeTable (the eager reads below all resolve at v0, and the
    // commit validates against v0)
    val v0 = currentVersionOf(spark, dataDir)
    val rootQ = FsListing.norm(root.makeQualified(
      hfs.getUri, hfs.getWorkingDirectory).toString)
    val (meta, hasDv) = withSwapRetry {
      val m = manifestFrameAt(spark, dataDir, v0)
      val del =
        if (m.columns.contains(DvDelCol)) coalesce(col(DvDelCol), lit(0L))
        else lit(0L)
      (m.select(ManifestFileIndex.normPath(col("file")).as("f"),
          (col("n_rows") - del).as("nr"))
        .collect().map(r => (r.getString(0), r.getLong(1))),
        m.columns.contains(DvCol))
    }
    require(meta.nonEmpty, s"optimizePartitioned on empty table $dataDir")
    val byPart = meta.groupBy(t => relPartitionDir(rootQ, t._1)).toSeq.sortBy(_._1)
    val stg = new org.apache.hadoop.fs.Path(
      s"${dataDir}_stg_${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      // partitions stage CONCURRENTLY (bounded pool): the I/O is O(live
      // bytes) either way, but sequential submission pays one job-
      // scheduling latency PER partition dir — linear in tree width —
      // where the pool overlaps them (ScaleSmoke's partitioned_surgery
      // tier measures the wall-time difference at 64 dirs)
      val written = new java.util.concurrent.atomic.AtomicInteger(0)
      stageConcurrently(spark, byPart) { case (rel, files) =>
        val live = files.map(_._2).sum
        if (live > 0) {
          val n = ((live + targetRowsPerFile - 1) / targetRowsPerFile).toInt
          val raw = spark.read.parquet(files.map(_._1).toIndexedSeq: _*)
          val rows =
            if (hasDv) applyDv(raw,
              () => manifestFrameAt(spark, dataDir, v0),
              spill = Some((dataDir, v0)))
            else raw
          rows.repartition(n).write.parquet(
            if (rel.isEmpty) stg.toString else s"$stg/$rel")
          written.addAndGet(n)
        }
      }
      beforeCommitHook()
      CommitLock.withLock(hfs,
        new org.apache.hadoop.fs.Path(root, "_manifest.lock")) {
        requireUnchanged(hfs, dataDir, v0, stg)
        val moved = movePartitionTree(hfs, stg, root)
        hfs.delete(stg, true)
        require(moved.nonEmpty,
          s"optimizePartitioned produced no data files for $dataDir")
        // fresh stats for the WHOLE new file set (basePath-anchored, so
        // tracked partition columns get real bounds — that is what lets
        // the manifest prune partitions by range later)
        val stats = statsForFiles(spark, dataDir, moved, cols, bloomCols,
          expectedPerFile, fpp)
        val tmp = new org.apache.hadoop.fs.Path(
          s"${manifestPath(dataDir)}_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
        writeManifest(stats, tmp, moved.size.toLong)
        swapVersioned(hfs, dataDir, tmp, "optimize")
        spark.catalog.refreshByPath(dataDir)
      }
      written.get()
    } finally { if (hfs.exists(stg)) hfs.delete(stg, true) }
  }

  /** Range DELETE for a HIVE-PARTITIONED manifest table — the
    * partition-aware twin of [[deleteRange]], same stage-all-then-
    * one-swap atomicity as [[optimizePartitioned]]: candidate files
    * (manifest bounds intersecting `[lo, hi]`) rewrite their survivors
    * INTO their own partition directories; untouched files carry by
    * reference byte-for-byte; everything publishes as ONE MVCC version.
    * `c` must be a PHYSICAL file column — deleting by the partition
    * column itself is a directory-level operation (drop the matching
    * `col=value` dirs and refresh), and silently treating it as a row
    * filter would rewrite every file to delete whole partitions. Fails
    * loud in that case. Returns (files rewritten, files carried).
    */
  def deleteRangePartitioned(spark: SparkSession, dataDir: String, c: String,
      lo: Column, hi: Column, cols: Seq[String],
      bloomCols: Seq[String] = Nil, expectedPerFile: Long = 65536L,
      fpp: Double = 0.01): (Int, Int) = {
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    loadCovering(spark, dataDir)
    val v0 = currentVersionOf(spark, dataDir)
    val rootQ = FsListing.norm(root.makeQualified(
      hfs.getUri, hfs.getWorkingDirectory).toString)
    val m = manifestFrameAt(spark, dataDir, v0)
    require(m.columns.contains(s"min_$c") && m.columns.contains(s"max_$c"),
      s"deleteRangePartitioned needs tracked bounds for $c under $dataDir")
    val disjoint = coalesce(col(s"max_$c") < lo || col(s"min_$c") > hi,
      lit(false))
    val (flags, hasDv) = withSwapRetry {
      val mf = manifestFrameAt(spark, dataDir, v0)
      (mf.select(ManifestFileIndex.normPath(col("file")).as("f"),
          disjoint.as("d")).collect()
        .map(r => (r.getString(0), r.getBoolean(1))),
        mf.columns.contains(DvCol))
    }
    val candPaths = flags.filter(!_._2).map(_._1).sorted
    val nCarried = flags.count(_._2)
    if (candPaths.isEmpty) return (0, nCarried)
    // partition-column guard: the predicate column must live in the
    // file bytes, or the survivor filter below would read it from the
    // DIRECTORY and rewrite files only to re-encode whole-partition
    // deletes the cheap dir-drop path should handle
    require(physicalFields(spark, candPaths.head).contains(c),
      s"deleteRangePartitioned column '$c' is a PARTITION column under " +
        s"$dataDir — drop the matching partition directories and refresh " +
        "instead of a row-level rewrite")
    val byPart = candPaths.groupBy(relPartitionDir(rootQ, _)).toSeq.sortBy(_._1)
    val keep = col(c).isNull || !(col(c) >= lo && col(c) <= hi)
    val stg = new org.apache.hadoop.fs.Path(
      s"${dataDir}_stg_${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      // concurrent staging — see optimizePartitioned
      stageConcurrently(spark, byPart) { case (rel, files) =>
        val raw = spark.read.parquet(files.toIndexedSeq: _*)
        val live =
          if (hasDv) applyDv(raw,
            () => manifestFrameAt(spark, dataDir, v0),
            spill = Some((dataDir, v0)))
          else raw
        live.filter(keep).write.parquet(
          if (rel.isEmpty) stg.toString else s"$stg/$rel")
      }
      beforeCommitHook()
      CommitLock.withLock(hfs,
        new org.apache.hadoop.fs.Path(root, "_manifest.lock")) {
        requireUnchanged(hfs, dataDir, v0, stg)
        val moved = movePartitionTree(hfs, stg, root)
        hfs.delete(stg, true)
        val carried = m.filter(disjoint)
        val merged =
          if (moved.isEmpty) carried
          else carried.unionByName(alignStats(
            statsForFiles(spark, dataDir, moved, cols, bloomCols,
              expectedPerFile, fpp), carried.columns.toIndexedSeq))
        val tmp = new org.apache.hadoop.fs.Path(
          s"${manifestPath(dataDir)}_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
        writeManifest(merged, tmp, (flags.length + moved.size).toLong)
        swapVersioned(hfs, dataDir, tmp, "delete")
        spark.catalog.refreshByPath(dataDir)
        (candPaths.length, nCarried)
      }
    } finally { if (hfs.exists(stg)) hfs.delete(stg, true) }
  }

  /** Manifest-aware orphan-file VACUUM (the remove-orphans verb of the
    * table-format lifecycle, beside write-through / compact / time
    * travel): delete every data file under `dataDir` the live manifest
    * does not reference — the residue of crashed or raced writers whose
    * append landed but whose refresh never committed. Manifest readers
    * ([[ManifestFileIndex]]) never see orphans, but a naive directory
    * read double-counts them and they leak storage forever.
    *
    * Safety contract: runs under the SAME advisory lock as
    * writeThrough/refresh, so an in-flight rival's freshly-landed (not
    * yet manifested) files can never be reaped mid-commit — by the time
    * the lock is held, every committed writer's refresh has run. Refuses
    * to operate without a manifest (everything would be "orphan").
    *
    * Scale contract: the orphan decision is a distributed anti-join of
    * the live listing against the manifest's path column; only the
    * doomed paths are collected — O(orphans) driver bytes, the same
    * distributed-planning rule as [[ManifestFileIndex.listFiles]].
    * Returns the deleted paths, sorted.
    */
  def vacuum(spark: SparkSession, dataDir: String,
      graceMs: Long = 600000L, keepVersions: Int = 1): Seq[String] = {
    require(keepVersions >= 1, s"keepVersions=$keepVersions: must retain the current version")
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    CommitLock.withLock(hfs,
      new org.apache.hadoop.fs.Path(root, "_manifest.lock")) {
      require(hfs.exists(new org.apache.hadoop.fs.Path(manifestPath(dataDir))),
        s"no manifest under $dataDir — vacuum without one would reap the whole table")
      import spark.implicits._
      val cutoff = System.currentTimeMillis() - graceMs
      // a file already gone counts as reapable; a LIVE file younger than
      // graceMs is possibly in-flight (see the orphan-sweep note below)
      def pastGrace(p: String): Boolean =
        try hfs.getFileStatus(new org.apache.hadoop.fs.Path(p))
          .getModificationTime < cutoff
        catch { case _: java.io.FileNotFoundException => true }
      // TIME-TRAVEL retention: the live set is the UNION of the newest
      // `keepVersions` snapshots (current + that many minus one history
      // manifests); history manifests beyond retention are reaped,
      // making "version not retained" a loud resolution failure in
      // readAsOf rather than a half-missing read. keepVersions = 1 is
      // the classic semantics: live = current manifest only.
      //
      // RESURRECTION GUARD: an expired history manifest and the data
      // files ONLY IT references must leave disk TOGETHER. Reaping the
      // manifest while graceMs spares its young files would strand them
      // as unreferenced-but-live — the next refresh, no longer seeing
      // them in any history manifest, would re-manifest them as fresh
      // appends, and a pre-surgery file's rows (deleted ranges, stale
      // pre-merge key values) would silently REJOIN the current version.
      // So an expired manifest is reaped only once every file it
      // exclusively references (not referenced by any retained version
      // or any other still-present history manifest) is past the grace
      // cutoff; otherwise it is SPARED this pass — still covering its
      // young files against re-manifesting — and retried next vacuum.
      // The per-version reference sets are collected path strings:
      // O(files-per-version) driver bytes, the listing-sized state any
      // FileIndex already holds, never manifest payload.
      val hist = historyVersions(hfs, root)
      val keptHist = hist.takeRight(keepVersions - 1)
      val expired = hist.dropRight(keepVersions - 1)
      val reapedWith = Seq.newBuilder[String]
      if (expired.nonEmpty) {
        // ONE Spark job over every version's manifest (the per-version
        // loop was a collect per history dir — job-scheduling overhead
        // linear in history depth); the owning version is recovered from
        // each row's source path ("" = the current, unsuffixed manifest)
        val byVersion: Map[String, Set[String]] =
          spark.read.parquet(
            (manifestPath(dataDir) +: hist.map(histPath(dataDir, _))): _*)
            .select(
              regexp_extract(input_file_name(), "_manifest_v(\\d+)/", 1).as("v"),
              ManifestFileIndex.normPath(col("file")).as("f"))
            .collect()
            .groupBy(_.getString(0))
            .map { case (v, rows) => v -> rows.map(_.getString(1)).toSet }
        val retainedRefs = byVersion.getOrElse("", Set.empty) ++
          keptHist.flatMap(v => byVersion.getOrElse(v.toString, Set.empty))
        val expiredRefs: Map[Long, Set[String]] =
          expired.map(v => v -> byVersion.getOrElse(v.toString, Set.empty)).toMap
        // ONE-PASS reference counting, not a per-version set rebuild
        // (that was O(versions² × files-per-version) driver work on
        // exactly the deep-history tables this file optimizes elsewhere):
        // a file is exclusive to v iff no retained version knows it and
        // v is the only still-present expired manifest referencing it.
        // Reaping v decrements its files' counts, so a file shared with
        // an already-reaped older version re-qualifies at the younger
        // one's turn; sparing v leaves counts intact, so the spared
        // manifest keeps covering its files.
        val refCount = scala.collection.mutable.Map.empty[String, Int]
        expiredRefs.valuesIterator.foreach(_.foreach { p =>
          refCount(p) = refCount.getOrElse(p, 0) + 1 })
        // oldest-first: a file shared between two expired versions stays
        // until the LAST manifest referencing it is itself reapable
        expired.foreach { v =>
          val exclusive = expiredRefs(v)
            .filter(p => !retainedRefs(p) && refCount(p) == 1)
          if (exclusive.forall(pastGrace)) {
            // DATA FILES FIRST, manifest LAST: a crash between the two
            // deletes must leave the safe half. Files-gone-manifest-alive
            // only degrades to the loud readAsOf/mid-scan failure already
            // documented, and the next vacuum reaps the manifest (a
            // missing file counts as pastGrace). The other order strands
            // past-grace files unreferenced-but-live, and the next
            // refresh would re-manifest them — deleted/stale rows
            // silently REJOINING the current version, the exact
            // resurrection this guard exists to prevent.
            exclusive.foreach { p =>
              if (hfs.delete(new org.apache.hadoop.fs.Path(p), false))
                reapedWith += p
            }
            hfs.delete(new org.apache.hadoop.fs.Path(histPath(dataDir, v)), true)
            expiredRefs(v).foreach(p => refCount(p) -= 1)
          }
        }
      }
      // ORPHAN SWEEP: a live file no still-present manifest references —
      // current, retained history, or an expired-but-SPARED manifest
      // (re-list after the reaping loop so spared versions keep
      // protecting their files) — is crashed/raced writer residue.
      val manifested = (manifestFrame(spark, dataDir)
          .select(ManifestFileIndex.normPath(col("file")).as("m_file")) +:
        historyFiles(spark, dataDir, hfs, root) // re-listed: spared only
          .map(_.select(col("h_file").as("m_file"))).toSeq)
        .reduce(_ unionByName _)
        .distinct()
      val candidates = FsListing.listDataFiles(hfs, root).toDF("live_file")
        .join(manifested, col("live_file") === col("m_file"), "left_anti")
        .collect().map(_.getString(0)).sorted.toSeq
      // retention threshold: the lock only serializes against
      // writeThrough users; refresh()'s contract blesses UNLOCKED data
      // appends followed by a locked refresh, and a vacuum landing in
      // that gap would see the append as orphaned and destroy committed
      // rows. A file younger than `graceMs` is treated as possibly
      // in-flight and spared (the standard remove-orphans retention;
      // size graceMs above the longest append→refresh latency). The
      // stats are O(candidate) driver RPCs — already the doomed set,
      // never the table.
      val orphans = candidates.filter { p =>
        try hfs.getFileStatus(new org.apache.hadoop.fs.Path(p))
          .getModificationTime < cutoff
        catch { case _: java.io.FileNotFoundException => false }
      }
      orphans.foreach(p =>
        hfs.delete(new org.apache.hadoop.fs.Path(p), false))
      // DV-SPILL RETENTION: `_dv_spill/v{N}` parquets are version-keyed
      // CACHES (ensureDvSpill re-creates them idempotently), so reaping
      // follows manifest retention — spills of unretained versions and
      // abandoned tmp dirs go once past grace; a reader mid-scan on one
      // hits the same loud retention race the data files document
      locally {
        val spillRoot = new org.apache.hadoop.fs.Path(s"$dataDir/_dv_spill")
        if (hfs.exists(spillRoot)) {
          val keep = (keptHist :+ currentVersion(hfs, dataDir)).toSet
          hfs.listStatus(spillRoot).foreach { st =>
            val n = st.getPath.getName
            val unretained =
              n.startsWith(".tmp_") || n.startsWith(".doomed_") ||
                (n.startsWith("v") && n.drop(1).nonEmpty &&
                  n.drop(1).forall(_.isDigit) && !keep.contains(n.drop(1).toLong))
            if (unretained && st.getModificationTime < cutoff)
              hfs.delete(st.getPath, true)
          }
        }
      }
      // drop any cached listings/footers for the pruned tree so a reader
      // planned after the vacuum never references a deleted file
      spark.catalog.refreshByPath(dataDir)
      (orphans ++ reapedWith.result()).sorted
    }
  }

  private def refreshLocked(spark: SparkSession, dataDir: String,
      root: org.apache.hadoop.fs.Path, hfs0: org.apache.hadoop.fs.FileSystem,
      cols: Seq[String], bloomCols: Seq[String], expectedPerFile: Long,
      fpp: Double, versionFloor: Long = 0L): Unit = {
    val hfs = hfs0
    val mPath = new org.apache.hadoop.fs.Path(manifestPath(dataDir))
    val wantCols = (Seq("file", "n_rows") ++
      cols.flatMap(c => Seq(s"min_$c", s"max_$c")) ++
      bloomCols.map(c => s"bloom_$c")).sorted
    if (!hfs.exists(mPath))
      return buildWithBloom(spark, dataDir, cols, bloomCols, expectedPerFile,
        fpp, versionFloor)
    val existing = readManifestDir(spark, manifestPath(dataDir))
    // dv columns are ORTHOGONAL to the tracked-column set: a refresh
    // must carry them (a rebuild re-stats raw files and would resurrect
    // DV-deleted rows — buildWithBloom's own guard fails loud on that)
    val existingCore =
      existing.columns.filterNot(c => c == DvCol || c == DvDelCol)
    if (existingCore.sorted.toSeq != wantCols)
      return buildWithBloom(spark, dataDir, cols, bloomCols, expectedPerFile,
        fpp, versionFloor)

    val live = FsListing.listDataFiles(hfs, root)
    // carried entries stay DISTRIBUTED: a broadcast semi-join against
    // the (path-strings-only) live listing keeps every still-live
    // entry — bounds and bloom binaries never visit the driver. The
    // only rows collected are the NEW paths (anti-join the other way),
    // which is exactly the delta the driver must hand to spark.read.
    import spark.implicits._
    val liveDf = broadcast(live.toDF("live_file"))
    val normFile = ManifestFileIndex.normPath(col("file")).as("m_file")
    val kept = existing.join(liveDf,
      ManifestFileIndex.normPath(existing("file")) === col("live_file"),
      "left_semi")
    // "new" means never-manifested: a file referenced only by RETAINED
    // HISTORY versions is a prior snapshot's member (an MVCC publish
    // left it for as-of readers), not a fresh append — re-manifesting it
    // would double-count its rows in the current version. The subtract
    // runs DRIVER-side over path strings (one column-pruned collect of
    // the existing manifest's `file` column — the same paths the driver
    // must hand to spark.read anyway — plus the memoized per-version
    // history sets), so an append on a deep-retention table stops
    // re-reading every history manifest per refresh.
    val existingFiles = labeled(spark, "graft: refresh new-files") {
      existing.select(normFile).collect()
    }.map(_.getString(0)).toSet
    val memoKey = FsListing.norm(root.makeQualified(
      hfs.getUri, hfs.getWorkingDirectory).toString)
    val histSets = historyFileSets(spark, dataDir, hfs, root, memoKey)
    val newFiles = live
      .filterNot(existingFiles)
      .filterNot(f => histSets.exists(_.contains(f)))
      .sorted
    val merged =
      if (newFiles.isEmpty) kept
      else {
        // basePath keeps partition columns resolvable when the tree is
        // hive-partitioned and a partition column is tracked
        val fresh = statsForFiles(spark, dataDir, newFiles.toSeq,
          cols, bloomCols, expectedPerFile, fpp)
        kept.unionByName(alignStats(fresh, kept.columns.toIndexedSeq))
      }
    // `merged` READS the manifest it must replace, so land it beside the
    // live one and swap by rename (write-temp-then-rename is the same
    // commit move IdempotentFileSink uses) — no self-overwrite, and a
    // reader holding the old frame keeps a consistent view
    // sweep torn tmp dirs from crashed predecessors BEFORE staging ours:
    // we hold the manifest lock, so no rival is mid-write under a
    // different nonce, and underscore-prefixed leftovers are invisible
    // to readers but would otherwise accumulate forever
    hfs.listStatus(root).iterator
      .filter(_.getPath.getName.startsWith("_manifest_tmp_"))
      .foreach(s => hfs.delete(s.getPath, true))
    val tmp = new org.apache.hadoop.fs.Path(
      s"${manifestPath(dataDir)}_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    writeManifest(merged, tmp, live.size.toLong)
    swapVersioned(hfs, dataDir, tmp, "refresh")
  }

  /** Entries per manifest part file for [[writeManifest]]'s sharding:
    * with inline bloom sidecars at the default expectedPerFile/fpp a
    * manifest row is ~80 KB, so 4096 entries ≈ a 300 MB part — large
    * enough that the common table (≤ 4096 files) keeps the single-part
    * fast path, small enough that a 10⁵-file table's multi-GB manifest
    * never funnels through one write task (or lands as one multi-GB
    * object a reader must fetch serially).
    */
  private[graft] val ManifestEntriesPerPart = 4096L

  /** Land a manifest frame at `tmp` with a part count sized to its
    * (approximate — an upper bound is fine) entry count. Readers glob
    * the manifest dir ([[manifestFrame]]), so the part count is
    * invisible to them; the version/op markers are dir-level files
    * beside the parts either way. Single-part stays `coalesce(1)` (no
    * shuffle); sharded uses `repartition` because upstream frames
    * (carried ∪ fresh unions) may hold fewer partitions than parts and
    * coalesce can only reduce. The part-count ceiling (1024 — publish
    * commits are rename-per-part, so an unbounded count would turn the
    * swap into 10⁴ driver RPCs) re-binds entry growth only past
    * `1024 × ManifestEntriesPerPart ≈ 4.2M` files — a table whose
    * MANIFEST is hundreds of GB with default blooms, i.e. planning cost
    * is dominated by content long before part sizing matters again.
    */
  private def writeManifest(df: DataFrame, tmp: org.apache.hadoop.fs.Path,
      approxEntries: Long): Unit = {
    val parts = math.max(1L, math.min(1024L,
      (approxEntries + ManifestEntriesPerPart - 1) / ManifestEntriesPerPart))
      .toInt
    labeled(df.sparkSession, "graft: manifest write") {
      (if (parts == 1) df.coalesce(1) else df.repartition(parts))
        .write.mode("overwrite").parquet(tmp.toString)
    }
  }

  /** VERSIONED manifest swap: the outgoing `_manifest` RENAMES to
    * `_manifest_v{N}` instead of deleting — history costs zero extra
    * writes (one metadata rename per refresh, manifest-sized dirs), and
    * each retained version is a complete file-level snapshot
    * [[readAsOf]] can plan from until [[vacuum]]'s retention reaps it.
    * The new manifest at `tmp` is stamped `_v{N+1}` before it lands, so
    * versions stay monotonic whatever the history retention deleted.
    */
  private def swapVersioned(hfs: org.apache.hadoop.fs.FileSystem,
      dataDir: String, tmp: org.apache.hadoop.fs.Path,
      op: String): Unit = {
    val dst = new org.apache.hadoop.fs.Path(manifestPath(dataDir))
    // OPERATION marker (DESCRIBE HISTORY): the verb that produced this
    // version rides as an empty `_op_<verb>` file beside the `_v{N}`
    // stamp — zero extra I/O beyond one empty create, retired/reaped
    // with its manifest dir
    hfs.create(new org.apache.hadoop.fs.Path(tmp, s"_op_$op"), true).close()
    val newV =
      if (hfs.exists(dst)) {
        val v = versionOf(hfs, dst)
        hfs.create(new org.apache.hadoop.fs.Path(tmp, s"_v${v + 1}"), true).close()
        val hist = new org.apache.hadoop.fs.Path(histPath(dataDir, v))
        hfs.delete(hist, true) // a build() reset can reuse a version number
        require(hfs.rename(dst, hist),
          s"manifest history rename failed under $dataDir")
        v + 1
      } else {
        hfs.create(new org.apache.hadoop.fs.Path(tmp, "_v1"), true).close()
        1L
      }
    // a RECYCLED version number (build() reset) must never serve a
    // previous incarnation's dv spill or size estimate: the spill cache
    // and the est memo are keyed by version and assume immutability —
    // evict both for the number being published
    locally {
      val sp = new org.apache.hadoop.fs.Path(dvSpillDir(dataDir, newV))
      if (hfs.exists(sp)) hfs.delete(sp, true)
      dvEstMemo.remove((FsListing.norm(dataDir), newV))
    }
    require(hfs.rename(tmp, dst), s"manifest swap rename failed under $dataDir")
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
    val (_, total) = loadCovering(spark, dataDir) // staleness guard
    // PIN ONE VERSION for the kept-set collect AND the dv resolution
    // readKeptDv performs — un-pinned, a rival swap between the two
    // would mix snapshots (see readKeptDv)
    val v0 = currentVersionOf(spark, dataDir)
    // bound test in Spark expression semantics (same coercions the data
    // filter gets), on the tiny manifest frame
    val keepFile = bounds.map { case (c, lo, hi) =>
      col(s"min_$c").isNull || col(s"max_$c").isNull ||
        (col(s"min_$c") <= hi && col(s"max_$c") >= lo)
    }.reduce(_ && _)
    val kept = withSwapRetry {
      val mdf = manifestFrameAt(spark, dataDir, v0)
      bounds.foreach { case (c, _, _) =>
        require(mdf.columns.contains(s"min_$c") && mdf.columns.contains(s"max_$c"),
          s"manifest under $dataDir has no tracked bounds for '$c' — " +
            s"rebuild with the column in cols")
      }
      mdf.filter(keepFile)
        .select("file").collect().map(r => norm(r.getString(0))).toSeq
    }
    val rowPred = bounds.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi }.reduce(_ && _)
    (readKeptDv(spark, dataDir, kept, v0).filter(rowPred),
      kept.size, total)
  }

  /** POINT lookup planned through the Bloom sidecar: open only the files
    * whose filter might contain at least one probe key (a missing/null
    * sidecar cell keeps the file — unknown is never skipped). The probe
    * runs driver-side over the tiny manifest — |files| filter
    * deserializations, the same metadata-scale work as the bounds test —
    * and the exact `IN` filter behind it removes false positives, so the
    * result is identical to the full scan's.
    */
  def readPointLookup(spark: SparkSession, dataDir: String, c: String,
      keys: Seq[Long]): (DataFrame, Int, Int) = {
    require(keys.nonEmpty, "readPointLookup with no keys")
    // ENCODING GUARD: the sidecar was built with putLong for integral
    // columns and putString for string columns (fileStats) — probing a
    // string-built filter with mightContainLong silently false-negatives
    // files out of the kept set (rows vanish). Resolve the column's
    // tracked type and fail loud toward [[readPointLookupString]].
    val dt = resolveColumnType(spark, dataDir, c, "readPointLookup")
    require(FsListing.isIntegral(dt),
      s"readPointLookup column '$c' is $dt — its bloom sidecar hashes " +
        "the native encoding; use readPointLookupString for string keys")
    val keyArr = keys.toArray
    val probe = udf { (bytes: Array[Byte]) =>
      bytes == null || {
        val bf = org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(bytes))
        keyArr.exists(bf.mightContainLong)
      }
    }
    pointLookupCore(spark, dataDir, c, probe, col(c).isin(keys: _*))
  }

  /** [[readPointLookup]] for STRING key columns — probes with the same
    * UTF-8 encoding the build side stored ([[fileStats]]' putString),
    * so the no-false-negative contract holds in the string key space.
    */
  def readPointLookupString(spark: SparkSession, dataDir: String,
      c: String, keys: Seq[String]): (DataFrame, Int, Int) = {
    require(keys.nonEmpty, "readPointLookupString with no keys")
    require(!keys.contains(null),
      "readPointLookupString: NULL key in batch — matches no row")
    val dt = resolveColumnType(spark, dataDir, c, "readPointLookupString")
    require(dt == StringType,
      s"readPointLookupString column '$c' is $dt — use readPointLookup " +
        "for integral keys")
    val keyArr = keys.toArray
    val probe = udf { (bytes: Array[Byte]) =>
      bytes == null || {
        val bf = org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(bytes))
        keyArr.exists(bf.mightContainString)
      }
    }
    pointLookupCore(spark, dataDir, c, probe,
      col(c).isin(keys.toIndexedSeq: _*))
  }

  /** Shared engine of the two point-lookup verbs: membership probes run
    * as a Spark job over the manifest — each executor task deserializes
    * only its partition's sidecars and tests the (driver-sized,
    * closure-captured) key set; the driver sees surviving path strings,
    * never filter binaries. O(kept) driver state; ManifestFileIndexSpec
    * pins the byte bound.
    */
  private def pointLookupCore(spark: SparkSession, dataDir: String,
      c: String, probe: org.apache.spark.sql.expressions.UserDefinedFunction,
      exact: Column): (DataFrame, Int, Int) = {
    val (_, total) = loadCovering(spark, dataDir) // staleness guard
    // one pinned version for the bloom probe and the dv resolution
    val v0 = currentVersionOf(spark, dataDir)
    val kept = withSwapRetry {
      val mdf = manifestFrameAt(spark, dataDir, v0)
      require(mdf.columns.contains(s"bloom_$c"),
        s"manifest under $dataDir has no bloom sidecar for '$c' — " +
          s"buildWithBloom(..., bloomCols = Seq(\"$c\")) first")
      mdf.filter(probe(col(s"bloom_$c")))
        .select(ManifestFileIndex.normPath(col("file")))
        .collect().map(_.getString(0)).toSeq
    }
    val df = readKeptDv(spark, dataDir, kept, v0).filter(exact)
    (df, kept.size, total)
  }

  /** Read the manifest and enforce COVERAGE via [[requireCovering]].
    * Returns the manifest frame and its file count; manifest CONTENT
    * (bounds, blooms) stays distributed.
    */
  private[sources] def loadCovering(spark: SparkSession, dataDir: String): (DataFrame, Int) =
    requireCovering(spark, dataDir) // one manifest read serves guard + plan


  /** Enforce COVERAGE: every live data file under the directory must be
    * manifested — a file landed after the last build would otherwise be
    * silently absent from every planned query. Fail loud; the writer
    * owes a rebuild. Runs as a distributed anti-join: the live listing
    * (already driver-resident by any FileIndex's contract — path
    * strings, no manifest payload) parallelizes out and subtracts the
    * manifest's `file` column on executors; the driver receives one
    * count and at most one example path. Returns the manifest file
    * count.
    */
  /** Coverage-guard memo: `dataDir → (manifest version, live-listing
    * fingerprint, manifest row count)`. The guard's verdict is a PURE
    * function of (manifest version, live file set) — the version
    * changes on every swap, and a raw append/delete changes the
    * listing fingerprint (part-file names carry job UUIDs, so even a
    * rebuild after a reset can't alias) — so an unchanged pair can
    * skip the probe job outright. Repeated reads of one table (the
    * dominant pattern: every index construction guards) pay one
    * cheap listing + one marker stat instead of a Spark job each.
    */
  private val coveringMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Int)]()

  /** Per-(table, version, content-stamp) memo of a HISTORY manifest's
    * file-path set. A `_manifest_v{N}` dir is immutable once the swap
    * renamed it in, so an entry can be served forever — but the KEY
    * must identify the dir's INCARNATION, not just its number: a table
    * deleted and rebuilt at the same path recycles version numbers
    * (the full-suite PlanAuditSpec run caught exactly this — a lane's
    * second plan construction read the first incarnation's sets and
    * false-tripped the staleness guard). The incarnation stamp is
    * [[manifestDirStamp]] — first part name (job-unique UUID), length,
    * part count — which two incarnations can never share even when a
    * delete-and-rebuild lands in the same coarse-filesystem mtime tick
    * with the same version number (the residual aliasing window the r20
    * mtime stamp left open; HistMemoIncarnationSpec pins the same-tick
    * rebuild). A stale entry (vacuum reaped the version, or a rebuild
    * orphaned the key) is never LOOKED UP again — its stamp can't
    * recur — so it is dead weight until [[HistFilesMemoMaxPaths]]
    * cap-and-clears. Driver cost is path STRINGS — the same O(files)
    * state the live listing (any FileIndex's contract) already holds.
    */
  private val histFilesMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, String), Set[String]]()
  private[graft] val HistFilesMemoMaxPaths = 4 * 1024 * 1024
  private val histFilesMemoPaths = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Union of the retained history versions' file sets, memoized per
    * immutable version dir; only versions absent from the memo pay a
    * read (ONE multi-path spark read for all of them — the same shape
    * [[historyFiles]] uses), so a poll loop stops re-reading the whole
    * retention depth on every coverage probe.
    */
  private def historyFileSets(spark: SparkSession, dataDir: String,
      hfs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, memoKey: String): Seq[Set[String]] = {
    // (version, content stamp) pairs — one root listing for the dir set
    // plus one listStatus per history dir for its incarnation stamp
    // (sub-ms each against the ~50 ms spark read a memo hit avoids; see
    // [[histFilesMemo]] for why mtime alone was not a sound stamp). A
    // dir whose stamp is unresolvable (vacuumed mid-probe, torn listing)
    // is treated as a miss and read uncached — never memoized wrong.
    val hs = historyDirs(hfs, root).keysIterator.toSeq.sorted
      .map { v =>
        (v, manifestDirStamp(hfs,
          new org.apache.hadoop.fs.Path(histPath(dataDir, v))))
      }
    val (hitV, missV) = hs.partition { case (v, st) =>
      st.exists(s => histFilesMemo.containsKey((memoKey, v, s))) }
    val loaded: Map[Long, Set[String]] =
      if (missV.isEmpty) Map.empty
      else {
        // version recovered from the dir name — same trick as history():
        // the rename that froze the dir stamped it. Explicit one-column
        // schema: no footer inference, no min_/max_ drift exposure.
        val rows = labeled(spark, "graft: coverage history load") {
          spark.read
            .schema(StructType(Seq(StructField("file", StringType))))
            .parquet(missV.map(p => histPath(dataDir, p._1)): _*)
            .select(ManifestFileIndex.normPath(col("file")).as("f"),
              regexp_extract(input_file_name(),
                "_manifest_v(\\d+)/[^/]*$", 1).cast("long").as("_v"))
            .collect()
        }
        rows.groupBy(_.getLong(1)).map { case (v, rs) =>
          v -> rs.map(_.getString(0)).toSet
        }
      }
    missV.foreach { case (v, st) =>
      st.foreach { stamp =>
        val s = loaded.getOrElse(v, Set.empty[String])
        if (histFilesMemoPaths.addAndGet(s.size.toLong) > HistFilesMemoMaxPaths) {
          histFilesMemo.clear()
          histFilesMemoPaths.set(s.size.toLong)
        }
        histFilesMemo.put((memoKey, v, stamp), s)
      }
    }
    hitV.flatMap { case (v, st) =>
      st.flatMap(s => Option(histFilesMemo.get((memoKey, v, s)))) } ++
      // a version vacuumed between the listing and the read contributes
      // an empty set — exactly what the multi-path read would have shown
      missV.map { case (v, _) => loaded.getOrElse(v, Set.empty[String]) }
  }

  private[sources] def requireCovering(spark: SparkSession,
      dataDir: String): (DataFrame, Int) = {
    val mdf = manifestFrame(spark, dataDir)

    // RECURSIVE data-file listing (build() reads through
    // spark.read.parquet, which descends into partition subdirs) with
    // metadata excluded and paths canonicalized — shared with the
    // ledger's delta selection, one definition of "data file": FsListing
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val live = FsListing.listDataFiles(hfs, root)
    val fp = (live.size.toLong << 32) |
      (scala.util.hashing.MurmurHash3.orderedHash(live).toLong & 0xffffffffL)
    val v = currentVersion(hfs, dataDir)
    val memoKey = FsListing.norm(root.makeQualified(
      hfs.getUri, hfs.getWorkingDirectory).toString)
    val hit = coveringMemo.get(memoKey)
    if (hit != null && hit._1 == v && hit._2 == fp)
      return (mdf, hit._3)
    // coverage = every live file is CURRENT data or a retained prior
    // snapshot's member (an MVCC publish leaves old files on disk for
    // as-of readers until vacuum retention) — only a file NO retained
    // version knows is a staleness trip. The verdict runs DRIVER-side
    // over path strings (the state this guard already holds: the live
    // listing): one column-pruned collect of the current manifest's
    // `file` column — blooms/bounds never leave executors — plus the
    // per-immutable-version history sets from [[historyFileSets]]'s
    // memo. Versus the old distributed anti-join probe this drops the
    // per-read history re-read (O(retention depth) work on EVERY index
    // construction) and the extra join/union job — a CDC poll's
    // coverage check is one tiny job, then set membership.
    val curFiles = labeled(spark, "graft: coverage probe") {
      withSwapRetry {
        manifestFrame(spark, dataDir)
          .select(ManifestFileIndex.normPath(col("file")))
          .collect()
      }
    }.map(_.getString(0))
    val total = curFiles.length
    require(total > 0, s"empty manifest under $dataDir — build() first")
    val known = curFiles.toSet
    val missing0 = live.filterNot(known)
    if (missing0.nonEmpty) {
      val histSets = historyFileSets(spark, dataDir, hfs, root, memoKey)
      val unknown = missing0.filterNot(f => histSets.exists(_.contains(f)))
      if (unknown.nonEmpty)
        throw new IllegalArgumentException(
          s"requirement failed: manifest under $dataDir is stale: " +
            s"${unknown.size} unmanifested files (e.g. ${unknown.head}) — " +
            "rebuild")
    }
    // only PASSING verdicts memoize (a failure must re-probe and re-throw);
    // cap-and-clear bounds a long-lived session over many tables
    if (coveringMemo.size >= 256) coveringMemo.clear()
    coveringMemo.put(memoKey, (v, fp, total))
    (mdf, total)
  }

  /** See [[FsListing.norm]] — manifest `file` entries come from
    * `input_file_name()` (percent-encoded URIs) and must both compare
    * against the listing and feed `spark.read` in decoded form.
    */
  private def norm(s: String): String = FsListing.norm(s)

  /** Scan exactly `kept`. basePath pins schema parity with the unpruned
    * read: without it, a leaf-file read under hive-style partition dirs
    * drops the partition columns, so the pruned frame's schema would
    * diverge from the full scan (and from the kept-empty branch).
    */
  private def readKept(spark: SparkSession, dataDir: String,
      kept: Seq[String]): DataFrame =
    if (kept.isEmpty)
      spark.read.parquet(dataDir).filter(lit(false)) // schema-stable empty
    else spark.read.option("basePath", dataDir).parquet(kept: _*)
}

/** Thrown when a write surgery (deleteRange / mergeKeys / publishVia)
  * finds, under the commit lock, that the table is no longer at the
  * manifest version its plan read: a rival writer committed between plan
  * and publish, and publishing the staged output would silently discard
  * that rival's work. The caller's remedy is to re-run the surgery
  * against the current version — the same optimistic
  * conflict-and-retry protocol Delta raises as
  * ConcurrentModificationException.
  */
final class ConcurrentWriteException(msg: String) extends RuntimeException(msg)
