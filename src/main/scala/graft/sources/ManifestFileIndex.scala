package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.{FileStatusCache, HadoopFsRelation, InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** TRANSPARENT manifest skipping: a custom [[org.apache.spark.sql
  * .execution.datasources.FileIndex]] that consults the `_manifest`
  * per-file bounds DURING file listing — the integration point table
  * formats use (Delta's TahoeFileIndex, Iceberg's scan planning), so
  * callers write a PLAIN `df.filter(range)` and the scan opens only
  * intersecting files. [[FileManifest.readPruned]] is the explicit
  * form; this makes the same skipping invisible: Catalyst pushes the
  * filter conjuncts to `listFiles(_, dataFilters)`, and the index drops
  * every file whose tracked bounds can't satisfy them BEFORE the scan
  * plans its partitions — fewer splits, fewer footer reads, and the
  * pruning composes with everything downstream (joins, aggregates,
  * AQE) because it happens below the plan.
  *
  * Soundness rules (identical to `readPruned`): unknown (NULL) bounds
  * keep the file; only conjuncts of the shape `col (=|<|<=|>|>=) lit`
  * (either operand order) on numerically-comparable tracked columns
  * prune — anything else contributes nothing; strict bounds are
  * relaxed to inclusive (conservative); NULL-valued rows can never
  * satisfy a range conjunct, so bound-based skipping loses no row. The
  * construction-time coverage guard fails LOUD on a stale manifest.
  */
class ManifestFileIndex(spark: SparkSession, dataDir: String)
    extends InMemoryFileIndex(
      spark, Seq(new Path(dataDir)), Map.empty, None,
      FileStatusCache.getOrCreate(spark), None, None) {

  /** norm'd file path → (tracked col → (min, max)); None = unknown.
    * Only NUMERIC-typed bounds participate: a string column's manifest
    * min/max is LEXICOGRAPHIC (min "10" < "9"), so comparing it against
    * a numerically-parsed literal would skip files that match —
    * non-numeric tracked columns simply never prune here (sound;
    * `readPrunedMulti` evaluates them in Spark expression semantics if
    * the explicit form is needed).
    */
  private val (fileBounds, fileBlooms): (
      Map[String, Map[String, (Option[BigDecimal], Option[BigDecimal])]],
      Map[String, Map[String, org.apache.spark.util.sketch.BloomFilter]]) = {
    val (mdf, _) = FileManifest.loadCovering(spark, dataDir)
    val tracked = mdf.columns.filter(_.startsWith("min_")).map(_.stripPrefix("min_"))
      .filter(c => mdf.columns.contains(s"max_$c"))
      .filter(c => mdf.schema(s"min_$c").dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType]).toSeq
    // bloom sidecars (buildWithBloom): an EQUALITY conjunct on a
    // bloom-tracked column additionally prunes by MEMBERSHIP — the
    // point-lookup layer min/max bounds can't provide (a
    // hash-distributed key intersects every file's range), composed
    // transparently with the bounds test. Bloom semantics keep it
    // sound: no false negatives; a NULL sidecar cell keeps the file.
    val bloomCols = mdf.columns.filter(_.startsWith("bloom_"))
      .map(_.stripPrefix("bloom_")).toSeq
    def num(v: Any): Option[BigDecimal] =
      if (v == null) None
      else try Some(BigDecimal(v.toString)) catch { case _: NumberFormatException => None }
    val rows = mdf.select("file",
      tracked.flatMap(c => Seq(s"min_$c", s"max_$c")) ++
        bloomCols.map(c => s"bloom_$c"): _*).collect()
    val bounds = rows.map { r =>
      FsListing.norm(r.getString(0)) ->
        tracked.zipWithIndex.map { case (c, i) =>
          c -> (num(r.get(1 + 2 * i)), num(r.get(2 + 2 * i)))
        }.toMap
    }.toMap
    val bloomBase = 1 + 2 * tracked.size
    val blooms = rows.map { r =>
      FsListing.norm(r.getString(0)) ->
        bloomCols.zipWithIndex.flatMap { case (c, i) =>
          if (r.isNullAt(bloomBase + i)) None
          else Some(c -> org.apache.spark.util.sketch.BloomFilter
            .readFrom(r.getAs[Array[Byte]](bloomBase + i)))
        }.toMap
    }.toMap
    (bounds, blooms)
  }

  /** Directory-level partition pruning (hive-style trees) COMPOSES with
    * the per-file bounds/bloom test: `super.listFiles` first drops whole
    * partition directories via `partitionFilters` (Catalyst's own
    * pruning over the inferred partition spec), then the manifest test
    * filters the surviving leaf files — two independent skipping layers
    * in one listing, each sound on its own.
    */
  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    val ranges = extractRanges(dataFilters)
    if (ranges.isEmpty) base
    else {
      // bloom probes are sound only for INTEGRAL-typed attributes: the
      // sidecar stores cast-to-long keys, and a non-integral equality
      // literal (timestamp micros vs stored seconds, fractional double)
      // could false-negative — the buildWithBloom guard enforces this at
      // build time, and this read-side check keeps even an off-contract
      // legacy sidecar from pruning unsoundly.
      val integralAttrs = dataFilters.flatMap(_.collect {
        case a: Attribute if FsListing.isIntegral(a.dataType) => a.name
      }).toSet
      base.map { pd =>
        PartitionDirectory(pd.values, pd.files.filter { f =>
          keepFile(FsListing.norm(f.getPath.toString), ranges, integralAttrs)
        })
      }.filter(_.files.nonEmpty)
    }
  }

  /** Per tracked column, the tightest [lo, hi] the pushed conjuncts
    * imply (strict bounds relaxed to inclusive — conservative).
    */
  private def extractRanges(dataFilters: Seq[Expression])
    : Map[String, (Option[BigDecimal], Option[BigDecimal])] = {
    def lit(e: Expression): Option[BigDecimal] = e match {
      case Literal(v, _) if v != null =>
        try Some(BigDecimal(v.toString)) catch { case _: NumberFormatException => None }
      case _ => None
    }
    def attr(e: Expression): Option[String] = e match {
      case a: Attribute if
        fileBounds.valuesIterator.take(1).exists(_.contains(a.name)) ||
          fileBlooms.valuesIterator.take(1).exists(_.contains(a.name)) =>
        Some(a.name)
      case _ => None
    }
    val perCol = scala.collection.mutable.Map[String, (Option[BigDecimal], Option[BigDecimal])]()
    def tighten(c: String, lo: Option[BigDecimal], hi: Option[BigDecimal]): Unit = {
      val (l0, h0) = perCol.getOrElse(c, (None, None))
      perCol(c) = (
        Seq(l0, lo).flatten.reduceOption(_ max _),
        Seq(h0, hi).flatten.reduceOption(_ min _))
    }
    dataFilters.foreach {
      // literal-on-the-LEFT mirrors must come first: an untyped
      // `case EqualTo(a, l)` matches EVERY EqualTo (patterns don't
      // discriminate operand types), which would shadow them into dead
      // code and silently lose lit-op-col pruning
      case GreaterThanOrEqual(l: Literal, a) => // lit >= col  ⇒  col <= lit
        for (c <- attr(a); v <- lit(l)) tighten(c, None, Some(v))
      case GreaterThan(l: Literal, a) =>
        for (c <- attr(a); v <- lit(l)) tighten(c, None, Some(v))
      case LessThanOrEqual(l: Literal, a) => // lit <= col  ⇒  col >= lit
        for (c <- attr(a); v <- lit(l)) tighten(c, Some(v), None)
      case LessThan(l: Literal, a) =>
        for (c <- attr(a); v <- lit(l)) tighten(c, Some(v), None)
      case EqualTo(l: Literal, a) =>
        for (c <- attr(a); v <- lit(l)) tighten(c, Some(v), Some(v))
      case GreaterThanOrEqual(a, l: Literal) =>
        for (c <- attr(a); v <- lit(l)) tighten(c, Some(v), None)
      case GreaterThan(a, l: Literal) =>
        for (c <- attr(a); v <- lit(l)) tighten(c, Some(v), None)
      case LessThanOrEqual(a, l: Literal) =>
        for (c <- attr(a); v <- lit(l)) tighten(c, None, Some(v))
      case LessThan(a, l: Literal) =>
        for (c <- attr(a); v <- lit(l)) tighten(c, None, Some(v))
      case EqualTo(a, l: Literal) =>
        for (c <- attr(a); v <- lit(l)) tighten(c, Some(v), Some(v))
      case _ => () // untracked/complex conjunct: contributes no pruning
    }
    perCol.toMap
  }

  private def keepFile(file: String,
      ranges: Map[String, (Option[BigDecimal], Option[BigDecimal])],
      integralAttrs: Set[String]): Boolean = {
    val boundsOk = fileBounds.get(file) match {
      case None => true // not in the manifest view (raced?) — never skip
      case Some(bounds) =>
        ranges.forall { case (c, (lo, hi)) =>
          bounds.get(c) match {
            case Some((Some(mn), Some(mx))) =>
              lo.forall(mx >= _) && hi.forall(mn <= _)
            case _ => true // unknown bounds: keep
          }
        }
    }
    // a degenerate range (lo == hi — every EqualTo, and any >=v && <=v
    // pair that collapses to a point) additionally probes the bloom
    // sidecar: for the point to match ANY row of the file, the key must
    // be a member. Long-representable keys only (the sidecar hashes
    // longs); anything else keeps the file.
    val bloomsOk = ranges.forall {
      case (c, (Some(lo), Some(hi)))
        if lo == hi && lo.isValidLong && integralAttrs.contains(c) =>
        fileBlooms.get(file).flatMap(_.get(c))
          .forall(_.mightContainLong(lo.toLongExact))
      case _ => true
    }
    boundsOk && bloomsOk
  }
}

object ManifestFileIndex {

  /** The manifest-backed read: a plain DataFrame whose scans consult the
    * `_manifest` transparently for every pushed range/equality filter.
    * Hive-partitioned trees compose: predicates on partition columns
    * prune whole directories (Catalyst partition pruning over the
    * inferred partition spec), predicates on tracked data columns prune
    * the surviving leaf files by bounds/bloom — both inside one
    * `listFiles`.
    *
    * Schema contract: with `schema = None` the data schema comes from
    * ONE footer (the index just listed everything; manifest dirs are
    * single-writer uniform). A schema-EVOLVED directory MUST pass the
    * declared target schema explicitly — first-footer inference would
    * silently drop columns absent from that one file (evolved staging
    * reads go through `Staging.readEvolved`, which requires the declared
    * schema for exactly this reason).
    */
  def read(spark: SparkSession, dataDir: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val idx = new ManifestFileIndex(spark, dataDir)
    // one footer, not a full-directory inference sweep; partition
    // columns never appear in footers, so this stays the DATA schema
    // and the inferred partitionSchema rides separately
    val dataSchema = schema.getOrElse {
      val first = idx.allFiles().headOption.getOrElse(
        throw new IllegalArgumentException(s"no data files under $dataDir"))
      spark.read.parquet(first.getPath.toString).schema
    }
    val relation = HadoopFsRelation(idx, idx.partitionSchema, dataSchema,
      None, new ParquetFileFormat, Map.empty[String, String])(spark)
    spark.baseRelationToDataFrame(relation)
  }
}
