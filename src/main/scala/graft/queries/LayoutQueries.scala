package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact
import graft.operators.GlobalRowNumber
import graft.sources.Staging

/** Data-layout operators: the clustering / global-ordering machinery a
  * 100 TB table needs before it is written, not read.
  *
  *  - q88: a Morton (z-order) clustering key — interleaving the bits of
  *    two dimensions so a range scan on EITHER dimension touches few
  *    contiguous key ranges. This is the sort key behind multi-dimension
  *    data skipping (Delta/Iceberg `OPTIMIZE ZORDER BY`); here it is a
  *    pure codegen'd expression, so computing it map-side costs nothing.
  *  - q93: exact global decile statistics WITHOUT a partition-less
  *    window — reuses [[GlobalRowNumber]]'s two-pass range-bucketed
  *    numbering, so the biggest sort any task runs is ~n/buckets rows.
  *  - q96: hash-bucketed co-located join — both fact tables written
  *    `bucketBy` the join key, after which the join plans with ZERO
  *    exchange (the spec asserts it). At 100 TB this is THE fact⋈fact
  *    strategy: the shuffle is paid once at ingest and every subsequent
  *    join of the two tables on that key is exchange-free.
  */
object LayoutQueries {

  /** Write `df` as a bucketed, per-bucket-sorted datasource table under
    * java.io.tmpdir (never inside the repo), replacing any previous
    * incarnation. The `repartition(buckets, key)` aligns Spark's write
    * tasks with the bucket hash, so each bucket lands as ONE file —
    * the layout bucketed reads plan best against (and the precondition
    * for ever eliding the merge-side sort).
    */
  private def writeBucketed(
      df: org.apache.spark.sql.DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val path = java.nio.file.Paths
      .get(sys.props("java.io.tmpdir"), "graft_buckets", table).toString
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(buckets, col(key))
      .write.format("parquet")
      .option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** The exchange-free joined detail (shared by q96 and its spec): both
    * sides bucketed on the join key → SortMergeJoin with no shuffle
    * below it.
    */
  def bucketedJoin(s: org.apache.spark.sql.SparkSession, d: String)
    : org.apache.spark.sql.DataFrame = bucketedJoinNamed(s, d)._1

  /** As [[bucketedJoin]], also returning THIS call's table names: the
    * spec inspects exactly the directories this call wrote. (Locating
    * them by max numeric suffix is wrong across JVMs — /tmp persists
    * while the counter restarts at 0, so a stale directory from a
    * previous run can shadow the current one.)
    */
  private[graft] def bucketedJoinNamed(
      s: org.apache.spark.sql.SparkSession, d: String)
    : (org.apache.spark.sql.DataFrame, String, String) = {
    val buckets = 8
    // unique table names per construction: concurrent callers (parallel
    // test suites both exercising q96, bench reps) each own their tables
    // — a shared fixed name is a drop/overwrite race against a reader
    val id = bucketedJoinCounter.incrementAndGet()
    val (ot, lt) = (s"graft_q96_orders_$id", s"graft_q96_lineitem_$id")
    writeBucketed(Tables.orders(s, d)
      .select("o_orderkey", "o_orderpriority"), ot, "o_orderkey", buckets)
    writeBucketed(Tables.lineitem(s, d)
      .select("l_orderkey", "l_extendedprice"), lt, "l_orderkey", buckets)
    // hint("merge") pins SortMergeJoin: at test SF the planner would
    // rather broadcast the small side (and ignore buckets entirely), but
    // the strategy this layout exists for is the fact⋈fact case where
    // NEITHER side broadcasts — the hint makes the plan under test the
    // plan that runs at scale
    (s.table(ot).hint("merge")
      .join(s.table(lt),
        col("o_orderkey") === col("l_orderkey")), ot, lt)
  }

  private val bucketedJoinCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Morton interleave of the low `bits` of `a` (odd positions) and `b`
    * (even positions) — a static fold, fully codegen-friendly.
    */
  private[graft] def morton(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc + shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i)
    }

  /** The identical interleave as DuckDB SQL (bit-shift via exact powers
    * of two — multiplication keeps operator precedence unambiguous).
    */
  private def mortonSql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"(($a >> $i) & 1) * ${1L << (2 * i + 1)}",
        s"(($b >> $i) & 1) * ${1L << (2 * i)}")
    }.mkString(" + ")

  val defs: Seq[QueryDef] = Seq(

    // ---- z-order clustering key ------------------------------------------
    // Cluster `orders` on (customer, order-day): 8 low bits of each,
    // interleaved to a 16-bit Morton key, then summarized per 64-key
    // block (the "file" a writer would cut). The summary's tight per-block
    // min/max on BOTH dimensions is exactly the data-skipping property
    // z-ordering buys.
    QueryDef.sql(
      "q88_zorder_key",
      s"""WITH k AS (
         |  SELECT o_orderkey,
         |    o_custkey & 255 AS a,
         |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) & 255 AS b
         |  FROM orders),
         |z AS (SELECT o_orderkey, a, b, ${mortonSql("a", "b", 8)} AS zkey FROM k)
         |SELECT zkey // 64 AS zblock, COUNT(*) AS n,
         |  MIN(a) AS a_lo, MAX(a) AS a_hi, MIN(b) AS b_lo, MAX(b) AS b_hi
         |FROM z GROUP BY 1 ORDER BY 1""") { (s, d) =>
      val day = datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          col("o_custkey").bitwiseAND(lit(255L)).as("a"),
          day.cast("long").bitwiseAND(lit(255L)).as("b"))
        .withColumn("zkey", morton(col("a"), col("b"), 8))
        .groupBy((col("zkey") - col("zkey") % 64).divide(64).cast("long").as("zblock"))
        .agg(count(lit(1)).as("n"),
          min(col("a")).as("a_lo"), max(col("a")).as("a_hi"),
          min(col("b")).as("b_lo"), max(col("b")).as("b_hi"))
        .orderBy("zblock")
    },

    // ---- exact global deciles via two-pass numbering ---------------------
    // Decile stats over the EXACT global (o_totalprice, o_orderkey) order.
    // The naive ntile(10) is a partition-less window — a single-task sort
    // of the whole table. Here the global rank comes from
    // GlobalRowNumber.byKeyOrder (range-bucket, count, offset — every
    // sort is per-bucket), and the decile is integer math on the rank.
    // The composite sort key packs exact cents and the unique order key
    // into one long, so ties are impossible (valid while cents < ~9e5
    // and o_orderkey < 1e10; both hold at TPC-H SF ≤ ~700).
    QueryDef.sql(
      "q93_global_deciles",
      """WITH r AS (
        |  SELECT o_totalprice,
        |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
        |    COUNT(*) OVER () AS n
        |  FROM orders)
        |SELECT ((rn - 1) * 10) // n AS decile, COUNT(*) AS n_orders,
        |  MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
        |FROM r GROUP BY 1 ORDER BY 1""") { (s, d) =>
      val orders = Tables.orders(s, d)
        .select(col("o_totalprice"),
          (round(col("o_totalprice") * 100).cast("long") * 10000000000L +
            col("o_orderkey")).as("pk"))
      val n = orders.count()
      val t = (col("rn") - 1) * 10
      GlobalRowNumber.byKeyOrder(orders, "pk", "rn")
        .groupBy(((t - t % n) / n).cast("long").as("decile"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"),
          Exact.dsum(col("o_totalprice"), 14, 2).as("total"))
        .orderBy("decile")
    },

    // ---- bucketed co-located join ----------------------------------------
    // orders⋈lineitem where BOTH sides were written `bucketBy(8, key)` +
    // `sortBy(key)`: the scan's hash-bucket layout satisfies the join's
    // distribution requirement, so the SortMergeJoin takes its inputs
    // straight from the parquet buckets — no Exchange below the join
    // (BucketedJoinSpec pins that plan shape). The timing INCLUDES both
    // bucketed writes: that is the once-per-ingest cost the layout buys
    // every later join with. Only the tiny 5-row priority rollup after
    // the join shuffles.
    QueryDef.sql(
      "q96_bucketed_join",
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, d) =>
      bucketedJoin(s, d)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          Exact.dsum(col("l_extendedprice"), 14, 2).as("revenue"))
        .orderBy("o_orderpriority")
    },

    // ---- file-level min/max manifest: range reads skip whole files -------
    // The table-format-lite skipping layer (FileManifest): events written
    // range-laid-out on ts_ns (repartitionByRange → files with disjoint
    // time ranges), a per-file min/max manifest built once, and a
    // mid-stream time-slice query planned THROUGH the manifest — only
    // files whose bounds intersect are ever opened (parquet row-group
    // stats prune within a file; the manifest spares the footer reads
    // and, at 100 TB, most of the listing). The slice bounds derive from
    // the table's own min/max (integer math, replayed identically by the
    // oracle); the skipped-file count and soundness edge cases (unknown
    // bounds, stale manifest) are pinned in FileManifestSpec.
    QueryDef.sql(
      "q115_manifest_skip",
      s"""WITH b AS (SELECT min(epoch_ns(ts)) AS mn, max(epoch_ns(ts)) AS mx
         |           FROM events),
         |r AS (SELECT mn + (mx - mn) // 4 AS lo, mn + (mx - mn) // 2 AS hi
         |      FROM b)
         |SELECT event_type, COUNT(*) AS n,
         |  MIN(epoch_ns(ts)) AS min_ts, MAX(epoch_ns(ts)) AS max_ts
         |FROM events, r
         |WHERE epoch_ns(ts) >= lo AND epoch_ns(ts) <= hi
         |GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest")
      val ev = Tables.events(s, d).select("event_id", "event_type", "value", "ts_ns")
      ev.repartitionByRange(8, col("ts_ns"))
        .write.mode("overwrite").parquet(dir)
      graft.sources.FileManifest.build(s, dir, Seq("ts_ns"))
      val b = ev.agg(min("ts_ns"), max("ts_ns")).head()
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      val (lo, hi) = (mn + (mx - mn) / 4, mn + (mx - mn) / 2)
      val (sliced, _, _) = graft.sources.FileManifest.readPruned(
        s, dir, "ts_ns", lit(lo), lit(hi))
      sliced.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          min("ts_ns").as("min_ts"), max("ts_ns").as("max_ts"))
        .orderBy("event_type")
    },

    // ---- 2-D manifest skipping over a z-order layout ---------------------
    // q115's multi-dimension form (FileManifest.readPrunedMulti +
    // LayoutQueries.morton): events laid out by the Morton interleave of
    // a 64-way user shard and a 64-way time bucket, manifested on BOTH,
    // and a (user-shard × time) box query planned through the manifest —
    // the z-curve gives every file tight bounds on both dimensions, so
    // the box skips at file granularity on both (ZorderManifestSpec
    // measures the skip counts; here the hash gate pins that pruned ≡
    // unpruned). The bucket arithmetic is pure integer math replayed
    // identically by the oracle: `step = span div 64 + 1` keeps every
    // product inside BIGINT (a naive `(ts-mn)*64` overflows on
    // nanosecond epochs).
    QueryDef.sql(
      "q117_manifest_2d",
      s"""WITH b AS (SELECT min(epoch_ns(ts)) AS mn, max(epoch_ns(ts)) AS mx
         |           FROM events),
         |e AS (SELECT event_id, value,
         |        user_id % 64 AS shard,
         |        (epoch_ns(ts) - mn) // ((mx - mn) // 64 + 1) AS tbucket
         |      FROM events, b)
         |SELECT tbucket, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total,
         |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
         |FROM e
         |WHERE shard >= 16 AND shard <= 31 AND tbucket >= 16 AND tbucket <= 31
         |GROUP BY tbucket ORDER BY tbucket""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest2d")
      val ev0 = Tables.events(s, d)
      val b = ev0.agg(min("ts_ns"), max("ts_ns")).head()
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      val step = (mx - mn) / 64 + 1
      // `div`, never `/`: Column `/` is double division, inexact for the
      // >2^53 nanosecond offsets this buckets (see q39b's epoch note)
      val ev = ev0.select(col("event_id"), col("value"),
        pmod(col("user_id"), lit(64)).as("shard"),
        expr(s"(ts_ns - ${mn}L) div ${step}L").as("tbucket"))
      ev.withColumn("zk", morton(col("shard"), col("tbucket"), 6))
        .repartitionByRange(16, col("zk"))
        .sortWithinPartitions("zk")
        .drop("zk")
        .write.mode("overwrite").parquet(dir)
      graft.sources.FileManifest.build(s, dir, Seq("shard", "tbucket"))
      val (box, _, _) = graft.sources.FileManifest.readPrunedMulti(s, dir,
        Seq(("shard", lit(16L), lit(31L)), ("tbucket", lit(16L), lit(31L))))
      box.groupBy("tbucket")
        .agg(count(lit(1)).as("n"), Exact.dsum(col("value"), 14, 2).as("total"),
          min("event_id").as("min_id"), max("event_id").as("max_id"))
        .orderBy("tbucket")
    },

    // ---- deterministic corpus shuffle → fixed-size training shards -------
    // The last layout step before a corpus feeds a trainer: break source
    // ordering (documents arrive grouped by crawl/source; a trainer
    // reading shards sequentially must not see 10M contiguous docs of
    // one source) and cut the permuted order into FIXED-SIZE shards.
    // The permutation is a pure hash of doc_id (multiplicative, the q60
    // family — overflow-free, RNG-free, so it survives re-runs and
    // late-arriving data), packed with the id into one collision-free
    // sort key; the global ordinal comes from GlobalRowNumber's
    // two-pass range-bucketed numbering — never a partition-less
    // window — and the shard id is integer math on it. Per-shard
    // source mixing is the observable: each 64-doc shard draws from
    // ~all sources (count_distinct pinned per shard by the gate).
    QueryDef.sql(
      "q120_shuffle_shards",
      """WITH h AS (
        |  SELECT doc_id, source, n_chars,
        |    (((doc_id % 100000) * 2654435761) % 100000) * 4294967296 + doc_id AS skey
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, n_chars,
        |    ROW_NUMBER() OVER (ORDER BY skey) AS rn
        |  FROM h)
        |SELECT (rn - 1) // 64 AS shard_id, COUNT(*) AS n_docs,
        |  COUNT(DISTINCT source) AS n_sources,
        |  CAST(SUM(n_chars) AS BIGINT) AS shard_chars,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM r GROUP BY 1 ORDER BY 1""") { (s, d) =>
      // hash in [0, 100000), packed above the id: one long key, unique
      // by construction, ordered ≡ (hash, doc_id). The pack factor
      // requires doc_id < 2^32 (~4e9 documents) — past that the id term
      // would bleed into the hash field and silently reorder, so the
      // limit is ENFORCED map-side (raise_error on the violating row,
      // zero extra scans; widen the pack factor when a corpus legally
      // crosses it)
      val packed = (col("doc_id") % 100000 * 2654435761L) % 100000 *
        4294967296L + col("doc_id")
      val keyed = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"),
          when(col("doc_id") >= 4294967296L, raise_error(concat(
            lit("q120 pack key overflow: doc_id "), col("doc_id"),
            lit(" >= 2^32 — widen the pack factor"))).cast("long"))
            .otherwise(packed).as("skey"))
      GlobalRowNumber.byKeyOrder(keyed, "skey", "rn")
        .groupBy(expr("(rn - 1) div 64").cast("long").as("shard_id"))
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(col("source")).as("n_sources"),
          sum(col("n_chars")).cast("long").as("shard_chars"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("shard_id")
    },

    // ---- TRANSPARENT manifest skipping (custom FileIndex) -----------------
    // q115's time-slice with the skipping moved BELOW the plan: the
    // caller writes a plain `.filter(range)` against
    // ManifestFileIndex.read and the index consults the _manifest
    // during file listing — the Delta/Iceberg integration point, so
    // pruning composes with joins/aggregates/AQE instead of living in a
    // bespoke reader API. ManifestFileIndexSpec measures the pruned
    // listing and the scan's numFiles; this gate pins result
    // equivalence (same oracle family as q115, independent derivation).
    QueryDef.sql(
      "q131_manifest_transparent",
      s"""WITH b AS (SELECT min(epoch_ns(ts)) AS mn, max(epoch_ns(ts)) AS mx
         |           FROM events),
         |r AS (SELECT mn + (mx - mn) // 8 AS lo, mn + 3 * ((mx - mn) // 8) AS hi
         |      FROM b)
         |SELECT event_type, COUNT(*) AS n,
         |  MIN(epoch_ns(ts)) AS min_ts, MAX(epoch_ns(ts)) AS max_ts
         |FROM events, r
         |WHERE epoch_ns(ts) >= lo AND epoch_ns(ts) <= hi
         |GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest_auto")
      val ev = Tables.events(s, d).select("event_id", "event_type", "value", "ts_ns")
      ev.repartitionByRange(8, col("ts_ns"))
        .write.mode("overwrite").parquet(dir)
      graft.sources.FileManifest.build(s, dir, Seq("ts_ns"))
      val b = ev.agg(min("ts_ns"), max("ts_ns")).head()
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      val (lo, hi) = (mn + (mx - mn) / 8, mn + 3 * ((mx - mn) / 8))
      graft.sources.ManifestFileIndex.read(s, dir)
        .filter(col("ts_ns") >= lo && col("ts_ns") <= hi) // plain filter — the index prunes
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          min("ts_ns").as("min_ts"), max("ts_ns").as("max_ts"))
        .orderBy("event_type")
    },

    // ---- clustering-preserving compaction (OPTIMIZE ZORDER shape) --------
    // The operational closer of the layout story: a streaming/incremental
    // sink leaves 64 tiny files with NO clustering (round-robin mix — a
    // manifest over them skips nothing), Staging.compactSorted rewrites
    // them as ~8 right-sized files globally RANGE-sorted on the Morton
    // key, the manifest is rebuilt as part of the repoint, and a 2-D box
    // query planned through it skips at file granularity again (q117's
    // layout, recovered from small-files residue instead of written
    // perfectly the first time). The gate pins the box query's results
    // through the compacted path against the from-source oracle — a
    // compaction that lost/duplicated rows or broke the manifest fails;
    // CompactionSpec measures the file-count drop and the before/after
    // skip asymmetry.
    QueryDef.sql(
      "q123_compact_zorder",
      s"""WITH b AS (SELECT min(epoch_ns(ts)) AS mn, max(epoch_ns(ts)) AS mx
         |           FROM events),
         |e AS (SELECT event_id, value,
         |        user_id % 64 AS shard,
         |        (epoch_ns(ts) - mn) // ((mx - mn) // 64 + 1) AS tbucket
         |      FROM events, b)
         |SELECT tbucket, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total,
         |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
         |FROM e
         |WHERE shard >= 0 AND shard <= 15 AND tbucket >= 32 AND tbucket <= 47
         |GROUP BY tbucket ORDER BY tbucket""") { (s, d) =>
      val small = QueryDef.scratch(d, "compact_in")
      val compacted = QueryDef.scratch(d, "compact_out")
      val ev0 = Tables.events(s, d)
      val b = ev0.agg(min("ts_ns"), max("ts_ns")).head()
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      val step = (mx - mn) / 64 + 1
      val ev = ev0.select(col("event_id"), col("value"),
        pmod(col("user_id"), lit(64)).as("shard"),
        expr(s"(ts_ns - ${mn}L) div ${step}L").as("tbucket"))
        .withColumn("zk", morton(col("shard"), col("tbucket"), 6))
      // the small-files residue: 64 round-robin files, clustering destroyed
      ev.repartition(64).write.mode("overwrite").parquet(small)
      val rows = ev0.count()
      Staging.compactSorted(s, small, compacted, Seq("zk"),
        targetFileRows = (rows + 7) / 8)
      graft.sources.FileManifest.build(s, compacted, Seq("shard", "tbucket"))
      val (box, _, _) = graft.sources.FileManifest.readPrunedMulti(s, compacted,
        Seq(("shard", lit(0L), lit(15L)), ("tbucket", lit(32L), lit(47L))))
      box.groupBy("tbucket")
        .agg(count(lit(1)).as("n"), Exact.dsum(col("value"), 14, 2).as("total"),
          min("event_id").as("min_id"), max("event_id").as("max_id"))
        .orderBy("tbucket")
    },

    // ---- transparent manifest over a HIVE-PARTITIONED tree ---------------
    // q131's skipping composed with directory-level partition pruning:
    // the staging tree is partitionBy(shard) with ts-ranged files INSIDE
    // every shard dir (the layout a sharded incremental writer lands,
    // landed via the write-through sink so data + manifest commit
    // together), and ONE plain `.filter(shard = 2 AND ts range)` prunes
    // on both axes in the same listFiles — Catalyst drops the other
    // shard directories, the manifest drops the non-intersecting ts
    // files within the survivor. ManifestFileIndexSpec pins each
    // layer's file count; this gate pins result equivalence against the
    // from-source oracle.
    QueryDef.sql(
      "q133_manifest_partitioned",
      s"""WITH b AS (SELECT min(epoch_ns(ts)) AS mn, max(epoch_ns(ts)) AS mx
         |           FROM events),
         |r AS (SELECT mn + (mx - mn) // 8 AS lo, mn + 3 * ((mx - mn) // 8) AS hi
         |      FROM b)
         |SELECT event_type, COUNT(*) AS n,
         |  MIN(epoch_ns(ts)) AS min_ts, MAX(epoch_ns(ts)) AS max_ts
         |FROM events, r
         |WHERE event_id % 4 = 2 AND epoch_ns(ts) >= lo AND epoch_ns(ts) <= hi
         |GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest_part")
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"), col("ts_ns"),
          pmod(col("event_id"), lit(4)).as("shard"))
      // range-cluster ts within each shard so per-file bounds are tight,
      // then land data + manifest in one write-through call
      graft.sources.FileManifest.writeThrough(
        ev.repartitionByRange(8, col("shard"), col("ts_ns")),
        dir, Seq("ts_ns"), mode = "overwrite", partitionCols = Seq("shard"))
      val b = ev.agg(min("ts_ns"), max("ts_ns")).head()
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      val (lo, hi) = (mn + (mx - mn) / 8, mn + 3 * ((mx - mn) / 8))
      graft.sources.ManifestFileIndex.read(s, dir)
        .filter(col("shard") === 2 && col("ts_ns") >= lo && col("ts_ns") <= hi)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          min("ts_ns").as("min_ts"), max("ts_ns").as("max_ts"))
        .orderBy("event_type")
    },

    // ---- incremental write-through lifecycle ------------------------------
    // The operational loop a staging table actually lives: initial land
    // + manifest in one writeThrough (overwrite), a later APPEND whose
    // refresh stats only the new files (carried entries byte-identical —
    // FileManifestSpec pins that), then a transparent range read over
    // the combined tree with zero manual rebuilds and no stale-guard
    // trip. The gate pins the combined result against the from-source
    // oracle — an append the manifest lost, a carried entry gone wrong,
    // or over-pruning across the batch boundary all fail.
    QueryDef.sql(
      "q136_manifest_writethrough",
      s"""WITH b AS (SELECT min(epoch_ns(ts)) AS mn, max(epoch_ns(ts)) AS mx
         |           FROM events),
         |r AS (SELECT mn + (mx - mn) // 8 AS lo, mn + 5 * ((mx - mn) // 8) AS hi
         |      FROM b)
         |SELECT event_type, COUNT(*) AS n,
         |  MIN(epoch_ns(ts)) AS min_ts, MAX(epoch_ns(ts)) AS max_ts
         |FROM events, r
         |WHERE epoch_ns(ts) >= lo AND epoch_ns(ts) <= hi
         |GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest_wt")
      val ev = Tables.events(s, d).select("event_id", "event_type", "value", "ts_ns")
      // initial land (overwrite resets the scratch between runs), then an
      // append batch — both through the write-through sink, both
      // ts-range-clustered so per-file bounds stay tight
      graft.sources.FileManifest.writeThrough(
        ev.filter(col("event_id") % 3 =!= 2).repartitionByRange(4, col("ts_ns")),
        dir, Seq("ts_ns"), mode = "overwrite")
      graft.sources.FileManifest.writeThrough(
        ev.filter(col("event_id") % 3 === 2).repartitionByRange(2, col("ts_ns")),
        dir, Seq("ts_ns"))
      val b = ev.agg(min("ts_ns"), max("ts_ns")).head()
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      val (lo, hi) = (mn + (mx - mn) / 8, mn + 5 * ((mx - mn) / 8))
      graft.sources.ManifestFileIndex.read(s, dir)
        .filter(col("ts_ns") >= lo && col("ts_ns") <= hi)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          min("ts_ns").as("min_ts"), max("ts_ns").as("max_ts"))
        .orderBy("event_type")
    },

    // ---- orphan-file vacuum: the remove-orphans lifecycle verb -----------
    // A crashed/raced writer leaves data files the manifest never heard
    // of: manifest READERS are immune, but a naive directory read
    // double-counts the orphans and the bytes leak forever. The gate
    // stages a write-through table, plants a rival's crashed append (two
    // files landed, no refresh), measures the naive pre-vacuum listing
    // view (inflated — n_pre counts base + orphans), vacuums under the
    // writer lock, and pins THREE things at once: the post-vacuum naive
    // read equals the manifest content exactly (orphans gone), the
    // surviving rows are untouched (min/max/count per type), and exactly
    // the two planted files died (over-deletion would change the counts;
    // under-deletion leaves n_post inflated). The orphan decision is a
    // distributed anti-join (listing × manifest paths); only doomed
    // paths reach the driver.
    QueryDef.sql(
      "q154_manifest_vacuum",
      """WITH pre AS (SELECT event_type, COUNT(*) AS n_pre FROM events GROUP BY 1),
        |post AS (SELECT event_type, COUNT(*) AS n_post,
        |           MIN(epoch_ns(ts)) AS min_ts, MAX(epoch_ns(ts)) AS max_ts
        |         FROM events WHERE event_id % 3 <> 2 GROUP BY 1)
        |SELECT p.event_type, pre.n_pre, p.n_post, p.min_ts, p.max_ts,
        |  CAST(2 AS BIGINT) AS orphans_deleted
        |FROM post p JOIN pre ON p.event_type = pre.event_type
        |ORDER BY p.event_type""") { (s, d) =>
      import s.implicits._
      val dir = QueryDef.scratch(d, "manifest_vac")
      val ev = Tables.events(s, d).select("event_id", "event_type", "value", "ts_ns")
      graft.sources.FileManifest.writeThrough(
        ev.filter(col("event_id") % 3 =!= 2).repartitionByRange(4, col("ts_ns")),
        dir, Seq("ts_ns"), mode = "overwrite")
      // the crashed rival: data lands, the manifest never covers it
      ev.filter(col("event_id") % 3 === 2).repartition(2)
        .write.mode("append").parquet(dir)
      // naive listing view BEFORE the vacuum — materialized eagerly, or
      // the lazy plan would list the tree after the files are gone
      val pre = s.read.parquet(dir).groupBy("event_type")
        .agg(count(lit(1)).as("n_pre")).as[(String, Long)].collect().toSeq
      // graceMs=0: the gate plants its orphans seconds before vacuuming
      // and every writer here goes through the locked writeThrough path
      val orphans = graft.sources.FileManifest.vacuum(s, dir, graceMs = 0L)
      s.read.parquet(dir).groupBy("event_type")
        .agg(count(lit(1)).as("n_post"),
          min("ts_ns").as("min_ts"), max("ts_ns").as("max_ts"))
        .join(broadcast(pre.toDF("event_type", "n_pre")), Seq("event_type"))
        .select(col("event_type"), col("n_pre"), col("n_post"),
          col("min_ts"), col("max_ts"),
          lit(orphans.length.toLong).as("orphans_deleted"))
        .orderBy("event_type")
    },

    // ---- versioned manifests: time-travel reads ---------------------------
    // The table-format lifecycle's last missing verb (write-through /
    // skip / compact / vacuum / TIME TRAVEL): every manifest refresh
    // retires the outgoing `_manifest` by RENAME to `_manifest_v{N}` —
    // a complete file-level snapshot that costs zero extra writes — and
    // `readAsOf(v)` plans the table exactly as it stood at version v
    // (parquet files are immutable, so the old bytes stay correct;
    // appends never invalidate them). The gate lands three versions of
    // an orders slice through the write-through sink and pins every
    // version's (count, key-sum) against the from-source oracle — a
    // snapshot that leaked a later append, dropped a file, or renamed
    // into the wrong slot fails the hash. Retention is vacuum's
    // `keepVersions`: beyond it the old manifest dir itself is reaped,
    // so an expired as-of read fails LOUD at version resolution (named
    // retained range), never as a half-missing file scan.
    QueryDef.sql(
      "q164_time_travel",
      """WITH v AS (SELECT 1 AS version UNION ALL SELECT 2 UNION ALL SELECT 3)
        |SELECT CAST(version AS BIGINT) AS version,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM v JOIN orders ON o_orderkey % 7 < version
        |GROUP BY version ORDER BY version""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest_tt")
      // version numbers are part of this gate's OUTPUT (the oracle
      // hard-codes v1..): reset the scratch table so the monotonic
      // version token (kept across overwrite rebuilds since r16 — the
      // OCC ABA fix) restarts at v1 deterministically
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val o = Tables.orders(s, d).select("o_orderkey")
      // v1: initial land (overwrite resets scratch history between runs);
      // v2, v3: appends — each writeThrough refresh retires a snapshot
      graft.sources.FileManifest.writeThrough(
        o.filter(col("o_orderkey") % 7 === 0).repartition(2),
        dir, Seq("o_orderkey"), mode = "overwrite")
      graft.sources.FileManifest.writeThrough(
        o.filter(col("o_orderkey") % 7 === 1).repartition(2), dir, Seq("o_orderkey"))
      graft.sources.FileManifest.writeThrough(
        o.filter(col("o_orderkey") % 7 === 2).repartition(2), dir, Seq("o_orderkey"))
      graft.sources.FileManifest.versions(s, dir).map { v =>
        graft.sources.FileManifest.readAsOf(s, dir, v)
          .agg(count(lit(1)).as("n_rows"), sum(col("o_orderkey")).as("key_sum"))
          .select(lit(v).as("version"), col("n_rows"), col("key_sum"))
      }.reduce(_ unionByName _)
        .orderBy("version")
    },

    // ---- range DELETE with file-level surgery (MVCC) -----------------------
    // The retention / right-to-be-forgotten verb: delete a ts window by
    // rewriting ONLY the files whose manifest bounds intersect it —
    // untouched files carry by reference (entries, stats, blooms
    // byte-for-byte), so cost is O(intersecting files) never a table
    // rewrite. Publishes as an MVCC version: the pre-delete snapshot
    // stays readable via readAsOf (this gate reads BOTH versions) until
    // vacuum retention — which is when deleted bytes actually leave
    // disk, exactly Delta's DELETE→VACUUM purge contract. The gate
    // lands a ts-range-clustered events slice, deletes the second
    // quarter of the ts span, and pins each version's (count, id-sum)
    // against the from-source oracle; DeleteRangeSpec pins the file
    // surgery itself (carried entries byte-identical, only
    // intersecting files rewritten, vacuum purge).
    QueryDef.sql(
      "q166_delete_range",
      """WITH b AS (SELECT min(epoch_ns(ts)) AS mn, max(epoch_ns(ts)) AS mx
        |           FROM events),
        |r AS (SELECT mn + (mx - mn) // 4 AS lo, mn + (mx - mn) // 2 AS hi FROM b)
        |SELECT CAST(1 AS BIGINT) AS version,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(event_id) AS BIGINT) AS id_sum
        |FROM events
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(event_id) AS BIGINT)
        |FROM events, r
        |WHERE NOT (epoch_ns(ts) >= lo AND epoch_ns(ts) <= hi)
        |ORDER BY version""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest_del")
      // version numbers are part of this gate's OUTPUT (the oracle
      // hard-codes v1..): reset the scratch table so the monotonic
      // version token (kept across overwrite rebuilds since r16 — the
      // OCC ABA fix) restarts at v1 deterministically
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val ev = Tables.events(s, d).select("event_id", "event_type", "value", "ts_ns")
      graft.sources.FileManifest.writeThrough(
        ev.repartitionByRange(4, col("ts_ns")),
        dir, Seq("ts_ns"), mode = "overwrite")
      val b = ev.agg(min("ts_ns"), max("ts_ns")).head()
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      val (lo, hi) = (mn + (mx - mn) / 4, mn + (mx - mn) / 2)
      graft.sources.FileManifest.deleteRange(
        s, dir, "ts_ns", lit(lo), lit(hi), Seq("ts_ns"))
      graft.sources.FileManifest.versions(s, dir).map { v =>
        graft.sources.FileManifest.readAsOf(s, dir, v)
          .agg(count(lit(1)).as("n_rows"), sum(col("event_id")).as("id_sum"))
          .select(lit(v).as("version"), col("n_rows"), col("id_sum"))
      }.reduce(_ unionByName _)
        .orderBy("version")
    },

    // ---- keyed MERGE with bloom-pruned file surgery (MVCC) ----------------
    // The table-format MERGE verb: an upsert batch (updates to existing
    // keys + brand-new keys) REPLACES matched rows and inserts the rest,
    // rewriting only the files whose bloom sidecar / bounds might hold a
    // matched key — the skipping stack pointed at a WRITE. Every other
    // file carries by reference (entries, stats, bloom bytes intact), so
    // a small CDC batch against a huge table costs O(touched files).
    // Publishes as an MVCC version: this gate reads BOTH the pre-merge
    // and post-merge snapshots and pins (count, key-sum, cust-sum)
    // against the from-source oracle — a lost update, a duplicated
    // matched row, a dropped insert, or a carried file that should have
    // been rewritten all move a sum. MergeKeysSpec pins the surgery
    // (bounds-deterministic single-file rewrite, byte-identical carried
    // entries, bloom-pruned variant).
    QueryDef.sql(
      "q167_merge_files",
      """WITH merged AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 997 = 0 THEN -1 ELSE o_custkey END AS o_custkey
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 900000000, -2 FROM orders WHERE o_orderkey % 4999 = 0)
        |SELECT CAST(1 AS BIGINT) AS version,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
        |FROM orders
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(o_orderkey) AS BIGINT), CAST(SUM(o_custkey) AS BIGINT)
        |FROM merged
        |ORDER BY version""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest_merge")
      // version numbers are part of this gate's OUTPUT (the oracle
      // hard-codes v1..): reset the scratch table so the monotonic
      // version token (kept across overwrite rebuilds since r16 — the
      // OCC ABA fix) restarts at v1 deterministically
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      graft.sources.FileManifest.writeThrough(
        o.repartitionByRange(4, col("o_orderkey")),
        dir, Seq("o_orderkey"), bloomCols = Seq("o_orderkey"),
        mode = "overwrite")
      val updates = o.filter(col("o_orderkey") % 997 === 0)
        .select(col("o_orderkey"), lit(-1L).as("o_custkey"))
        .unionByName(o.filter(col("o_orderkey") % 4999 === 0)
          .select((col("o_orderkey") + 900000000L).as("o_orderkey"),
            lit(-2L).as("o_custkey")))
      graft.sources.FileManifest.mergeKeys(
        s, dir, updates, "o_orderkey", Seq("o_orderkey"),
        bloomCols = Seq("o_orderkey"))
      graft.sources.FileManifest.versions(s, dir).map { v =>
        graft.sources.FileManifest.readAsOf(s, dir, v)
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_orderkey")).as("key_sum"),
            sum(col("o_custkey")).as("cust_sum"))
          .select(lit(v).as("version"), col("n_rows"),
            col("key_sum"), col("cust_sum"))
      }.reduce(_ unionByName _)
        .orderBy("version")
    },

    // ---- streaming CDC upserts into the MVCC table (q167 online) ----------
    // The online shape of the MERGE verb: upsert batches ARRIVE as a
    // file stream (3 real micro-batches, one file per trigger) and each
    // applies through mergeKeys inside foreachBatch — bloom/bounds file
    // surgery per batch, one MVCC version per commit, the q147 ingest
    // pattern with a TABLE in place of an index. Replay safety comes
    // from merge semantics itself: re-applying an upsert batch yields
    // the identical row set (replacement is keyed), so a recovered
    // stream converges to the same table whatever the retry history —
    // and batches touch DISJOINT key residues, so arrival order cannot
    // change the answer either. The gate pins the final table's
    // (count, key-sum, cust-sum) against the from-source oracle; a
    // double-applied update, a lost insert, or a carried file that
    // should have rewritten all move a sum.
    QueryDef.sql(
      "q168_stream_merge",
      """WITH merged AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 1009 = 0 THEN -1
        |         WHEN o_orderkey % 1009 = 1 THEN -2
        |         WHEN o_orderkey % 1009 = 2 THEN -3
        |         ELSE o_custkey END AS o_custkey
        |  FROM orders
        |  UNION ALL
        |  SELECT * FROM (VALUES (900000000, -100), (900000001, -101),
        |                        (900000002, -102)) v(k, c))
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
        |FROM merged""") { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      import s.implicits._
      val root = QueryDef.scratch(d, "stream_merge")
      val rootP = new org.apache.hadoop.fs.Path(root)
      val hfs = rootP.getFileSystem(s.sessionState.newHadoopConf())
      if (hfs.exists(rootP)) hfs.delete(rootP, true)
      val table = s"$root/table"
      val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      graft.sources.FileManifest.writeThrough(
        o.repartitionByRange(4, col("o_orderkey")),
        table, Seq("o_orderkey"), bloomCols = Seq("o_orderkey"),
        mode = "overwrite")
      // 3 upsert batches, one parquet file each: batch b rewrites the
      // %1009=b residue class to -(b+1) and inserts one brand-new key
      (0 until 3).foreach { b =>
        o.filter(col("o_orderkey") % 1009 === b)
          .select(col("o_orderkey"), lit(-(b + 1).toLong).as("o_custkey"))
          .unionByName(Seq((900000000L + b, -100L - b))
            .toDF("o_orderkey", "o_custkey"))
          .coalesce(1)
          .write.parquet(s"$root/arrivals/b$b")
      }
      val sch = s.read.parquet(s"$root/arrivals/b0").schema
      val q = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/arrivals/b*")
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/_ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!batch.isEmpty)
            graft.sources.FileManifest.mergeKeys(
              s, table, batch, "o_orderkey", Seq("o_orderkey"),
              bloomCols = Seq("o_orderkey"))
          ()
        }
        .start()
      q.awaitTermination()
      graft.sources.ManifestFileIndex.read(s, table)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("key_sum"),
          sum(col("o_custkey")).as("cust_sum"))
    },

    // ---- change-data-feed read: row-level diff of two MVCC versions ------
    // The incremental-consumer verb that completes the table-format set
    // (Delta table_changes, Iceberg incremental read): diff two
    // versioned manifests into inserted/deleted FILE sets — files in
    // both versions are provably unchanged (immutability) and are never
    // opened — then net row-level changes with multiset EXCEPTs so
    // carried rows a surgery rewrote byte-identically vanish. The gate
    // drives the table through a range DELETE (v2) and a keyed MERGE
    // with updates + brand-new keys (v3), then emits every change
    // v1 → v3: the oracle recomputes the identical delta from source —
    // a leaked carried row, a lost delete, a doubled update, or a
    // missed insert all change the row set. CdfSpec pins version-pair
    // selection, empty-side/append-only shapes, and the
    // vacuumed-version loud failure.
    QueryDef.sql(
      "q169_change_feed",
      """WITH b AS (SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx FROM orders),
        |r AS (SELECT mn + (mx - mn) // 10 AS lo,
        |             mn + 2 * ((mx - mn) // 10) AS hi FROM b),
        |del AS (SELECT o_orderkey, o_custkey FROM orders, r
        |        WHERE o_orderkey >= lo AND o_orderkey <= hi),
        |surv AS (SELECT o_orderkey, o_custkey FROM orders, r
        |         WHERE NOT (o_orderkey >= lo AND o_orderkey <= hi)),
        |upd AS (SELECT o_orderkey FROM surv WHERE o_orderkey % 1013 = 0)
        |SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |       CAST(o_custkey AS BIGINT) AS o_custkey,
        |       'delete' AS change_type FROM del
        |UNION ALL
        |SELECT CAST(s.o_orderkey AS BIGINT), CAST(s.o_custkey AS BIGINT), 'delete'
        |  FROM surv s JOIN upd ON s.o_orderkey = upd.o_orderkey
        |UNION ALL
        |SELECT CAST(o_orderkey AS BIGINT), CAST(-5 AS BIGINT), 'insert' FROM upd
        |UNION ALL
        |SELECT CAST(o_orderkey + 800000000 AS BIGINT), CAST(-9 AS BIGINT), 'insert'
        |  FROM surv WHERE o_orderkey % 4999 = 0
        |ORDER BY change_type, o_orderkey, o_custkey""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest_cdf")
      // version numbers are part of this gate's OUTPUT (the oracle
      // hard-codes v1..): reset the scratch table so the monotonic
      // version token (kept across overwrite rebuilds since r16 — the
      // OCC ABA fix) restarts at v1 deterministically
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val o = Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"))
      graft.sources.FileManifest.writeThrough(
        o.repartitionByRange(4, col("o_orderkey")),
        dir, Seq("o_orderkey"), bloomCols = Seq("o_orderkey"),
        mode = "overwrite")
      val b = o.agg(min("o_orderkey"), max("o_orderkey")).head()
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      val (lo, hi) = (mn + (mx - mn) / 10, mn + 2 * ((mx - mn) / 10))
      graft.sources.FileManifest.deleteRange(
        s, dir, "o_orderkey", lit(lo), lit(hi), Seq("o_orderkey"),
        bloomCols = Seq("o_orderkey"))
      val surv = o.filter(!(col("o_orderkey") >= lo && col("o_orderkey") <= hi))
      val updates = surv.filter(col("o_orderkey") % 1013 === 0)
        .select(col("o_orderkey"), lit(-5L).as("o_custkey"))
        .unionByName(surv.filter(col("o_orderkey") % 4999 === 0)
          .select((col("o_orderkey") + 800000000L).as("o_orderkey"),
            lit(-9L).as("o_custkey")))
      graft.sources.FileManifest.mergeKeys(
        s, dir, updates, "o_orderkey", Seq("o_orderkey"),
        bloomCols = Seq("o_orderkey"))
      graft.sources.FileManifest.changesBetween(s, dir, 1L, 3L)
        .orderBy("change_type", "o_orderkey", "o_custkey")
    },

    // ---- incremental view maintenance from the change feed ---------------
    // WHY a change feed exists: a downstream aggregate (the materialized
    // view every reporting/training-mix pipeline keeps) updates from the
    // row-level delta WITHOUT re-reading the table — inserts contribute
    // +1/+value, deletes −1/−value, groups netting to zero drop. Cost is
    // O(view + delta) however large the table grew; the recompute the
    // delta replaces is O(table). The gate materializes the view at v1,
    // drives the same delete+merge as q169, applies changesBetween(1,3)
    // as signed increments, and hash-gates the maintained view against
    // the oracle's from-scratch aggregate of the FINAL state — any
    // leaked carried row, sign error, or undropped empty group moves a
    // sum. (Exact integer arithmetic end-to-end: counts and key sums.)
    QueryDef.sql(
      "q170_incremental_view",
      """WITH b AS (SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx FROM orders),
        |r AS (SELECT mn + (mx - mn) // 10 AS lo,
        |             mn + 2 * ((mx - mn) // 10) AS hi FROM b),
        |surv AS (SELECT o_orderkey, o_custkey FROM orders, r
        |         WHERE NOT (o_orderkey >= lo AND o_orderkey <= hi)),
        |final AS (
        |  SELECT o_orderkey, o_custkey FROM surv WHERE o_orderkey % 1013 <> 0
        |  UNION ALL
        |  SELECT o_orderkey, -5 FROM surv WHERE o_orderkey % 1013 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 800000000, -9 FROM surv WHERE o_orderkey % 4999 = 0)
        |SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM final GROUP BY o_custkey ORDER BY o_custkey""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest_ivm")
      // version numbers are part of this gate's OUTPUT (the oracle
      // hard-codes v1..): reset the scratch table so the monotonic
      // version token (kept across overwrite rebuilds since r16 — the
      // OCC ABA fix) restarts at v1 deterministically
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val o = Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"))
      graft.sources.FileManifest.writeThrough(
        o.repartitionByRange(4, col("o_orderkey")),
        dir, Seq("o_orderkey"), bloomCols = Seq("o_orderkey"),
        mode = "overwrite")
      // the view, materialized ONCE at v1
      val mv1 = graft.sources.FileManifest.readAsOf(s, dir, 1L)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_sum"))
        .transform(graft.Materialize.checkpoint)
      val b = o.agg(min("o_orderkey"), max("o_orderkey")).head()
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      val (lo, hi) = (mn + (mx - mn) / 10, mn + 2 * ((mx - mn) / 10))
      graft.sources.FileManifest.deleteRange(
        s, dir, "o_orderkey", lit(lo), lit(hi), Seq("o_orderkey"),
        bloomCols = Seq("o_orderkey"))
      val surv = o.filter(!(col("o_orderkey") >= lo && col("o_orderkey") <= hi))
      val updates = surv.filter(col("o_orderkey") % 1013 === 0)
        .select(col("o_orderkey"), lit(-5L).as("o_custkey"))
        .unionByName(surv.filter(col("o_orderkey") % 4999 === 0)
          .select((col("o_orderkey") + 800000000L).as("o_orderkey"),
            lit(-9L).as("o_custkey")))
      graft.sources.FileManifest.mergeKeys(
        s, dir, updates, "o_orderkey", Seq("o_orderkey"),
        bloomCols = Seq("o_orderkey"))
      // maintenance: the view never re-reads the table — only the delta
      val delta = graft.sources.FileManifest.changesBetween(s, dir, 1L, 3L)
        .select(col("o_custkey"),
          when(col("change_type") === "insert", lit(1L))
            .otherwise(lit(-1L)).as("sgn"),
          col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum("sgn").as("n"),
          sum(col("sgn") * col("o_orderkey")).as("key_sum"))
      mv1.unionByName(delta)
        .groupBy("o_custkey")
        .agg(sum("n").as("n"), sum("key_sum").as("key_sum"))
        .filter(col("n") > 0)
        .orderBy("o_custkey")
    },

    // ---- the full online loop: CDC in → MVCC commit → CDF out → view -----
    // q168 (streaming upserts) composed with q170 (incremental view
    // maintenance), the production serving topology: upsert batches
    // arrive as a file stream, each commits through mergeKeys as one
    // MVCC version, and the SAME foreachBatch turns the commit's change
    // feed into signed increments on a downstream grouped view — the
    // table is never re-read. View snapshots are keyed BY TABLE VERSION
    // (mv/v{N}), which makes replay correct for free: a recovered batch
    // re-merges idempotently (keyed replacement), its changesBetween
    // nets to EMPTY (the rewritten files carry identical rows), and the
    // chain extends with a no-op snapshot that already holds the batch's
    // effect — no batch-id bookkeeping in the view itself. The gate pins
    // the final view (count + key-sum per customer) against the oracle's
    // from-scratch aggregate of the fully-merged state; CdfSpec pins the
    // empty-netting replay property directly.
    QueryDef.sql(
      "q171_stream_view_maintenance",
      """WITH b AS (SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx
        |           FROM orders),
        |m AS (SELECT o_orderkey,
        |        CASE WHEN o_orderkey % 997 = 0
        |             THEN -1 - (((o_orderkey - mn) * 3) // (mx - mn + 1))
        |             ELSE o_custkey END AS o_custkey
        |      FROM orders, b),
        |merged AS (SELECT * FROM m
        |  UNION ALL
        |  SELECT * FROM (VALUES (900000000, -100), (900000001, -101),
        |                        (900000002, -102)) v(k, c))
        |SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM merged GROUP BY o_custkey ORDER BY o_custkey""") { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      import s.implicits._
      val root = QueryDef.scratch(d, "stream_ivm")
      val rootP = new org.apache.hadoop.fs.Path(root)
      val hfs = rootP.getFileSystem(s.sessionState.newHadoopConf())
      if (hfs.exists(rootP)) hfs.delete(rootP, true)
      val table = s"$root/table"
      val o = Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"))
      graft.sources.FileManifest.writeThrough(
        o.repartitionByRange(4, col("o_orderkey")),
        table, Seq("o_orderkey"), bloomCols = Seq("o_orderkey"),
        mode = "overwrite")
      // the view at v1 — the last time the table itself is aggregated
      graft.sources.FileManifest.readAsOf(s, table, 1L)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_sum"))
        .write.mode("overwrite").parquet(s"$root/mv/v1")
      // RANGE-CLUSTERED CDC (vs q168's residue-spread worst case, where
      // every batch touches every file): batch b updates the %997 keys of
      // the b-th THIRD of the key range + one brand-new key, so the
      // bloom/bounds skipping stack actually bites per commit and the
      // change feed stays O(touched files) — the shape a partitioned
      // upstream (per-region/per-day CDC) delivers.
      val bnd = o.agg(min("o_orderkey"), max("o_orderkey")).head()
      val (mnK, mxK) = (bnd.getLong(0), bnd.getLong(1))
      val spanK = mxK - mnK + 1
      (0 until 3).foreach { b =>
        o.filter(col("o_orderkey") % 997 === 0 &&
            expr(s"((o_orderkey - $mnK) * 3) div $spanK") === b)
          .select(col("o_orderkey"), lit(-(b + 1).toLong).as("o_custkey"))
          .unionByName(Seq((900000000L + b, -100L - b))
            .toDF("o_orderkey", "o_custkey"))
          .coalesce(1)
          .write.parquet(s"$root/arrivals/b$b")
      }
      val sch = s.read.parquet(s"$root/arrivals/b0").schema
      val q = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/arrivals/b*")
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/_ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            val vBefore = graft.sources.FileManifest.versions(s, table).max
            graft.sources.FileManifest.mergeKeys(
              s, table, batch, "o_orderkey", Seq("o_orderkey"),
              bloomCols = Seq("o_orderkey"))
            val vAfter = graft.sources.FileManifest.versions(s, table).max
            val delta = graft.sources.FileManifest
              .changesBetween(s, table, vBefore, vAfter)
              .select(col("o_custkey"),
                when(col("change_type") === "insert", lit(1L))
                  .otherwise(lit(-1L)).as("sgn"),
                col("o_orderkey"))
              .groupBy("o_custkey")
              .agg(sum("sgn").as("n"),
                sum(col("sgn") * col("o_orderkey")).as("key_sum"))
            s.read.parquet(s"$root/mv/v$vBefore")
              .unionByName(delta)
              .groupBy("o_custkey")
              .agg(sum("n").as("n"), sum("key_sum").as("key_sum"))
              .filter(col("n") > 0)
              .write.mode("overwrite").parquet(s"$root/mv/v$vAfter")
            // snapshots otherwise accumulate one dir per commit forever;
            // replay only ever re-reads v(before) — keep=3 is ample
            graft.sources.ChangeFeedTail.pruneSnapshots(
              s, s"$root/mv", "v", keep = 3)
          }
          ()
        }
        .start()
      q.awaitTermination()
      val vFinal = graft.sources.FileManifest.versions(s, table).max
      s.read.parquet(s"$root/mv/v$vFinal").orderBy("o_custkey")
    },

    // ---- pruned time travel: a FILTERED as-of read skips files ------------
    // The common audit query — "yesterday's slice of one key range" —
    // must not open the whole historical snapshot. readAsOf plans
    // through a version-pinned ManifestFileIndex, so the retained
    // manifest's bounds/bloom stats prune the as-of listing exactly like
    // a current read: on the range-clustered v1 below, the [15%, 25%]
    // probe opens ~1-2 of 8 files (AsOfPrunedSpec pins the count; this
    // gate pins the VALUES — both versions' filtered aggregates against
    // the from-source oracle, including the deleted slice still visible
    // at v1 and gone at v2).
    QueryDef.sql(
      "q172_asof_pruned_read",
      """WITH b AS (SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx FROM orders),
        |r AS (SELECT mn + (mx - mn) // 10 AS dlo,
        |             mn + 2 * ((mx - mn) // 10) AS dhi,
        |             mn + 15 * ((mx - mn) // 100) AS qlo,
        |             mn + 25 * ((mx - mn) // 100) AS qhi FROM b)
        |SELECT CAST(1 AS BIGINT) AS version,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders, r WHERE o_orderkey >= qlo AND o_orderkey <= qhi
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(o_orderkey) AS BIGINT)
        |FROM orders, r WHERE o_orderkey >= qlo AND o_orderkey <= qhi
        |  AND NOT (o_orderkey >= dlo AND o_orderkey <= dhi)
        |ORDER BY version""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest_asof_pruned")
      // version numbers are part of this gate's OUTPUT: reset scratch so
      // the monotonic version token restarts at v1 deterministically
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val o = Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("o_orderkey"))
      graft.sources.FileManifest.writeThrough(
        o.repartitionByRange(8, col("o_orderkey")),
        dir, Seq("o_orderkey"), bloomCols = Seq("o_orderkey"),
        mode = "overwrite")
      val b = o.agg(min("o_orderkey"), max("o_orderkey")).head()
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      val (dlo, dhi) = (mn + (mx - mn) / 10, mn + 2 * ((mx - mn) / 10))
      val (qlo, qhi) = (mn + 15 * ((mx - mn) / 100), mn + 25 * ((mx - mn) / 100))
      graft.sources.FileManifest.deleteRange(
        s, dir, "o_orderkey", lit(dlo), lit(dhi), Seq("o_orderkey"),
        bloomCols = Seq("o_orderkey"))
      Seq(1L, 2L).map { v =>
        graft.sources.FileManifest.readAsOf(s, dir, v)
          .filter(col("o_orderkey") >= qlo && col("o_orderkey") <= qhi)
          .agg(count(lit(1)).as("n_rows"), sum("o_orderkey").as("key_sum"))
          .select(lit(v).as("version"), col("n_rows"), col("key_sum"))
      }.reduce(_ unionByName _)
        .orderBy("version")
    },

    // ---- decoupled CDF consumer: an independent reader tails the chain ----
    // q171 maintains its view inside the WRITER's foreachBatch; the
    // production topology is a SEPARATE consumer — ChangeFeedTail — that
    // polls versions(), consumes changesBetween(cursor, head) (one feed
    // however many commits landed since the last poll), applies signed
    // deltas to its version-keyed view snapshot, and commits a durable
    // cursor. At-least-once delivery + version-keyed snapshots = replay
    // safe; snapshot retention prunes old view versions. The gate
    // interleaves writer commits with consumer polls — including one
    // poll that spans TWO commits — and pins the final view against the
    // oracle's from-scratch aggregate of the fully-merged state.
    // ChangeFeedTailSpec pins the cursor protocol itself (crash
    // recovery, retention lag, a real two-thread writer/consumer race).
    QueryDef.sql(
      "q173_cdf_tail_consumer",
      """WITH b AS (SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx
        |           FROM orders),
        |m AS (SELECT o_orderkey,
        |        CASE WHEN o_orderkey % 997 = 0
        |             THEN -21 - (((o_orderkey - mn) * 3) // (mx - mn + 1))
        |             ELSE o_custkey END AS o_custkey
        |      FROM orders, b),
        |merged AS (SELECT * FROM m
        |  UNION ALL
        |  SELECT * FROM (VALUES (910000000, -200), (910000001, -201),
        |                        (910000002, -202)) v(k, c))
        |SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM merged GROUP BY o_custkey ORDER BY o_custkey""") { (s, d) =>
      import graft.sources.{ChangeFeedTail, FileManifest}
      import s.implicits._
      val root = QueryDef.scratch(d, "cdf_tail")
      locally {
        val p = new org.apache.hadoop.fs.Path(root)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val table = s"$root/table"
      val o = Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"))
      FileManifest.writeThrough(
        o.repartitionByRange(4, col("o_orderkey")),
        table, Seq("o_orderkey"), bloomCols = Seq("o_orderkey"),
        mode = "overwrite")
      // consumer bootstrap: snapshot the view AS OF v1, cursor at 1
      FileManifest.readAsOf(s, table, 1L)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_sum"))
        .write.mode("overwrite").parquet(s"$root/mv/v1")
      ChangeFeedTail.init(s, s"$root/cursor", 1L)
      def applyDelta(feed: org.apache.spark.sql.DataFrame,
          fromV: Long, toV: Long): Unit = {
        val delta = feed.select(col("o_custkey"),
            when(col("change_type") === "insert", lit(1L))
              .otherwise(lit(-1L)).as("sgn"), col("o_orderkey"))
          .groupBy("o_custkey")
          .agg(sum("sgn").as("n"),
            sum(col("sgn") * col("o_orderkey")).as("key_sum"))
        s.read.parquet(s"$root/mv/v$fromV")
          .unionByName(delta)
          .groupBy("o_custkey")
          .agg(sum("n").as("n"), sum("key_sum").as("key_sum"))
          .filter(col("n") > 0)
          .write.mode("overwrite").parquet(s"$root/mv/v$toV")
        ChangeFeedTail.pruneSnapshots(s, s"$root/mv", "v", keep = 3)
      }
      // range-clustered CDC batches (q171's shape) committed by the
      // WRITER; the consumer is a separate poll loop over the chain
      val bnd = o.agg(min("o_orderkey"), max("o_orderkey")).head()
      val (mnK, mxK) = (bnd.getLong(0), bnd.getLong(1))
      val spanK = mxK - mnK + 1
      def commitBatch(b: Int): Unit = FileManifest.mergeKeys(
        s, table,
        o.filter(col("o_orderkey") % 997 === 0 &&
            expr(s"((o_orderkey - $mnK) * 3) div $spanK") === b)
          .select(col("o_orderkey"), lit(-21L - b).as("o_custkey"))
          .unionByName(Seq((910000000L + b, -200L - b))
            .toDF("o_orderkey", "o_custkey")),
        "o_orderkey", Seq("o_orderkey"), bloomCols = Seq("o_orderkey"))
      commitBatch(0); commitBatch(1)
      // one poll spans BOTH commits (the consumer slept through them)
      ChangeFeedTail.poll(s, table, s"$root/cursor")(applyDelta)
      commitBatch(2)
      ChangeFeedTail.drain(s, table, s"$root/cursor")(applyDelta)
      val vFinal = ChangeFeedTail.cursor(s, s"$root/cursor").get
      s.read.parquet(s"$root/mv/v$vFinal").orderBy("o_custkey")
    },

    // ---- CDF update pairing: pre/post images instead of delete+insert ----
    // q169's feed surfaces an update as delete-of-old + insert-of-new
    // with no pairing key; Delta emits update_preimage/update_postimage
    // so a consumer reconstructing per-key updates doesn't join the two
    // sides itself. changesBetweenKeyed relabels exactly the keys with
    // a one-delete/one-insert pair (any other multiplicity keeps the
    // primitive labels — no unambiguous pairing exists); the oracle
    // recomputes the same labeled delta from source: range-deleted rows
    // stay 'delete', merged-key survivors become pre/post image pairs,
    // brand-new keys stay 'insert'.
    QueryDef.sql(
      "q174_cdf_update_pairing",
      """WITH b AS (SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx FROM orders),
        |r AS (SELECT mn + (mx - mn) // 10 AS lo,
        |             mn + 2 * ((mx - mn) // 10) AS hi FROM b),
        |del AS (SELECT o_orderkey, o_custkey FROM orders, r
        |        WHERE o_orderkey >= lo AND o_orderkey <= hi),
        |surv AS (SELECT o_orderkey, o_custkey FROM orders, r
        |         WHERE NOT (o_orderkey >= lo AND o_orderkey <= hi)),
        |upd AS (SELECT o_orderkey FROM surv WHERE o_orderkey % 1013 = 0)
        |SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |       CAST(o_custkey AS BIGINT) AS o_custkey,
        |       'delete' AS change_type FROM del
        |UNION ALL
        |SELECT CAST(s.o_orderkey AS BIGINT), CAST(s.o_custkey AS BIGINT),
        |       'update_preimage'
        |  FROM surv s JOIN upd ON s.o_orderkey = upd.o_orderkey
        |UNION ALL
        |SELECT CAST(o_orderkey AS BIGINT), CAST(-5 AS BIGINT),
        |       'update_postimage' FROM upd
        |UNION ALL
        |SELECT CAST(o_orderkey + 800000000 AS BIGINT), CAST(-9 AS BIGINT), 'insert'
        |  FROM surv WHERE o_orderkey % 4999 = 0
        |ORDER BY change_type, o_orderkey, o_custkey""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest_cdf_pair")
      // version numbers are part of this gate's OUTPUT: reset scratch so
      // the monotonic version token restarts at v1 deterministically
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val o = Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"))
      graft.sources.FileManifest.writeThrough(
        o.repartitionByRange(4, col("o_orderkey")),
        dir, Seq("o_orderkey"), bloomCols = Seq("o_orderkey"),
        mode = "overwrite")
      val b = o.agg(min("o_orderkey"), max("o_orderkey")).head()
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      val (lo, hi) = (mn + (mx - mn) / 10, mn + 2 * ((mx - mn) / 10))
      graft.sources.FileManifest.deleteRange(
        s, dir, "o_orderkey", lit(lo), lit(hi), Seq("o_orderkey"),
        bloomCols = Seq("o_orderkey"))
      val surv = o.filter(!(col("o_orderkey") >= lo && col("o_orderkey") <= hi))
      val updates = surv.filter(col("o_orderkey") % 1013 === 0)
        .select(col("o_orderkey"), lit(-5L).as("o_custkey"))
        .unionByName(surv.filter(col("o_orderkey") % 4999 === 0)
          .select((col("o_orderkey") + 800000000L).as("o_orderkey"),
            lit(-9L).as("o_custkey")))
      graft.sources.FileManifest.mergeKeys(
        s, dir, updates, "o_orderkey", Seq("o_orderkey"),
        bloomCols = Seq("o_orderkey"))
      graft.sources.FileManifest
        .changesBetweenKeyed(s, dir, 1L, 3L, "o_orderkey")
        .orderBy("change_type", "o_orderkey", "o_custkey")
    },

    // ---- deletion vectors: row-level delete without file rewrites ---------
    // q175 is the DELETION-VECTOR verb (Delta deletion vectors /
    // Iceberg positional deletes): deleteRangeDV marks matched ROW
    // POSITIONS in per-file manifest sidecars — the data files are
    // untouched, the write cost is one column-pruned scan of the
    // intersecting files plus a manifest swap, and every read path
    // anti-filters positions via the native dv_contains codegen probe.
    // At 100 TB this is the difference between "delete a sliver" =
    // metadata and "delete a sliver" = rewriting GB-sized files. The
    // gate lands a ts-clustered events slice (v1), DV-deletes a narrow
    // window (v2 — narrow so the hybrid threshold keeps it a DV, not a
    // rewrite), then purgeDv materializes the deletes (v3 — Delta's
    // REORG APPLY PURGE; reads return to the zero-overhead plan). All
    // three versions' (count, id-sum) pin against the from-source
    // oracle: v2 ≡ v3 proves the purge is lossless; DvSpec pins the
    // file-level mechanics (no rewrite, threshold split, resurrection
    // guards).
    QueryDef.sql(
      "q175_dv_delete",
      """WITH b AS (SELECT min(epoch_ns(ts)) AS mn, max(epoch_ns(ts)) AS mx
        |           FROM events),
        |r AS (SELECT mn + (mx - mn) // 4 AS lo,
        |             mn + (mx - mn) // 4 + (mx - mn) // 16 AS hi FROM b)
        |SELECT CAST(1 AS BIGINT) AS version,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(event_id) AS BIGINT) AS id_sum
        |FROM events
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(event_id) AS BIGINT)
        |FROM events, r
        |WHERE NOT (epoch_ns(ts) >= lo AND epoch_ns(ts) <= hi)
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(event_id) AS BIGINT)
        |FROM events, r
        |WHERE NOT (epoch_ns(ts) >= lo AND epoch_ns(ts) <= hi)
        |ORDER BY version""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest_dv")
      // version numbers are part of this gate's OUTPUT: reset scratch so
      // the monotonic version token restarts at v1 deterministically
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val ev = Tables.events(s, d).select("event_id", "event_type", "value", "ts_ns")
      graft.sources.FileManifest.writeThrough(
        ev.repartitionByRange(4, col("ts_ns")),
        dir, Seq("ts_ns"), mode = "overwrite")
      val b = ev.agg(min("ts_ns"), max("ts_ns")).head()
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      val (lo, hi) = (mn + (mx - mn) / 4, mn + (mx - mn) / 4 + (mx - mn) / 16)
      graft.sources.FileManifest.deleteRangeDV(
        s, dir, "ts_ns", lit(lo), lit(hi), Seq("ts_ns"))
      graft.sources.FileManifest.purgeDv(s, dir, Seq("ts_ns"))
      graft.sources.FileManifest.versions(s, dir).map { v =>
        graft.sources.FileManifest.readAsOf(s, dir, v)
          .agg(count(lit(1)).as("n_rows"), sum(col("event_id")).as("id_sum"))
          .select(lit(v).as("version"), col("n_rows"), col("id_sum"))
      }.reduce(_ unionByName _)
        .orderBy("version")
    },

    // q176 is the CHANGE FEED over deletion-vector versions: a DV
    // delete changes a file's LIVE rows without touching its bytes, so
    // file identity in changesBetween's provably-unchanged rule extends
    // to (path, dv) — a dv-changed file is read on both sides, each
    // under its own version's vector, and the signed net emits exactly
    // the newly-dead rows as deletes. The purge span (v2→v3) rewrites
    // files but changes no logical row: the feed must net to ZERO —
    // physical reorganization is invisible to CDC consumers, the same
    // contract q165 pins for compaction.
    QueryDef.sql(
      "q176_dv_cdf",
      """WITH b AS (SELECT min(epoch_ns(ts)) AS mn, max(epoch_ns(ts)) AS mx
        |           FROM events),
        |r AS (SELECT mn + (mx - mn) // 4 AS lo,
        |             mn + (mx - mn) // 4 + (mx - mn) // 16 AS hi FROM b)
        |SELECT CAST(12 AS BIGINT) AS span,
        |  CAST(COUNT(*) AS BIGINT) AS n_deletes,
        |  CAST(0 AS BIGINT) AS n_inserts,
        |  CAST(SUM(event_id) AS BIGINT) AS id_sum
        |FROM events, r
        |WHERE epoch_ns(ts) >= lo AND epoch_ns(ts) <= hi
        |UNION ALL
        |SELECT CAST(23 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |  CAST(NULL AS BIGINT)
        |ORDER BY span""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest_dv_cdf")
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val ev = Tables.events(s, d).select("event_id", "event_type", "value", "ts_ns")
      graft.sources.FileManifest.writeThrough(
        ev.repartitionByRange(4, col("ts_ns")),
        dir, Seq("ts_ns"), mode = "overwrite")
      val b = ev.agg(min("ts_ns"), max("ts_ns")).head()
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      val (lo, hi) = (mn + (mx - mn) / 4, mn + (mx - mn) / 4 + (mx - mn) / 16)
      graft.sources.FileManifest.deleteRangeDV(
        s, dir, "ts_ns", lit(lo), lit(hi), Seq("ts_ns"))
      graft.sources.FileManifest.purgeDv(s, dir, Seq("ts_ns"))
      def spanAgg(tag: Long, fromV: Long, toV: Long) =
        graft.sources.FileManifest.changesBetween(s, dir, fromV, toV)
          .agg(
            sum(when(col("change_type") === "delete", 1L).otherwise(0L))
              .as("_nd"),
            sum(when(col("change_type") === "insert", 1L).otherwise(0L))
              .as("_ni"),
            sum(col("event_id")).as("id_sum"))
          .select(lit(tag).as("span"),
            coalesce(col("_nd"), lit(0L)).as("n_deletes"),
            coalesce(col("_ni"), lit(0L)).as("n_inserts"),
            col("id_sum"))
      spanAgg(12L, 1L, 2L).unionByName(spanAgg(23L, 2L, 3L)).orderBy("span")
    },

    // q177 is the KEYED DV DELETE — right-to-be-forgotten in its
    // production shape (a batch of record ids to erase, spread across
    // the whole table): deleteKeysDV plans candidates through the same
    // bounds + bloom key probes mergeKeys uses, then marks the matched
    // positions in per-file DVs — a spread erasure batch against a huge
    // table costs a column-pruned scan of only the files that might
    // hold a key, and not one data file is rewritten. The gate erases
    // every %97 order key and pins both versions' (count, key-sum)
    // against the from-source oracle; DvSpec pins the bloom-pruned
    // candidate set and the no-rewrite property.
    QueryDef.sql(
      "q177_dv_delete_keys",
      """SELECT CAST(1 AS BIGINT) AS version,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(o_orderkey) AS BIGINT)
        |FROM orders WHERE o_orderkey % 97 <> 0
        |ORDER BY version""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest_dv_keys")
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val o = Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"))
      graft.sources.FileManifest.writeThrough(
        o.repartitionByRange(8, col("o_orderkey")),
        dir, Seq("o_orderkey"), bloomCols = Seq("o_orderkey"),
        mode = "overwrite")
      val erase = o.filter(col("o_orderkey") % 97 === 0)
        .select("o_orderkey").distinct()
        .collect().map(_.getLong(0)).toSeq
      graft.sources.FileManifest.deleteKeysDV(
        s, dir, "o_orderkey", erase, Seq("o_orderkey"),
        bloomCols = Seq("o_orderkey"))
      graft.sources.FileManifest.versions(s, dir).map { v =>
        graft.sources.FileManifest.readAsOf(s, dir, v)
          .agg(count(lit(1)).as("n_rows"), sum(col("o_orderkey")).as("key_sum"))
          .select(lit(v).as("version"), col("n_rows"), col("key_sum"))
      }.reduce(_ unionByName _)
        .orderBy("version")
    },

    // q178 is MERGE-ON-READ — q167's upsert batch applied through
    // mergeKeysDV: matched keys' OLD rows are marked dead in per-file
    // deletion vectors and the whole batch appends as fresh files, so
    // the write cost is a column-pruned candidate scan + a batch-sized
    // write instead of rewriting every candidate file (the
    // copy-on-write/merge-on-read trade every production table format
    // exposes). Same oracle as q167 — the read-side contract is
    // identical; only the physical shape differs (DvSpec pins that: no
    // candidate file rewritten, the batch appended, CDF pairs the
    // update's delete-old/insert-new).
    QueryDef.sql(
      "q178_merge_on_read",
      """WITH merged AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 997 = 0 THEN -1 ELSE o_custkey END AS o_custkey
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 900000000, -2 FROM orders WHERE o_orderkey % 4999 = 0)
        |SELECT CAST(1 AS BIGINT) AS version,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
        |FROM orders
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(o_orderkey) AS BIGINT), CAST(SUM(o_custkey) AS BIGINT)
        |FROM merged
        |ORDER BY version""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest_mor")
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      graft.sources.FileManifest.writeThrough(
        o.repartitionByRange(4, col("o_orderkey")),
        dir, Seq("o_orderkey"), bloomCols = Seq("o_orderkey"),
        mode = "overwrite")
      val updates = o.filter(col("o_orderkey") % 997 === 0)
        .select(col("o_orderkey"), lit(-1L).as("o_custkey"))
        .unionByName(o.filter(col("o_orderkey") % 4999 === 0)
          .select((col("o_orderkey") + 900000000L).as("o_orderkey"),
            lit(-2L).as("o_custkey")))
      graft.sources.FileManifest.mergeKeysDV(
        s, dir, updates, "o_orderkey", Seq("o_orderkey"),
        bloomCols = Seq("o_orderkey"))
      graft.sources.FileManifest.versions(s, dir).map { v =>
        graft.sources.FileManifest.readAsOf(s, dir, v)
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_orderkey")).as("key_sum"),
            sum(col("o_custkey")).as("cust_sum"))
          .select(lit(v).as("version"), col("n_rows"),
            col("key_sum"), col("cust_sum"))
      }.reduce(_ unionByName _)
        .orderBy("version")
    },

    // q179 is SCHEMA EVOLUTION ON THE MVCC TABLE: an append lands files
    // with an ADDED column (the q111 staging contract lifted to the
    // manifest table), and a declared-target read through the manifest
    // index null-fills the column for pre-evolution files — the
    // tracked-column manifest is orthogonal to data-schema width, so
    // refresh carries old entries and stats only the new files. The
    // as-of read of v1 anchors its inferred schema on a file OF THAT
    // VERSION (the index's version-anchored inference — a
    // directory-first-footer inference would leak the evolved column
    // into history or drop it from the present).
    QueryDef.sql(
      "q179_evolved_table",
      """WITH v1 AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0),
        |v2 AS (SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 3 = 1)
        |SELECT CAST(1 AS BIGINT) AS version,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(NULL AS BIGINT) AS cust_sum
        |FROM v1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(o_orderkey) AS BIGINT), CAST(SUM(o_custkey) AS BIGINT)
        |FROM (SELECT o_orderkey, CAST(NULL AS BIGINT) AS o_custkey FROM v1
        |      UNION ALL SELECT * FROM v2)
        |ORDER BY version""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest_evolve")
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val o = Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"))
      graft.sources.FileManifest.writeThrough(
        o.filter(col("o_orderkey") % 3 === 0).select("o_orderkey")
          .repartition(2),
        dir, Seq("o_orderkey"), mode = "overwrite")
      graft.sources.FileManifest.writeThrough(
        o.filter(col("o_orderkey") % 3 === 1).repartition(2),
        dir, Seq("o_orderkey"))
      val target = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_custkey",
          org.apache.spark.sql.types.LongType)))
      val pre = graft.sources.FileManifest.readAsOf(s, dir, 1L)
        .agg(count(lit(1)).as("n_rows"), sum(col("o_orderkey")).as("key_sum"))
        .select(lit(1L).as("version"), col("n_rows"), col("key_sum"),
          lit(null).cast("long").as("cust_sum"))
      val cur = graft.sources.ManifestFileIndex
        .read(s, dir, schema = Some(target))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("key_sum"),
          sum(col("o_custkey")).as("cust_sum"))
        .select(lit(2L).as("version"), col("n_rows"),
          col("key_sum"), col("cust_sum"))
      pre.unionByName(cur).orderBy("version")
    },

    // q180 is OPTIMIZE on the MVCC table: 32 small files + a deletion
    // vector retire together into right-sized files in one publish —
    // bin-packing compaction (Delta OPTIMIZE / Iceberg rewrite_data_
    // files) that also materializes DV debt. The gate pins all three
    // versions' aggregates (v3 ≡ v2: optimize is lossless), a
    // METADATA-ONLY fastCount (Σ n_rows − Σ n_del from the manifest —
    // no data page touched; row 99 must equal the scanned count), and
    // the v2→v3 change feed netting to zero (physical reorganization
    // invisible to CDC consumers).
    QueryDef.sql(
      "q180_table_optimize",
      """WITH b AS (SELECT min(epoch_ns(ts)) AS mn, max(epoch_ns(ts)) AS mx
        |           FROM events),
        |r AS (SELECT mn + (mx - mn) // 4 AS lo,
        |             mn + (mx - mn) // 4 + (mx - mn) // 16 AS hi FROM b),
        |kept AS (SELECT event_id FROM events, r
        |         WHERE NOT (epoch_ns(ts) >= lo AND epoch_ns(ts) <= hi))
        |SELECT CAST(1 AS BIGINT) AS version,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(event_id) AS BIGINT) AS id_sum
        |FROM events
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(event_id) AS BIGINT) FROM kept
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(event_id) AS BIGINT) FROM kept
        |UNION ALL
        |SELECT CAST(99 AS BIGINT), CAST(COUNT(*) AS BIGINT), CAST(0 AS BIGINT)
        |FROM kept
        |ORDER BY version""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest_optimize")
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val ev = Tables.events(s, d).select("event_id", "event_type", "value", "ts_ns")
      graft.sources.FileManifest.writeThrough(
        ev.repartitionByRange(32, col("ts_ns")),
        dir, Seq("ts_ns"), mode = "overwrite")
      val b = ev.agg(min("ts_ns"), max("ts_ns")).head()
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      val (lo, hi) = (mn + (mx - mn) / 4, mn + (mx - mn) / 4 + (mx - mn) / 16)
      graft.sources.FileManifest.deleteRangeDV(
        s, dir, "ts_ns", lit(lo), lit(hi), Seq("ts_ns"))
      val live = graft.sources.FileManifest.fastCount(s, dir)
      graft.sources.FileManifest.optimizeTable(
        s, dir, Seq("ts_ns"), targetRowsPerFile = (live + 3) / 4)
      val versions = graft.sources.FileManifest.versions(s, dir).map { v =>
        graft.sources.FileManifest.readAsOf(s, dir, v)
          .agg(count(lit(1)).as("n_rows"), sum(col("event_id")).as("id_sum"))
          .select(lit(v).as("version"), col("n_rows"), col("id_sum"))
      }.reduce(_ unionByName _)
      val meta = graft.sources.FileManifest
        .changesBetween(s, dir, 2L, 3L)
        .agg(count(lit(1)).as("id_sum"))
        .select(lit(99L).as("version"),
          lit(graft.sources.FileManifest.fastCount(s, dir)).as("n_rows"),
          col("id_sum"))
      versions.unionByName(meta).orderBy("version")
    },

    // q181 is DESCRIBE HISTORY: every version swap stamps the VERB that
    // produced it (an empty `_op_<verb>` marker riding the manifest
    // rename — zero extra I/O), and `history()` reads the audit trail
    // back from retained manifests alone: (version, op, live rows) with
    // no data page touched. The gate drives one table through five
    // different verbs — build, refresh (append), copy-on-write delete,
    // DV delete, merge-on-read — and pins the full trail, live counts
    // included (n_rows − n_del metadata arithmetic), against the
    // from-source oracle.
    QueryDef.sql(
      "q181_history",
      """WITH b AS (SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx
        |           FROM orders),
        |s0 AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0),
        |s1 AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 1),
        |v2 AS (SELECT o_orderkey FROM s0 UNION ALL SELECT o_orderkey FROM s1),
        |v3 AS (SELECT o_orderkey FROM v2, b
        |       WHERE NOT (o_orderkey >= mn + (mx - mn) // 10
        |              AND o_orderkey <= mn + 2 * ((mx - mn) // 10))),
        |v4 AS (SELECT o_orderkey FROM v3, b
        |       WHERE NOT (o_orderkey >= mn + 3 * ((mx - mn) // 10)
        |              AND o_orderkey <= mn + 4 * ((mx - mn) // 10))),
        |ins AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 4999 = 0)
        |SELECT CAST(1 AS BIGINT) AS version, 'build' AS op,
        |  CAST((SELECT COUNT(*) FROM s0) AS BIGINT) AS n_rows
        |UNION ALL SELECT CAST(2 AS BIGINT), 'refresh',
        |  CAST((SELECT COUNT(*) FROM v2) AS BIGINT)
        |UNION ALL SELECT CAST(3 AS BIGINT), 'delete',
        |  CAST((SELECT COUNT(*) FROM v3) AS BIGINT)
        |UNION ALL SELECT CAST(4 AS BIGINT), 'dv-delete',
        |  CAST((SELECT COUNT(*) FROM v4) AS BIGINT)
        |UNION ALL SELECT CAST(5 AS BIGINT), 'merge-dv',
        |  CAST((SELECT COUNT(*) FROM v4) + (SELECT COUNT(*) FROM ins) AS BIGINT)
        |ORDER BY version""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest_history")
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").cast("long").as("o_orderkey"))
      graft.sources.FileManifest.writeThrough(
        o.filter(col("o_orderkey") % 3 === 0).repartition(2),
        dir, Seq("o_orderkey"), bloomCols = Seq("o_orderkey"),
        mode = "overwrite")
      graft.sources.FileManifest.writeThrough(
        o.filter(col("o_orderkey") % 3 === 1).repartition(2),
        dir, Seq("o_orderkey"), bloomCols = Seq("o_orderkey"))
      val b = o.agg(min("o_orderkey"), max("o_orderkey")).head()
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      graft.sources.FileManifest.deleteRange(
        s, dir, "o_orderkey",
        lit(mn + (mx - mn) / 10), lit(mn + 2 * ((mx - mn) / 10)),
        Seq("o_orderkey"), bloomCols = Seq("o_orderkey"))
      graft.sources.FileManifest.deleteRangeDV(
        s, dir, "o_orderkey",
        lit(mn + 3 * ((mx - mn) / 10)), lit(mn + 4 * ((mx - mn) / 10)),
        Seq("o_orderkey"), bloomCols = Seq("o_orderkey"))
      graft.sources.FileManifest.mergeKeysDV(
        s, dir,
        o.filter(col("o_orderkey") % 4999 === 0)
          .select((col("o_orderkey") + 800000000L).as("o_orderkey")),
        "o_orderkey", Seq("o_orderkey"), bloomCols = Seq("o_orderkey"))
      graft.sources.FileManifest.history(s, dir)
        .select("version", "op", "n_rows").orderBy("version")
    },

    // q182 is CDF ACROSS OPTIMIZE — the reorganization-aware feed
    // (Delta's dataChange=false skip): the span v1→v4 crosses a
    // full-table bin-packing OPTIMIZE (v3), and changesBetween
    // decomposes the span at the `_op_optimize` stamp so the rewritten
    // files are never opened — the feed is exactly the delete's and
    // merge's row-level changes, zero I/O for the compaction hop. The
    // oracle recomputes the identical delta from source (q169's
    // contract), so a leaked carried row from the optimize rewrite, a
    // lost delete, or a skipped-hop arithmetic error all change the row
    // set; CdfSpec pins the zero-data-I/O plan property directly.
    QueryDef.sql(
      "q182_cdf_across_optimize",
      """WITH b AS (SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx FROM orders),
        |r AS (SELECT mn + (mx - mn) // 10 AS lo,
        |             mn + 2 * ((mx - mn) // 10) AS hi FROM b),
        |del AS (SELECT o_orderkey, o_custkey FROM orders, r
        |        WHERE o_orderkey >= lo AND o_orderkey <= hi),
        |surv AS (SELECT o_orderkey, o_custkey FROM orders, r
        |         WHERE NOT (o_orderkey >= lo AND o_orderkey <= hi)),
        |upd AS (SELECT o_orderkey FROM surv WHERE o_orderkey % 1013 = 0)
        |SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |       CAST(o_custkey AS BIGINT) AS o_custkey,
        |       'delete' AS change_type FROM del
        |UNION ALL
        |SELECT CAST(s.o_orderkey AS BIGINT), CAST(s.o_custkey AS BIGINT), 'delete'
        |  FROM surv s JOIN upd ON s.o_orderkey = upd.o_orderkey
        |UNION ALL
        |SELECT CAST(o_orderkey AS BIGINT), CAST(-5 AS BIGINT), 'insert' FROM upd
        |UNION ALL
        |SELECT CAST(o_orderkey + 800000000 AS BIGINT), CAST(-9 AS BIGINT), 'insert'
        |  FROM surv WHERE o_orderkey % 4999 = 0
        |ORDER BY change_type, o_orderkey, o_custkey""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest_cdf_reorg")
      // version numbers are part of this gate's OUTPUT: reset scratch so
      // the monotonic version token restarts at v1 deterministically
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val o = Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"))
      graft.sources.FileManifest.writeThrough(
        o.repartitionByRange(4, col("o_orderkey")),
        dir, Seq("o_orderkey"), bloomCols = Seq("o_orderkey"),
        mode = "overwrite")
      val b = o.agg(min("o_orderkey"), max("o_orderkey")).head()
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      val (lo, hi) = (mn + (mx - mn) / 10, mn + 2 * ((mx - mn) / 10))
      graft.sources.FileManifest.deleteRange(
        s, dir, "o_orderkey", lit(lo), lit(hi), Seq("o_orderkey"),
        bloomCols = Seq("o_orderkey")) // v2: data change
      // v3: pure reorganization — the whole table repacks into 2 files;
      // the feed below must skip this hop entirely
      graft.sources.FileManifest.optimizeTable(
        s, dir, Seq("o_orderkey"), bloomCols = Seq("o_orderkey"),
        targetRowsPerFile =
          (graft.sources.FileManifest.fastCount(s, dir) + 1) / 2)
      val surv = o.filter(!(col("o_orderkey") >= lo && col("o_orderkey") <= hi))
      val updates = surv.filter(col("o_orderkey") % 1013 === 0)
        .select(col("o_orderkey"), lit(-5L).as("o_custkey"))
        .unionByName(surv.filter(col("o_orderkey") % 4999 === 0)
          .select((col("o_orderkey") + 800000000L).as("o_orderkey"),
            lit(-9L).as("o_custkey")))
      graft.sources.FileManifest.mergeKeys(
        s, dir, updates, "o_orderkey", Seq("o_orderkey"),
        bloomCols = Seq("o_orderkey")) // v4: data change
      graft.sources.FileManifest.changesBetween(s, dir, 1L, 4L)
        .orderBy("change_type", "o_orderkey", "o_custkey")
    },

    // q183 is STRING-KEYED surgery — the keyed verbs in the type real
    // right-to-be-forgotten batches actually carry (UUID/document-id
    // strings, not surrogate longs): a merge-on-read upsert keyed on a
    // string id (string bloom sidecars + UTF-8-ordered bounds slicing
    // plan the candidates), then a string-keyed DV erasure batch. The
    // gate pins the final table (count + string min/max per customer)
    // against the from-source oracle — a key false-negatived out of
    // its file by an ordering/encoding mismatch (the UTF-16-vs-UTF-8
    // trap StringKeySpec pins directly) leaves a stale duplicate or a
    // lost delete, and either moves a count.
    QueryDef.sql(
      "q183_string_key_surgery",
      """WITH t AS (SELECT 'k' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS ok,
        |                  CAST(o_custkey AS BIGINT) AS c, o_orderkey FROM orders),
        |m AS (SELECT ok, CASE WHEN o_orderkey % 1013 = 0 THEN -5 ELSE c END AS c,
        |             o_orderkey FROM t),
        |merged AS (SELECT ok, c, o_orderkey FROM m
        |  UNION ALL SELECT 'z_new_0', -100, 0
        |  UNION ALL SELECT 'z_new_1', -101, 0),
        |final AS (SELECT * FROM merged
        |          WHERE NOT (o_orderkey % 4999 = 0 AND o_orderkey <> 0))
        |SELECT CAST(c AS BIGINT) AS o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
        |       min(ok) AS min_ok, max(ok) AS max_ok
        |FROM final GROUP BY c ORDER BY o_custkey""") { (s, d) =>
      import s.implicits._
      val dir = QueryDef.scratch(d, "manifest_strkey")
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val o = Tables.orders(s, d).select(
        concat(lit("k"),
          lpad(col("o_orderkey").cast("string"), 12, "0")).as("ok"),
        col("o_custkey").cast("long").as("o_custkey"),
        col("o_orderkey").cast("long").as("o_orderkey"))
      graft.sources.FileManifest.writeThrough(
        o.select("ok", "o_custkey").repartitionByRange(4, col("ok")),
        dir, Seq("ok"), bloomCols = Seq("ok"), mode = "overwrite")
      val updates = o.filter(col("o_orderkey") % 1013 === 0)
        .select(col("ok"), lit(-5L).as("o_custkey"))
        .unionByName(Seq(("z_new_0", -100L), ("z_new_1", -101L))
          .toDF("ok", "o_custkey"))
      graft.sources.FileManifest.mergeKeysDV(
        s, dir, updates, "ok", Seq("ok"), bloomCols = Seq("ok"))
      val delKeys = o
        .filter(col("o_orderkey") % 4999 === 0 && col("o_orderkey") =!= 0L)
        .select("ok").collect().map(_.getString(0)).toSeq
      if (delKeys.nonEmpty)
        graft.sources.FileManifest.deleteKeysDVString(
          s, dir, "ok", delKeys, Seq("ok"), bloomCols = Seq("ok"))
      graft.sources.ManifestFileIndex.read(s, dir)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"),
          min("ok").as("min_ok"), max("ok").as("max_ok"))
        .orderBy("o_custkey")
    },

    // q184 is PARTITION-AWARE surgery: a hive-partitioned manifest
    // table takes a cross-partition range DELETE and a tree-wide
    // OPTIMIZE, each as ONE atomic manifest commit (rewrites land
    // inside their partition dirs; the partition column never flattens
    // into file data; a per-partition loop would be N commits with
    // readers seeing intermediate states — PartitionedSurgerySpec pins
    // the single-version property and the carried-by-reference split).
    // The gate pins the final per-partition aggregates against the
    // from-source oracle: a survivor row leaked into the wrong
    // partition dir, a double-encoded partition column, or a lost
    // carried file all move a count or a sum.
    QueryDef.sql(
      "q184_partitioned_surgery",
      """WITH b AS (SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx FROM orders),
        |r AS (SELECT mn + (mx - mn) // 10 AS lo,
        |             mn + 2 * ((mx - mn) // 10) AS hi FROM b),
        |f AS (SELECT o_orderkey, o_orderkey % 4 AS p FROM orders, r
        |      WHERE NOT (o_orderkey >= lo AND o_orderkey <= hi))
        |SELECT CAST(p AS BIGINT) AS p, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM f GROUP BY p ORDER BY p""") { (s, d) =>
      val dir = QueryDef.scratch(d, "manifest_partsurg")
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val o = Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        (col("o_orderkey") % 4).cast("long").as("p"))
      graft.sources.FileManifest.writeThrough(
        o.repartitionByRange(8, col("p"), col("o_orderkey")),
        dir, Seq("o_orderkey"), partitionCols = Seq("p"),
        mode = "overwrite")
      val b = o.agg(min("o_orderkey"), max("o_orderkey")).head()
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      val (lo, hi) = (mn + (mx - mn) / 10, mn + 2 * ((mx - mn) / 10))
      graft.sources.FileManifest.deleteRangePartitioned(
        s, dir, "o_orderkey", lit(lo), lit(hi), Seq("o_orderkey"))
      graft.sources.FileManifest.optimizePartitioned(
        s, dir, Seq("o_orderkey"), targetRowsPerFile = 1L << 20)
      graft.sources.ManifestFileIndex.read(s, dir)
        .groupBy(col("p").cast("long").as("p"))
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_sum"))
        .orderBy("p")
    },

    // q185 is the CONSUMER LAGGING ACROSS A NIGHTLY OPTIMIZE — the
    // motivating scenario for the reorganization-aware feed, composed
    // end-to-end: a ChangeFeedTail consumer initializes at v1, then the
    // table takes a keyed merge (v2), a full-table OPTIMIZE (v3), and a
    // second merge (v4) before its next poll. ONE poll consumes the
    // whole (1,4] gap; changesBetween decomposes it at the optimize
    // stamp, so the consumer's catch-up reads only the two merges'
    // touched files — the rewritten-everything compaction hop costs it
    // zero data I/O (CdfSpec pins the plan property; this gate pins the
    // maintained view's VALUES against the from-scratch oracle of the
    // final state, so a skipped data hop or a leaked reorg row moves a
    // sum).
    QueryDef.sql(
      "q185_cdf_tail_across_optimize",
      """WITH m AS (SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 1013 = 0 THEN -5 ELSE o_custkey END AS c
        |  FROM orders),
        |merged AS (SELECT o_orderkey, c FROM m
        |  UNION ALL
        |  SELECT * FROM (VALUES (900000000, -100), (900000001, -101),
        |                        (900000002, -102)) v(k, c))
        |SELECT CAST(c AS BIGINT) AS o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM merged GROUP BY c ORDER BY o_custkey""") { (s, d) =>
      import s.implicits._
      val root = QueryDef.scratch(d, "cdf_tail_reorg")
      locally {
        val p = new org.apache.hadoop.fs.Path(root)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val table = s"$root/table"
      val o = Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"))
      graft.sources.FileManifest.writeThrough(
        o.repartitionByRange(4, col("o_orderkey")),
        table, Seq("o_orderkey"), bloomCols = Seq("o_orderkey"),
        mode = "overwrite") // v1
      var view = graft.sources.FileManifest.readAsOf(s, table, 1L)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_sum"))
        .transform(graft.Materialize.checkpoint)
      graft.sources.ChangeFeedTail.init(s, s"$root/cursor", 1L)
      // v2: keyed merge; v3: full-table optimize (every file rewrites);
      // v4: second merge — all BEFORE the consumer's next poll
      graft.sources.FileManifest.mergeKeys(
        s, table,
        o.filter(col("o_orderkey") % 1013 === 0)
          .select(col("o_orderkey"), lit(-5L).as("o_custkey")),
        "o_orderkey", Seq("o_orderkey"), bloomCols = Seq("o_orderkey"))
      graft.sources.FileManifest.optimizeTable(
        s, table, Seq("o_orderkey"), bloomCols = Seq("o_orderkey"),
        targetRowsPerFile =
          (graft.sources.FileManifest.fastCount(s, table) + 1) / 2)
      graft.sources.FileManifest.mergeKeys(
        s, table,
        Seq((900000000L, -100L), (900000001L, -101L), (900000002L, -102L))
          .toDF("o_orderkey", "o_custkey"),
        "o_orderkey", Seq("o_orderkey"), bloomCols = Seq("o_orderkey"))
      val consumed = graft.sources.ChangeFeedTail.drain(
        s, table, s"$root/cursor") { (feed, _, _) =>
        val delta = feed.select(col("o_custkey"),
            when(col("change_type") === "insert", lit(1L))
              .otherwise(lit(-1L)).as("sgn"),
            col("o_orderkey"))
          .groupBy("o_custkey")
          .agg(sum("sgn").as("n"),
            sum(col("sgn") * col("o_orderkey")).as("key_sum"))
        view = view.unionByName(delta)
          .groupBy("o_custkey")
          .agg(sum("n").as("n"), sum("key_sum").as("key_sum"))
          .filter(col("n") > 0)
          .transform(graft.Materialize.checkpoint)
      }
      require(consumed == Seq((1L, 4L)),
        s"expected ONE poll consuming the whole (1,4] gap, got $consumed")
      view.orderBy("o_custkey")
    },

    // q186 is the GDPR workload in its PRODUCTION layout — string
    // (document-id) keys AND a hive-partitioned tree, combined: a
    // string-keyed merge-on-read upsert, then a string-keyed DV erase
    // batch, each as ONE atomic commit across all partitions
    // (PartitionedKeyedSpec pins single-version atomicity, the
    // directory-only partition encoding, and per-file bloom pruning on
    // the tree). The gate pins per-partition (count, string min/max,
    // custkey sum) against the from-source oracle: a key
    // false-negatived out of its file, an upsert routed to the wrong
    // partition dir, or a double-encoded partition column each move a
    // count or a bound.
    QueryDef.sql(
      "q186_partitioned_keyed",
      """WITH t AS (SELECT 'k' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS ok,
        |                  CAST(o_custkey AS BIGINT) AS c,
        |                  o_orderkey % 4 AS p, o_orderkey FROM orders),
        |m AS (SELECT ok, CASE WHEN o_orderkey % 1013 = 0 THEN -5 ELSE c END AS c,
        |             p, o_orderkey FROM t),
        |merged AS (SELECT ok, c, p, o_orderkey FROM m
        |  UNION ALL SELECT 'z_new_0', -100, 1, 0
        |  UNION ALL SELECT 'z_new_1', -101, 2, 0),
        |final AS (SELECT * FROM merged
        |          WHERE NOT (o_orderkey % 4999 = 0 AND o_orderkey <> 0))
        |SELECT CAST(p AS BIGINT) AS p, CAST(COUNT(*) AS BIGINT) AS n,
        |       min(ok) AS min_ok, max(ok) AS max_ok,
        |       CAST(SUM(c) AS BIGINT) AS cust_sum
        |FROM final GROUP BY p ORDER BY p""") { (s, d) =>
      import s.implicits._
      val dir = QueryDef.scratch(d, "manifest_partkey")
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val o = Tables.orders(s, d).select(
        concat(lit("k"),
          lpad(col("o_orderkey").cast("string"), 12, "0")).as("ok"),
        col("o_custkey").cast("long").as("o_custkey"),
        (col("o_orderkey") % 4).cast("long").as("p"),
        col("o_orderkey").cast("long").as("o_orderkey"))
      graft.sources.FileManifest.writeThrough(
        o.select("ok", "o_custkey", "p")
          .repartitionByRange(8, col("p"), col("ok")),
        dir, Seq("ok"), bloomCols = Seq("ok"),
        partitionCols = Seq("p"), mode = "overwrite") // v1
      val updates = o.filter(col("o_orderkey") % 1013 === 0)
        .select(col("ok"), lit(-5L).as("o_custkey"), col("p"))
        .unionByName(Seq(("z_new_0", -100L, 1L), ("z_new_1", -101L, 2L))
          .toDF("ok", "o_custkey", "p"))
      graft.sources.FileManifest.mergeKeysDVPartitioned(
        s, dir, updates, "ok", Seq("ok"), bloomCols = Seq("ok")) // v2
      val delKeys = o
        .filter(col("o_orderkey") % 4999 === 0 && col("o_orderkey") =!= 0L)
        .select("ok").collect().map(_.getString(0)).toSeq
      if (delKeys.nonEmpty)
        graft.sources.FileManifest.deleteKeysDVStringPartitioned(
          s, dir, "ok", delKeys, Seq("ok"), bloomCols = Seq("ok")) // v3
      graft.sources.ManifestFileIndex.read(s, dir)
        .groupBy(col("p").cast("long").as("p"))
        .agg(count(lit(1)).as("n"),
          min("ok").as("min_ok"), max("ok").as("max_ok"),
          sum("o_custkey").as("cust_sum"))
        .orderBy("p")
    },

    // q187 is q186's scale dimension: the UNCAPPED partitioned keyed
    // path — both batches forced past `maxCollectedKeys`, so candidate
    // planning runs global-bounds (agg-only, zero driver-resident
    // keys), the NULL/dup guards run as aggregates, and matched
    // positions / rewrite survivors run as exact key JOINS instead of
    // InSet predicates; the erase batch arrives as a DATAFRAME
    // (deleteKeysDVFramePartitioned — the query-selected GDPR sweep,
    // millions of keys at 100 TB). Same one-commit-per-verb atomicity
    // and directory-only partition encoding as q186
    // (PartitionedKeyedSpec pins parity with the capped path). The
    // gate pins per-partition (count, custkey sum, key sum): a join
    // matcher that missed a key, a candidate bound that excluded a
    // holder file, or an insert routed to the wrong dir each move one.
    QueryDef.sql(
      "q187_partitioned_keyed_uncapped",
      """WITH t AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
        |                  CAST(o_custkey AS BIGINT) AS c,
        |                  o_orderkey % 4 AS p FROM orders),
        |m AS (SELECT k, CASE WHEN k % 97 = 0 THEN -7 ELSE c END AS c, p
        |      FROM t),
        |merged AS (SELECT k, c, p FROM m
        |  UNION ALL SELECT * FROM (VALUES (900000000, -100, 0),
        |    (900000001, -101, 1), (900000002, -102, 2)) v(k, c, p)),
        |final AS (SELECT * FROM merged
        |          WHERE NOT (k % 131 = 0 AND k < 900000000))
        |SELECT CAST(p AS BIGINT) AS p, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(c) AS BIGINT) AS cust_sum,
        |       CAST(SUM(k) AS BIGINT) AS key_sum
        |FROM final GROUP BY p ORDER BY p""") { (s, d) =>
      import s.implicits._
      val dir = QueryDef.scratch(d, "manifest_partkey_uncapped")
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val h = p.getFileSystem(s.sessionState.newHadoopConf())
        if (h.exists(p)) h.delete(p, true)
      }
      val o = Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("k"),
        col("o_custkey").cast("long").as("c"),
        (col("o_orderkey") % 4).cast("long").as("p"))
      graft.sources.FileManifest.writeThrough(
        o.repartitionByRange(8, col("p"), col("k")),
        dir, Seq("k"), bloomCols = Seq("k"),
        partitionCols = Seq("p"), mode = "overwrite") // v1
      // v2: ~1/97 of the keys update + three inserts — forced PAST the
      // cap, so this merge runs the no-collect plan at any scale factor
      val updates = o.filter(col("k") % 97 === 0)
        .select(col("k"), lit(-7L).as("c"), col("p"))
        .unionByName(Seq((900000000L, -100L, 0L), (900000001L, -101L, 1L),
          (900000002L, -102L, 2L)).toDF("k", "c", "p"))
      graft.sources.FileManifest.mergeKeysDVPartitioned(
        s, dir, updates, "k", Seq("k"), bloomCols = Seq("k"),
        maxCollectedKeys = 50)
      // v3: QUERY-SELECTED erase batch as a DataFrame, also past the cap
      graft.sources.FileManifest.deleteKeysDVFramePartitioned(
        s, dir, "k", o.filter(col("k") % 131 === 0).select("k"),
        Seq("k"), bloomCols = Seq("k"), maxCollectedKeys = 50)
      graft.sources.ManifestFileIndex.read(s, dir)
        .groupBy(col("p").cast("long").as("p"))
        .agg(count(lit(1)).as("n"), sum("c").as("cust_sum"),
          sum("k").as("key_sum"))
        .orderBy("p")
    }
  )
}
