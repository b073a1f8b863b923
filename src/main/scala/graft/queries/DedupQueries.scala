package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.{Dedup, PrefixFilter}
import graft.dedup.Dedup._

/** Dedup operator coverage. The corpus is `documents` augmented with exact
  * duplicates (every 5th doc re-inserted under doc_id+100000) so dedup
  * operators have real work; both engines construct the same corpus.
  *
  * Oracle SQL for minhash/simhash is generated from the SAME constants the
  * Spark plans use ([[Dedup.Perms]], bit widths), so signatures must agree
  * bit-for-bit or the gate fails.
  */
object DedupQueries {

  private val CorpusSql =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0)"""
      .stripMargin

  private def corpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    docs.unionByName(
      docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      // the table is small on disk (one input split) but the per-row
      // signature kernels are CPU-heavy; widen only when the scan itself
      // is narrower than the machine (Tables.spread — identity at scale)
      .transform(Tables.spread(_, col("doc_id")))
  }

  /** Portable char-fold hash, DuckDB formulation (mirror of Exact.foldHash).
    * The empty-string CASE pins DuckDB's `string_split('','') = ['']` /
    * `unicode('') = -1` edge to the fold's 0 (see Exact.foldHash docs).
    */
  private def foldSql(e: String): String =
    s"CASE WHEN length($e) = 0 THEN 0 ELSE list_reduce(list_prepend(0::BIGINT, list_transform(string_split($e, ''), c -> unicode(c)::BIGINT)), (a, x) -> (a * 31 + x) % 1000000007) END"

  private val TokSql =
    "SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM corpus"

  private val ShingleSetsSql =
    """sets AS (
      |  SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
      |    THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |    ELSE [] END) AS shd
      |  FROM tok)""".stripMargin

  /** The minhash permutation array, rendered once for every oracle. */
  private lazy val PermsSql: String = Perms.map { case (a, b) =>
    s"list_min(list_transform(hs, h -> (h * $a + $b) % $P))"
  }.mkString("[", ", ", "]")

  /** The minhash CTE chain over relation `rel`: `${p}tok` → `${p}sets`
    * (distinct 3-shingles) → `${p}mh` (signatures) → `${p}bands` (LSH
    * band keys). ONE builder parameterized by (relation, prefix) so the
    * self-join pipeline (q26/q71/q72, prefix "") and the delta-vs-base
    * pipeline (q79, prefixes `b_`/`d_`) can never drift apart.
    */
  private def mhChainSql(rel: String, p: String): String =
    s"""${p}tok AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM $rel),
       |${p}sets AS (
       |  SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
       |    THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |    ELSE [] END) AS shd
       |  FROM ${p}tok),
       |${p}mh AS (
       |  SELECT doc_id, $PermsSql AS mh
       |  FROM (SELECT doc_id, list_transform(shd, s -> ${foldSql("s")}) AS hs FROM ${p}sets)),
       |${p}bands AS (
       |  ${(0 until Bands).map { b =>
            val lo = b * RowsPerBand + 1
            val hi = (b + 1) * RowsPerBand
            s"SELECT doc_id, $b AS band, array_to_string(mh[$lo:$hi], ',') AS key FROM ${p}mh"
          }.mkString("\n  UNION ALL ")})""".stripMargin

  /** The q26 LSH pipeline's CTE chain up to `pairs (d1, d2, jac)` —
    * shared verbatim by q26 and the clustering queries q71/q72 so their
    * edge sets are the identical oracle-matched relation.
    */
  private lazy val PairsCtes: String =
    s"""$CorpusSql,
       |${mhChainSql("corpus", "")},
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2
       |  FROM bands l JOIN bands r
       |    ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id),
       |est AS (
       |  SELECT d1, d2 FROM cand
       |  JOIN mh m1 ON cand.d1 = m1.doc_id
       |  JOIN mh m2 ON cand.d2 = m2.doc_id
       |  WHERE len(list_filter(range(1, ${NumPerms + 1}), i -> m1.mh[i] = m2.mh[i])) >= 6),
       |j AS (
       |  SELECT d1, d2,
       |    CAST(len(list_intersect(a.shd, b.shd)) AS DOUBLE) /
       |      (len(a.shd) + len(b.shd) - len(list_intersect(a.shd, b.shd))) AS jac
       |  FROM est JOIN sets a ON est.d1 = a.doc_id
       |           JOIN sets b ON est.d2 = b.doc_id),
       |pairs AS (SELECT d1, d2, jac FROM j WHERE jac >= 0.5)""".stripMargin

  /** Clustering CTE chain: `pairs` → recursive transitive closure →
    * `lab (doc_id, cluster_id)`. The oracle states WHAT a component is
    * (reachability fixpoint); the Spark side computes the same relation
    * with the large-star/small-star contraction — declarative spec vs
    * distributed algorithm, gate-checked equal.
    */
  private lazy val ClustersCtes: String =
    s"""$PairsCtes,
       |edges AS (SELECT d1 AS u, d2 AS v FROM pairs
       |          UNION ALL SELECT d2 AS u, d1 AS v FROM pairs),
       |reach AS (
       |  SELECT u AS src, v AS dst FROM edges
       |  UNION
       |  SELECT r.src, e.v AS dst FROM reach r JOIN edges e ON r.dst = e.u),
       |lab AS (
       |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
       |  FROM reach GROUP BY src)""".stripMargin

  /** Spark twin of the `pairs` CTE (unordered): the q26 plan minus its
    * presentation ORDER BY.
    */
  private def lshPairs(s: SparkSession, d: String): DataFrame = {
    // signatures/shingle-sets are reused by the self-join AND the
    // verification joins — materialize once (the standard LSH shape:
    // signatures are ~100× smaller than the corpus; at full scale this
    // becomes a parquet checkpoint between stages). localCheckpoint, not
    // persist(): blocks are freed by the ContextCleaner once the returned
    // plan is unreferenced, so a query lambda leaves no session-lifetime
    // cache entry behind (the geo/Geo.gridSpatialJoin contract).
    val sets = corpus(s, d)
      .select(col("doc_id"),
        Dedup.distinctShinglesUdf(col("text"), lit(3)).as("shd"))
      .transform(graft.Materialize.checkpoint)
    // fused JVM signature kernel (hash fold + 16 minima in one pass);
    // the expression pipeline allocates a fresh slot array per shingle
    val mh = sets
      .withColumn("mh", Dedup.minhashUdf(col("shd")))
    val bands = mh.select(col("doc_id"), col("mh"),
      posexplode(bandKeys(col("mh"))).as(Seq("band", "key")))
      .transform(graft.Materialize.checkpoint)
    val cand = bands.as("l")
      .join(bands.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("d1"), col("l.mh").as("mh1"),
        col("r.doc_id").as("d2"), col("r.mh").as("mh2"))
      .distinct()
    // signature-agreement prefilter: 16 long compares estimate jaccard;
    // only candidates with >= 6/16 matching slots (est ~0.38) pay the
    // exact shingle-set intersection — standard LSH verify staging
    val est = cand.filter(
      size(filter(zip_with(col("mh1"), col("mh2"), (a, b) => a === b),
        x => x)) >= 6)
      .select("d1", "d2")
    est
      .join(sets.select(col("doc_id").as("d1"), col("shd").as("shd1")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("shd").as("shd2")), "d2")
      .select(col("d1"), col("d2"), Dedup.jaccard(col("shd1"), col("shd2")).as("jac"))
      .filter(col("jac") >= 0.5)
  }

  /** Spark twin of the `lab` CTE: near-dup clusters from the LSH pairs via
    * [[graft.dedup.ConnectedComponents]].
    */
  private def dupClusters(s: SparkSession, d: String): DataFrame =
    graft.dedup.ConnectedComponents
      .run(lshPairs(s, d).select(col("d1").as("u"), col("d2").as("v")))
      .select(col("node").as("doc_id"), col("label").as("cluster_id"))

  /** PAIR-FREE clustering (q144): LSH band buckets fuse DIRECTLY into
    * connected components as star edges — each bucket member points at
    * its bucket's minimum doc_id, so a bucket of r co-banded documents
    * contributes r−1 edges where the q26/q71 pipeline materializes
    * C(r,2) candidate PAIRS before clustering. At q26's duplicate
    * density (the 100× smoke plants every original as a ~100-replica
    * near-dup cluster) pair emission is the quadratic output that kills
    * the job (README's q26 row: 313 s / growth exponent 1.87); star
    * edges grow linearly in replicas and the component contraction is
    * already O(log n) rounds.
    *
    * Semantics: components of bucket CO-OCCURRENCE — no est/jaccard
    * verification. Every verified q71 pair shares ≥1 bucket by
    * construction, so verified edges ⊆ star-closure edges and each q71
    * cluster lies entirely inside ONE q144 cluster (a guaranteed
    * coarsening — never splits a true cluster; the refinement property
    * BucketClusterSpec pins structurally). At banding's operating point
    * the false-positive rate is ~0 — on the gate corpus the two
    * labelings are bit-identical (also spec-pinned) — and a 100 TB run
    * that wants exact verification applies it WITHIN each (small) q144
    * cluster instead of across every bucket pair. Null-signature
    * documents (< 3 tokens) carry no bucket and never cluster, exactly
    * as they carry no q71 pair.
    */
  private def bucketClusters(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bands = corpus(s, d)
      .select(col("doc_id"), Dedup.minhashUdf(
        Dedup.distinctShinglesUdf(col("text"), lit(3))).as("mh"))
      .filter(col("mh").isNotNull)
      .select(col("doc_id"), posexplode(bandKeys(col("mh"))).as(Seq("band", "key")))
    // ONE shuffle on (band, key): the window min is the bucket root and
    // the star edges are emitted map-side off the same partitioning —
    // no self-join, no pair set, output linear in bucket sizes
    val edges = bands
      .withColumn("v", min(col("doc_id"))
        .over(Window.partitionBy(col("band"), col("key"))))
      .filter(col("doc_id") =!= col("v"))
      .select(col("doc_id").as("u"), col("v"))
    graft.dedup.ConnectedComponents.run(edges)
      .select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  /** q144 oracle: reachability over bucket-star edges — the same
    * declarative-fixpoint style as q71's, with `pairs` replaced by the
    * bucket→min star relation (mh[1] IS NOT NULL mirrors the Spark
    * side's null-signature exclusion: DuckDB's list_min([]) renders an
    * empty document's signature as 16 NULLs, which would otherwise band
    * on the empty key).
    */
  private lazy val BucketClustersCtes: String =
    s"""$CorpusSql,
       |${mhChainSql("corpus", "")},
       |vbands AS (
       |  SELECT b.doc_id, b.band, b.key FROM bands b
       |  JOIN mh m ON b.doc_id = m.doc_id WHERE m.mh[1] IS NOT NULL),
       |bmin AS (SELECT band, key, min(doc_id) AS root FROM vbands GROUP BY band, key),
       |star AS (
       |  SELECT b.doc_id AS u, m.root AS v
       |  FROM vbands b JOIN bmin m ON b.band = m.band AND b.key = m.key
       |  WHERE b.doc_id <> m.root),
       |edges AS (SELECT u, v FROM star UNION ALL SELECT v AS u, u AS v FROM star),
       |reach AS (
       |  SELECT u AS src, v AS dst FROM edges
       |  UNION
       |  SELECT r.src, e.v AS dst FROM reach r JOIN edges e ON r.dst = e.u),
       |lab AS (
       |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
       |  FROM reach GROUP BY src)""".stripMargin

  /** SimHash near-pair plan, shared by the 24-bit portable (q28) and
    * 64-bit production (q78) widths — only the signature kernel and the
    * band extraction differ. Hamming runs BEFORE distinct: the filter is
    * a map-side xor+popcount, so failing candidates never reach the
    * dedup shuffle, and surviving rows carry (d1, d2, ham) instead of
    * two signatures — strictly less exchanged data, same result
    * (band-duplicate pairs agree on ham, so distinct is unaffected).
    */
  private def simhashPairs(s: SparkSession, d: String,
      signature: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      bandsOf: org.apache.spark.sql.Column => Seq[org.apache.spark.sql.Column],
      maxHam: Int = 3): DataFrame = {
    val sig = corpus(s, d)
      .select(col("doc_id"), signature(col("text")).as("sh"))
      .transform(graft.Materialize.checkpoint) // both self-join sides; ContextCleaner-released
    val bands = sig.select(col("doc_id"), col("sh"),
      posexplode(array(bandsOf(col("sh")): _*)).as(Seq("band", "key")))
    bands.as("l")
      .join(bands.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("d1"), col("r.doc_id").as("d2"),
        hamming(col("l.sh"), col("r.sh")).cast("long").as("ham"))
      .filter(col("ham") <= maxHam)
      .distinct()
      .orderBy("d1", "d2")
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- exact dedup: hash-groupBy on a digest ---------------------------
    QueryDef.sql(
      "q25_dedup_exact",
      s"""WITH $CorpusSql
         |SELECT md5(text) AS h, min(doc_id) AS keeper, COUNT(*) AS n
         |FROM corpus GROUP BY 1 ORDER BY h""") { (s, d) =>
      corpus(s, d)
        .groupBy(md5(col("text").cast("binary")).as("h"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
        .orderBy("h")
    },

    // ---- MinHash + LSH banding + exact Jaccard verification --------------
    QueryDef.sql(
      "q26_minhash_lsh",
      s"""WITH $PairsCtes
         |SELECT d1, d2, jac FROM pairs ORDER BY d1, d2""") { (s, d) =>
      lshPairs(s, d).orderBy("d1", "d2")
    },

    // ---- cross-source duplication matrix (dedup ANALYTICS) ---------------
    // Which sources copy from which: every verified near-dup pair mapped
    // to its (source, source) cell — the cross-crawl contamination
    // matrix a curation team reads before deciding which feed to drop or
    // down-weight. The pair relation is q26's VERBATIM (shared
    // lshPairs), so this is a reporting aggregate over an already-gated
    // edge set: two shuffled equi-joins against the documents table
    // (corpus replica ids fold back to their original doc via % 100000)
    // and one K²-cell groupBy. NO broadcast hint on the documents side:
    // one row per document is corpus-sized, not a dim — at 100 TB it is
    // billions of rows, and a forced broadcast is a driver/executor OOM.
    // AQE still broadcasts it when it measures small. Per-pair jaccard
    // quantizes to 1e-6 BEFORE the cell sum (the q151 rule: integer
    // aggregate, order-free), mean as one double division.
    QueryDef.sql(
      "q158_dup_source_matrix",
      s"""WITH $PairsCtes,
         |s1 AS (SELECT doc_id, source FROM documents),
         |m AS (SELECT p.jac, a.source AS sa, b.source AS sb
         |      FROM pairs p JOIN s1 a ON (p.d1 % 100000) = a.doc_id
         |                   JOIN s1 b ON (p.d2 % 100000) = b.doc_id),
         |g AS (SELECT LEAST(sa, sb) AS src_a, GREATEST(sa, sb) AS src_b,
         |        CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |        CAST(SUM(CAST(FLOOR(jac * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS jac_e6
         |      FROM m GROUP BY 1, 2)
         |SELECT src_a, src_b, n_pairs, jac_e6,
         |  CAST(jac_e6 AS DOUBLE) / CAST(n_pairs AS DOUBLE) AS mean_jac_e6
         |FROM g ORDER BY src_a, src_b""") { (s, d) =>
      val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
      lshPairs(s, d)
        .join(src.select(col("doc_id").as("k1"), col("source").as("sa")),
          col("d1") % 100000 === col("k1"))
        .join(src.select(col("doc_id").as("k2"), col("source").as("sb")),
          col("d2") % 100000 === col("k2"))
        .select(least(col("sa"), col("sb")).as("src_a"),
          greatest(col("sa"), col("sb")).as("src_b"),
          floor(col("jac") * lit(1e6) + lit(0.5)).as("e6"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("n_pairs"), sum(col("e6")).as("jac_e6"))
        .select(col("src_a"), col("src_b"), col("n_pairs"), col("jac_e6"),
          (col("jac_e6").cast("double") / col("n_pairs").cast("double"))
            .as("mean_jac_e6"))
        .orderBy("src_a", "src_b")
    },

    // ---- split leakage: near-dup pairs straddling train/val/test ----------
    // Eval hygiene DISTINCT from benchmark decontamination (q67/q101):
    // a random split leaks whenever a val/test doc has a near-dup in
    // train — the eval score then measures memorization. q77's
    // production split keys on doc_id % 1000, which exact replicas
    // (+100000) share, so it is leak-free BY CONSTRUCTION for planted
    // dups; this gate deliberately splits NAIVELY (mod 100003, which
    // replicas do not share) and measures what leaks: every verified
    // q26 pair whose endpoints fall in different splits, rolled up per
    // split-pair cell with the distinct leaked-doc count. The pair
    // relation is q26's verbatim — the detector is a reporting
    // aggregate over an already-gated edge set. The split label is PURE
    // doc_id arithmetic, so it computes INLINE on each pair endpoint —
    // map-side expressions, zero joins; a corpus-cardinality split dim
    // (one row per document) would be a broadcast that grows with the
    // corpus, an OOM at 10⁹ docs for a frame that never needed to exist.
    QueryDef.sql(
      "q161_split_leakage",
      s"""WITH $PairsCtes,
         |m AS (SELECT d1, d2,
         |        CASE WHEN ((d1 % 100003) * 2654435761) % 1000 < 900 THEN 'train'
         |             WHEN ((d1 % 100003) * 2654435761) % 1000 < 950 THEN 'val'
         |             ELSE 'test' END AS s1,
         |        CASE WHEN ((d2 % 100003) * 2654435761) % 1000 < 900 THEN 'train'
         |             WHEN ((d2 % 100003) * 2654435761) % 1000 < 950 THEN 'val'
         |             ELSE 'test' END AS s2
         |      FROM pairs),
         |x AS (SELECT LEAST(s1, s2) AS split_a, GREATEST(s1, s2) AS split_b,
         |             d1, d2 FROM m WHERE s1 <> s2),
         |g AS (SELECT split_a, split_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |      FROM x GROUP BY 1, 2),
         |di AS (SELECT split_a, split_b, d1 AS doc FROM x
         |       UNION SELECT split_a, split_b, d2 AS doc FROM x),
         |dg AS (SELECT split_a, split_b,
         |         CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_docs
         |       FROM di GROUP BY 1, 2)
         |SELECT g.split_a, g.split_b, g.n_pairs, dg.n_docs
         |FROM g JOIN dg ON g.split_a = dg.split_a AND g.split_b = dg.split_b
         |ORDER BY g.split_a, g.split_b""") { (s, d) =>
      def splitOf(c: org.apache.spark.sql.Column) = {
        val h = (c % 100003 * 2654435761L) % 1000
        when(h < 900, "train").when(h < 950, "val").otherwise("test")
      }
      val m = lshPairs(s, d)
        .select(col("d1"), col("d2"),
          splitOf(col("d1")).as("s1"), splitOf(col("d2")).as("s2"))
        .filter(col("s1") =!= col("s2"))
        .select(least(col("s1"), col("s2")).as("split_a"),
          greatest(col("s1"), col("s2")).as("split_b"), col("d1"), col("d2"))
        .transform(graft.Materialize.checkpoint)
      val g = m.groupBy("split_a", "split_b").agg(count(lit(1)).as("n_pairs"))
      val dg = m.select(col("split_a"), col("split_b"), col("d1").as("doc"))
        .unionByName(m.select(col("split_a"), col("split_b"), col("d2").as("doc")))
        .distinct()
        .groupBy("split_a", "split_b").agg(count(lit(1)).as("n_docs"))
      g.join(dg, Seq("split_a", "split_b"))
        .select("split_a", "split_b", "n_pairs", "n_docs")
        .orderBy("split_a", "split_b")
    },

    // ---- PAIR-FREE dup-source matrix (q158's scale path) ------------------
    // q158 aggregates the verified pair relation directly, so its cost is
    // the TRUE pair count — quadratic in replica depth (q26's 313 s /
    // exp 1.87 at the 100× smoke). This twin never touches pairs: it
    // tallies q144's bucket clusters per source (one groupBy, linear in
    // corpus) and derives the per-cell pair counts COMBINATORIALLY —
    // C(n,2) within a source, n_a·n_b across — via a label-co-located
    // self-join of the K-row-per-cluster tally table. The oracle stays
    // PAIR-BASED (q158's relation, counts only): near-dup components are
    // complete graphs at gate density (exact replicas inherit their
    // original's buckets and jaccard), so the two formulations
    // hash-match — measured, not assumed: 139 verified pairs == 139
    // within-cluster combinations at sf0.01. A corpus where LSH
    // transitivity makes a component incomplete would split the two
    // numbers; this gate deliberately pins the regime where the cheap
    // form is exact.
    QueryDef.sql(
      "q162_dup_matrix_clustered",
      s"""WITH $PairsCtes,
         |s1 AS (SELECT doc_id, source FROM documents),
         |m AS (SELECT a.source AS sa, b.source AS sb
         |      FROM pairs p JOIN s1 a ON (p.d1 % 100000) = a.doc_id
         |                   JOIN s1 b ON (p.d2 % 100000) = b.doc_id)
         |SELECT LEAST(sa, sb) AS src_a, GREATEST(sa, sb) AS src_b,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM m GROUP BY 1, 2 ORDER BY src_a, src_b""") { (s, d) =>
      val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
      val t = bucketClusters(s, d)
        .join(src.select(col("doc_id").as("k"), col("source")),
          col("doc_id") % 100000 === col("k"))
        .groupBy("cluster_id", "source").agg(count(lit(1)).as("n"))
      val within = t.filter(col("n") >= 2)
        .select(col("source").as("src_a"), col("source").as("src_b"),
          expr("n * (n - 1) div 2").as("p"))
      val cross = t.as("a")
        .join(t.as("b"),
          col("a.cluster_id") === col("b.cluster_id") &&
            col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
          (col("a.n") * col("b.n")).as("p"))
      within.unionByName(cross)
        .groupBy("src_a", "src_b").agg(sum(col("p")).as("n_pairs"))
        .orderBy("src_a", "src_b")
    },

    // ---- PAIR-FREE split-leakage detector (q161's scale path) -------------
    // Same reroute for the leakage report: per-cluster per-split tallies
    // (split labels are inline doc_id arithmetic, the q161 rule), then
    // straddling pair counts n_a·n_b and leaked-doc counts n_a + n_b per
    // cell from the tally self-join — within a complete component every
    // a-split doc pairs with every b-split doc, so each member is an
    // endpoint of some straddling pair, and clusters partition the
    // corpus, so per-cluster doc tallies sum to the global distinct
    // count. Oracle = q161's pair-based relation verbatim.
    QueryDef.sql(
      "q163_leakage_clustered",
      s"""WITH $PairsCtes,
         |m AS (SELECT d1, d2,
         |        CASE WHEN ((d1 % 100003) * 2654435761) % 1000 < 900 THEN 'train'
         |             WHEN ((d1 % 100003) * 2654435761) % 1000 < 950 THEN 'val'
         |             ELSE 'test' END AS s1,
         |        CASE WHEN ((d2 % 100003) * 2654435761) % 1000 < 900 THEN 'train'
         |             WHEN ((d2 % 100003) * 2654435761) % 1000 < 950 THEN 'val'
         |             ELSE 'test' END AS s2
         |      FROM pairs),
         |x AS (SELECT LEAST(s1, s2) AS split_a, GREATEST(s1, s2) AS split_b,
         |             d1, d2 FROM m WHERE s1 <> s2),
         |g AS (SELECT split_a, split_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |      FROM x GROUP BY 1, 2),
         |di AS (SELECT split_a, split_b, d1 AS doc FROM x
         |       UNION SELECT split_a, split_b, d2 AS doc FROM x),
         |dg AS (SELECT split_a, split_b,
         |         CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_docs
         |       FROM di GROUP BY 1, 2)
         |SELECT g.split_a, g.split_b, g.n_pairs, dg.n_docs
         |FROM g JOIN dg ON g.split_a = dg.split_a AND g.split_b = dg.split_b
         |ORDER BY g.split_a, g.split_b""") { (s, d) =>
      val h = (col("doc_id") % 100003 * 2654435761L) % 1000
      val t = bucketClusters(s, d)
        .select(col("cluster_id"),
          when(h < 900, "train").when(h < 950, "val")
            .otherwise("test").as("split"))
        .groupBy("cluster_id", "split").agg(count(lit(1)).as("n"))
      t.as("a")
        .join(t.as("b"),
          col("a.cluster_id") === col("b.cluster_id") &&
            col("a.split") < col("b.split"))
        .select(col("a.split").as("split_a"), col("b.split").as("split_b"),
          (col("a.n") * col("b.n")).as("p"), (col("a.n") + col("b.n")).as("d"))
        .groupBy("split_a", "split_b")
        .agg(sum(col("p")).as("n_pairs"), sum(col("d")).as("n_docs"))
        .orderBy("split_a", "split_b")
    },

    // ---- SimHash signatures ----------------------------------------------
    QueryDef.sql(
      "q27_simhash", {
        val bitsSql = (0 until SimHashBits).map { b =>
          s"CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END)) >= 0 THEN ${1L << b} ELSE 0 END"
        }.mkString("\n    + ")
        // `hs IS NULL` guards NULL text explicitly: len(NULL) is NULL, the
        // CASE would fall to ELSE, and the per-bit votes (list_sum over
        // NULL → NULL ≥ 0 → NULL) would each resolve to 0 — yielding
        // sh = 0 where the Spark side yields NULL (tokens(null) → null)
        s"""WITH $CorpusSql,
           |tok AS ($TokSql),
           |tokhs AS (SELECT doc_id, list_transform(toks, t -> ${foldSql("t")}) AS hs FROM tok)
           |SELECT doc_id, CASE WHEN hs IS NULL OR len(hs) = 0 OR len(hs) > ${Dedup.SimHashMaxTokens}
           |  THEN NULL ELSE CAST($bitsSql AS BIGINT) END AS sh
           |FROM tokhs ORDER BY doc_id"""
      }) { (s, d) =>
      corpus(s, d)
        .select(col("doc_id"),
          Dedup.simhashUdf(graft.text.TextAnalysis.tokens(col("text"))).as("sh"))
        .orderBy("doc_id")
    },

    // ---- SimHash near-pair search via byte-band blocking -----------------
    QueryDef.sql(
      "q28_simhash_pairs", {
        val bitsSql = (0 until SimHashBits).map { b =>
          s"CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END)) >= 0 THEN ${1L << b} ELSE 0 END"
        }.mkString(" + ")
        val byteBandsSql = (0 until 3).map { i =>
          s"SELECT doc_id, sh, $i AS band, (sh >> ${i * 8}) & 255 AS key FROM sig"
        }.mkString("\n  UNION ALL ")
        s"""WITH $CorpusSql,
           |tok AS ($TokSql),
           |tokhs AS (SELECT doc_id, list_transform(toks, t -> ${foldSql("t")}) AS hs FROM tok),
           |sig AS (SELECT doc_id, CASE WHEN hs IS NULL OR len(hs) = 0 OR len(hs) > ${Dedup.SimHashMaxTokens}
           |  THEN NULL ELSE CAST($bitsSql AS BIGINT) END AS sh FROM tokhs),
           |bands AS (
           |  $byteBandsSql),
           |cand AS (
           |  SELECT DISTINCT l.doc_id AS d1, l.sh AS sh1, r.doc_id AS d2, r.sh AS sh2
           |  FROM bands l JOIN bands r
           |    ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id)
           |SELECT d1, d2, CAST(bit_count(xor(sh1, sh2)) AS BIGINT) AS ham
           |FROM cand WHERE bit_count(xor(sh1, sh2)) <= 3 ORDER BY d1, d2"""
      }) { (s, d) =>
      simhashPairs(s, d,
        t => Dedup.simhashUdf(graft.text.TextAnalysis.tokens(t)),
        Dedup.simhashBytes)
    },

    // ---- character-n-gram Jaccard via exact prefix filtering -------------
    // The oracle is the all-pairs ground truth; the Spark plan finds the
    // SAME pairs through PrefixFilter's equi-join candidate generation
    // (recall 1.0 by the prefix-filtering lemma — see PrefixFilter docs —
    // unlike MinHash banding, whose s-curve drops threshold-grazing
    // pairs), so no O(n²) self-join appears anywhere in the plan.
    QueryDef.sql(
      "q29_ngram_jaccard",
      """WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0),
        |g AS (SELECT doc_id,
        |        list_distinct(list_transform(range(1, length(text) - 1), i -> substr(text, i, 3))) AS gs
        |      FROM sub)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE) /
        |    (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs))) AS jac
        |FROM g a JOIN g b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE) /
        |    (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs))) >= 0.5
        |ORDER BY d1, d2""") { (s, d) =>
      val g = Tables.documents(s, d)
        .filter(col("doc_id") % 20 === 0)
        .transform(Tables.spread(_, col("doc_id"))) // gram extraction wants all cores
        .select(col("doc_id"), charNgrams(col("text")).as("gs"))
        // prefix generation and verification reuse the gram sets
        .transform(graft.Materialize.checkpoint)
      // cost-based: prefix filtering on a Zipfian alphabet, grid-blocked
      // all-pairs when the corpus alphabet is provably too small for
      // prefixes to select (the synthetic documents table: 389 distinct
      // 3-grams → every pair is a candidate anyway — see PrefixFilter)
      PrefixFilter.jaccardSelfJoinAdaptive(g, "doc_id", "gs", 0.5)
        .orderBy("d1", "d2")
    },

    // ---- near-dup clusters: pairs → connected components -----------------
    // Pairs alone don't say what to delete: A~B and B~C must land A, B, C
    // in ONE cluster even though (A, C) was never emitted. The oracle
    // declares the component as a recursive reachability fixpoint; the
    // Spark plan computes it with alternating star contraction
    // (O(log n) bounded rounds of groupBy-min + equi-join — see
    // ConnectedComponents). cluster_id = component-minimum doc_id, a
    // canonical label both engines derive independently.
    QueryDef.sql(
      "q71_dup_clusters",
      s"""WITH RECURSIVE $ClustersCtes
         |SELECT doc_id, cluster_id,
         |  CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS csize
         |FROM lab ORDER BY doc_id""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      dupClusters(s, d)
        .withColumn("csize",
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
        .orderBy("doc_id")
    },

    // ---- canonical selection: keep ONE document per dup cluster ----------
    // The dedup end-game: inside each near-dup cluster keep the longest
    // text (doc_id ascending as the tie-break), mark the rest deletable.
    // One partitioned window over the tiny cluster relation — the corpus
    // itself is only touched for a projected (doc_id, length) join.
    QueryDef.sql(
      "q72_canonical_keep",
      s"""WITH RECURSIVE $ClustersCtes,
         |scored AS (
         |  SELECT l.doc_id, l.cluster_id, CAST(length(c.text) AS BIGINT) AS tlen
         |  FROM lab l JOIN corpus c ON l.doc_id = c.doc_id),
         |r AS (
         |  SELECT doc_id, cluster_id, tlen,
         |    row_number() OVER (PARTITION BY cluster_id
         |                       ORDER BY tlen DESC, doc_id) AS rn
         |  FROM scored)
         |SELECT doc_id, cluster_id, tlen, rn = 1 AS keep
         |FROM r ORDER BY doc_id""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val tlen = corpus(s, d)
        .select(col("doc_id"), length(col("text")).cast("long").as("tlen"))
      dupClusters(s, d)
        .join(tlen, "doc_id")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("cluster_id"))
            .orderBy(col("tlen").desc, col("doc_id"))))
        .select(col("doc_id"), col("cluster_id"), col("tlen"),
          (col("rn") === 1).as("keep"))
        .orderBy("doc_id")
    },

    // ---- pair-free clustering: band buckets → star edges → components ----
    // The scale path past q26's quadratic pair emission: see
    // [[bucketClusters]]. Same presentation as q71 so the two labelings
    // diff directly; BucketClusterSpec pins equality on the gate corpus
    // and the coarsening guarantee in general.
    QueryDef.sql(
      "q144_bucket_clusters",
      s"""WITH RECURSIVE $BucketClustersCtes
         |SELECT doc_id, cluster_id,
         |  CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS csize
         |FROM lab ORDER BY doc_id""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      bucketClusters(s, d)
        .withColumn("csize",
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
        .orderBy("doc_id")
    },

    // ---- incremental dedup: new batch vs existing corpus -----------------
    // The shape that matters once the corpus is too big to re-self-join:
    // the base corpus's band index is persisted STATE; only the (small)
    // delta computes signatures and probes it with a band equi-join —
    // base never self-joins, base signatures never recompute. Per delta
    // document the verdict is admit (novel) or reject (n_dups matches,
    // best_jac). Half the delta is constructed novel on both engines.
    QueryDef.sql(
      "q79_incremental_dedup", {
        s"""WITH $CorpusSql,
           |delta AS (
           |  SELECT doc_id + 200000 AS doc_id,
           |    CASE WHEN doc_id % 40 = 27
           |      THEN 'completely novel document ' || CAST(doc_id AS VARCHAR) || ' with unique content entirely unlike anything else'
           |      ELSE text END AS text
           |  FROM documents WHERE doc_id % 20 = 7),
           |${mhChainSql("corpus", "b_")},
           |${mhChainSql("delta", "d_")},
           |cand AS (
           |  SELECT DISTINCT d.doc_id AS delta_id, b.doc_id AS base_id
           |  FROM d_bands d JOIN b_bands b ON d.band = b.band AND d.key = b.key),
           |est AS (
           |  SELECT delta_id, base_id FROM cand
           |  JOIN d_mh m1 ON cand.delta_id = m1.doc_id
           |  JOIN b_mh m2 ON cand.base_id = m2.doc_id
           |  WHERE len(list_filter(range(1, ${NumPerms + 1}), i -> m1.mh[i] = m2.mh[i])) >= 6),
           |j AS (
           |  SELECT delta_id, base_id,
           |    CAST(len(list_intersect(a.shd, b.shd)) AS DOUBLE) /
           |      (len(a.shd) + len(b.shd) - len(list_intersect(a.shd, b.shd))) AS jac
           |  FROM est JOIN d_sets a ON est.delta_id = a.doc_id
           |           JOIN b_sets b ON est.base_id = b.doc_id),
           |m AS (
           |  SELECT delta_id, COUNT(*) AS n_dups, MAX(jac) AS best_jac
           |  FROM j WHERE jac >= 0.5 GROUP BY delta_id)
           |SELECT d.doc_id AS delta_id,
           |  CAST(coalesce(m.n_dups, 0) AS BIGINT) AS n_dups,
           |  m.best_jac,
           |  m.delta_id IS NULL AS is_novel
           |FROM delta d LEFT JOIN m ON d.doc_id = m.delta_id
           |ORDER BY delta_id"""
      }) { (s, d) =>
      def sigBands(df: DataFrame): (DataFrame, DataFrame, DataFrame) = {
        val sets = df.select(col("doc_id"),
          Dedup.distinctShinglesUdf(col("text"), lit(3)).as("shd"))
          .transform(graft.Materialize.checkpoint)
        val mh = sets.select(col("doc_id"), col("shd"),
          Dedup.minhashUdf(col("shd")).as("mh")).transform(graft.Materialize.checkpoint)
        val bands = mh.select(col("doc_id"),
          posexplode(bandKeys(col("mh"))).as(Seq("band", "key")))
        (sets, mh, bands)
      }
      val delta = Tables.documents(s, d)
        .filter(col("doc_id") % 20 === 7)
        .select((col("doc_id") + 200000).as("doc_id"),
          when(col("doc_id") % 40 === 27,
            concat(lit("completely novel document "), col("doc_id").cast("string"),
              lit(" with unique content entirely unlike anything else")))
            .otherwise(col("text")).as("text"))
        .transform(Tables.spread(_, col("doc_id")))
      val (dSets, dMh, dBands) = sigBands(delta)
      val (bSets, bMh, bBands) = sigBands(corpus(s, d))
      val cand = dBands.as("l")
        .join(bBands.as("r"), col("l.band") === col("r.band") && col("l.key") === col("r.key"))
        .select(col("l.doc_id").as("delta_id"), col("r.doc_id").as("base_id"))
        .distinct()
      val est = cand
        .join(dMh.select(col("doc_id").as("delta_id"), col("mh").as("mh1")), "delta_id")
        .join(bMh.select(col("doc_id").as("base_id"), col("mh").as("mh2")), "base_id")
        .filter(size(filter(zip_with(col("mh1"), col("mh2"), (a, b) => a === b),
          x => x)) >= 6)
        .select("delta_id", "base_id")
      val matches = est
        .join(dSets.select(col("doc_id").as("delta_id"), col("shd").as("shd1")), "delta_id")
        .join(bSets.select(col("doc_id").as("base_id"), col("shd").as("shd2")), "base_id")
        .select(col("delta_id"), Dedup.jaccard(col("shd1"), col("shd2")).as("jac"))
        .filter(col("jac") >= 0.5)
        .groupBy("delta_id")
        .agg(count(lit(1)).as("n_dups"), max(col("jac")).as("best_jac"))
      delta.select(col("doc_id").as("delta_id"))
        .join(matches, Seq("delta_id"), "left")
        .select(col("delta_id"),
          coalesce(col("n_dups"), lit(0L)).as("n_dups"),
          col("best_jac"),
          col("n_dups").isNull.as("is_novel"))
        .orderBy("delta_id")
    },

    // ---- production-width simhash near-pairs -----------------------------
    // The 64-bit/16-bit-band scale variant of q28: same plan shape, 256×
    // more selective blocking keys. ScaleSmoke showed the 24-bit form's
    // byte-bands saturating on a 60k-doc corpus (quadratic candidate
    // growth inside hot buckets); this is the knob a real run turns.
    // The wrapping FNV-1a-64 multiply overflows checked BIGINT SQL, but
    // DuckDB's HUGEINT (int128) holds the full 2^64 × 2^41 product, so
    // the oracle carries the hash state as a HUGEINT in [0, 2^64):
    // multiply then reduce mod 2^64 (exact — no limb split needed since
    // the FNV prime is 41 bits), and xor via the low 16 bits only
    // (char codes < 2^16 can't touch higher bits). Signatures stay
    // unsigned HUGEINT end-to-end; hamming splits each into two 32-bit
    // BIGINT halves for xor/bit_count. Bit-for-bit with
    // [[Dedup.fnv64Jvm]]/[[Dedup.simhash64Jvm]] on BMP text — the same
    // scope as every char-fold oracle here (JVM hashes UTF-16 code
    // units, DuckDB's unicode() yields codepoints; they agree below
    // U+10000, and the testdata corpus is ASCII). The `hs IS NULL`
    // guard mirrors Spark's null-text → null-signature contract (see
    // the q27 oracle note).
    QueryDef.sql(
      "q78_simhash64_pairs", {
        // same empty-string guard as foldSql: DuckDB's string_split('','')
        // = [''] and unicode('') = -1, which would feed c = -1 into the
        // fold and drive the HUGEINT state negative — fnv64Jvm('') is the
        // untouched offset basis. TokSql never emits empty tokens today,
        // but the fold must stay self-contained for reuse on shingles.
        val fnvSql =
          "CASE WHEN length(t) = 0 THEN 14695981039346656037::HUGEINT ELSE " +
            "list_reduce(list_prepend(14695981039346656037::HUGEINT, " +
            "list_transform(string_split(t, ''), ch -> unicode(ch)::HUGEINT)), " +
            "(h, c) -> ((h - h % 65536 + xor((h % 65536)::BIGINT, c::BIGINT)::HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT) END"
        val bitsSql = (0 until 64).map { b =>
          val bit = BigInt(1) << b
          s"CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h // $bit::HUGEINT) % 2 = 1 THEN 1 ELSE -1 END)) >= 0 THEN $bit::HUGEINT ELSE 0::HUGEINT END"
        }.mkString("\n    + ")
        val bandSql = (0 until 4).map { i =>
          s"SELECT doc_id, shu, $i AS band, (shu // ${BigInt(1) << (16 * i)}::HUGEINT) % 65536 AS key FROM sig WHERE shu IS NOT NULL"
        }.mkString("\n  UNION ALL ")
        val hamSql =
          "bit_count(xor((s1 // 4294967296)::BIGINT, (s2 // 4294967296)::BIGINT))" +
            " + bit_count(xor((s1 % 4294967296)::BIGINT, (s2 % 4294967296)::BIGINT))"
        // sig/bands are referenced 4×/2× downstream; DuckDB 1.0 inlines
        // CTEs, so without MATERIALIZED the 64 bit-vote passes re-run
        // up to 8× (measured: >4 min vs 28 s at sf0.1)
        s"""WITH $CorpusSql,
           |tok AS ($TokSql),
           |tokhs AS (SELECT doc_id, list_transform(toks, t -> $fnvSql) AS hs FROM tok),
           |sig AS MATERIALIZED (SELECT doc_id, CASE WHEN hs IS NULL OR len(hs) = 0 OR len(hs) > ${Dedup.SimHashMaxTokens} THEN NULL ELSE $bitsSql END AS shu FROM tokhs),
           |bands AS MATERIALIZED (
           |  $bandSql),
           |cand AS (
           |  SELECT DISTINCT l.doc_id AS d1, l.shu AS s1, r.doc_id AS d2, r.shu AS s2
           |  FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id)
           |SELECT d1, d2, CAST($hamSql AS BIGINT) AS ham
           |FROM cand WHERE $hamSql <= 3
           |ORDER BY d1, d2"""
      }) { (s, d) =>
      simhashPairs(s, d,
        t => Dedup.simhash64Udf(graft.text.TextAnalysis.tokens(t)),
        Dedup.simhash64Bands)
    },

    // ---- blocked edit-distance near-dup pairs ----------------------------
    // Candidate pairs share a 16-char text prefix (the blocking key —
    // an equi-join shuffle on the prefix, never an O(n²) cross join);
    // survivors are verified with levenshtein. Blocking is part of the
    // operator's declared semantics (standard blocking+verify entity
    // resolution), so the oracle applies the identical block. The Spark
    // side uses the THRESHOLD form levenshtein(a, b, 8): it abandons a
    // row's DP early once the distance provably exceeds 8 — O(k·n) per
    // verified pair instead of O(n·m), the difference between verifying
    // a hot block and timing out on it at corpus scale.
    //
    // Scale behavior (ScaleSmoke 10x): pair work grows with Σ block².
    // A corpus with many shared-prefix documents inflates blocks — the
    // remedies are a longer/multi-key block (prefix + length bucket) or
    // graduating to band-based blocking (q78's shape); both change the
    // declared candidate contract, so this operator keeps the standard
    // 16-char prefix and states the trade.
    QueryDef.sql(
      "q98_edit_distance", {
        val k = Dedup.EditDistanceMax
        s"""WITH d AS (SELECT doc_id, text FROM documents),
           |p AS (
           |  SELECT a.doc_id AS d1, b.doc_id AS d2,
           |    levenshtein(a.text, b.text) AS ed
           |  FROM d a JOIN d b
           |    ON substr(a.text, 1, 16) = substr(b.text, 1, 16)
           |    AND a.doc_id < b.doc_id)
           |SELECT d1, d2, CAST(ed AS BIGINT) AS ed
           |FROM p WHERE ed <= $k ORDER BY d1, d2"""
      }) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          substring(col("text"), 1, 16).as("blk"))
      val a = docs.select(col("doc_id").as("d1"), col("text").as("t1"), col("blk"))
      val b = docs.select(col("doc_id").as("d2"), col("text").as("t2"), col("blk"))
      a.join(b, Seq("blk"))
        .filter(col("d1") < col("d2"))
        .select(col("d1"), col("d2"),
          levenshtein(col("t1"), col("t2"), Dedup.EditDistanceMax)
            .cast("long").as("ed"))
        .filter(col("ed") >= 0) // threshold form returns -1 past the cap
        .orderBy("d1", "d2")
    },

    // ---- exact-substring duplication: k-token window hashing -------------
    // Substring-LEVEL dedup (the ExactSubstr family) vs the doc-level
    // families above: every 8-token window is hashed, a hash seen more
    // than once anywhere in the corpus marks a duplicated span, and the
    // per-doc dup_frac is the boilerplate/copy-paste signal MinHash
    // dilutes away on long documents. The corpus's re-inserted every-5th
    // docs guarantee cross-doc spans; natural repetition adds within-doc
    // ones. Windows are map-side; the digest is the only wide shuffle key.
    QueryDef.sql(
      "q140_substring_dedup",
      s"""WITH $CorpusSql,
         |tok AS ($TokSql),
         |w AS (
         |  SELECT doc_id, md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS h
         |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i
         |        FROM tok WHERE len(toks) >= 8)),
         |st AS (SELECT h, COUNT(*) AS cnt FROM w GROUP BY h)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
         |  CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
         |  CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_frac
         |FROM w JOIN st USING (h)
         |GROUP BY doc_id ORDER BY doc_id""") { (s, d) =>
      Dedup.substringDupStats(corpus(s, d), 8).orderBy("doc_id")
    }
  )
}
