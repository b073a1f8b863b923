package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** Training-data preparation operators: deterministic mixture sampling
  * (up/down-weighting sources), token-budget truncation, greedy sequence
  * packing, benchmark decontamination, and quality-ranked budget capping
  * — the ops that sit between dedup/quality filtering and tokenizer
  * sharding in a real pipeline. All hash/arithmetic-based, so the DuckDB
  * oracle reproduces every decision bit-for-bit (no RNG).
  */
object MixQueries {

  /** Boilerplate strip (q126), both execution paths behind a MEASURED
    * switch. Chunk membership is decided on 128-bit JVM digests
    * ([[graft.functions.Exact.digest128Jvm]]) so corpus text never rides
    * the counting shuffle. The boilerplate set's cardinality is then
    * counted (one small job over the already-shuffled digests) and picks
    * the plan:
    *
    *  - `|bp| <= bpMax` (every real corpus: boilerplate is the repeated
    *    TAIL — 341 of 7k chunks at sf0.01): the digest set collects into
    *    a JVM hash set closed over by one rebuild UDF — each document
    *    filters its own in-order chunk array and rebuilds map-side. Zero
    *    text movement, O(1) membership per chunk.
    *  - `|bp| > bpMax` (pathological density — the 100× smoke replicates
    *    every doc ~100×, so nearly EVERY chunk repeats and the "small
    *    set" premise inverts): collecting would be a driver OOM and a
    *    broadcast scan per element; instead the digests anti-join (16-B
    *    rows), surviving (doc_id, chunk_no) INT positions regroup, and
    *    one doc_id join rebuilds from each doc's own array — corpus text
    *    moves exactly once, where the r14 shape moved it twice.
    *
    * Both paths are bit-identical (BoilerplateStripSpec forces each on
    * the gate corpus); the oracle never changes. The measured switch is
    * the q29/GlobalRowNumber posture: fast path as an optimization,
    * never an assumption.
    */
  private[graft] def boilerplateStrip(s: org.apache.spark.sql.SparkSession,
      d: String, bpMax: Long = 65536L): org.apache.spark.sql.DataFrame = {
    import graft.text.TextAnalysis
    import graft.functions.Exact
    val t = Tables.documents(s, d)
      .transform(graft.Tables.spread(_, col("doc_id")))
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0) // sequence(0,-1) would DESCEND
      .select(col("doc_id"),
        transform(sequence(lit(0), expr("(size(toks) + 3) div 4 - 1")),
          k => array_join(
            slice(col("toks"), (k * 4 + 1).cast("int"), lit(4)), " "))
          .as("chunks"))
      .transform(graft.Materialize.checkpoint) // shared by counter + rebuild
    val dg = t
      .select(col("doc_id"), posexplode(col("chunks")).as(Seq("chunk_no", "chunk")))
      .select(col("doc_id"), col("chunk_no"),
        Exact.digest128Udf(col("chunk")).as("dg"))
      .transform(graft.Materialize.checkpoint) // counter + (fallback) anti-join
    val bp = dg.groupBy("dg").agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select("dg")
    if (bp.count() <= bpMax) {
      val set = bp.collect().map { r =>
        val st = r.getStruct(0); (st.getLong(0), st.getLong(1))
      }.toSet
      val rebuild = udf((chunks: Seq[String]) => {
        val kept = chunks.filterNot(c => set(Exact.digest128Jvm(c)))
        (chunks.size.toLong, kept.size.toLong,
          if (kept.isEmpty) 0L else Exact.foldHashJvm(kept.mkString(" ")))
      })
      t.select(col("doc_id"), rebuild(col("chunks")).as("r"))
        .select(col("doc_id"), col("r._1").as("n_chunks"),
          col("r._2").as("n_kept"), col("r._3").as("cleaned_hash"))
        .orderBy("doc_id")
    } else {
      val keptPos = dg.join(bp, Seq("dg"), "left_anti")
        .groupBy("doc_id").agg(sort_array(collect_list(col("chunk_no"))).as("pos"))
      t.join(keptPos, Seq("doc_id"), "left")
        .select(col("doc_id"),
          size(col("chunks")).cast("long").as("n_chunks"),
          coalesce(size(col("pos")), lit(0)).cast("long").as("n_kept"),
          when(col("pos").isNull || size(col("pos")) === 0, lit(0L))
            .otherwise(graft.functions.Exact.foldHashUdf(array_join(
              transform(col("pos"), p => element_at(col("chunks"), p + 1)), " ")))
            .as("cleaned_hash"))
        .orderBy("doc_id")
    }
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- mixture sampling: per-language keep-rates, hash-gated -----------
    // keep iff (doc_id·2654435761 mod 1000) < rate(lang): en 80%, de 50%,
    // computed as ((doc_id mod 1000)·C) mod 1000 — identical by modular
    // arithmetic, but overflow-free for doc_id past 2^63/C ≈ 3.5e9 (a
    // raw multiply would THROW under ANSI at 100 TB corpus ids),
    // others 25% — deterministic "data mixing" with no RNG state.
    QueryDef.sql(
      "q60_mixture_sample",
      """SELECT lang, COUNT(*) AS n_kept,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars_kept
        |FROM documents
        |WHERE ((doc_id % 1000) * 2654435761) % 1000 <
        |  CASE lang WHEN 'en' THEN 800 WHEN 'de' THEN 500 ELSE 250 END
        |GROUP BY lang ORDER BY lang""") { (s, d) =>
      val rate = when(col("lang") === "en", 800)
        .when(col("lang") === "de", 500).otherwise(250)
      Tables.documents(s, d)
        .filter((col("doc_id") % 1000 * 2654435761L) % 1000 < rate)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).cast("long").as("chars_kept"))
        .orderBy("lang")
    },

    // ---- token-budget truncation: first 64 tokens, rejoined --------------
    QueryDef.sql(
      "q61_token_truncate",
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(least(len(toks), 64) AS BIGINT) AS n_tokens,
        |  CASE WHEN len(toks) = 0 THEN 0 ELSE list_reduce(list_prepend(0::BIGINT,
        |    list_transform(string_split(array_to_string(toks[1:64], ' '), ''),
        |      c -> unicode(c)::BIGINT)),
        |    (a, x) -> (a * 31 + x) % 1000000007) END AS truncated_hash
        |FROM t ORDER BY doc_id""") { (s, d) =>
      val toks = graft.text.TextAnalysis.tokens(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), toks.as("toks"))
        .select(col("doc_id"),
          least(size(col("toks")), lit(64)).cast("long").as("n_tokens"),
          graft.functions.Exact.foldHashUdf(
            concat_ws(" ", slice(col("toks"), 1, 64))).as("truncated_hash"))
        .orderBy("doc_id")
    },

    // ---- greedy sequence packing: 512-token packs per source shard -------
    // pack id = floor(running-token-total-before-this-doc / 512) within
    // each source partition (deterministic doc order) — the windowed form
    // of sequence packing; partitioned by source so no global ordering.
    QueryDef.sql(
      "q62_sequence_pack",
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tok,
        |    CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |                          ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS before_tok
        |  FROM t)
        |SELECT source, before_tok // 512 AS pack_id,
        |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS pack_tokens
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(graft.text.TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
        .withColumn("before_tok", sum(col("n_tok")).over(w) - col("n_tok"))
        .withColumn("pack_id", expr("before_tok div 512"))
        .groupBy("source", "pack_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).cast("long").as("pack_tokens"))
        .orderBy("source", "pack_id")
    },

    // ---- benchmark decontamination: shingle overlap vs a probe set -------
    // The standard eval-contamination sweep: the (small) benchmark's
    // distinct word shingles broadcast; a document is contaminated when
    // it shares any shingle. Shingle width is the knob — production
    // sweeps use 8-13-gram windows; the synthetic corpus's short
    // template texts only collide at 3-grams, so that is what the gate
    // exercises. Only shingle rows shuffle — the classic
    // broadcast-semi-join shape; at 100 TB the probe side is the
    // benchmark suite (tiny by construction), the corpus never shuffles.
    QueryDef.sql(
      "q67_decontaminate",
      """WITH tok AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source, list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
        |    ELSE [] END) AS shd
        |  FROM tok),
        |probe AS (SELECT DISTINCT unnest(shd) AS g FROM sh WHERE doc_id % 250 = 0),
        |hit AS (
        |  SELECT DISTINCT doc_id, source FROM (
        |    SELECT doc_id, source, unnest(shd) AS g FROM sh WHERE doc_id % 250 <> 0)
        |  WHERE g IN (SELECT g FROM probe))
        |SELECT source, COUNT(*) AS contaminated,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM hit GROUP BY 1 ORDER BY 1""") { (s, d) =>
      val sh = Tables.documents(s, d)
        .transform(graft.Tables.spread(_, col("doc_id"))) // shingle kernels want all cores
        .select(col("doc_id"), col("source"),
          Dedup.distinctShinglesUdf(col("text"), lit(3)).as("shd"))
        // probe and corpus sides share the shingle pass (localCheckpoint →
        // ContextCleaner-released, no leaked cache entry)
        .transform(graft.Materialize.checkpoint)
      val probes = sh.filter(col("doc_id") % 250 === 0)
        .select(explode(col("shd")).as("g")).distinct()
      sh.filter(col("doc_id") % 250 =!= 0)
        .select(col("doc_id"), col("source"), explode(col("shd")).as("g"))
        .join(broadcast(probes), Seq("g"), "left_semi")
        .select("doc_id", "source").distinct()
        .groupBy("source")
        .agg(count(lit(1)).as("contaminated"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("source")
    },

    // ---- repetition ratio: duplicate-bigram fraction per document --------
    // The Gopher-rules repetition signal: heavily templated/boilerplate
    // documents have a high fraction of repeated word 2-grams. Pure
    // map-side expression work; `keep` applies the standard ≤0.2 gate.
    QueryDef.sql(
      "q69_repetition_ratio",
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, CASE WHEN len(toks) >= 2
        |    THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        |    ELSE [] END AS bg
        |  FROM t)
        |SELECT doc_id,
        |  CAST(len(bg) AS BIGINT) AS n_bigrams,
        |  CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct,
        |  CASE WHEN len(bg) = 0 THEN 0.0::DOUBLE
        |       ELSE 1.0::DOUBLE - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg) END AS rep_ratio,
        |  (CASE WHEN len(bg) = 0 THEN 0.0::DOUBLE
        |        ELSE 1.0::DOUBLE - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg) END) <= 0.2 AS keep
        |FROM g ORDER BY doc_id""") { (s, d) =>
      // one-pass JVM kernel: the expression form's array_distinct over
      // bigram STRINGS is O(n²) (Spark's specialized distinct set covers
      // primitives only) and projection collapse re-inlines the bigram
      // build per use — measured 9.1 s → 0.6 s at sf0.1. Equivalence is
      // gated by this oracle (exact string-distinct semantics).
      Tables.documents(s, d)
        .transform(graft.Tables.spread(_, col("doc_id"))) // per-doc string kernels want all cores
        .withColumn("bs", graft.text.TextAnalysis.bigramStatsUdf(col("text")))
        .select(col("doc_id"),
          col("bs._1").as("n_bigrams"), col("bs._2").as("n_distinct"))
        .withColumn("rep_ratio",
          when(col("n_bigrams") === 0, lit(0.0))
            .otherwise(lit(1.0) - col("n_distinct").cast("double") / col("n_bigrams")))
        .withColumn("keep", col("rep_ratio") <= 0.2)
        .orderBy("doc_id")
    },

    // ---- deterministic train/val/test split ------------------------------
    // The split every training run needs, done the only way that survives
    // re-runs and late-arriving data: assignment is a pure function of
    // doc_id (multiplicative hash, 98/1/1), never RNG — a document keeps
    // its split forever, on any cluster, at any scale, and val/test stay
    // leak-free as the corpus grows. Map-side assignment, one partial-agg
    // shuffle for the report.
    QueryDef.sql(
      "q77_split_assign",
      """SELECT source,
        |  CASE WHEN ((doc_id % 1000) * 2654435761) % 1000 < 980 THEN 'train'
        |       WHEN ((doc_id % 1000) * 2654435761) % 1000 < 990 THEN 'val'
        |       ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS n_tokens
        |FROM documents
        |GROUP BY source, split ORDER BY source, split""") { (s, d) =>
      val h = (col("doc_id") % 1000 * 2654435761L) % 1000
      Tables.documents(s, d)
        .select(col("source"),
          when(h < 980, "train").when(h < 990, "val").otherwise("test").as("split"),
          graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("toks"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
        .orderBy("source", "split")
    },

    // ---- quality-ranked token budget cap per source ----------------------
    // Keep each source's best documents until the source's running token
    // total crosses 20k — curriculum-style budgeting. Ordering is the
    // q22 quality score (bit-identical across engines) with doc_id
    // tie-break; one partitioned window, no global sort.
    QueryDef.sql(
      "q68_token_budget_cap", {
        val stop = TextQueries.EnStopSql
        s"""WITH t AS (
           |  SELECT doc_id, source,
           |    list_filter(string_split(text, ' '), x -> x <> '') AS toks, text
           |  FROM documents),
           |q AS (
           |  SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tok,
           |    0.5::DOUBLE * (CAST(len(list_filter(toks, x -> x IN $stop)) AS DOUBLE) / len(toks))
           |    + 0.3::DOUBLE * (1.0::DOUBLE - CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE) / length(text))
           |    + 0.2::DOUBLE * least(1.0::DOUBLE, CAST(len(toks) AS DOUBLE) / 100.0::DOUBLE) AS score
           |  FROM t),
           |r AS (
           |  SELECT doc_id, source, n_tok,
           |    CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY score DESC, doc_id
           |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
           |  FROM q)
           |SELECT source, COUNT(*) AS n_kept, CAST(SUM(n_tok) AS BIGINT) AS kept_tokens
           |FROM r WHERE running <= 20000 GROUP BY 1 ORDER BY 1"""
      }) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("score").desc, col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(graft.text.TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"),
          graft.text.TextAnalysis.qualityScoreFast(col("text"),
            graft.queries.TextQueries.EnStop).as("score"))
        .withColumn("running", sum(col("n_tok")).over(w))
        .filter(col("running") <= 20000)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum(col("n_tok")).cast("long").as("kept_tokens"))
        .orderBy("source")
    },

    // ---- sub-document boilerplate removal (CCNet/Dolma paragraph dedup) --
    // Document-level dedup (q25-q29) keeps near-identical DOCUMENTS out;
    // this removes repeated SPANS inside otherwise-unique documents —
    // headers, footers, nav chrome — the paragraph-granularity pass of
    // CCNet-style pipelines. Unit here: non-overlapping 4-token chunks
    // (the corpus has no sentence punctuation); a chunk is boilerplate
    // when it appears in ≥2 DISTINCT documents (within-doc repetition is
    // q69's signal, deliberately exempt). Documents reassemble from
    // their surviving chunks in order; per-doc chunk tallies + the
    // rebuilt text's hash are gated row-for-row. Scale shape: see
    // [[boilerplateStrip]] — digest-only counting shuffle, then a
    // MEASURED switch between the map-side hash-set rebuild (real
    // corpora: boilerplate is the small repeated tail) and a
    // digest-anti-join fallback for pathological density where the
    // small-set premise inverts; corpus text moves zero or one time,
    // where the r14 shape shuffled it twice (100x exp 1.05).
    QueryDef.sql(
      "q126_boilerplate_strip",
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents
        |  WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0),
        |e AS (SELECT doc_id, toks, unnest(range(0, (len(toks) + 3) // 4)) AS k FROM t),
        |ch AS (SELECT doc_id, k AS chunk_no,
        |         array_to_string(toks[4*k+1:4*k+4], ' ') AS chunk FROM e),
        |bp AS (SELECT chunk FROM ch GROUP BY chunk
        |       HAVING COUNT(DISTINCT doc_id) >= 2),
        |kept AS (SELECT doc_id, chunk_no, chunk FROM ch
        |         WHERE chunk NOT IN (SELECT chunk FROM bp)),
        |tot AS (SELECT doc_id, COUNT(*) AS n_chunks FROM ch GROUP BY 1),
        |kag AS (SELECT doc_id, COUNT(*) AS n_kept,
        |          string_agg(chunk, ' ' ORDER BY chunk_no) AS cleaned
        |        FROM kept GROUP BY 1)
        |SELECT tot.doc_id AS doc_id, n_chunks, COALESCE(n_kept, 0) AS n_kept,
        |  CASE WHEN cleaned IS NULL THEN 0
        |       ELSE list_reduce(list_prepend(0::BIGINT,
        |         list_transform(string_split(cleaned, ''), c -> unicode(c)::BIGINT)),
        |         (a, x) -> (a * 31 + x) % 1000000007) END AS cleaned_hash
        |FROM tot LEFT JOIN kag USING (doc_id) ORDER BY doc_id""") { (s, d) =>
      boilerplateStrip(s, d)
    },

    // ---- per-source rank normalization of quality scores ------------------
    // Raw heuristic scores aren't comparable ACROSS sources (a clean
    // books corpus and a noisy crawl have different score
    // distributions); mixing with one global threshold over-prunes one
    // and under-prunes the other. The standard fix is rank
    // normalization: cume_dist within source maps every score to its
    // within-source percentile, so "keep the best 40% of each source"
    // is one comparable cut. cume_dist is tie-stable (equal scores get
    // the identical percentile regardless of tie order — count(≤)/count,
    // a ratio of exact ints) so the per-doc output is deterministic and
    // bit-identical across engines. Execution is NOT the naive
    // per-source window (one reducer sorts an entire giant source):
    // GlobalRowNumber.cumeDistByKey range-buckets on score, so every
    // sort is ~n/buckets rows whatever the source skew — the q93
    // two-pass numbering generalized to percentiles, with the oracle
    // still the naive cume_dist (the rewrite must be exactly
    // invisible).
    QueryDef.sql(
      "q127_rank_normalize", {
        val stop = TextQueries.EnStopSql
        s"""WITH t AS (
           |  SELECT doc_id, source,
           |    list_filter(string_split(text, ' '), x -> x <> '') AS toks, text
           |  FROM documents),
           |q AS (
           |  SELECT doc_id, source,
           |    0.5::DOUBLE * (CAST(len(list_filter(toks, x -> x IN $stop)) AS DOUBLE) / len(toks))
           |    + 0.3::DOUBLE * (1.0::DOUBLE - CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE) / length(text))
           |    + 0.2::DOUBLE * least(1.0::DOUBLE, CAST(len(toks) AS DOUBLE) / 100.0::DOUBLE) AS score
           |  FROM t)
           |SELECT doc_id, source, score,
           |  cume_dist() OVER (PARTITION BY source ORDER BY score) AS pct,
           |  cume_dist() OVER (PARTITION BY source ORDER BY score) > 0.6 AS keep
           |FROM q ORDER BY doc_id"""
      }) { (s, d) =>
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          graft.text.TextAnalysis.qualityScoreFast(col("text"),
            graft.queries.TextQueries.EnStop).as("score"))
      graft.operators.GlobalRowNumber
        .cumeDistByKey(scored, Seq("source"), "score", "pct")
        .withColumn("keep", col("pct") > 0.6)
        .orderBy("doc_id")
    },

    // ---- exact stratified top-N via threshold prefilter -------------------
    // "Cap every language at N docs, chosen by the deterministic hash
    // permutation" — q68's count-based sibling, built to survive one
    // giant stratum: StratifiedTopN prefilters to ~margin·N rows per
    // stratum MAP-SIDE (per-stratum thresholds from a tiny broadcast
    // count), ranks only the survivors, and recomputes any stratum the
    // prefilter shorted (soundness guard — StratifiedTopNSpec forces
    // that path with adversarial hashes). The oracle is the NAIVE full
    // window, so the rewrite must be exactly invisible.
    QueryDef.sql(
      "q128_stratified_topn",
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    ((doc_id % 100000) * 2654435761) % 100000 AS hkey
        |  FROM documents),
        |r AS (SELECT doc_id, lang, hkey,
        |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hkey, doc_id) AS rk
        |      FROM h)
        |SELECT doc_id, lang, hkey, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 30 ORDER BY doc_id""") { (s, d) =>
      import graft.operators.StratifiedTopN
      val keyed = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          ((col("doc_id") % 100000 * 2654435761L) % 100000).as("hkey"))
      StratifiedTopN.byHashOrder(keyed, Seq("lang"), "hkey", 100000L,
        "doc_id", n = 30)
        .select(col("doc_id"), col("lang"), col("hkey"),
          col("rk").cast("long").as("rk"))
        .orderBy("doc_id")
    },

    // ---- the full training-data pipeline, composed as ONE plan -----------
    // The capstone: redact → quality gates (repetition + hashed-linear
    // classifier) → exact dedup (keep-first) → benchmark
    // decontamination → mixture sampling → sequence packing — the
    // Dolma/CCNet-style end-to-end corpus build, every stage an
    // operator this engine already gates individually, here chained so
    // COMPOSITION is what's tested: column contracts between stages,
    // and the oracle replaying all six stages bit-for-bit (a drift in
    // ANY stage's semantics breaks the final pack tallies). Plan
    // shape: stages 1–3 are pure map-side; dedup is one md5 shuffle
    // whose output CHECKPOINTS (eagerly — the q67 pattern: the
    // deduped frame feeds both the shingle probe and the output
    // chain, and without the cut the whole redact/gate/dedup prefix
    // would execute twice); decontamination shuffles shingles only
    // with the tiny probe side broadcast; mixture is map-side; packing
    // is one source-partitioned window. The corpus text never shuffles
    // after the dedup hash.
    QueryDef.sql(
      "q132_pipeline_e2e", {
        import graft.text.TextAnalysis.{EmailRe, PhoneRe}
        s"""WITH r0 AS (
           |  SELECT doc_id, lang, source,
           |    regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
           |                   '$PhoneRe', '<PHONE>', 'g') AS t
           |  FROM documents),
           |t0 AS (
           |  SELECT doc_id, lang, source, t,
           |    list_filter(string_split(t, ' '), x -> x <> '') AS toks
           |  FROM r0),
           |q0 AS (
           |  SELECT *, CAST(len(toks) AS BIGINT) AS n_tok,
           |    CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
           |      i -> toks[i] || ' ' || toks[i+1]) ELSE [] END AS bg
           |  FROM t0),
           |q1 AS (
           |  SELECT doc_id, lang, source, t, toks, n_tok FROM q0
           |  WHERE n_tok > 0
           |    AND (CASE WHEN len(bg) = 0 THEN 0.0
           |         ELSE 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg) END) <= 0.2
           |    AND CAST(COALESCE(list_sum(list_transform(toks, tok ->
           |      ((list_reduce(list_prepend(0::BIGINT,
           |          list_transform(string_split(tok, ''), c -> unicode(c)::BIGINT)),
           |          (a, x) -> (a * 31 + x) % 1000000007) % 4096)
           |        * 2654435761) % 2001 - 1000)), 0) AS BIGINT) > 0),
           |dmin AS (SELECT md5(t) AS h, min(doc_id) AS keeper FROM q1 GROUP BY 1),
           |q2 AS (SELECT q1.* FROM q1
           |       JOIN dmin ON md5(q1.t) = dmin.h AND q1.doc_id = dmin.keeper),
           |probe AS (
           |  SELECT DISTINCT unnest(CASE WHEN len(toks) >= 3
           |    THEN list_transform(range(1, len(toks) - 1),
           |           i -> array_to_string(toks[i:i+2], ' '))
           |    ELSE [] END) AS g
           |  FROM (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
           |        FROM documents WHERE doc_id % 250 = 0)),
           |sh3 AS (
           |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 3
           |    THEN list_transform(range(1, len(toks) - 1),
           |           i -> array_to_string(toks[i:i+2], ' '))
           |    ELSE [] END) AS g
           |  FROM q2),
           |hit AS (SELECT DISTINCT doc_id FROM sh3 WHERE g IN (SELECT g FROM probe)),
           |q3 AS (SELECT * FROM q2 WHERE doc_id % 250 <> 0
           |       AND doc_id NOT IN (SELECT doc_id FROM hit)),
           |q4 AS (SELECT * FROM q3
           |       WHERE ((doc_id % 1000) * 2654435761) % 1000 <
           |         CASE lang WHEN 'en' THEN 800 WHEN 'de' THEN 500 ELSE 250 END),
           |packed AS (
           |  SELECT doc_id, source, n_tok,
           |    CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
           |                          ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS before_tok
           |  FROM q4)
           |SELECT source, before_tok // 512 AS pack_id, COUNT(*) AS n_docs,
           |  CAST(SUM(n_tok) AS BIGINT) AS pack_tokens,
           |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
           |FROM packed GROUP BY 1, 2 ORDER BY 1, 2"""
      }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import graft.text.TextAnalysis
      val docs = Tables.documents(s, d)
        .transform(graft.Tables.spread(_, col("doc_id")))
      val red = docs.select(col("doc_id"), col("lang"), col("source"),
        TextAnalysis.redactPii(col("text")).as("t"))
      // hl._1 IS the token count (same split-on-space semantics) — no
      // second tokenization materializing a per-doc string array for a
      // number the JVM pass already computed (the q121 pattern)
      val q1 = red
        .withColumn("bs", TextAnalysis.bigramStatsUdf(col("t")))
        .withColumn("rep", when(col("bs._1") === 0, lit(0.0))
          .otherwise(lit(1.0) - col("bs._2").cast("double") / col("bs._1")))
        .withColumn("hl", TextAnalysis.hashedLinearUdf(col("t")))
        .withColumn("n_tok", col("hl._1"))
        .filter(col("n_tok") > 0 && col("rep") <= 0.2 && col("hl._2") > 0)
        .select("doc_id", "lang", "source", "t", "n_tok")
      val wmd = Window.partitionBy("h")
      val q2 = q1
        .withColumn("h", md5(col("t").cast("binary")))
        .withColumn("keeper", min("doc_id").over(wmd))
        .filter(col("doc_id") === col("keeper"))
        .drop("h", "keeper")
        // shared by the shingle pass and the output chain
        .transform(graft.Materialize.checkpoint)
      val probe = docs.filter(col("doc_id") % 250 === 0)
        .select(explode(Dedup.distinctShinglesUdf(col("text"), lit(3))).as("g"))
        .distinct()
      val hit = q2
        .select(col("doc_id"),
          explode(Dedup.distinctShinglesUdf(col("t"), lit(3))).as("g"))
        .join(broadcast(probe), Seq("g"), "left_semi")
        .select("doc_id").distinct()
      val rate = when(col("lang") === "en", 800)
        .when(col("lang") === "de", 500).otherwise(250)
      val q4 = q2.filter(col("doc_id") % 250 =!= 0)
        .join(hit, Seq("doc_id"), "left_anti")
        .filter((col("doc_id") % 1000 * 2654435761L) % 1000 < rate)
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      q4.withColumn("before_tok", sum(col("n_tok")).over(w) - col("n_tok"))
        .withColumn("pack_id", expr("before_tok div 512"))
        .groupBy("source", "pack_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast("long").as("pack_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("source", "pack_id")
    },

    // ---- sliding-window context chunking (stride + overlap) --------------
    // The other half of sequence prep beside q61 (head truncation) and
    // q62 (packing): long documents split into overlapping fixed-width
    // training chunks — window W=32 tokens, stride S=24 (8-token overlap
    // so no span is ever cut mid-context), final chunk clipped to the
    // tail, short docs emitted whole. Chunk count and offsets are pure
    // per-row arithmetic and the chunk bodies are slices of the one
    // token array: the whole operator is map-side (tokenize → sequence
    // explode → slice → hash), NO shuffle of any kind — chunking 100 TB
    // is embarrassingly parallel and this plan keeps it that way (the
    // only exchange in the plan is the output presentation sort). Chunk
    // identity is hash-gated ([[graft.functions.Exact.foldHash]] of the
    // rejoined slice), so a off-by-one in either engine's slicing fails
    // the gate rather than sliding by silently.
    QueryDef.sql(
      "q152_chunk_sliding",
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM t WHERE len(toks) >= 1),
        |k AS (SELECT doc_id, toks, n,
        |        CASE WHEN n <= 32 THEN 1
        |             ELSE 1 + CAST(CEIL(CAST(n - 32 AS DOUBLE) / 24.0) AS BIGINT) END AS n_chunks
        |      FROM n),
        |c AS (SELECT doc_id, toks, n, unnest(range(0, n_chunks)) AS chunk_id FROM k),
        |s AS (SELECT doc_id, chunk_id, n, chunk_id * 24 + 1 AS start_tok,
        |        LEAST(CAST(32 AS BIGINT), n - (chunk_id * 24 + 1) + 1) AS n_tok,
        |        toks
        |      FROM c)
        |SELECT doc_id, chunk_id, start_tok, n_tok,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(string_split(array_to_string(
        |      toks[start_tok:start_tok + n_tok - 1], ' '), ''),
        |      ch -> unicode(ch)::BIGINT)),
        |    (a, x) -> (a * 31 + x) % 1000000007) AS chunk_hash
        |FROM s ORDER BY doc_id, chunk_id""") { (s, d) =>
      val W = 32L
      val S = 24L
      val t = Tables.documents(s, d)
        .select(col("doc_id"),
          graft.text.TextAnalysis.tokens(col("text")).as("toks"))
        .withColumn("n", size(col("toks")).cast("long"))
        .filter(col("n") >= 1)
        .withColumn("n_chunks", when(col("n") <= W, lit(1L))
          .otherwise(lit(1L) +
            ceil((col("n") - W).cast("double") / lit(S.toDouble)).cast("long")))
      t.select(col("doc_id"), col("toks"), col("n"),
          explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
        .withColumn("start_tok", col("chunk_id") * S + 1)
        .withColumn("n_tok", least(lit(W), col("n") - col("start_tok") + 1))
        .select(col("doc_id"), col("chunk_id"), col("start_tok"), col("n_tok"),
          graft.functions.Exact.foldHashUdf(concat_ws(" ",
            slice(col("toks"), col("start_tok").cast("int"),
              col("n_tok").cast("int")))).as("chunk_hash"))
        .orderBy("doc_id", "chunk_id")
    },

    // ---- mixture planning: water-filling token allocation -----------------
    // The PLANNING step between q60 (apply sampling rates) and q68 (cap
    // by quality): given per-source token capacity, target mixture
    // weights, and a total token budget, allocate tokens ∝ weight —
    // except sources whose capacity runs out first SATURATE (take all
    // they have) and their shortfall redistributes to the rest at a
    // common water level λ. Closed form, no iteration: sort sources by
    // capacity/weight, prefix-sum both, λ(k) = (B − Σ_sat c)/(Σ_unsat w);
    // the saturation set is the longest ratio-sorted prefix whose own
    // ratio is under its λ. At 90% budget 13 of 20 sources saturate, so
    // BOTH branches are gate-exercised. Scale shape: the only
    // corpus-sized work is ONE token-count groupBy; every window and
    // cross after it runs on the K-source aggregate (K rows — the q150
    // post-aggregate rule), so mixture planning costs the same at 100 TB
    // as at 100 MB.
    QueryDef.sql(
      "q157_mixture_waterfill",
      """WITH t AS (SELECT source,
        |    CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS c,
        |    CAST(CAST(SUBSTR(source, 4) AS INT) % 3 + 1 AS BIGINT) AS w
        |  FROM documents GROUP BY source),
        |b AS (SELECT CAST(9 * SUM(c) // 10 AS BIGINT) AS budget,
        |             CAST(SUM(w) AS BIGINT) AS wtot FROM t),
        |r AS (SELECT source, c, w,
        |        CAST(c AS DOUBLE) / CAST(w AS DOUBLE) AS ratio,
        |        CAST(row_number() OVER (ORDER BY CAST(c AS DOUBLE)/CAST(w AS DOUBLE), source) AS BIGINT) AS rk,
        |        CAST(SUM(c) OVER (ORDER BY CAST(c AS DOUBLE)/CAST(w AS DOUBLE), source ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ck,
        |        CAST(SUM(w) OVER (ORDER BY CAST(c AS DOUBLE)/CAST(w AS DOUBLE), source ROWS UNBOUNDED PRECEDING) AS BIGINT) AS wk
        |      FROM t),
        |l AS (SELECT r.*, budget, wtot,
        |        CASE WHEN wtot - wk > 0
        |             THEN CAST(budget - ck AS DOUBLE) / CAST(wtot - wk AS DOUBLE) END AS lam_k
        |      FROM r CROSS JOIN b),
        |star AS (SELECT COALESCE(MAX(CASE WHEN ratio <= lam_k THEN rk END), 0) AS kstar FROM l),
        |lam AS (SELECT CASE WHEN s.kstar = 0
        |               THEN CAST(b2.budget AS DOUBLE) / CAST(b2.wtot AS DOUBLE)
        |               ELSE MAX(CASE WHEN l.rk = s.kstar THEN l.lam_k END) END AS lam
        |        FROM l CROSS JOIN star s CROSS JOIN b b2
        |        GROUP BY s.kstar, b2.budget, b2.wtot)
        |SELECT l.source, l.c, l.w, l.rk <= s.kstar AS saturated,
        |  CASE WHEN l.rk <= s.kstar THEN l.c
        |       ELSE CAST(FLOOR(lam.lam * CAST(l.w AS DOUBLE)) AS BIGINT) END AS alloc
        |FROM l CROSS JOIN star s CROSS JOIN lam
        |ORDER BY l.source""") { (s, d) =>
      val t = Tables.documents(s, d)
        .groupBy("source")
        .agg(sum(size(graft.text.TextAnalysis.tokens(col("text"))).cast("long"))
          .as("c"))
        .withColumn("w",
          (substring(col("source"), 4, 10).cast("int") % 3 + 1).cast("long"))
      val b = t.agg(sum("c").as("sc"), sum("w").as("wtot"))
        .selectExpr("9 * sc div 10 as budget", "wtot")
      graft.operators.Waterfill.allocate(t, b)
    }
  )
}
