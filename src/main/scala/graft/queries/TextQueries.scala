package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextAnalysis._

/** Text-analysis operator coverage over `documents`: token counting (plain
  * + BPE-ish), quality scoring, language-ID voting, and portable document
  * fingerprinting — each mirrored by an independent DuckDB formulation.
  */
object TextQueries {

  val EnStop = Seq("the", "a", "key", "scan", "fast")
  val EnStopSql = "('the','a','key','scan','fast')"

  /** q143's fixed retrieval query — a literal term set, the shape a
    * quality-filter or retrieval workload ships to the engine.
    */
  val BmTerms = Seq("vector", "stream", "merge", "hash")

  /** DuckDB replay of the whole BM25 path: same tokenizer as q89, same
    * integer inputs, constants and association order written to mirror
    * [[graft.text.Bm25]] exactly (see its determinism contract — only ln
    * may differ by an ulp, absorbed by the 1e-6 score quantization).
    */
  private def bm25OracleSql: String = {
    val is = BmTerms.indices
    val tfCols = is.map(i =>
      s"CAST(len(list_filter(toks, x -> x = '${BmTerms(i)}')) AS BIGINT) AS tf$i")
      .mkString(",\n        |    ")
    val anyHit = is.map(i => s"tf$i > 0").mkString(" OR ")
    val dfCols = is.map(i =>
      s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(",\n        |    ")
    val score = is.map { i =>
      s"""(LN(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5)) * ((CAST(tf$i AS DOUBLE) * 2.2) / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))))"""
    }.mkString(" + ")
    val nHit = is.map(i => s"CASE WHEN tf$i > 0 THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
        |    $tfCols
        |  FROM t),
        |cand AS (SELECT * FROM c WHERE $anyHit),
        |st AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(len(toks)) AS BIGINT) AS total_dl
        |  FROM t),
        |dfs AS (
        |  SELECT
        |    $dfCols
        |  FROM cand),
        |sc AS (
        |  SELECT doc_id, dl, CAST($nHit AS BIGINT) AS n_hit,
        |    CAST(FLOOR(($score) * 1000000.0 + 0.5) AS BIGINT) AS score_e6
        |  FROM cand
        |  CROSS JOIN (SELECT n_docs,
        |    CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl FROM st)
        |  CROSS JOIN dfs),
        |r AS (
        |  SELECT doc_id, dl, n_hit, score_e6,
        |    CAST(row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS BIGINT) AS rk
        |  FROM sc)
        |SELECT doc_id, dl, n_hit, score_e6, rk FROM r WHERE rk <= 10 ORDER BY rk"""
  }

  private def profileSql(p: Seq[String]): String =
    p.mkString("('", "','", "')")

  /** Adjacent-token bigrams of `documents`-shaped rows — map-side zip of
    * the one token array (shared by the batch q151 gate and its q155
    * streaming twin so the two can never drift).
    */
  private def bigramsOf(docs: org.apache.spark.sql.DataFrame)
    : org.apache.spark.sql.DataFrame = {
    val toks = graft.text.TextAnalysis.tokens(lower(col("text")))
    docs.select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1))).as("p"))
      .select(col("doc_id"), col("p.0").as("w1"), col("p.1").as("w2"))
  }

  /** Score bigram rows against the (c2, c1, v) bigram LM: per-bigram
    * smoothed −ln P quantized to 1e-6 BEFORE the per-doc sum (exact
    * integer aggregate, order-free), mean as one double division.
    * Per-row semantics carry no cross-doc state, so scoring a stream
    * micro-batch and scoring the whole corpus agree row-for-row.
    */
  private def lmScore(bg: org.apache.spark.sql.DataFrame,
      c2: org.apache.spark.sql.DataFrame, c1: org.apache.spark.sql.DataFrame,
      v: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val p = (coalesce(col("c2"), lit(0L)).cast("double") + lit(0.5)) /
      (coalesce(col("c1"), lit(0L)).cast("double") +
        lit(0.5) * col("v").cast("double"))
    bg
      .join(broadcast(c2), Seq("w1", "w2"), "left")
      .join(broadcast(c1), Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        floor((-log(p)) * lit(1e6) + lit(0.5)).as("e6"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("e6")).as("nll_e6"))
      .select(col("doc_id"), col("n_bigrams"), col("nll_e6"),
        (col("nll_e6").cast("double") / col("n_bigrams").cast("double"))
          .as("mean_nll_e6"))
  }

  /** Shipped-LM size caps: the trained bigram/context tables are pruned to
    * the top-K most frequent entries (count desc, key tie-break — a total
    * order, so both engines pick the identical K) BEFORE they feed
    * scoring. An unpruned bigram table grows with the train slice (Heaps'
    * law), so broadcasting it would OOM at 100 TB; a production LM ships
    * pruned, and out-of-model entries smooth to the same α-backoff as any
    * unseen bigram. K is sized to BITE at the sf0.01 gate (903 distinct
    * train bigrams / 30 unigrams there) so the pruning semantics are what
    * the hash actually pins.
    */
  private val LmTopBigrams = 512
  private val LmTopUnigrams = 24

  /** Train the pruned (c2, c1, v) bigram LM from `docs` (held-in slice
    * doc_id % 4 = 0) — ONE builder shared by q151, its q155 streaming
    * twin, and q159's buckets so the three models can never drift. The
    * top-K prune is an ordered LIMIT (TakeOrderedAndProject — K rows to
    * the driver-side of the broadcast no matter the corpus size), which
    * is also what proves these frames bounded to the plan audit.
    */
  private[graft] def lmTrain(docs: org.apache.spark.sql.DataFrame,
      materialize: Boolean = false)
    : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
       org.apache.spark.sql.DataFrame) = {
    // materialize=true is the static-model stream's trainer (q155): the
    // train-slice BIGRAMS checkpoint once — one tokenize pass — and the
    // three model tables derive from that base and checkpoint tiny, so
    // per-micro-batch broadcasts replay nothing. Lazy (q151/q159), each
    // broadcast re-derives its subtree inside the one batch job, which
    // is cheaper than checkpoint I/O for a single evaluation. ONE
    // builder either way — the two modes cannot drift.
    val ck: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      if (materialize) graft.Materialize.checkpoint else identity
    val train = ck(bigramsOf(docs).filter(col("doc_id") % 4 === 0))
    val c2 = ck(train.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .orderBy(col("c2").desc, col("w1"), col("w2")).limit(LmTopBigrams))
    val c1 = ck(train.groupBy("w1").agg(count(lit(1)).as("c1"))
      .orderBy(col("c1").desc, col("w1")).limit(LmTopUnigrams))
    val v = ck(docs.filter(col("doc_id") % 4 === 0)
      .select(explode(graft.text.TextAnalysis.tokens(lower(col("text"))))
        .as("tok"))
      .agg(count_distinct(col("tok")).as("v")))
    (c2, c1, v)
  }

  /** q151's oracle — also q155's verbatim: streaming the scoring pass
    * must not change an answer.
    */
  private val BigramLmSql =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
      |    unnest(list_transform(range(1, len(toks)), i -> toks[i+1])) AS w2
      |  FROM t WHERE len(toks) >= 2),
      |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg WHERE doc_id % 4 = 0 GROUP BY 1, 2
      |       ORDER BY c2 DESC, w1, w2 LIMIT 512),
      |c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg WHERE doc_id % 4 = 0 GROUP BY 1
      |       ORDER BY c1 DESC, w1 LIMIT 24),
      |v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
      |      FROM (SELECT unnest(toks) AS tok FROM t WHERE doc_id % 4 = 0)),
      |nll AS (
      |  SELECT bg.doc_id,
      |    CAST(FLOOR((-LN((CAST(COALESCE(c2.c2, 0) AS DOUBLE) + 0.5) /
      |      (CAST(COALESCE(c1.c1, 0) AS DOUBLE) + 0.5 * CAST(v.v AS DOUBLE))))
      |      * 1000000.0 + 0.5) AS BIGINT) AS e6
      |  FROM bg
      |  LEFT JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2
      |  LEFT JOIN c1 ON bg.w1 = c1.w1
      |  CROSS JOIN v)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(e6) AS BIGINT) AS nll_e6,
      |  CAST(SUM(e6) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_nll_e6
      |FROM nll GROUP BY doc_id ORDER BY doc_id"""

  val defs: Seq[QueryDef] = Seq(

    // ---- token counting: whitespace + BPE-ish pre-tokenizer --------------
    QueryDef.sql(
      "q21_token_stats",
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpeish,
        |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS n_punct,
        |  CAST(length(text) AS BIGINT) AS n_len
        |FROM documents ORDER BY doc_id""") { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        bpeishCount(col("text")).cast("long").as("n_bpeish"),
        punctCount(col("text")).cast("long").as("n_punct"),
        length(col("text")).cast("long").as("n_len"))
        .orderBy("doc_id")
    },

    // ---- heuristic quality score (stopword/punct/length mix) -------------
    QueryDef.sql(
      "q22_quality_score",
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents)
         |SELECT doc_id,
         |  0.5::DOUBLE * (CAST(len(list_filter(toks, x -> x IN $EnStopSql)) AS DOUBLE) / len(toks))
         |  + 0.3::DOUBLE * (1.0::DOUBLE - CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE) / length(text))
         |  + 0.2::DOUBLE * least(1.0::DOUBLE, CAST(len(toks) AS DOUBLE) / 100.0::DOUBLE) AS score
         |FROM t ORDER BY doc_id""") { (s, d) =>
      // qualityScoreFast: JVM counting + the identical Catalyst double
      // assembly (TextKernelSpec pins bit-parity; 16.1 s → 0.3 s for the
      // score pass at the 100x smoke — the HOF stopword filter is an
      // interpreted lambda per token)
      Tables.documents(s, d).select(
        col("doc_id"),
        qualityScoreFast(col("text"), EnStop).as("score"))
        .orderBy("doc_id")
    },

    // ---- language-ID voting → confusion matrix ---------------------------
    QueryDef.sql(
      "q23_lang_confusion", {
        val scoreCols = LangProfiles.map { case (l, p) =>
          s"len(list_filter(toks, x -> x IN ${profileSql(p)})) AS s_$l"
        }.mkString(",\n        |    ")
        val all = LangProfiles.map { case (l, _) => s"s_$l" }.mkString(", ")
        val caseChain = LangProfiles.map { case (l, _) =>
          s"WHEN s_$l = greatest($all) THEN '$l'"
        }.mkString("\n        |    ")
        s"""WITH t AS (
           |  SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS toks
           |  FROM documents),
           |s AS (
           |  SELECT lang,
           |    $scoreCols
           |  FROM t)
           |SELECT lang, CASE
           |    $caseChain
           |    ELSE 'und' END AS predicted,
           |  COUNT(*) AS n
           |FROM s GROUP BY 1, 2 ORDER BY 1, 2"""
      }) { (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), langId(col("text")).as("predicted"))
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    },

    // ---- portable rolling-hash document fingerprint ----------------------
    QueryDef.sql(
      "q24_fingerprint",
      """WITH norm AS (
        |  SELECT doc_id,
        |    lower(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS nt
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN length(nt) = 0 THEN 0 ELSE list_reduce(
        |    list_prepend(0::BIGINT,
        |      list_transform(string_split(nt, ''), c -> unicode(c)::BIGINT)),
        |    (a, x) -> (a * 31 + x) % 1000000007) END AS fp
        |FROM norm ORDER BY doc_id""") { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), fingerprintPortable(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    // ---- PII redaction: typed placeholders + occurrence counts -----------
    // The synthetic corpus carries no PII, so both engines first inject
    // the SAME deterministic emails/phones (doc_id-derived; ~1/3 of docs
    // get an email, ~1/4 a phone, some both, many neither), then redact.
    // The md5 of the redacted text makes the gate exact: a regex dialect
    // divergence or a missed/extra replacement flips the hash. All
    // map-side codegen'd expressions — no shuffle at any scale.
    QueryDef.sql(
      "q74_pii_scrub", {
        import graft.text.TextAnalysis.{EmailRe, PhoneRe}
        s"""WITH aug AS (
           |  SELECT doc_id, text
           |    || CASE WHEN doc_id % 3 = 0 THEN ' reach user'
           |         || CAST(doc_id % 89 AS VARCHAR) || '@mail'
           |         || CAST(doc_id % 7 AS VARCHAR) || '.com' ELSE '' END
           |    || CASE WHEN doc_id % 4 = 0 THEN ' call 555-'
           |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS t
           |  FROM documents)
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_emails,
           |  CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phones,
           |  md5(regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
           |                     '$PhoneRe', '<PHONE>', 'g')) AS h
           |FROM aug ORDER BY doc_id"""
      }) { (s, d) =>
      import graft.text.TextAnalysis
      val aug = concat(col("text"),
        when(col("doc_id") % 3 === 0, concat(
          lit(" reach user"), (col("doc_id") % 89).cast("string"),
          lit("@mail"), (col("doc_id") % 7).cast("string"), lit(".com")))
          .otherwise(lit("")),
        when(col("doc_id") % 4 === 0, concat(
          lit(" call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")))
      Tables.documents(s, d)
        .select(col("doc_id"), aug.as("t"))
        .select(col("doc_id"),
          TextAnalysis.emailCount(col("t")).cast("long").as("n_emails"),
          TextAnalysis.phoneCount(col("t")).cast("long").as("n_phones"),
          md5(TextAnalysis.redactPii(col("t")).cast("binary")).as("h"))
        .orderBy("doc_id")
    },

    // ---- per-language distinctive terms (integer tf/df ranking) ----------
    // Top-5 tokens per language by raw language-local frequency, ties
    // broken toward corpus-rare (low document-frequency) tokens then
    // lexically — the integer-only core of tf-idf term ranking (an
    // actual idf multiplies by a log, which is float-unstable across
    // engines; the RANKING it induces for fixed tf is this df order).
    // Scale shape: one explode, two partial-agg groupBys on the token
    // key, a join of two ALREADY-AGGREGATED vocab tables, and a window
    // partitioned by language — nothing touches raw documents twice.
    QueryDef.sql(
      "q89_distinctive_terms",
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |    unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS token
        |  FROM documents),
        |tf AS (SELECT lang, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |r AS (
        |  SELECT lang, tf.token AS token, tf, df,
        |    row_number() OVER (PARTITION BY lang
        |                       ORDER BY tf DESC, df ASC, tf.token) AS rk
        |  FROM tf JOIN df ON tf.token = df.token)
        |SELECT lang, token, tf, df, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 5 ORDER BY lang, rk""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import graft.text.TextAnalysis
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
      // ONE corpus scan and ONE (lang, token) shuffle: a document has
      // exactly one lang, so global document frequency is the sum of
      // per-lang distinct-doc counts — a window over the same aggregate,
      // not a second scan+groupBy of the corpus (the naive tf/df pair of
      // aggregations planned TWO parquet scans of `documents`)
      val base = tok.groupBy("lang", "token")
        .agg(count(lit(1)).as("tf"), count_distinct(col("doc_id")).as("dfl"))
      val withDf = base
        .withColumn("df", sum(col("dfl")).over(Window.partitionBy("token")))
        .drop("dfl")
      val w = Window.partitionBy("lang").orderBy(col("tf").desc, col("df").asc, col("token"))
      withDf
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
        .select("lang", "token", "tf", "df", "rk")
        .orderBy("lang", "rk")
    },

    // ---- hashed-linear (fastText-style) quality classifier ---------------
    // Model-BASED filtering after the heuristic gates (q22/q69): each
    // token hashes into one of 4096 weight buckets (the hashing trick —
    // no vocabulary to ship), the margin is the integer sum of token
    // weights, score normalizes by length, keep thresholds at 0. Pure
    // map-side inference — the 100 TB corpus never shuffles; per-row
    // outputs are hash-gated, so the oracle replays every token hash,
    // bucket, weight, and sum bit-for-bit. One JVM pass per document
    // (TextAnalysis.hashedLinearJvm; HashedLinearSpec pins the
    // expression twin identical).
    QueryDef.sql(
      "q121_hashed_classifier",
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
        |    CAST(COALESCE(list_sum(list_transform(toks, tok ->
        |      ((list_reduce(list_prepend(0::BIGINT,
        |          list_transform(string_split(tok, ''), c -> unicode(c)::BIGINT)),
        |          (a, x) -> (a * 31 + x) % 1000000007) % 4096)
        |        * 2654435761) % 2001 - 1000)), 0) AS BIGINT) AS margin
        |  FROM t)
        |SELECT doc_id, n_tok, margin,
        |  CASE WHEN n_tok = 0 THEN 0.0::DOUBLE
        |       ELSE CAST(margin AS DOUBLE) / (n_tok * 1000) END AS score,
        |  margin > 0 AS keep
        |FROM w ORDER BY doc_id""") { (s, d) =>
      import graft.text.TextAnalysis
      Tables.documents(s, d)
        .transform(graft.Tables.spread(_, col("doc_id"))) // per-doc hash kernels want all cores
        .withColumn("hl", TextAnalysis.hashedLinearUdf(col("text")))
        .select(col("doc_id"), col("hl._1").as("n_tok"), col("hl._2").as("margin"))
        .withColumn("score", when(col("n_tok") === 0, lit(0.0))
          .otherwise(col("margin").cast("double") / (col("n_tok") * 1000)))
        .withColumn("keep", col("margin") > 0)
        .orderBy("doc_id")
    },

    // ---- uncertainty sampling: the labeling queue -------------------------
    // Active-learning selection over q121's classifier: per source, the
    // 5 documents with the SMALLEST |margin| — the rows the model is
    // least sure about, exactly the ones a labeling budget buys the
    // most from. Margin inference stays the q121 map-side JVM kernel;
    // the per-source top-N runs through `operators/StratifiedTopN`
    // (count → prefilter → rank only survivors, shortfall-guarded), so
    // one giant source never sorts in a single reducer — the same
    // scale posture as q128, keyed by |margin| instead of a hash.
    QueryDef.sql(
      "q160_uncertainty_sample",
      """WITH t AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tok,
        |    CAST(COALESCE(list_sum(list_transform(toks, tok ->
        |      ((list_reduce(list_prepend(0::BIGINT,
        |          list_transform(string_split(tok, ''), c -> unicode(c)::BIGINT)),
        |          (a, x) -> (a * 31 + x) % 1000000007) % 4096)
        |        * 2654435761) % 2001 - 1000)), 0) AS BIGINT) AS margin
        |  FROM t),
        |f AS (SELECT * FROM w WHERE n_tok > 0),
        |r AS (SELECT source, doc_id, n_tok, margin,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY source
        |               ORDER BY ABS(margin), doc_id) AS BIGINT) AS rk
        |      FROM f)
        |SELECT source, doc_id, n_tok, margin, rk FROM r WHERE rk <= 5
        |ORDER BY source, rk""") { (s, d) =>
      import graft.text.TextAnalysis
      val m = Tables.documents(s, d)
        .transform(graft.Tables.spread(_, col("doc_id")))
        .withColumn("hl", TextAnalysis.hashedLinearUdf(col("text")))
        .select(col("doc_id"), col("source"),
          col("hl._1").as("n_tok"), col("hl._2").as("margin"))
        .filter(col("n_tok") > 0)
        .withColumn("umargin", abs(col("margin")))
      graft.operators.StratifiedTopN.byHashOrder(
          m, Seq("source"), "umargin", 1L << 40, "doc_id", n = 5)
        .select(col("source"), col("doc_id"), col("n_tok"), col("margin"),
          col("rk").cast("long").as("rk"))
        .orderBy("source", "rk")
    },

    // ---- BM25 top-k lexical retrieval ------------------------------------
    // Inverted-index retrieval without materializing the inverted index:
    // per-document (dl, tf_i) for the FIXED query-term set is computed
    // map-side (no token explode, no token shuffle), the candidate
    // filter (any tf_i > 0) drops the non-matching corpus before
    // anything moves, and the corpus-level inputs — N, Σdl, per-term
    // df — are one-row aggregates broadcast back onto the candidates
    // (the q76 one-row-cross shape). Top-k is TakeOrderedAndProject:
    // per-partition heap of k, driver merge of k×partitions rows —
    // never a global sort. At 100 TB the (N, Σdl) corpus scan is the
    // part a deployment replaces with maintained stats state (one row,
    // the q104/q137/q141 sketch-table pattern); everything else touches
    // matching documents only. Scoring determinism: see
    // [[graft.text.Bm25]] — integer inputs, mirrored association order,
    // scores compared at 1e-6 granularity, rank tie-broken by doc_id.
    QueryDef.sql("q143_bm25_topk", bm25OracleSql) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import graft.text.{Bm25, TextAnalysis}
      val is = BmTerms.indices
      val toks = TextAnalysis.tokens(lower(col("text")))
      val cand = Tables.documents(s, d)
        .select(col("doc_id"), toks.as("toks"))
        .select(Seq(col("doc_id"), size(col("toks")).cast("long").as("dl")) ++
          is.map { i =>
            size(filter(col("toks"), x => x === BmTerms(i)))
              .cast("long").as(s"tf$i")
          }: _*)
        .filter(is.map(i => col(s"tf$i") > 0).reduce(_ || _))
      val stats = Tables.documents(s, d)
        .select(toks.as("toks"))
        .agg(count(lit(1)).as("n_docs"), sum(size(col("toks")).cast("long")).as("total_dl"))
        .select(col("n_docs"),
          (col("total_dl").cast("double") / col("n_docs").cast("double")).as("avgdl"))
      val dfAgg = cand.agg(
        sum((col("tf0") > 0).cast("long")).as("df0"),
        is.tail.map(i => sum((col(s"tf$i") > 0).cast("long")).as(s"df$i")): _*)
      val score = is.map { i =>
        Bm25.termScore(col(s"tf$i"), col("dl"), col(s"df$i"),
          col("n_docs"), col("avgdl"))
      }.reduceLeft(_ + _)
      val nHit = is.map(i => when(col(s"tf$i") > 0, lit(1L)).otherwise(lit(0L)))
        .reduceLeft(_ + _)
      cand
        .crossJoin(broadcast(stats))
        .crossJoin(broadcast(dfAgg))
        .select(col("doc_id"), col("dl"), nHit.as("n_hit"),
          floor(score * lit(1e6) + lit(0.5)).as("score_e6"))
        .orderBy(col("score_e6").desc, col("doc_id"))
        .limit(10)
        .withColumn("rk", row_number()
          .over(Window.orderBy(col("score_e6").desc, col("doc_id"))).cast("long"))
        .orderBy("rk")
    },

    // ---- bigram-LM perplexity filter (CCNet-style quality gate) -----------
    // Model-based quality scoring one rung above q121's hashed linear
    // classifier: an add-α-smoothed bigram language model is TRAINED on a
    // held-in slice (doc_id % 4 = 0) and every document is scored by its
    // mean negative log-likelihood — the perplexity signal CCNet-style
    // pipelines bucket web text by (high NLL ⇒ far from the reference
    // distribution ⇒ drop or down-weight). Scale shape: tokenize + bigram
    // zip are map-side; the LM build is ONE (w1,w2) groupBy with map-side
    // combine over the train slice only; scoring is an equi-join of corpus
    // bigrams against the ALREADY-AGGREGATED model tables — broadcast here
    // (and at 100 TB too, after the standard top-N prune that makes a
    // shipped LM small), shuffle equi-join on the bigram key if unpruned;
    // the per-doc reduce is an integer groupBy. Never corpus².
    // Float determinism: each bigram's -ln P is computed from integer
    // counts in mirrored op order and quantized to 1e-6 BEFORE the per-doc
    // sum, so the aggregate is exact integer addition (order-free); the
    // mean is one double division of identical integers. Unseen contexts
    // degrade smoothly to P = 1/V (α cancels), so held-out docs score
    // without special cases.
    QueryDef.sql("q151_bigram_lm_nll", BigramLmSql) { (s, d) =>
      val docs = Tables.documents(s, d)
      val (c2, c1, v) = lmTrain(docs)
      lmScore(bigramsOf(docs), c2, c1, v).orderBy("doc_id")
    },

    // ---- streaming twin of q151: model inference over a document stream --
    // The LM is STATIC state (trained batch-side, checkpointed once);
    // documents arrive as a file stream consumed one file per trigger —
    // three real micro-batches — and each batch scores against the
    // broadcast model inside foreachBatch, committing through the
    // idempotent batch-id sink (a replayed batch can never double-score
    // a doc). Scoring carries no cross-doc state (the per-doc reduce is
    // within the doc's own rows, and a doc rides in exactly one file),
    // so batching cannot change an answer: the oracle is q151's
    // VERBATIM. This is the online shape of quality filtering — a
    // fresh crawl scored on arrival against the reference LM, the
    // q147 ingest pattern with a model in place of an index.
    QueryDef.sql("q155_stream_lm_score", BigramLmSql) { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      import graft.sinks.IdempotentFileSink
      val root = QueryDef.scratch(d, "stream_lm")
      val rootP = new org.apache.hadoop.fs.Path(root)
      val hfs = rootP.getFileSystem(s.sessionState.newHadoopConf())
      if (hfs.exists(rootP)) hfs.delete(rootP, true)
      val docs = Tables.documents(s, d)
      val (c2, c1, v) = lmTrain(docs, materialize = true)
      // the corpus arrives as 3 files, one per micro-batch
      docs.select("doc_id", "text").repartition(3)
        .write.parquet(s"$root/arrivals")
      val sch = s.read.parquet(s"$root/arrivals").schema
      val q = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/arrivals")
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/_ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          IdempotentFileSink.writeBatch(
            lmScore(bigramsOf(batch), c2, c1, v), s"$root/sink", id)
        }
        .start()
      q.awaitTermination()
      IdempotentFileSink.read(s, s"$root/sink")
        .select("doc_id", "n_bigrams", "nll_e6", "mean_nll_e6")
        .orderBy("doc_id")
    },

    // ---- CCNet head/middle/tail buckets over the LM score -----------------
    // CCNet's actual OUTPUT shape: per source, documents split into
    // perplexity terciles (head = closest to the reference LM, tail =
    // furthest), the buckets a pretraining mix samples at different
    // rates. Composes q151's NLL with a per-source ntile — the window
    // partitions by source, so no global sort; ordering is on the
    // mean-NLL double, bit-identical across engines because it is one
    // division of identical integers (doc_id tie-break). The gated
    // output is the per-(source, bucket) roll-up with integer NLL
    // bounds — a drifted bucket boundary moves a doc between buckets
    // and fails the hash.
    QueryDef.sql(
      "q159_ccnet_buckets", {
        val inner = BigramLmSql.stripMargin
          .replace("FROM nll GROUP BY doc_id ORDER BY doc_id",
            "FROM nll GROUP BY doc_id")
        s"""WITH scored AS ($inner),
           |b AS (SELECT d.source, s.doc_id, s.nll_e6, s.n_bigrams,
           |        CAST(ntile(3) OVER (PARTITION BY d.source
           |               ORDER BY CAST(s.nll_e6 AS DOUBLE) / CAST(s.n_bigrams AS DOUBLE),
           |                        s.doc_id) AS BIGINT) AS bucket
           |      FROM scored s JOIN documents d ON s.doc_id = d.doc_id)
           |SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(MIN(nll_e6) AS BIGINT) AS min_nll_e6,
           |  CAST(MAX(nll_e6) AS BIGINT) AS max_nll_e6
           |FROM b GROUP BY source, bucket ORDER BY source, bucket"""
      }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val (c2, c1, v) = lmTrain(docs)
      val w = Window.partitionBy("source")
        .orderBy(col("nll_e6").cast("double") / col("n_bigrams").cast("double"),
          col("doc_id"))
      lmScore(bigramsOf(docs), c2, c1, v)
        .join(docs.select("doc_id", "source"), "doc_id")
        .withColumn("bucket", ntile(3).over(w).cast("long"))
        .groupBy("source", "bucket")
        .agg(count(lit(1)).as("n_docs"),
          min(col("nll_e6")).as("min_nll_e6"),
          max(col("nll_e6")).as("max_nll_e6"))
        .orderBy("source", "bucket")
    },

    // ---- sparse TF-IDF cosine retrieval (inverted-index join) ------------
    // The SPARSE twin of the dense embedding path (q30/q106): documents
    // as tf-idf vectors over the vocabulary, query docs retrieving their
    // top-3 nearest by cosine THROUGH AN INVERTED INDEX — candidates
    // meet only on shared tokens (the posting-list equi-join), so a pair
    // with no overlap costs nothing, ever; there is no all-pairs stage
    // at any corpus size. Plan: one tokenize+explode (map-side), one
    // (doc,token) tf shuffle, df as a second aggregate of the SAME tf
    // table (never a second corpus scan), the tiny query-doc postings
    // broadcast onto the posting join, per-pair integer dot aggregate,
    // per-query rank window. Float determinism, the q151 rule: each
    // token's weight product quantizes to 1e-6 BEFORE the per-pair sum
    // (exact integer aggregate; same for the norms' squared sums), so
    // the only double ops are one division and one multiply chain on
    // identical integers — bit-exact in DuckDB.
    QueryDef.sql(
      "q156_tfidf_cosine",
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
        |dft AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        |w AS (SELECT doc_id, tf.token AS token,
        |        CAST(tf AS DOUBLE) * LN(CAST(n AS DOUBLE) / CAST(df AS DOUBLE)) AS w
        |      FROM tf JOIN dft ON tf.token = dft.token CROSS JOIN nd),
        |nrm AS (SELECT doc_id,
        |          sqrt(CAST(SUM(CAST(FLOOR(w * w * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |               / 1000000.0) AS nrm
        |        FROM w GROUP BY 1),
        |p AS (SELECT q.doc_id AS q_id, c.doc_id AS n_id,
        |        CAST(SUM(CAST(FLOOR(q.w * c.w * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS dot_e6
        |      FROM w q JOIN w c ON q.token = c.token AND q.doc_id <> c.doc_id
        |      WHERE q.doc_id % 100 = 0
        |      GROUP BY 1, 2),
        |sc AS (SELECT q_id, n_id,
        |         (CAST(dot_e6 AS DOUBLE) / 1000000.0) / (a.nrm * b.nrm) AS sim
        |       FROM p JOIN nrm a ON q_id = a.doc_id JOIN nrm b ON n_id = b.doc_id),
        |r AS (SELECT q_id, n_id, sim,
        |        CAST(row_number() OVER (PARTITION BY q_id
        |               ORDER BY sim DESC, n_id) AS BIGINT) AS rank
        |      FROM sc)
        |SELECT q_id, n_id, sim, rank FROM r WHERE rank <= 3
        |ORDER BY q_id, rank""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import graft.text.TextAnalysis
      val docs = Tables.documents(s, d)
      val tf = docs
        .select(col("doc_id"),
          explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      // dft grows with DISTINCT TOKENS (Heaps' law — 10⁸-10⁹ at web
      // scale), so it must NOT be broadcast: the tf ⋈ dft equi-join on
      // token reuses the hash partitioning the df aggregate itself just
      // produced, so the plain join costs zero extra exchange on the df
      // side. Only the 1-row corpus count and the fixed query postings
      // below are broadcast-sized.
      val dft = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val nd = docs.agg(count(lit(1)).as("n"))
      val w = tf.join(dft, "token")
        .crossJoin(broadcast(nd))
        .select(col("doc_id"), col("token"),
          (col("tf").cast("double") *
            log(col("n").cast("double") / col("df").cast("double"))).as("w"))
        // weights feed the norms AND both sides of the posting join
        .transform(graft.Materialize.checkpoint)
      val nrm = w.groupBy("doc_id")
        .agg(sum(floor(col("w") * col("w") * lit(1e6) + lit(0.5))).as("n2e6"))
        .select(col("doc_id"),
          sqrt(col("n2e6").cast("double") / lit(1e6)).as("nrm"))
      val q = w.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("q_id"), col("token"), col("w").as("wq"))
      val pairs = broadcast(q)
        .join(w.select(col("doc_id").as("n_id"), col("token"), col("w").as("wc")),
          "token")
        .filter(col("q_id") =!= col("n_id"))
        .groupBy("q_id", "n_id")
        .agg(sum(floor(col("wq") * col("wc") * lit(1e6) + lit(0.5))).as("dot_e6"))
      val win = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      pairs
        .join(nrm.select(col("doc_id").as("q_id"), col("nrm").as("nq")), "q_id")
        .join(nrm.select(col("doc_id").as("n_id"), col("nrm").as("nc")), "n_id")
        .select(col("q_id"), col("n_id"),
          ((col("dot_e6").cast("double") / lit(1e6)) /
            (col("nq") * col("nc"))).as("sim"))
        .withColumn("rank", row_number().over(win).cast("long"))
        .filter(col("rank") <= 3)
        .orderBy("q_id", "rank")
    },

    // ---- chunk-level retrieval capstone (RAG-ingest shape) ----------------
    // The text→vector BRIDGE composed end-to-end: documents split into
    // 16-token chunks (q152's granularity — retrieval wants passages,
    // not whole documents), every chunk embedded map-side by the SIGNED
    // FEATURE-HASHING trick (integer vector: token t adds ±1 to
    // component foldHash(t) mod 16 — deterministic, so the oracle
    // reproduces every component), query documents embedded the same
    // way, and each query retrieves its top-3 nearest chunks by cosine
    // (own document excluded). Exactness: integer dots/norms via the
    // codegen fold_dot_long kernel, one double division of identical
    // integers — bit-exact in DuckDB. Scale shape: embedding is a
    // PROJECTION (zero shuffle — the q152 rule), the gate serves
    // brute-force against the broadcast query workload (q30's shape);
    // at 100 TB the same chunk-embedding table feeds the gated IVF/PQ
    // lifecycle (q106/q107/q147) unchanged — the capstone's new
    // semantics is the bridge, not the index.
    QueryDef.sql(
      "q165_chunk_retrieval", {
        val fold = "list_reduce(list_prepend(0::BIGINT, " +
          "list_transform(string_split(t, ''), c -> unicode(c)::BIGINT)), " +
          "(a, x) -> (a * 31 + x) % 1000000007)"
        val emb = (0 until 16).map { j =>
          s"CAST(list_sum(list_transform(hs, h -> CASE WHEN h % 16 = $j " +
            "THEN CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END " +
            "ELSE 0 END)) AS BIGINT)"
        }.mkString("[", ", ", "]")
        s"""WITH t AS (
           |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
           |  FROM documents),
           |tn AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
           |ch AS (SELECT doc_id, k AS chunk_no, toks[16*k+1:16*k+16] AS ctoks
           |       FROM (SELECT doc_id, toks, unnest(range(0, (len(toks)+15)//16)) AS k FROM tn)),
           |ce AS (SELECT doc_id, chunk_no, $emb AS emb
           |       FROM (SELECT doc_id, chunk_no, list_transform(ctoks, t -> $fold) AS hs FROM ch)),
           |cn AS (SELECT * FROM (
           |         SELECT doc_id, chunk_no, emb,
           |           CAST(list_sum(list_transform(range(1, 17), i -> emb[i]*emb[i])) AS BIGINT) AS n2
           |         FROM ce) WHERE n2 > 0),
           |qe AS (SELECT doc_id AS q_id, $emb AS emb
           |       FROM (SELECT doc_id, list_transform(toks, t -> $fold) AS hs
           |             FROM tn WHERE doc_id % 100 = 0)),
           |qn AS (SELECT * FROM (
           |         SELECT q_id, emb,
           |           CAST(list_sum(list_transform(range(1, 17), i -> emb[i]*emb[i])) AS BIGINT) AS qn2
           |         FROM qe) WHERE qn2 > 0),
           |sc AS (SELECT q_id, c.doc_id AS n_doc, c.chunk_no,
           |         CAST(list_sum(list_transform(range(1, 17), i -> q.emb[i]*c.emb[i])) AS DOUBLE)
           |           / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) AS sim
           |       FROM qn q JOIN cn c ON q.q_id <> c.doc_id),
           |r AS (SELECT q_id, n_doc, chunk_no, sim,
           |        CAST(row_number() OVER (PARTITION BY q_id
           |               ORDER BY sim DESC, n_doc, chunk_no) AS BIGINT) AS rank
           |      FROM sc)
           |SELECT q_id, n_doc, CAST(chunk_no AS BIGINT) AS chunk_no, sim, rank
           |FROM r WHERE rank <= 3 ORDER BY q_id, rank"""
      }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import graft.functions.{Exact, VectorFold}
      VectorFold.register(s)
      val docs = Tables.documents(s, d)
        .transform(graft.Tables.spread(_, col("doc_id")))
        .select(col("doc_id"),
          graft.text.TextAnalysis.tokens(lower(col("text"))).as("toks"))
        .filter(size(col("toks")) > 0)
        .transform(graft.Materialize.checkpoint) // feeds chunks AND queries
      val chunks = docs
        .select(col("doc_id"), posexplode(transform(
            sequence(lit(0), expr("(size(toks) + 15) div 16 - 1")),
            k => slice(col("toks"), (k * 16 + 1).cast("int"), lit(16))))
          .as(Seq("chunk_no", "ctoks")))
        .select(col("doc_id"), col("chunk_no").cast("long").as("chunk_no"),
          Exact.hashEmbedUdf(col("ctoks"), lit(16)).as("emb"))
        .withColumn("n2", VectorFold.dotLong(col("emb"), col("emb")))
        .filter(col("n2") > 0)
      val q = docs.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("q_id"),
          Exact.hashEmbedUdf(col("toks"), lit(16)).as("qemb"))
        .withColumn("qn2", VectorFold.dotLong(col("qemb"), col("qemb")))
        .filter(col("qn2") > 0)
      val win = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("n_doc"), col("chunk_no"))
      broadcast(q).join(chunks, col("q_id") =!= col("doc_id"))
        .select(col("q_id"), col("doc_id").as("n_doc"), col("chunk_no"),
          (VectorFold.dotLong(col("qemb"), col("emb")).cast("double") /
            (sqrt(col("qn2").cast("double")) * sqrt(col("n2").cast("double"))))
            .as("sim"))
        .withColumn("rank", row_number().over(win).cast("long"))
        .filter(col("rank") <= 3)
        .orderBy("q_id", "rank")
    }
  )
}
