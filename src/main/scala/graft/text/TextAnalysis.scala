package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Exact

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization + token counting, BPE-ish subword counting, quality
  * scoring, language-ID by token-profile voting, and document
  * fingerprinting. (Driver extension surface; no reference analog — the
  * closest are the regex scalar ops of SURVEY.md §2.8.)
  *
  * Everything is builtin expressions (split / filter / regexp_count /
  * higher-order array functions) → whole-stage codegen, one scan, no
  * shuffle until the caller aggregates. At 100 TB these are the map-side
  * of a documents pipeline; the only state is literal token profiles.
  */
object TextAnalysis {

  /** Whitespace tokens, empty strings dropped (multi-space safe). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alpha runs + digit runs + single punctuation,
    * the classic pre-tokenizer upper bound on BPE piece count.
    */
  def bpeishCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))

  def punctCount(text: Column): Column =
    regexp_count(text, lit("[^A-Za-z0-9 ]"))

  /** Fraction of tokens present in `stop` (a closed stopword set). */
  def stopwordRatio(text: Column, stop: Seq[String]): Column = {
    val t = tokens(text)
    size(filter(t, x => x.isin(stop: _*))).cast("double") / size(t)
  }

  /** Composite quality score in [0,1]:
    * 0.5·stopword-ratio + 0.3·(1 − punct-density) + 0.2·min(1, tokens/100).
    * Same shape as published heuristic quality filters (length, symbol
    * density, stopword presence); weights are fixed constants so the score
    * is bit-reproducible.
    */
  def qualityScore(text: Column, stop: Seq[String]): Column =
    lit(0.5) * stopwordRatio(text, stop) +
      lit(0.3) * (lit(1.0) - punctCount(text).cast("double") / length(text)) +
      lit(0.2) * least(lit(1.0), tokenCount(text).cast("double") / lit(100.0))

  /** One-pass JVM twin of the [[qualityScore]] COUNTS — (tokens,
    * stopword hits, punct chars, text length in code points). The
    * expression form's `filter(tokens, isin(stop...))` is a
    * higher-order function (CodegenFallback: an interpreted lambda per
    * token) running a LINEAR stopword scan per token, plus a regex pass
    * for punct — measured 16.1 s → 0.3 s for the 500k-doc score pass at
    * the 100× smoke (the win100 decomposition rows time both forms
    * permanently). Only the integer counting moves to the JVM; the
    * score's double arithmetic stays in Catalyst ([[scoreFromCounts]])
    * in exactly [[qualityScore]]'s op order, so the two forms are
    * bit-identical (TextKernelSpec pins it, incl. empty/punct-only/null
    * texts). Code-point iteration matches `length()`/Java-regex
    * semantics beyond the BMP.
    */
  def textStatsJvm(text: String, stop: Set[String]): (Long, Long, Long, Long) = {
    val toks = text.split(" ")
    var n = 0L; var s = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) { n += 1; if (stop.contains(t)) s += 1 }
      i += 1
    }
    var p = 0L; var len = 0L
    var j = 0
    while (j < text.length) {
      val cp = text.codePointAt(j)
      len += 1
      val plain = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= '0' && cp <= '9') || cp == ' '
      if (!plain) p += 1
      j += Character.charCount(cp)
    }
    (n, s, p, len)
  }

  /** [[qualityScore]]'s exact double assembly over a counts struct
    * `(n_tokens, n_stop, n_punct, n_chars)` — the same Catalyst ops in
    * the same order as the expression form (incl. its ANSI
    * divide-by-zero THROW on a zero-token text — the twins agree on
    * exceptions too), so only the counting differs between them.
    */
  def scoreFromCounts(st: Column): Column =
    lit(0.5) * (st.getField("_2").cast("double") / st.getField("_1")) +
      lit(0.3) * (lit(1.0) - st.getField("_3").cast("double") / st.getField("_4")) +
      lit(0.2) * least(lit(1.0), st.getField("_1").cast("double") / lit(100.0))

  /** Drop-in fast twin of [[qualityScore]]: JVM counts + Catalyst score
    * assembly. NULL text → NULL score, as the expression form.
    */
  def qualityScoreFast(text: Column, stop: Seq[String]): Column = {
    val stopSet = stop.toSet
    val u = udf((s: String) => Option(s).map(textStatsJvm(_, stopSet)))
    scoreFromCounts(u(text))
  }

  /** Language profiles: token vote sets. Deterministic, closed-world —
    * the n-gram-heuristic shape of fastText-style LID reduced to exact
    * token membership so an independent SQL oracle exists.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "key", "scan", "fast"),
    "de" -> Seq("agg", "sort", "vector", "window"),
    "es" -> Seq("data", "row", "stream", "small"),
    "fr" -> Seq("query", "order", "line", "big"),
    "zh" -> Seq("merge", "join", "batch", "table"))

  def langScore(text: Column, profile: Seq[String]): Column =
    size(filter(tokens(text), x => x.isin(profile: _*)))

  /** Predicted language: argmax of profile votes, ties broken by profile
    * declaration order (en > de > es > fr > zh).
    */
  def langId(text: Column): Column = {
    val scores = LangProfiles.map { case (l, p) => l -> langScore(text, p) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // Built right-to-left so the first declared language wins ties.
    scores.reverse.foldLeft(lit("und"): Column) { case (acc, (l, s)) =>
      when(s === best, lit(l)).otherwise(acc)
    }
  }

  /** Deterministic document fingerprint: polynomial rolling hash over the
    * normalized text (lowercase, non-alphanumeric collapsed) — the
    * oracle-mirrorable form (see [[graft.functions.Exact.foldHash]]).
    * For pure-Spark scale paths prefer [[fingerprint64]].
    */
  def fingerprintPortable(text: Column): Column =
    Exact.foldHashUdf(lower(regexp_replace(text, "[^A-Za-z0-9 ]", "")))

  /** 64-bit xxHash fingerprint — the production-scale variant (one codegen
    * expression, no per-char array). Not DuckDB-mirrorable bit-for-bit, so
    * queries use [[fingerprintPortable]] for the oracle and this for speed.
    */
  def fingerprint64(text: Column): Column =
    xxhash64(lower(regexp_replace(text, "[^A-Za-z0-9 ]", "")))

  /** `(total, distinct)` word-bigram counts in one JVM pass. The
    * expression form (`array_distinct` over the bigram strings) is O(n²):
    * Spark's specialized distinct hash set covers primitive types only,
    * so string arrays fall back to pairwise comparison — measured 7.5 s
    * vs sub-second at sf0.1 on q69. Token split matches [[tokens]]
    * (split on space, empties dropped).
    */
  def bigramStatsJvm(text: String): (Long, Long) = {
    val toks = text.split(" ").filter(_.nonEmpty)
    if (toks.length < 2) (0L, 0L)
    else {
      val set = new java.util.HashSet[String]()
      var i = 0
      while (i < toks.length - 1) { set.add(toks(i) + " " + toks(i + 1)); i += 1 }
      ((toks.length - 1).toLong, set.size.toLong)
    }
  }

  /** PII redaction patterns — deliberately restricted to constructs with
    * identical semantics in Java regex (Spark) and RE2 (DuckDB): character
    * classes, `+`/bounded repetition, no backrefs/lookaround. Codegen'd
    * `regexp_replace`/`regexp_count` — pure map-side work at any scale.
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "555-[0-9]{4}"

  /** Replace every email/phone occurrence with a typed placeholder token —
    * the standard pre-training PII scrub (redact, don't drop: document
    * structure survives for packing/quality scoring downstream).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))

  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))

  /** Null-safe: null text → `(0, 0)` — exactly what the expression
    * pipeline it replaced computed (`wordShingles(null)` is the empty
    * array, so both counts were 0) and what the DuckDB oracle's
    * `CASE WHEN len(toks) >= 2 … ELSE []` yields. A bare String-param
    * UDF would NPE instead.
    */
  val bigramStatsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((s: String) =>
      if (s == null) (0L, 0L) else bigramStatsJvm(s))

  /** Hashed-bag-of-words LINEAR classifier inference — the fastText-
    * style model-based quality filter real pretraining pipelines run
    * after the heuristic gates: each token hashes into one of `dim`
    * weight buckets (the hashing trick — no vocabulary state to ship,
    * the property that makes the model a pure map-side function at
    * 100 TB), the document's margin is the sum of its tokens' weights,
    * and the keep decision thresholds it. Weights here are a fixed
    * integer function of the bucket (`(b·2654435761) mod 2001 − 1000`,
    * i.e. ~uniform in [−1000, 1000]) so inference is EXACT integer
    * arithmetic — order-independent, engine-independent, and replayable
    * verbatim by the DuckDB oracle; swapping trained weights in means
    * broadcasting a `dim`-sized array, nothing else changes. Returns
    * `(n_tokens, margin)`.
    *
    * One JVM pass per document, same measured policy as
    * [[bigramStatsJvm]]: the expression form re-materializes a
    * per-token hash fold through a per-character array per token.
    * HashedLinearSpec pins the expression twin bit-identical.
    */
  def hashedLinearJvm(text: String, dim: Long): (Long, Long) = {
    val toks = text.split(" ")
    var n = 0L
    var m = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        n += 1
        val b = Exact.foldHashJvm(t) % dim
        m += (b * 2654435761L) % 2001L - 1000L
      }
      i += 1
    }
    (n, m)
  }

  /** Null-safe UDF form of [[hashedLinearJvm]] at the standard 4096
    * buckets; null text → `(0, 0)` like every text kernel here.
    */
  val hashedLinearUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((s: String) =>
      if (s == null) (0L, 0L) else hashedLinearJvm(s, 4096L))
}
