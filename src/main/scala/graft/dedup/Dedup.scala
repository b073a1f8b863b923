package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.text.TextAnalysis

/** Document deduplication operators for training-data pipelines: exact
  * (hash group-by), MinHash+LSH banding, SimHash, and character-n-gram
  * Jaccard. (Driver extension surface; the reference's only dedup is the
  * keep-first key dedup of SURVEY.md §2.4 A4.)
  *
  * Design for 100 TB:
  *  - Exact dedup is one hash-aggregate on a 128-bit digest — the digest
  *    (not the document) is the shuffle key, so shuffle volume is rows ×
  *    ~40 bytes regardless of document size.
  *  - MinHash/LSH: per-document signatures are map-side only; the ONLY
  *    shuffle is the band-bucket exchange (bands × rows small keys), and
  *    candidate verification joins back just the candidate ids — the
  *    classic shingle→minhash→band→bucket-join plan, never an O(n²)
  *    cross join.
  *  - SimHash: signature map-side; near-pair search blocks on signature
  *    bytes (any hamming-≤k pair shares ≥1 of the 3 byte-bands under
  *    k ≤ 3 ⇒ pigeonhole), so the join key is one byte of the signature.
  *  - All primitives are higher-order-function expressions on arrays —
  *    codegen, no UDFs, no driver-side loops.
  *
  * Hash parity: signatures use [[Exact.foldHash]] (portable polynomial
  * hash) so a DuckDB oracle reproduces them bit-for-bit; a production
  * deployment would swap in `xxhash64` 1:1.
  */
object Dedup {

  val P: Long = Exact.HashP

  /** Fixed MinHash permutation constants (a·h + b mod P). Both engines
    * receive the same literals — generated once here, injected into the
    * oracle SQL by the query builder.
    */
  val NumPerms = 16
  val Perms: Seq[(Long, Long)] =
    (1 to NumPerms).map(j => (((j * 1299721L) % P) | 1L, (j * 104729L * 7919L) % P))

  /** LSH banding: 4 bands × 4 rows (s-curve threshold ≈ (1/4)^(1/4) ≈ .71
    * on the signature; we verify candidates exactly afterwards).
    */
  val Bands = 4
  val RowsPerBand: Int = NumPerms / Bands

  /** k-word shingles of the whitespace tokens ("" when fewer than k). */
  def wordShingles(text: Column, k: Int = 3): Column = {
    val t = TextAnalysis.tokens(text)
    when(size(t) >= k,
      transform(sequence(lit(0), size(t) - k),
        i => concat_ws(" ", (1 to k).map(o => element_at(t, i + o)): _*)))
      .otherwise(typedlit(Seq.empty[String]))
  }

  /** JVM twin of `array_distinct(wordShingles(text, k))`: one pass, one
    * split. The expression form re-runs the tokens SPLIT inside the
    * transform lambda for every element access (no common-subexpression
    * elimination inside higher-order-function bodies), making shingle
    * construction quadratic in document length. First-occurrence order is
    * preserved (LinkedHashSet), matching `array_distinct`.
    */
  def distinctShinglesJvm(text: String, k: Int): Array[String] = {
    val toks = text.split(" ").filter(_.nonEmpty)
    if (toks.length < k) Array.empty
    else {
      val set = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + k <= toks.length) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
        set.add(sb.toString)
        i += 1
      }
      set.toArray(new Array[String](set.size))
    }
  }

  /** Null-safe: null text → EMPTY shingle set — exactly what
    * `array_distinct(wordShingles(null))` evaluates to (tokens(null) is
    * null, `when(size(null) >= k)` is null → the `.otherwise([])` branch)
    * and what the DuckDB oracle's `CASE WHEN len(toks) >= 2 … ELSE []`
    * yields. A bare String-param UDF would NPE instead (the
    * [[graft.functions.Exact.foldHashUdf]] hazard).
    */
  val distinctShinglesUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((s: String, k: Int) =>
      if (s == null) Array.empty[String] else distinctShinglesJvm(s, k))

  /** Distinct character n-grams of a string (1-based substr positions,
    * matching the oracle's `range`-generated slices) — the expression
    * form, kept as the documented oracle mirror and spec cross-check.
    */
  def charNgramsExpr(text: Column, n: Int = 3): Column =
    array_distinct(
      when(length(text) >= n,
        transform(sequence(lit(1), length(text) - (n - 1)),
          i => text.substr(i, lit(n))))
        .otherwise(typedlit(Seq.empty[String])))

  /** JVM twin of [[charNgramsExpr]]: `array_distinct` over STRING arrays
    * is Spark's pairwise-comparison fallback (the specialized hash set
    * covers primitive types only — the [[graft.text.TextAnalysis
    * .bigramStatsJvm]] finding), so a ~1k-gram document costs ~10⁶
    * string compares. One pass, one LinkedHashSet; first-occurrence
    * order preserved, matching `array_distinct`.
    */
  def charNgramsJvm(text: String, n: Int): Array[String] = {
    if (text.length < n) Array.empty
    else {
      val set = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + n <= text.length) { set.add(text.substring(i, i + n)); i += 1 }
      set.toArray(new Array[String](set.size))
    }
  }

  /** Null-safe (null text → empty grams, the expression form's value). */
  val charNgramsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((s: String, n: Int) =>
      if (s == null) Array.empty[String] else charNgramsJvm(s, n))

  /** Hot-path distinct n-grams (see [[charNgramsJvm]]). */
  def charNgrams(text: Column, n: Int = 3): Column =
    charNgramsUdf(text, lit(n))

  /** Portable hashes of an array of strings (JVM fold — same values as
    * `transform(arr, Exact.foldHash)`, without a per-character array per
    * element; see [[Exact.foldHashJvm]]).
    */
  def hashAll(arr: Column): Column = Exact.foldHashAllUdf(arr)

  /** MinHash signature (length [[NumPerms]]) from pre-hashed shingles.
    * ONE pass over the hash array with an array accumulator (vs 16
    * independent `array_min(transform(...))` passes, which would also
    * re-evaluate the shingle-hash transform 16×): per element, each perm
    * slot takes `least(acc_i, (h·a_i + b_i) mod P)`. Empty input → null
    * signature (mirrors `list_min([]) = NULL`).
    */
  def minhashSignature(hashes: Column): Column =
    aggregate(
      hashes,
      typedlit(Seq.fill(NumPerms)(Long.MaxValue)),
      (acc, h) => array(Perms.zipWithIndex.map { case ((a, b), i) =>
        least(element_at(acc, i + 1), pmod(h * a + b, lit(P)))
      }: _*),
      acc => when(element_at(acc, 1) === Long.MaxValue,
        lit(null).cast("array<bigint>")).otherwise(acc))

  /** JVM twin of `minhashSignature(hashAll(shingles))`, fused: one pass
    * over the shingles folds each portable hash and updates all
    * [[NumPerms]] permutation minima in a primitive long array — no
    * intermediate hash array, no per-element array-accumulator
    * allocation (the expression fold builds a fresh 16-slot array per
    * shingle). Identical values: same char fold, same `(a·h+b) mod P`,
    * same empty→null contract. Equivalence pinned by DedupSimSpec's
    * dual-impl case and q26's oracle.
    */
  private val PermA: Array[Long] = Perms.map(_._1).toArray
  private val PermB: Array[Long] = Perms.map(_._2).toArray

  def minhashJvm(shingles: Seq[String]): Array[Long] = {
    val mins = Array.fill(NumPerms)(Long.MaxValue)
    val as = PermA
    val bs = PermB
    shingles.foreach { s =>
      val h = Exact.foldHashJvm(s)
      var i = 0
      while (i < NumPerms) {
        val v = (h * as(i) + bs(i)) % P // h, a < P < 2^30 → no overflow
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }
    mins
  }

  /** `minhashUdf(shingles)` → array<bigint> signature (null for empty). */
  val minhashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((xs: Seq[String]) =>
      Option(xs).filter(_.nonEmpty).map(minhashJvm))

  /** Band keys: [[Bands]] strings, each the comma-join of one signature
    * slice — the LSH bucket identifiers.
    */
  def bandKeys(sig: Column): Column =
    array((0 until Bands).map { b =>
      concat_ws(",", slice(sig, b * RowsPerBand + 1, RowsPerBand).cast("array<string>"))
    }: _*)

  /** Exact Jaccard over two pre-distinct string sets. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** SimHash bit width — [[Exact.foldHash]] values are < 2^30, so 24 bits
    * of real signal; 24 = 3 byte-bands for the hamming-≤3 pigeonhole
    * blocking.
    */
  val SimHashBits = 24

  /** A lane-overflow bound for [[simhash]]: per-bit counters are 16-bit
    * lanes, so any document of ≤ 65,535 tokens folds exactly; beyond that
    * a lane could carry into its neighbor, so the signature is null (no
    * signature — the document is too large to simhash in one fold; split
    * upstream if such docs must participate).
    */
  val SimHashMaxTokens = 65535

  /** Max accepted edit distance for q98's blocked levenshtein near-dup
    * verify — also the early-abandon threshold handed to Spark's
    * bounded levenshtein.
    */
  val EditDistanceMax = 8

  /** SimHash signature from pre-hashed tokens: per bit, majority vote over
    * the token hashes (ones ≥ half sets the bit — identical to the ±1
    * vote-sum ≥ 0 formulation the oracle uses: `ones − (n − ones) ≥ 0 ⇔
    * 2·ones ≥ n`).
    *
    * ONE pass, bit-packed: the 24 one-counters live in 8 longs of 3
    * 16-bit lanes (shifts 0/16/32); each token adds its spread bit
    * pattern with pure long arithmetic — no per-token array allocation.
    * Three lanes, not four: a 4-lane packing puts the top lane at bit 48,
    * and at 32,768 tokens its counter crosses bit 63 — a signed-long
    * overflow that ANSI mode rejects outright and non-ANSI mode wraps
    * into sign-corrupted lane reads. With the top lane at bit 32 the
    * accumulator peaks at 65,535·(1+2^16+2^32) ≈ 2^48, far inside the
    * signed range, so every lane extracts exactly for any n ≤
    * [[SimHashMaxTokens]]. Larger documents — and empty ones, mirroring
    * `minhashSignature`'s null — yield a null signature.
    */
  def simhash(hashes: Column): Column = {
    // bit pattern of h's 3-bit group spread into the 16-bit lanes of one long
    def spread(h: Column, group: Int): Column =
      (0 until 3).map { k =>
        shiftleft(shiftright(h, group * 3 + k) % 2, k * 16)
      }.reduce(_ + _)
    aggregate(
      hashes,
      struct((0 until 8).map(i => lit(0L).as(s"c$i")) :+ lit(0L).as("n"): _*),
      (acc, h) => struct(
        (0 until 8).map(i => (acc(s"c$i") + spread(h, i)).as(s"c$i"))
          :+ (acc("n") + 1L).as("n"): _*),
      acc => when(acc("n") === 0 || acc("n") > SimHashMaxTokens,
        lit(null).cast("bigint"))
        .otherwise((0 until SimHashBits).map { b =>
          val ones = shiftright(acc(s"c${b / 3}"), (b % 3) * 16)
            .bitwiseAND(lit(0xFFFFL))
          when(ones * 2 >= acc("n"), lit(1L << b)).otherwise(lit(0L))
        }.reduce(_ + _)))
  }

  /** JVM twin of `simhash(hashAll(tokens))`, fused like [[minhashJvm]]:
    * one pass folds each token hash and bumps 24 primitive int vote
    * counters (the expression fold allocates a 9-field struct per
    * token). Same contract: empty or > [[SimHashMaxTokens]] → null.
    */
  def simhashJvm(tokens: Seq[String]): java.lang.Long = {
    val n = tokens.length
    if (n == 0 || n > SimHashMaxTokens) return null
    val ones = new Array[Int](SimHashBits)
    tokens.foreach { t =>
      val h = Exact.foldHashJvm(t)
      var b = 0
      while (b < SimHashBits) {
        if (((h >> b) & 1L) == 1L) ones(b) += 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < SimHashBits) {
      if (2L * ones(b) >= n) sig |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  val simhashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((xs: Seq[String]) =>
      Option(xs).map(simhashJvm).orNull)

  /** The three byte-bands of a 24-bit simhash (blocking keys). */
  def simhashBytes(sh: Column): Seq[Column] =
    (0 until 3).map(i => pmod(shiftright(sh, i * 8), lit(256L)))

  /** Production-width simhash: 64 vote bits over a wrapping FNV-1a-64
    * token hash. The 24-bit portable form above exists because the DuckDB
    * oracle needs overflow-free arithmetic (`foldHash` < 2^30); this is
    * the variant a 100 TB run should block on — 4 16-bit bands give
    * 65,536 keys per band vs the byte-bands' 256, cutting expected
    * bucket collisions ~256× for the same hamming-≤3 pigeonhole. The
    * wrapping multiply overflows BIGINT SQL, but the q78 oracle carries
    * the hash as a DuckDB HUGEINT (int128) reduced mod 2^64 — exact,
    * since the 64-bit state × 41-bit FNV prime product fits in 105
    * bits — so this width is hash-gated bit-for-bit like the 24-bit
    * form, plus DedupSimSpec's determinism/locality/null properties.
    */
  def fnv64Jvm(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L // wrapping on purpose: JVM long multiply
      i += 1
    }
    h
  }

  def simhash64Jvm(tokens: Seq[String]): java.lang.Long = {
    val n = tokens.length
    if (n == 0 || n > SimHashMaxTokens) return null
    val ones = new Array[Int](64)
    tokens.foreach { t =>
      val h = fnv64Jvm(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) ones(b) += 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (2L * ones(b) >= n) sig |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  val simhash64Udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((xs: Seq[String]) =>
      Option(xs).map(simhash64Jvm).orNull)

  /** The four 16-bit bands of a 64-bit simhash (blocking keys). `>>>`
    * semantics via shiftrightunsigned: the top band must not smear the
    * sign bit (the round-2 lane-extraction lesson).
    */
  def simhash64Bands(sh: Column): Seq[Column] =
    (0 until 4).map(i =>
      shiftrightunsigned(sh, i * 16).bitwiseAND(lit(0xFFFFL)))

  /** Hamming distance between two simhash signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact-substring duplication signal (Lee et al. 2022,
    * arXiv:2107.06499 "Deduplicating Training Data Makes Language Models
    * Better" — the shingle-hash approximation of its suffix-array
    * ExactSubstr): every k-token window is hashed; a window whose hash
    * occurs more than once ANYWHERE in the corpus (another doc, or a
    * repeat inside its own doc) is a duplicated span. Unlike the
    * document-level families above, this measures substring-level
    * duplication — the boilerplate/quote/copy-paste signal doc-level
    * MinHash dilutes away on long documents. Output per doc:
    * (doc_id, n_windows, n_dup_windows, dup_frac). Docs with fewer than
    * k tokens (or NULL text) have no windows and are absent.
    *
    * Scale: windows are built map-side (one `transform` over the token
    * array + explode — no shuffle until the hash group-by); the shuffle
    * key is the 128-bit digest, never the window text, so shuffle bytes
    * are ~tokens × 40 regardless of token width. The count and the
    * flag join share the same hash partitioning (exchange reuse), and
    * the final aggregate is per-doc. This linear-shuffle plan is the
    * distributable trade for ExactSubstr's single-machine suffix array.
    */
  def substringDupStats(docs: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val wins = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      // guard BEFORE sequence(): sequence(1, 0) would count DOWN
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(toks) - ${k - 1}), " +
          s"i -> array_join(slice(toks, i, $k), ' '))")).as("win"))
      // 16-byte binary digest, not md5's 32-char hex STRING: `h` is the
      // wide shuffle key (one per window, token-linear volume), so hex
      // doubles every exchange this operator pays for zero information
      .select(col("doc_id"), unhex(md5(col("win").cast("binary"))).as("h"))
    val counts = wins.groupBy("h").agg(count(lit(1)).as("cnt"))
    wins.join(counts, "h")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_windows"),
        sum(when(col("cnt") > 1, 1).otherwise(0)).cast("long")
          .as("n_dup_windows"),
        (sum(when(col("cnt") > 1, 1).otherwise(0)).cast("double") /
          count(lit(1))).as("dup_frac"))
  }
}
