package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Training-data preparation operators: deterministic mixture sampling
  * (up/down-weighting sources), token-budget truncation, and greedy
  * sequence packing — the ops that sit between dedup/quality filtering
  * and tokenizer sharding in a real pipeline. All hash/arithmetic-based,
  * so the DuckDB oracle reproduces every decision bit-for-bit (no RNG).
  */
object MixQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- mixture sampling: per-language keep-rates, hash-gated -----------
    // keep iff (doc_id·2654435761 mod 1000) < rate(lang): en 80%, de 50%,
    // others 25% — deterministic "data mixing" with no RNG state.
    QueryDef.sql(
      "q60_mixture_sample",
      """SELECT lang, COUNT(*) AS n_kept,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars_kept
        |FROM documents
        |WHERE (doc_id * 2654435761) % 1000 <
        |  CASE lang WHEN 'en' THEN 800 WHEN 'de' THEN 500 ELSE 250 END
        |GROUP BY lang ORDER BY lang""") { (s, d) =>
      val rate = when(col("lang") === "en", 800)
        .when(col("lang") === "de", 500).otherwise(250)
      Tables.documents(s, d)
        .filter((col("doc_id") * 2654435761L) % 1000 < rate)
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
    }
  )
}
