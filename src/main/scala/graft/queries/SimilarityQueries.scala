package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.sim.Similarity

/** Similarity-search coverage over `embeddings`: exact brute-force cosine
  * top-k (the baseline every ANN variant is judged against), IVF nprobe=1
  * search (the scale path), and blocked embedding-cosine near-dup pairs.
  * DuckDB oracles pin the identical sequential fold order for every dot
  * product, so similarities compare bit-for-bit.
  */
object SimilarityQueries {

  /** DuckDB mirror of [[graft.functions.Exact.foldDot]]. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)"

  /** DuckDB mirror of [[graft.functions.Exact.foldCosine]]. */
  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  val defs: Seq[QueryDef] = Seq(

    // ---- brute-force cosine top-k (exact ANN baseline) -------------------
    QueryDef.sql(
      "q30_cosine_topk",
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
         |c AS (SELECT vec_id AS n_id, embedding AS nv FROM embeddings),
         |s AS (SELECT q_id, n_id, ${cosSql("qv", "nv")} AS sim
         |      FROM c JOIN q ON q_id <> n_id),
         |r AS (SELECT q_id, n_id, sim,
         |        CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT) AS rank
         |      FROM s)
         |SELECT q_id, n_id, sim, rank FROM r WHERE rank <= 5
         |ORDER BY q_id, rank""") { (s, d) =>
      val e = Tables.embeddings(s, d).repartition(col("vec_id")) // spread cosine kernels
      Similarity.topkNeighbors(e.filter(col("vec_id") % 100 === 0), e, 5)
        .orderBy("q_id", "rank")
    },

    // ---- blocked embedding-cosine near-dup pairs -------------------------
    QueryDef.sql(
      "q31_embedding_neardup",
      s"""SELECT d1, d2, sim FROM (
         |  SELECT a.vec_id AS d1, b.vec_id AS d2,
         |         ${cosSql("a.embedding", "b.embedding")} AS sim
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id)
         |WHERE sim >= 0.3 ORDER BY d1, d2""") { (s, d) =>
      Similarity.nearDupPairs(
        Tables.embeddings(s, d).repartition(col("vec_id")), "label", 0.3)
        .orderBy("d1", "d2")
    },

    // ---- IVF (inverted-file) ANN: assign to centroid cells, search own cell
    QueryDef.sql(
      "q32_ann_ivf",
      s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cv
         |               FROM embeddings WHERE vec_id % 97 = 0),
         |asg AS (SELECT e.vec_id, e.embedding, cent_id,
         |          ${cosSql("e.embedding", "cv")} AS csim
         |        FROM embeddings e CROSS JOIN cents),
         |cell AS (SELECT vec_id, embedding, cent_id AS cell FROM (
         |           SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rn
         |           FROM asg) WHERE rn = 1),
         |q AS (SELECT vec_id AS q_id, embedding AS qv, cell FROM cell WHERE vec_id % 100 = 0),
         |c AS (SELECT vec_id AS n_id, embedding AS nv, cell FROM cell),
         |s AS (SELECT q_id, n_id, ${cosSql("qv", "nv")} AS sim
         |      FROM c JOIN q USING (cell) WHERE q_id <> n_id),
         |r AS (SELECT q_id, n_id, sim,
         |        CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT) AS rank
         |      FROM s)
         |SELECT q_id, n_id, sim, rank FROM r WHERE rank <= 3
         |ORDER BY q_id, rank""") { (s, d) =>
      val e = Tables.embeddings(s, d).repartition(col("vec_id"))
      // cell assignment feeds both the query and corpus sides — persist
      // (at scale: the IVF index is materialized once, queried many times)
      val assigned = Similarity.ivfAssign(e, e.filter(col("vec_id") % 97 === 0))
        .persist()
      Similarity.ivfSearch(assigned, col("vec_id") % 100 === 0, 3)
        .orderBy("q_id", "rank")
    }
  )
}
