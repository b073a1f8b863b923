package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Exact, VectorFold}

/** Approximate-nearest-neighbor / similarity-search operators over an
  * embedding column (`array<float>`). (Driver extension surface.)
  *
  * Layout for 100 TB:
  *  - Brute-force top-k broadcasts the QUERY set (small by definition) and
  *    streams the corpus through a BroadcastNestedLoopJoin — one corpus
  *    scan, no corpus shuffle; the only shuffle is the per-query top-k
  *    window keyed by query id (tiny: k rows per query survive the
  *    map-side).
  *  - IVF: centroids broadcast; cell assignment is map-side argmax; the
  *    search joins query-cell to corpus-cell — an equi-join on cell id
  *    that prunes the candidate set by ~|cells|× vs brute force. Larger
  *    deployments re-partition the corpus BY cell once and reuse it
  *    across query batches.
  *  - Cosine math is `zip_with`+`aggregate` (codegen, no UDF), sequential
  *    fold order pinned so a DuckDB oracle reproduces bits exactly
  *    ([[Exact.foldCosine]]).
  */
object Similarity {

  def cosine(a: Column, b: Column): Column = Exact.foldCosine(a, b)

  /** Exact top-k neighbors for each query vector (self excluded).
    * Output: (q_id, n_id, sim, rank).
    */
  def topkNeighbors(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    VectorFold.register(queries.sparkSession)
    // norms are computed once per row (not once per pair); the float ops
    // are identical to inline cosine, so oracle bits don't change
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("qv"),
      Exact.foldNorm(col("embedding")).as("qn"))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("nv"),
      Exact.foldNorm(col("embedding")).as("nn"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (Exact.foldDot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** IVF cell assignment: nearest centroid by cosine (ties → lowest
    * centroid id). Output: input columns + `cell`.
    */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    VectorFold.register(vectors.sparkSession)
    val c = centroids.select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cent_id"))
    vectors.select(col("vec_id"), col("embedding"))
      .join(broadcast(c))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        cosine(col("embedding"), col("cv")).as("csim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
  }

  /** IVF search: top-k within the query's own cell (nprobe=1), self
    * excluded. Output: (q_id, n_id, sim, rank).
    */
  def ivfSearch(assigned: DataFrame, queryIds: Column, k: Int): DataFrame = {
    VectorFold.register(assigned.sparkSession)
    val q = assigned.filter(queryIds)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("cell"))
    val c = assigned
      .select(col("vec_id").as("n_id"), col("embedding").as("nv"), col("cell"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    c.join(broadcast(q), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), cosine(col("qv"), col("nv")).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Query-side probe fan-out for multi-probe IVF: each vector's `nprobe`
    * nearest centroids (ties → lowest centroid id). The corpus keeps its
    * single home cell — probing replicates only the (small) query side,
    * so recall grows with `nprobe` at `nprobe×` query-side join input and
    * zero extra corpus shuffle. Output: (vec_id, embedding, cell),
    * `nprobe` rows per vector.
    */
  def ivfProbes(vectors: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame = {
    VectorFold.register(vectors.sparkSession)
    val c = centroids.select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cent_id"))
    vectors.select(col("vec_id"), col("embedding"))
      .join(broadcast(c))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        cosine(col("embedding"), col("cv")).as("csim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
  }

  /** Multi-probe IVF search: queries meet the corpus in every probed
    * cell (equi-join on cell id; candidates are unique because a corpus
    * vector lives in exactly one cell). Output: (q_id, n_id, sim, rank).
    */
  def ivfSearchProbes(assigned: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    VectorFold.register(assigned.sparkSession)
    val q = probes.select(col("vec_id").as("q_id"), col("embedding").as("qv"),
      col("cell"))
    val c = assigned
      .select(col("vec_id").as("n_id"), col("embedding").as("nv"), col("cell"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    c.join(broadcast(q), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), cosine(col("qv"), col("nv")).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplanes for random-projection LSH:
    * component i of plane j is `((j·1000003 + i·7919) mod 97 − 48)/48`
    * ∈ [−1, 1] — pure integer math then one division, so an oracle can
    * reproduce every coefficient exactly.
    */
  def rpPlanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map(j => (0 until dim).map(i =>
      ((j * 1000003 + i * 7919) % 97 - 48) / 48.0))

  /** Random-hyperplane LSH bucket id: bit j set when dot(v, plane_j) ≥ 0.
    * Map-side only — nPlanes dot products per vector, no shuffle.
    */
  def rpLshBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (w, j) =>
      when(Exact.foldDot(v, typedlit(w)) >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Banded RP-LSH near-duplicate pairs — the OR-construction: the
    * `planes.size`-bit signature splits into `bands` bands of
    * `r = planes.size / bands` planes; candidates are pairs agreeing on
    * ≥1 whole band (within `blockCol`), then exact cosine verifies. Per-
    * band match probability for angle θ is `(1 − θ/π)^r`, so recall is
    * `1 − (1 − (1−θ/π)^r)^bands` — at 16 planes / 4 bands ≈ 0.96 for
    * sim 0.9 pairs. Scale rule: grow `r` with corpus size to hold
    * per-bucket membership (`r ≈ log2(n / target_bucket)`), adding bands
    * to keep recall.
    *
    * Plan shape: signature is map-side; only (block, band, key) rows
    * shuffle for the equi-join; vectors join back by id for verification
    * — the same LSH-banding shape as the MinHash dedup path, never a
    * per-block O(n²) explosion.
    * Output: (d1, d2, sim).
    */
  def bandedNearDupPairs(vectors: DataFrame, blockCol: String,
      planes: Seq[Seq[Double]], bands: Int, threshold: Double): DataFrame = {
    VectorFold.register(vectors.sparkSession)
    require(planes.size % bands == 0, "planes must split evenly into bands")
    val r = planes.size / bands
    val sig = vectors.select(col(blockCol).as("blk"), col("vec_id"),
      rpLshBucket(col("embedding"), planes).as("bucket"))
    val banded = sig.select(col("blk"), col("vec_id"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("bucket"), b * r).bitwiseAND(lit((1 << r) - 1))): _*))
        .as(Seq("band", "key")))
    val cand = banded.as("a")
      .join(banded.as("b"), col("a.blk") === col("b.blk") &&
        col("a.band") === col("b.band") && col("a.key") === col("b.key"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"))
      .distinct()
    val v = vectors.select(col("vec_id"), col("embedding"),
      Exact.foldNorm(col("embedding")).as("nrm"))
    cand
      .join(v.select(col("vec_id").as("d1"), col("embedding").as("v1"),
        col("nrm").as("n1")), "d1")
      .join(v.select(col("vec_id").as("d2"), col("embedding").as("v2"),
        col("nrm").as("n2")), "d2")
      .select(col("d1"), col("d2"),
        (Exact.foldDot(col("v1"), col("v2")) / (col("n1") * col("n2"))).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Near-duplicate pairs by embedding cosine within a blocking key (e.g.
    * a label or LSH bucket) — never a full cross join, but per-block pair
    * counts grow O(n²) with block membership: use [[bandedNearDupPairs]]
    * unless the block key is known to stay high-cardinality.
    * Output: (d1, d2, sim).
    */
  def nearDupPairs(vectors: DataFrame, blockCol: String, threshold: Double): DataFrame = {
    VectorFold.register(vectors.sparkSession)
    val a = vectors.select(col(blockCol).as("blk"),
      col("vec_id").as("d1"), col("embedding").as("v1"),
      Exact.foldNorm(col("embedding")).as("n1"))
    val b = vectors.select(col(blockCol).as("blk"),
      col("vec_id").as("d2"), col("embedding").as("v2"),
      Exact.foldNorm(col("embedding")).as("n2"))
    a.join(b, Seq("blk"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        (Exact.foldDot(col("v1"), col("v2")) / (col("n1") * col("n2"))).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Embedding-space benchmark decontamination — the ANN ANTI-JOIN shape:
    * find every TRAIN vector whose cosine against ANY benchmark vector
    * reaches `threshold`, so the caller can drop them (the embedding
    * twin of the shingle semi-join decontamination, catching paraphrased
    * contamination that exact n-grams miss). Contract, mirrored in the
    * oracle exactly like [[bandedNearDupPairs]]: a train vector is
    * indictable only via a benchmark vector sharing ≥1 RP-LSH band.
    *
    * Plan shape for 100 TB: the benchmark set is small by definition —
    * its banded form BROADCASTS, so candidate generation is a map-side
    * hash probe over the train scan (no train shuffle at all); only the
    * surviving candidate ids shuffle to fetch vectors for the exact-
    * cosine verify, and the per-train-id max aggregates partial map-side.
    * Output: (vec_id, max_sim) of CONTAMINATED train vectors.
    */
  def annContaminated(train: DataFrame, bench: DataFrame,
      planes: Seq[Seq[Double]], bands: Int, threshold: Double): DataFrame = {
    VectorFold.register(train.sparkSession)
    require(planes.size % bands == 0, "planes must split evenly into bands")
    val r = planes.size / bands
    def banded(df: DataFrame): DataFrame =
      df.select(col("vec_id"), rpLshBucket(col("embedding"), planes).as("bucket"))
        .select(col("vec_id"),
          posexplode(array((0 until bands).map(b =>
            shiftright(col("bucket"), b * r).bitwiseAND(lit((1 << r) - 1))): _*))
            .as(Seq("band", "key")))
    val cand = banded(train)
      .join(broadcast(banded(bench).withColumnRenamed("vec_id", "bid")),
        Seq("band", "key"))
      .select(col("vec_id"), col("bid")).distinct()
    val tv = train.select(col("vec_id"), col("embedding").as("v1"),
      Exact.foldNorm(col("embedding")).as("n1"))
    val bv = bench.select(col("vec_id").as("bid"), col("embedding").as("v2"),
      Exact.foldNorm(col("embedding")).as("n2"))
    cand.join(tv, "vec_id")
      .join(broadcast(bv), "bid")
      .select(col("vec_id"),
        (Exact.foldDot(col("v1"), col("v2")) / (col("n1") * col("n2"))).as("sim"))
      .filter(col("sim") >= threshold)
      .groupBy("vec_id")
      .agg(max(col("sim")).as("max_sim"))
  }

  /** Product-quantization index: split each `dim`-wide embedding into `m`
    * subspaces of `dim/m` dims; per subspace, snap the subvector to its
    * nearest codeword (squared-L2 argmin, ties → lowest codeword id) from
    * a shared codebook. Output: (vec_id, codes, dv) where `codes` is the
    * m-byte PQ code (one codeword id per subspace) and `dv` the decoded
    * (reconstructed) vector the approximate scores read — deliberately NO
    * raw embedding column (the index would otherwise carry the very bytes
    * it exists to avoid scanning); callers needing the true vector
    * re-join the source table by vec_id (q100's true-cosine column).
    *
    * 100 TB shape: the codebook is a broadcast (codewords × m subvectors);
    * encoding is one broadcast join + per-subspace argmin — map-side per
    * corpus row, no corpus shuffle (the groupBy re-assembling subspaces
    * keys on vec_id, which partial-aggregates map-side: m rows per key).
    * What a deployment PERSISTS is `codes` — m bytes against the raw
    * vector's dim×4 (16 B vs 256 B here, 16×) — and `dv` is decode-on-read
    * from the broadcast codebook at scan time, which is how the scan gets
    * its 16× bandwidth cut. Like the IVF index, built once, queried many
    * times. The codebook source is a deterministic corpus subset (the
    * same `vec_id % 97` device as q32's centroids) so the whole index is
    * reproducible in checked SQL; a production build k-means-trains each
    * subspace's codebook instead — swapping codebooks changes no plan
    * shape, only reconstruction error.
    *
    * Distance/ranking floats stay bit-exact across engines: squared L2 is
    * evaluated as `dot(a,a) − 2·dot(a,b) + dot(b,b)` with [[Exact.foldDot]]
    * sequential folds on both sides, and reconstruction concatenates
    * codewords in subspace order, so the approximate cosine is ONE 64-wide
    * fold — ADC by construction, with no float-sum reorder anywhere.
    */
  def pqIndex(vectors: DataFrame, codebookSrc: DataFrame, m: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m subspaces")
    val sub = dim / m
    VectorFold.register(vectors.sparkSession)
    val cb = codebookSrc.select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    def part(v: Column): Column = slice(v, col("j") * sub + 1, lit(sub))
    val va = part(col("embedding"))
    val ca = part(col("cv"))
    val dist = Exact.foldDot(va, va) - lit(2.0d) * Exact.foldDot(va, ca) +
      Exact.foldDot(ca, ca)
    // argmin as min(struct(dist, cent_id, sub)) — struct ordering is
    // (dist asc, cent_id asc), exactly the oracle's row_number order, and
    // unlike a rank window it partial-aggregates MAP-SIDE: the exchange
    // carries one best-so-far row per (vec_id, j) per map partition, not
    // the full corpus × codewords × subspaces stream. The raw embedding
    // never enters the shuffle at all (only id, j, dist, codeword) —
    // callers re-join the original table by vec_id when they need it.
    val best = vectors.select(col("vec_id"), col("embedding"))
      .join(broadcast(cb))
      .select(col("vec_id"), col("embedding"), col("cent_id"), col("cv"),
        explode(sequence(lit(0), lit(m - 1))).as("j"))
      .select(col("vec_id"), col("j"),
        struct(dist.as("dist"), col("cent_id"), ca.as("sub")).as("cand"))
      .groupBy("vec_id", "j")
      .agg(min(col("cand")).as("best"))
    best.groupBy("vec_id")
      .agg(array_sort(collect_list(struct(col("j"),
          col("best.cent_id").as("cent_id"), col("best.sub").as("sub"))))
        .as("parts"))
      .select(col("vec_id"),
        transform(col("parts"), p => p.getField("cent_id")).as("codes"),
        flatten(transform(col("parts"), p => p.getField("sub"))).as("dv"))
  }
}
