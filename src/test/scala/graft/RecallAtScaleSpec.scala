package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** Recall@3 gates for the composed IVF+PQ tiers at the 10× corpus
  * (sf0.1, 2000 vectors) with PRODUCTION-SHAPED books: cells ≈ √n (45)
  * and 256 codewords per subspace (the classic PQ paper's K), closing
  * the gap AnnRecallSpec documents for its deliberately-toy sf0.01
  * 8-codeword books. All numbers are deterministic (fixed testdata,
  * deterministic training inits and tie-breaks) — floors sit under the
  * RecallAtScale-measured values with enough slack to absorb a
  * re-generated-testdata regime shift without going vacuous.
  *
  * Measured sweep (RecallAtScale, sf0.1; recall granularity 1/60):
  * ```
  *           np=1   np=2   np=4   np=8   np=45(all)
  * K=8   raw 0.067  0.067  0.100  0.117  0.067
  *       res 0.133  0.117  0.100  0.133  0.133
  * K=64  raw 0.150  0.133  0.150  0.167  0.117
  *       res 0.150  0.200  0.217  0.267  0.267
  * K=256 raw 0.233  0.217  0.250  0.350  0.417
  *       res 0.233  0.217  0.267  0.317  0.300
  *
  * re-rank refine (exact cosine over the ADC top-depth, k=3):
  *           np=8/d12  np=8/d24  np=8/d48
  * K=256 raw 0.483     0.567     0.600
  *       res 0.483     0.567     0.583
  * K=64  raw 0.350     0.533     0.567
  * K=8   raw 0.200     0.267     0.383  (res 0.283/0.333/0.500)
  * ```
  * Four regime facts the gates encode:
  *  1. book size is the recall lever at fixed probe cost — K=256 roughly
  *     triples the toy K=8's recall at every width;
  *  2. residual coding's advantage concentrates where the budget is
  *     TIGHT relative to the data (K=8: +36%, K=64: +39% summed) — the
  *     regime that matters at 100 TB, where bytes/vector is the cost
  *     driver; at K=256 the codes out-resolve this corpus's margins and
  *     the two codings sit within recall granularity of each other
  *     (raw ahead by exactly 2 pairs at np=8);
  *  3. at coarse K, widening probes does NOT buy recall (K=8 all-cells
  *     ≤ np=8): ranking error, not candidate coverage, is the binding
  *     constraint — the quantitative argument for production-sized books;
  *  4. the RE-RANK refine converts that ranking error back into recall
  *     at depth×|queries| exact-cosine cost (48·20 = 960 re-scored rows
  *     against a 2000·45-candidate ADC scan): +0.25 at K=256 np=8
  *     (0.350 → 0.600) — the standard IVFADC recipe, quantized scan for
  *     coverage, exact tail for order.
  */
class RecallAtScaleSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.1"

  private lazy val e = Tables.embeddings(spark, sf)
  private lazy val exact: Set[(Long, Long)] = {
    val x = Similarity.topkNeighbors(e.filter(col("vec_id") % 100 === 0), e, 3)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(x.size == 60, s"expected 20 queries x 3, got ${x.size}")
    x
  }
  private lazy val train = e.filter(col("vec_id") % 4 === 0)
  // cells ~ sqrt(2000) ~ 45
  private lazy val cents = Similarity.ivfTrain(train,
    e.filter(col("vec_id") % 45 === 0), 64, 2)
  private lazy val asg = Similarity.ivfAssign(e, cents)
  private lazy val res = Similarity.residuals(asg, cents)

  private def idxOf(vecs: DataFrame, cb: DataFrame): DataFrame =
    vecs.select(col("vec_id"), col("cell"))
      .join(Similarity.pqIndex(vecs.select("vec_id", "embedding"), cb, 8, 64)
        .select(col("vec_id"), col("pcode")), "vec_id")
      .select(col("vec_id").as("n_id"), col("cell"), col("pcode"))

  /** (rawIdx, rawCb, resIdx, resCb) for a K-codeword budget. */
  private def books(k: Int) = {
    val cbRaw = Similarity.pqTrain(train,
      Similarity.pqCodebook(e.filter(col("vec_id") < k), 8, 64), 8, 64, 2)
    val cbRes = Similarity.pqTrain(res.join(train.select("vec_id"), "vec_id"),
      Similarity.pqCodebook(res.filter(col("vec_id") < k), 8, 64), 8, 64, 2)
    (idxOf(asg, cbRaw), cbRaw, idxOf(res, cbRes), cbRes)
  }

  // shared by both tests — the production books train once per suite run
  private lazy val books256 = books(256)

  private def recallOf(df: DataFrame): Double = {
    val hits = df.select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).count(exact.contains)
    spark.sharedState.cacheManager.clearCache()
    hits.toDouble / exact.size
  }

  test("production-shaped books (K=256, cells ~ sqrt n) clear recall floors at the 10x corpus") {
    val (rawIdx, cbRaw, resIdx, cbRes) = books256
    val probes2 = Similarity.ivfProbes(e.filter(col("vec_id") % 100 === 0), cents, 2)
    val probes8 = Similarity.ivfProbes(e.filter(col("vec_id") % 100 === 0), cents, 8)
    val raw2 = recallOf(Similarity.ivfPqSearch(rawIdx, probes2, cbRaw, e, 8, 64, 3))
    val res2 = recallOf(Similarity.ivfPqResidualSearch(resIdx, probes2, cbRes, cents, e, 8, 64, 3))
    val raw8 = recallOf(Similarity.ivfPqSearch(rawIdx, probes8, cbRaw, e, 8, 64, 3))
    val res8 = recallOf(Similarity.ivfPqResidualSearch(resIdx, probes8, cbRes, cents, e, 8, 64, 3))
    assert(raw2 >= 0.15, s"raw K=256 np=2 recall $raw2 (measured 0.217)")
    assert(res2 >= 0.15, s"residual K=256 np=2 recall $res2 (measured 0.217)")
    assert(raw8 >= 0.30, s"raw K=256 np=8 recall $raw8 (measured 0.350)")
    assert(res8 >= 0.25, s"residual K=256 np=8 recall $res8 (measured 0.317)")
    // parity within recall granularity at the saturating budget: the two
    // codings may not diverge by more than ~3 pairs either way
    assert(math.abs((raw2 + raw8) - (res2 + res8)) <= 3.0 / 60 + 1e-9,
      s"codings diverged at K=256: raw ${raw2 + raw8} vs residual ${res2 + res8}")

    // and the toy budget: book size is the recall lever, residual wins
    // where the budget is tight
    val (rawIdx8, cbRaw8, resIdx8, cbRes8) = books(8)
    val rawT = recallOf(Similarity.ivfPqSearch(rawIdx8, probes2, cbRaw8, e, 8, 64, 3)) +
      recallOf(Similarity.ivfPqSearch(rawIdx8, probes8, cbRaw8, e, 8, 64, 3))
    val resT = recallOf(Similarity.ivfPqResidualSearch(resIdx8, probes2, cbRes8, cents, e, 8, 64, 3)) +
      recallOf(Similarity.ivfPqResidualSearch(resIdx8, probes8, cbRes8, cents, e, 8, 64, 3))
    assert(raw2 + raw8 > rawT * 1.5,
      s"K=256 raw (${raw2 + raw8}) should far exceed K=8 raw ($rawT)")
    assert(res2 + res8 > resT * 1.5,
      s"K=256 residual (${res2 + res8}) should far exceed K=8 residual ($resT)")
    assert(resT >= rawT,
      s"residual coding ($resT) must not lose to raw ($rawT) at the tight K=8 budget " +
        "(measured 0.250 vs 0.184 — the MSE advantage ResidualPqSpec pins, shown on recall)")

    // RE-RANK refine at production books: exact-cosine re-ranking of the
    // ADC top-48 lifts recall@3 past 0.55 (measured 0.600 raw / 0.583
    // residual) — a ≥ +0.15 lift over the plain tier at identical
    // candidate-scan cost, since only depth×|queries| winners ever touch
    // raw vectors
    val rawR = recallOf(Similarity.ivfPqSearch(rawIdx, probes8, cbRaw,
      e, 8, 64, 3, rerankDepth = 48))
    val resR = recallOf(Similarity.ivfPqResidualSearch(resIdx, probes8,
      cbRes, cents, e, 8, 64, 3, rerankDepth = 48))
    assert(rawR >= 0.55, s"raw K=256 np=8 depth=48 recall $rawR (measured 0.600)")
    assert(resR >= 0.55, s"residual K=256 np=8 depth=48 recall $resR (measured 0.583)")
    assert(rawR >= raw8 + 0.15 && resR >= res8 + 0.15,
      s"re-rank lift collapsed: raw $raw8->$rawR, residual $res8->$resR")
  }

  /** The 0.60 plateau adjudicated: it is the IVF COVERAGE ceiling at
    * np=8, not a quantizer gap — and recall ≥ 0.7 is reached the moment
    * coverage allows it.
    *
    * Measured structural ceilings (CoverageProbe — fraction of exact
    * pairs whose true neighbor's home cell is probed; NO codebook can
    * exceed these at fixed nprobe):
    * ```
    * nprobe    1     2     4     8     12    16    24    45
    * ceiling  .300  .367  .467  .600  .667  .783  .900  1.000
    * ```
    * At np=8/depth=48 the existing raw-K=256 tier scores 0.600 —
    * EXACTLY its ceiling, so the quantizer has nothing left to recover
    * there (OPQ included). At np=16 (ceiling 0.783) the same tier
    * scores 0.767; np=24 (ceiling 0.900) scores 0.850.
    *
    * OPQ on THIS corpus: the synthetic embeddings are ~isotropic, the
    * regime where the OPQ objective is already minimized by identity —
    * measured plain-ADC recall 0.300-0.317 (learned) vs raw 0.350-0.417,
    * i.e. parity-to-slightly-behind within training noise, and the
    * re-ranked tier is ceiling-capped anyway (0.700 at np=16). OpqSpec
    * holds the other half of the story: on ANISOTROPIC data the learned
    * rotation cuts quantization MSE 2.6× (8.9e-2 → 3.4e-2) — the regime
    * OPQ exists for.
    */
  test("recall >= 0.7 where coverage allows; np=8 saturates its 0.600 ceiling") {
    val homeCell = asg.select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ceiling(np: Int): Double = {
      val probed = Similarity.ivfProbes(
        e.filter(col("vec_id") % 100 === 0), cents, np)
        .select(col("vec_id"), col("cell")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      exact.count { case (q, nb) =>
        probed.getOrElse(q, Set.empty).contains(homeCell(nb))
      }.toDouble / exact.size
    }
    val c8 = ceiling(8)
    val c16 = ceiling(16)
    assert(c8 <= 0.65,
      s"np=8 coverage ceiling moved ($c8, measured 0.600) — re-adjudicate the plateau")
    assert(c16 >= 0.70,
      s"np=16 coverage ceiling moved ($c16, measured 0.783) — the 0.7 gate needs headroom")

    val (rawIdx, cbRaw, _, _) = books256
    val probes8 = Similarity.ivfProbes(e.filter(col("vec_id") % 100 === 0), cents, 8)
    val probes16 = Similarity.ivfProbes(e.filter(col("vec_id") % 100 === 0), cents, 16)
    val r8 = recallOf(Similarity.ivfPqSearch(rawIdx, probes8, cbRaw,
      e, 8, 64, 3, rerankDepth = 48))
    val r16 = recallOf(Similarity.ivfPqSearch(rawIdx, probes16, cbRaw,
      e, 8, 64, 3, rerankDepth = 48))
    // the quantizer leaves at most one pair on the table at np=8 — the
    // plateau IS the ceiling
    assert(r8 >= c8 - 1.0 / 60 - 1e-9,
      s"np=8 recall $r8 fell below its coverage ceiling $c8 minus granularity")
    assert(r16 >= 0.70, s"np=16 depth=48 recall $r16 (measured 0.767, ceiling $c16)")

    // OPQ end-to-end through the rotated ADC path: books trained in the
    // learned rotation, queries rotated at table-build only, exact
    // re-rank in the original space — must hold the re-ranked tier at
    // this corpus's parity (isotropic ⇒ no lift to find)
    val (rO, cbO) = Similarity.opqTrain(train,
      e.filter(col("vec_id") < 256), 8, 64, pqIters = 2, opqIters = 3)
    val opqIdx = asg.select(col("vec_id"), col("cell"))
      .join(Similarity.pqIndex(
          Similarity.rotate(asg.select("vec_id", "embedding"), rO), cbO, 8, 64)
        .select(col("vec_id"), col("pcode")), "vec_id")
      .select(col("vec_id").as("n_id"), col("cell"), col("pcode"))
    val o16 = recallOf(Similarity.ivfPqSearch(opqIdx, probes16, cbO,
      e, 8, 64, 3, rerankDepth = 48, rotation = Some(rO)))
    assert(o16 >= 0.60, s"OPQ re-ranked np=16 recall $o16 (measured 0.700)")
  }
}
