package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** OPQ rotation correctness. The learned rotation must (a) be exactly
  * orthogonal, (b) solve the Procrustes subproblem (polar factor), and
  * (c) actually cut quantization error where the OPQ paper says it must:
  * ANISOTROPIC data, where axis-aligned subspaces concentrate variance
  * in a few subspaces and the equal-budget codebooks can't follow. On
  * the isotropic synthetic embeddings corpus OPQ is correctly a no-op
  * (RecallAtScaleSpec pins that parity); this spec builds the skewed
  * corpus where it is not.
  */
class OpqSpec extends AnyFunSuite with SparkSpec {

  private val Dim = 16
  private val M = 4
  private val N = 600
  private val K = 32

  /** Deterministic anisotropic sample: dim d carries scale 2^(−d/2) (a
    * steep variance decay), values from a fixed LCG. Axis-aligned PQ
    * gives subspace 0 nearly all the variance; a balancing rotation
    * spreads it.
    */
  private lazy val skewed: DataFrame = {
    var s = 42L
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    val rows = (0 until N).map { i =>
      (i.toLong, (0 until Dim).map(d => next() * math.pow(2.0, -d / 2.0)).toArray)
    }
    val session = spark
    import session.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def mse(vecs: DataFrame, cb: DataFrame): Double = {
    val idx = Similarity.pqIndex(vecs, cb, M, Dim).select(col("vec_id"), col("dv"))
    vecs.join(idx, "vec_id")
      .select(aggregate(
        zip_with(col("embedding").cast("array<double>"), col("dv"),
          (a, b) => (a - b) * (a - b)),
        lit(0.0d), (acc, x) => acc + x).as("e"))
      .agg(avg(col("e"))).head().getDouble(0)
  }

  private def matmulT(a: Array[Array[Double]]): Array[Array[Double]] =
    Array.tabulate(a.length, a.length)((i, j) =>
      (0 until a.length).map(k => a(i)(k) * a(j)(k)).sum)

  test("rotationMatrix is orthonormal and deterministic") {
    val r1 = Similarity.rotationMatrix(Dim)
    val r2 = Similarity.rotationMatrix(Dim)
    assert(r1.flatten[Double].sameElements(r2.flatten[Double]),
      "same seed must replay bit-exact")
    val g = matmulT(r1)
    for (i <- 0 until Dim; j <- 0 until Dim)
      assert(math.abs(g(i)(j) - (if (i == j) 1.0 else 0.0)) < 1e-12,
        s"R·Rᵀ deviates at ($i,$j): ${g(i)(j)}")
  }

  test("polarOrthogonal recovers the rotation of R·S for positive-definite S") {
    val r0 = Similarity.rotationMatrix(Dim, seed = 7L)
    // M = R0 · diag(positive): polar factor must be R0 itself
    val diag = (0 until Dim).map(i => 0.5 + i * 0.25)
    val m = Array.tabulate(Dim, Dim)((i, j) => r0(i)(j) * diag(j))
    val p = Similarity.polarOrthogonal(m)
    for (i <- 0 until Dim; j <- 0 until Dim)
      assert(math.abs(p(i)(j) - r0(i)(j)) < 1e-9,
        s"polar factor diverged at ($i,$j)")
  }

  test("rotate preserves norms and is bit-exact replayable") {
    val r = Similarity.rotationMatrix(Dim)
    val a = Similarity.rotate(skewed, r)
    val b = Similarity.rotate(skewed, r)
    val pairs = a.select(col("vec_id"), col("embedding").as("ea"))
      .join(b.select(col("vec_id"), col("embedding").as("eb")), "vec_id")
      .join(skewed.select(col("vec_id"),
        col("embedding").cast("array<double>").as("e0")), "vec_id")
      .select(
        aggregate(zip_with(col("ea"), col("eb"), (x, y) =>
          when(x === y, 0.0d).otherwise(1.0d)), lit(0.0d), _ + _).as("diff"),
        abs(aggregate(transform(col("ea"), x => x * x), lit(0.0d), _ + _) -
          aggregate(transform(col("e0"), x => x * x), lit(0.0d), _ + _)).as("dn"))
      .agg(sum(col("diff")), max(col("dn"))).head()
    assert(pairs.getDouble(0) == 0.0, "two applications of the same matrix diverged")
    assert(pairs.getDouble(1) < 1e-9, "orthogonal rotation changed a norm")
  }

  test("saved OPQ artifacts replay encoding bit-for-bit in a fresh load") {
    val init = skewed.filter(col("vec_id") < K)
    val (r, cb) = Similarity.opqTrain(skewed, init, M, Dim,
      pqIters = 2, opqIters = 2)
    val root = java.nio.file.Files.createTempDirectory("graft_opq_art").toString
    Similarity.saveOpq(root, r, cb)
    val (r2, cb2) = Similarity.loadOpq(spark, root)
    assert(r.flatten[Double].sameElements(r2.flatten[Double]),
      "rotation did not round-trip bit-exact")
    val enc1 = Similarity.pqIndex(Similarity.rotate(skewed, r), cb, M, Dim)
      .select(col("vec_id"), col("pcode")).collect()
      .map(x => x.getLong(0) -> x.getSeq[Int](1)).toMap
    val enc2 = Similarity.pqIndex(Similarity.rotate(skewed, r2), cb2, M, Dim)
      .select(col("vec_id"), col("pcode")).collect()
      .map(x => x.getLong(0) -> x.getSeq[Int](1)).toMap
    assert(enc1 == enc2, "reloaded artifacts encoded differently")
  }

  test("OPQ cuts quantization MSE on anisotropic data; fixed rotation helps too") {
    val init = skewed.filter(col("vec_id") < K)
    val cbId = Similarity.pqTrain(skewed,
      Similarity.pqCodebook(init, M, Dim), M, Dim, 3)
    val mseId = mse(skewed, cbId)

    val rF = Similarity.rotationMatrix(Dim)
    val cbF = Similarity.pqTrain(Similarity.rotate(skewed, rF),
      Similarity.pqCodebook(Similarity.rotate(init, rF), M, Dim), M, Dim, 3)
    val mseF = mse(Similarity.rotate(skewed, rF), cbF)

    val (rO, cbO) = Similarity.opqTrain(skewed, init, M, Dim,
      pqIters = 3, opqIters = 4)
    val mseO = mse(Similarity.rotate(skewed, rO), cbO)

    // trained rotation stays exactly orthogonal through the alternation
    val g = matmulT(rO)
    for (i <- 0 until Dim; j <- 0 until Dim)
      assert(math.abs(g(i)(j) - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"learned R drifted off the orthogonal manifold at ($i,$j)")

    info(f"quantization MSE: identity=$mseId%.3e fixed=$mseF%.3e opq=$mseO%.3e")
    assert(mseF < mseId * 0.85,
      s"fixed rotation should cut axis-skewed MSE: $mseF vs identity $mseId")
    assert(mseO < mseId * 0.70,
      s"learned OPQ should cut it further: $mseO vs identity $mseId")
    assert(mseO <= mseF * 1.02,
      s"learned OPQ lost to its own fixed-rotation init: $mseO vs $mseF")
  }
}
