package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** Properties of the PQ index q100's oracle can't see directly: code
  * vector shape/range, exact per-subspace argmin (vs an independent JVM
  * recompute), and zero reconstruction error for vectors that ARE
  * codebook members.
  */
class PqIndexSpec extends AnyFunSuite with SparkSpec {

  private val M = 8
  private val Dim = 64

  private def l2(a: Array[Float], b: Array[Float]): Double = {
    // the same dot-product decomposition pqIndex evaluates, so float
    // comparisons agree bit-for-bit
    def dot(x: Array[Float], y: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
      s
    }
    dot(a, a) - 2.0 * dot(a, b) + dot(b, b)
  }

  test("codes are m codebook ids; decode matches the independent argmin") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cbSrc = e.filter(col("vec_id") % 97 === 0)
    val idx = Similarity.pqIndex(e, cbSrc, M, Dim)

    val codebook = cbSrc.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(codebook.nonEmpty)

    val rows = idx.join(e.select("vec_id", "embedding"), "vec_id")
      .select("vec_id", "embedding", "codes", "dv").collect()
    assert(rows.length == e.count())

    rows.foreach { r =>
      val emb = r.getSeq[Float](1).toArray
      val codes = r.getSeq[Long](2)
      val dv = r.getSeq[Float](3).toArray
      assert(codes.length == M)
      assert(dv.length == Dim)
      val sub = Dim / M
      for (j <- 0 until M) {
        assert(codebook.contains(codes(j)), s"code ${codes(j)} not a codebook id")
        val va = emb.slice(j * sub, (j + 1) * sub)
        // independent argmin recompute (dist asc, cent_id asc)
        val best = codebook.toSeq
          .map { case (id, cv) => (l2(va, cv.slice(j * sub, (j + 1) * sub)), id) }
          .minBy(identity)
        assert(codes(j) == best._2,
          s"vec ${r.getLong(0)} subspace $j: got ${codes(j)}, argmin ${best._2}")
        // decoded slice IS the chosen codeword's slice
        assert(dv.slice(j * sub, (j + 1) * sub).toSeq ==
          codebook(codes(j)).slice(j * sub, (j + 1) * sub).toSeq)
      }
    }

    // codebook members reconstruct with zero error in every subspace
    rows.filter(r => codebook.contains(r.getLong(0))).foreach { r =>
      val emb = r.getSeq[Float](1).toArray
      val dv = r.getSeq[Float](3).toArray
      assert(l2(emb, dv) == 0.0, s"codebook vector ${r.getLong(0)} not exact")
    }
  }
}
