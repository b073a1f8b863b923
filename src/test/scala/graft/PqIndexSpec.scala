package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** Properties of the PQ index q100's oracle can't see directly: code
  * vector shape/range, exact per-subspace argmin (vs an independent JVM
  * recompute), zero reconstruction error for vectors that ARE codebook
  * members, and the k-means training loop — pinned bit-for-bit against a
  * JVM twin of its declared fold contract, with the trained codebook
  * required to actually beat the subset init it starts from.
  */
class PqIndexSpec extends AnyFunSuite with SparkSpec {

  private val M = 8
  private val Dim = 64
  private val Sub = Dim / M

  // the same sequential double folds PqArgmin evaluates, so float
  // comparisons agree bit-for-bit
  private def dot(x: Array[Double], y: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < x.length) { s += x(i) * y(i); i += 1 }
    s
  }

  private def l2(a: Array[Double], b: Array[Double]): Double =
    dot(a, a) - 2.0 * dot(a, b) + dot(b, b)

  private def subVec(emb: Array[Float], j: Int): Array[Double] =
    emb.slice(j * Sub, (j + 1) * Sub).map(_.toDouble)

  private def loadTrain(): Seq[(Long, Array[Float])] =
    Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toSeq.sortBy(_._1)

  /** (j, cent_id) → codeword, from the vec_id%97 subset — the init
    * pqCodebook builds.
    */
  private def subsetCb(train: Seq[(Long, Array[Float])]): Map[(Int, Long), Array[Double]] =
    (for ((vid, emb) <- train if vid % 97 == 0; j <- 0 until M)
      yield (j, vid) -> subVec(emb, j)).toMap

  /** JVM twin of [[Similarity.pqTrain]]'s declared contract: argmin ties
    * to the lowest cent_id; recenter = elementwise sum of members in
    * vec_id order from 0.0, divided by the member count; empty codewords
    * keep their position.
    */
  private def jvmTrain(train: Seq[(Long, Array[Float])],
      init: Map[(Int, Long), Array[Double]],
      iters: Int): Map[(Int, Long), Array[Double]] = {
    var cb = init
    for (_ <- 0 until iters) {
      val asg = collection.mutable.Map.empty[(Int, Long), List[(Long, Array[Double])]]
      for ((vid, emb) <- train; j <- 0 until M) {
        val va = subVec(emb, j)
        // .toSeq first: collecting pairs straight off the Map would key
        // the result BY DISTANCE and collapse equal-distance codewords,
        // losing the lowest-cent_id tie-break this twin exists to pin.
        // NaN distances mirror pq_argmin's strict `<`: a NaN candidate
        // never wins, and a subvector whose EVERY distance is NaN has no
        // nearest codeword — excluded from the recenter, like pqTrain's
        // cent_id.isNotNull filter and the oracle's NOT isnan(dist).
        val cands = cb.toSeq.collect {
          case ((jj, cid), cv) if jj == j => (l2(va, cv), cid)
        }.filterNot(_._1.isNaN)
        for (best <- cands.minOption)
          asg((j, best._2)) = (vid, va) :: asg.getOrElse((j, best._2), Nil)
      }
      cb = cb ++ asg.map { case (k, members) =>
        val ordered = members.sortBy(_._1).map(_._2)
        val acc = Array.fill(Sub)(0.0)
        for (va <- ordered; d <- 0 until Sub) acc(d) = acc(d) + va(d)
        k -> acc.map(_ / ordered.size)
      }
    }
    cb
  }

  private def encodeErr(train: Seq[(Long, Array[Float])],
      cb: Map[(Int, Long), Array[Double]]): Double =
    (for ((_, emb) <- train; j <- 0 until M) yield {
      val va = subVec(emb, j)
      cb.toSeq.collect { case ((jj, _), cv) if jj == j => l2(va, cv) }.min
    }).sum

  test("codes are m codebook ids; decode matches the independent argmin") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cb = Similarity.pqCodebook(e.filter(col("vec_id") % 97 === 0), M, Dim)
    val idx = Similarity.pqIndex(e, cb, M, Dim)

    val codebook = subsetCb(loadTrain())
    assert(codebook.nonEmpty)

    val rows = idx.join(e.select("vec_id", "embedding"), "vec_id")
      .select("vec_id", "embedding", "codes", "dv", "pcode").collect()
    assert(rows.length == e.count())

    // positional codes dereference through the cent_id-sorted codeword
    // order — the contract ivfPqSearch's ADC tables index by
    val sortedIds = (0 until M).map { j =>
      j -> codebook.keys.collect { case (jj, id) if jj == j => id }
        .toSeq.sorted
    }.toMap

    rows.foreach { r =>
      val emb = r.getSeq[Float](1).toArray
      val codes = r.getSeq[Long](2)
      val dv = r.getSeq[Double](3).toArray
      val pcode = r.getSeq[Int](4)
      assert(codes.length == M)
      assert(dv.length == Dim)
      assert(pcode.length == M)
      for (j <- 0 until M) {
        assert(codebook.contains((j, codes(j))), s"code ${codes(j)} not a codebook id")
        assert(sortedIds(j)(pcode(j) - 1) == codes(j),
          s"vec ${r.getLong(0)} subspace $j: pcode ${pcode(j)} does not " +
            s"dereference to code ${codes(j)}")
        val va = subVec(emb, j)
        // independent argmin recompute (dist asc, cent_id asc) — .toSeq
        // keeps equal-distance candidates distinct (see jvmTrain note)
        val best = codebook.toSeq.collect {
          case ((jj, id), cv) if jj == j => (l2(va, cv), id)
        }.min
        assert(codes(j) == best._2,
          s"vec ${r.getLong(0)} subspace $j: got ${codes(j)}, argmin ${best._2}")
        // decoded slice IS the chosen codeword's slice
        assert(dv.slice(j * Sub, (j + 1) * Sub).toSeq ==
          codebook((j, codes(j))).toSeq)
      }
    }

    // codebook members reconstruct with zero error in every subspace
    val memberIds = codebook.keySet.map(_._2)
    rows.filter(r => memberIds.contains(r.getLong(0))).foreach { r =>
      val emb = r.getSeq[Float](1).toArray.map(_.toDouble)
      val dv = r.getSeq[Double](3).toArray
      assert(l2(emb, dv) == 0.0, s"codebook vector ${r.getLong(0)} not exact")
    }
  }

  test("pqTrain matches the JVM Lloyd twin bit-for-bit and beats the subset init") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val init = Similarity.pqCodebook(e.filter(col("vec_id") % 97 === 0), M, Dim)
    val iters = 3
    // q100's sample rule: train on the deterministic vec_id%4 quarter
    val got = Similarity.pqTrain(e.filter(col("vec_id") % 4 === 0), init,
        M, Dim, iters)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2).toArray)
      .toMap

    val corpus = loadTrain()
    val sample = corpus.filter(_._1 % 4 == 0)
    val want = jvmTrain(sample, subsetCb(corpus), iters)
    assert(got.keySet == want.keySet)
    for (k <- want.keySet; d <- 0 until Sub)
      // == on doubles: the contract is BIT-exact, not approximate — this
      // is what lets the DuckDB oracle replay training and still hash-match
      assert(got(k)(d) == want(k)(d),
        s"codeword $k dim $d: got ${got(k)(d)}, twin ${want(k)(d)}")

    // training must actually help: total squared reconstruction error on
    // the FULL corpus (not just the sample it trained on) strictly below
    // the subset codebook's
    val errSubset = encodeErr(corpus, subsetCb(corpus))
    val errTrained = encodeErr(corpus, want)
    assert(errTrained < errSubset,
      s"trained err $errTrained not below subset err $errSubset")
  }

  test("a NaN training vector is excluded from the recenter, not poisoning it") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val init = Similarity.pqCodebook(e.filter(col("vec_id") % 97 === 0), M, Dim)
    val sample = e.filter(col("vec_id") % 4 === 0).select("vec_id", "embedding")
    // one dirty row: every distance from it is NaN, so pq_argmin → null.
    // Pre-guard, the row collector read that null cent_id as codeword 0
    // (primitive getLong) and silently dragged cell (j, 0)'s mean.
    val dirty = sample.limit(1)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          x => lit(Float.NaN) + x * lit(0.0f)).as("embedding"))
    val clean = Similarity.pqTrain(sample, init, M, Dim, 2).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    val withNaN = Similarity.pqTrain(sample.unionByName(dirty), init, M, Dim, 2)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    assert(withNaN == clean,
      "codebook trained with a NaN vector differs from the clean codebook")

    // the JVM twin mirrors the exclusion: dirty-trained twin doubles land
    // bit-identical to the engine's dirty-trained codebook (so the twin —
    // and the oracle fold it pins — can't silently assign the NaN vector
    // to the lowest codeword and fork from the engine)
    val corpus = loadTrain()
    val twinDirty = jvmTrain(
      corpus.filter(_._1 % 4 == 0) :+
        (9999999L, Array.fill(Dim)(Float.NaN)),
      subsetCb(corpus), 2)
    assert(twinDirty.keySet == withNaN.keySet)
    for (k <- twinDirty.keySet; d <- 0 until Sub)
      assert(twinDirty(k)(d) == withNaN(k)(d),
        s"codeword $k dim $d: twin ${twinDirty(k)(d)}, engine ${withNaN(k)(d)}")
  }
}
