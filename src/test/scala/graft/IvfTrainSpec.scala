package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** [[Similarity.ivfTrain]] — the full-width (m=1) instance of the pqTrain
  * Lloyd loop that replaced the `vec_id % 97` subset device as q32/q66's
  * cell source. Pins (a) the trained centroids bit-for-bit against an
  * independent JVM twin of the declared fold contract (so the DuckDB
  * oracle replay can't fork), and (b) the reason training exists at all:
  * trained cells must STRICTLY beat the subset init on full-corpus
  * assignment distortion — the r7/r8 critique that untrained cells were
  * the weakest link in the scale-path ANN story.
  */
class IvfTrainSpec extends AnyFunSuite with SparkSpec {

  private val Dim = 64

  private def dot(x: Array[Double], y: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < x.length) { s += x(i) * y(i); i += 1 }
    s
  }

  private def l2(a: Array[Double], b: Array[Double]): Double =
    dot(a, a) - 2.0 * dot(a, b) + dot(b, b)

  private def loadCorpus(): Seq[(Long, Array[Double])] =
    Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
      .toSeq.sortBy(_._1)

  /** JVM twin of the full-width Lloyd contract (PqIndexSpec.jvmTrain at
    * m=1): argmin ties to the lowest cent_id, NaN distances never win,
    * recenter = elementwise sum of members in vec_id order from 0.0
    * divided by the member count, empty centroids keep their position.
    */
  private def jvmTrain(train: Seq[(Long, Array[Double])],
      init: Map[Long, Array[Double]], iters: Int): Map[Long, Array[Double]] = {
    var cb = init
    for (_ <- 0 until iters) {
      val asg = collection.mutable.Map.empty[Long, List[(Long, Array[Double])]]
      for ((vid, v) <- train) {
        val cands = cb.toSeq.map { case (cid, cv) => (l2(v, cv), cid) }
          .filterNot(_._1.isNaN)
        for (best <- cands.minOption)
          asg(best._2) = (vid, v) :: asg.getOrElse(best._2, Nil)
      }
      cb = cb ++ asg.map { case (cid, members) =>
        val ordered = members.sortBy(_._1).map(_._2)
        val acc = Array.fill(Dim)(0.0)
        for (v <- ordered; d <- 0 until Dim) acc(d) = acc(d) + v(d)
        cid -> acc.map(_ / ordered.size)
      }
    }
    cb
  }

  /** Full-corpus assignment distortion: each vector's squared L2 to its
    * nearest centroid (the Lloyd objective), summed.
    */
  private def distortion(corpus: Seq[(Long, Array[Double])],
      cents: Map[Long, Array[Double]]): Double =
    corpus.map { case (_, v) => cents.values.map(l2(v, _)).min }.sum

  test("ivfTrain matches the full-width JVM Lloyd twin bit-for-bit") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // the q32/q66 contract: 2 rounds, %4 quarter-sample, %97 subset init
    val got = Similarity.ivfTrain(e.filter(col("vec_id") % 4 === 0),
        e.filter(col("vec_id") % 97 === 0), Dim, 2)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

    val corpus = loadCorpus()
    val init = corpus.filter(_._1 % 97 == 0).toMap
    val want = jvmTrain(corpus.filter(_._1 % 4 == 0), init, 2)
    assert(got.keySet == want.keySet)
    for (k <- want.keySet; d <- 0 until Dim)
      // == on doubles: the contract is BIT-exact — what lets the DuckDB
      // oracle replay training inside q32/q66/q106 and still hash-match
      assert(got(k)(d) == want(k)(d),
        s"centroid $k dim $d: got ${got(k)(d)}, twin ${want(k)(d)}")
  }

  test("trained cells strictly beat the subset init on assignment distortion") {
    val corpus = loadCorpus()
    val init = corpus.filter(_._1 % 97 == 0).toMap
    val trained = jvmTrain(corpus.filter(_._1 % 4 == 0), init, 2)

    val errSubset = distortion(corpus, init)
    val errTrained = distortion(corpus, trained)
    assert(errTrained < errSubset,
      s"trained distortion $errTrained not below subset $errSubset")
  }

  test("centroid output shape feeds ivfAssign: every vector lands in a trained cell") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Similarity.ivfTrain(e.filter(col("vec_id") % 4 === 0),
      e.filter(col("vec_id") % 97 === 0), Dim, 2)
    val centIds = cents.select("vec_id").collect().map(_.getLong(0)).toSet
    val assigned = Similarity.ivfAssign(e, cents)
    assert(assigned.count() == e.count())
    val cells = assigned.select("cell").distinct().collect().map(_.getLong(0)).toSet
    assert(cells.subsetOf(centIds), s"cells $cells not all trained ids")
  }
}
