package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GlobalRowNumber

/** The two-pass partition-offset numbering must reproduce a bare
  * `row_number() OVER (ORDER BY key)` exactly — that equivalence is what
  * lets q07 drop the single-partition window.
  */
class GlobalRowNumberSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("ranks equal the sorted position for unique keys (incl. negatives)") {
    val rnd = new scala.util.Random(21)
    val keys = rnd.shuffle((0 until 2000).map(i => i.toLong * 7 - 5000))
    val got = GlobalRowNumber
      .byKeyOrder(keys.toDF("k"), "k", "rn", buckets = 16)
      .select("k", "rn").as[(Long, Long)].collect().toMap
    keys.sorted.zipWithIndex.foreach { case (k, i) =>
      assert(got(k) == i + 1, s"key $k")
    }
  }

  test("heavy duplicates: ranks are a permutation, monotone across keys") {
    val rnd = new scala.util.Random(22)
    val keys = Seq.fill(3000)(rnd.nextInt(7).toLong) // 7 distinct values
    val got = GlobalRowNumber
      .byKeyOrder(keys.toDF("k"), "k", "rn", buckets = 8)
      .select("k", "rn").as[(Long, Long)].collect()
    assert(got.map(_._2).sorted.toSeq == (1L to 3000L))
    // every rank of a smaller key precedes every rank of a larger key
    val maxRankPerKey = got.groupBy(_._1).view.mapValues(_.map(_._2).max)
    val minRankPerKey = got.groupBy(_._1).view.mapValues(_.map(_._2).min)
    (0L until 6L).foreach { k =>
      assert(maxRankPerKey(k) < minRankPerKey(k + 1), s"key $k overlaps ${k + 1}")
    }
  }

  test("empty input yields empty output") {
    val empty = Seq.empty[Long].toDF("k")
    assert(GlobalRowNumber.byKeyOrder(empty, "k", "rn").count() == 0)
  }
}
