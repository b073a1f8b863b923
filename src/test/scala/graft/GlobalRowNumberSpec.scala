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

  // cumeDistByKey must be EXACTLY the naive per-stratum cume_dist — the
  // q127 rewrite is licensed by this equivalence. The workload is
  // deliberately skewed (one stratum holds ~90% of rows) with heavy
  // score ties, the two cases that distinguish the range-bucketed
  // two-pass from a wrong offset/tie treatment.
  test("cumeDistByKey ≡ naive cume_dist under skew and ties") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(23)
    val rows = (0 until 5000).map { i =>
      val src = if (i % 10 == 0) s"s${i % 3 + 1}" else "giant"
      // 40 distinct double scores → ~125 ties per (stratum, score)
      (i.toLong, src, (rnd.nextInt(40) * 0.37) - 3.0)
    }
    val df = rows.toDF("id", "src", "score")
    val naive = df.withColumn("pct",
      cume_dist().over(Window.partitionBy("src").orderBy("score")))
      .select("id", "pct").as[(Long, Double)].collect().toMap
    val got = GlobalRowNumber
      .cumeDistByKey(df, Seq("src"), "score", "pct", buckets = 8)
      .select("id", "pct").as[(Long, Double)].collect()
    assert(got.length == 5000)
    got.foreach { case (id, pct) =>
      assert(pct == naive(id), s"id $id: two-pass $pct vs naive ${naive(id)}")
    }
  }

  test("cumeDistByKey ≡ naive cume_dist on random skew/tie/bucket-count mixes") {
    import org.apache.spark.sql.expressions.Window
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genRows: Gen[(List[(String, Double)], Int)] = for {
      n <- Gen.choose(1, 120)
      rows <- Gen.listOfN(n, for {
        s <- Gen.frequency(6 -> "giant", 1 -> "a", 1 -> "b")
        // a small value pool forces heavy ties; the wide leg, range
        v <- Gen.frequency(
          3 -> Gen.oneOf(-1.5, 0.0, 0.25, 7.0),
          1 -> Gen.choose(-1e6, 1e6))
      } yield (s, v))
      buckets <- Gen.choose(2, 16)
    } yield (rows, buckets)
    val prop = Prop.forAll(genRows) { case (rows, buckets) =>
      val df = rows.zipWithIndex.map { case ((s, v), i) => (i.toLong, s, v) }
        .toDF("id", "src", "score")
      val naive = df.withColumn("pct",
        cume_dist().over(Window.partitionBy("src").orderBy("score")))
        .select("id", "pct").as[(Long, Double)].collect().toMap
      val got = GlobalRowNumber
        .cumeDistByKey(df, Seq("src"), "score", "pct", buckets)
        .select("id", "pct").as[(Long, Double)].collect()
      got.length == rows.length && got.forall { case (id, p) => p == naive(id) }
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(20).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("cumeDistByKey: NULL stratum is its own stratum (window semantics)") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, Some("a"), 1.0), (2L, Some("a"), 2.0),
      (3L, None, 1.0), (4L, None, 5.0), (5L, None, 5.0))
      .toDF("id", "src", "score")
    val naive = df.withColumn("pct",
      cume_dist().over(Window.partitionBy("src").orderBy("score")))
      .select("id", "pct").as[(Long, Double)].collect().toMap
    val got = GlobalRowNumber
      .cumeDistByKey(df, Seq("src"), "score", "pct", buckets = 4)
      .select("id", "pct").as[(Long, Double)].collect().toMap
    assert(got == naive)
  }
}
