package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.StratifiedTopN

/** Pins the threshold-prefilter stratified top-N: fast-path equality
  * with the naive full window, the soundness fallback under adversarial
  * (non-uniform) hash keys, NUL-separated routing of multi-column
  * strata, and NULL-hash handling.
  */
class StratifiedTopNSpec extends AnyFunSuite with SparkSpec {

  private val H = 1000L

  private def naive(df: DataFrame, stratum: Seq[String], n: Int): Set[(String, Long)] = {
    val w = Window.partitionBy(stratum.map(col): _*).orderBy(col("h"), col("id"))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= n)
      .select(concat_ws("|", stratum.map(col): _*), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
  }

  private def fast(df: DataFrame, stratum: Seq[String], n: Int,
      margin: Double = 2.5): Set[(String, Long)] =
    StratifiedTopN.byHashOrder(df, stratum, "h", H, "id", n, margin)
      .select(concat_ws("|", stratum.map(col): _*), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("fast path ≡ naive window on uniform hashes; small strata keep everything") {
    import spark.implicits._
    // uniform-ish hashes over two strata + one tiny stratum (cnt < n)
    val rows = (0L until 400L).map(i =>
      (if (i % 2 == 0) "en" else "de", (i * 761L) % H, i)) ++
      Seq(("xx", 999L, 9001L), ("xx", 1L, 9002L))
    val df = rows.toDF("lang", "h", "id")
    assert(fast(df, Seq("lang"), 20) == naive(df, Seq("lang"), 20))
    assert(fast(df, Seq("lang"), 20).count(_._1 == "xx") == 2) // cnt < n: all kept
  }

  test("adversarial stratum (all hashes at the top) falls back and stays exact") {
    import spark.implicits._
    // "bad": 100 rows all hashed ≥ 990 — the threshold prefilter keeps
    // nothing, so the guard must recompute it exactly; "good" stays fast
    val rows = (0L until 100L).map(i => ("bad", 990L + i % 10, i)) ++
      (0L until 200L).map(i => ("good", (i * 37L) % H, 1000L + i))
    val df = rows.toDF("lang", "h", "id")
    val got = fast(df, Seq("lang"), 15, margin = 1.0)
    assert(got == naive(df, Seq("lang"), 15))
    assert(got.count(_._1 == "bad") == 15, "fallback stratum lost rows")
  }

  test("multi-column strata route by NUL key — printable-separator aliases can't collide") {
    import spark.implicits._
    // ("a b", "c") and ("a", "b c") concat identically under a space
    // separator; only the first is adversarial and may fall back
    val rows = (0L until 50L).map(i => ("a b", "c", 995L, i)) ++
      (0L until 50L).map(i => ("a", "b c", (i * 61L) % H, 100L + i))
    val df = rows.toDF("s1", "s2", "h", "id")
    assert(fast(df, Seq("s1", "s2"), 10, margin = 1.0) ==
      naive(df, Seq("s1", "s2"), 10))
  }

  test("NULL hashes are dropped, not ranked") {
    import spark.implicits._
    val df = Seq(("en", Some(5L), 1L), ("en", Option.empty[Long], 2L))
      .toDF("lang", "h", "id")
    assert(fast(df, Seq("lang"), 10) == Set(("en", 1L)))
  }
}
