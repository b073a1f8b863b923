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

  test("multi-column strata route by join — concat-aliasing strata can't collide") {
    import spark.implicits._
    // ("a b", "c") and ("a", "b c") concat identically under any
    // printable separator; join-based routing can't confuse them even
    // when only the first is adversarial and falls back
    val rows = (0L until 50L).map(i => ("a b", "c", 995L, i)) ++
      (0L until 50L).map(i => ("a", "b c", (i * 61L) % H, 100L + i))
    val df = rows.toDF("s1", "s2", "h", "id")
    assert(fast(df, Seq("s1", "s2"), 10, margin = 1.0) ==
      naive(df, Seq("s1", "s2"), 10))
  }

  test("a NULL stratum is a stratum (naive-window semantics), even through the fallback") {
    import spark.implicits._
    // NULL lang, adversarially hashed so the prefilter keeps nothing —
    // both the count join and the fallback routing must be null-safe or
    // these rows silently vanish
    val rows = (0L until 40L).map(i => (Option.empty[String], 990L + i % 10, i)) ++
      (0L until 40L).map(i => (Some("en"), (i * 31L) % H, 100L + i))
    val df = rows.toDF("lang", "h", "id")
    def pairs(d: org.apache.spark.sql.DataFrame) = d.select("lang", "id")
      .collect().map(r =>
        (if (r.isNullAt(0)) "∅" else r.getString(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("h"), col("id"))
    val want = pairs(df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 8))
    val got = pairs(StratifiedTopN.byHashOrder(df, Seq("lang"), "h", H, "id", 8,
      margin = 1.0))
    assert(got == want)
    assert(got.count(_._1 == "∅") == 8, s"NULL stratum lost: $got")
  }

  test("timestamp-typed strata route exactly through the fallback (no string rendering)") {
    import spark.implicits._
    // driver toString ("…10:00:00.0") and Spark's cast("string")
    // ("…10:00:00") disagree on timestamps — routing must not depend on
    // either rendering
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-02 11:30:00")
    val rows = (0L until 30L).map(i => (t1, 995L, i)) ++ // adversarial → falls back
      (0L until 60L).map(i => (t2, (i * 53L) % H, 100L + i))
    val df = rows.toDF("day", "h", "id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("day")).orderBy(col("h"), col("id"))
    val want = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("day").cast("string"), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = StratifiedTopN.byHashOrder(df, Seq("day"), "h", H, "id", 5, margin = 1.0)
      .select(col("day").cast("string"), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.count(_._1 == "2024-01-01 10:00:00") == 5,
      s"shorted timestamp stratum lost rows: $got")
  }

  test("NULL hashes are dropped, not ranked") {
    import spark.implicits._
    val df = Seq(("en", Some(5L), 1L), ("en", Option.empty[Long], 2L))
      .toDF("lang", "h", "id")
    assert(fast(df, Seq("lang"), 10) == Set(("en", 1L)))
  }
}
