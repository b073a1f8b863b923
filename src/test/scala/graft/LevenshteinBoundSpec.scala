package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LevenshteinBoundRule: the length-difference guard appears exactly once
  * (idempotent under the fixpoint batch), short-circuits ahead of the DP,
  * and never changes results — including the threshold (-1) form q98 uses
  * and null inputs.
  */
class LevenshteinBoundSpec extends AnyFunSuite with SparkSpec {

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.LevenshteinBoundRule
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ eq graft.plans.LevenshteinBoundRule)
  }

  /** Parquet-backed (a pure-literal frame constant-folds to a
    * LocalRelation before any Filter exists for the rule to guard).
    * Varied lengths + nulls come from slicing real document text.
    */
  private def pairs = {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.select(col("doc_id").as("d1"),
      expr("substr(text, 1, cast(doc_id % 12 + 1 as int))").as("t1"),
      (col("doc_id") + 1000).as("d2"),
      expr("substr(text, 3, 8)").as("t2"))
  }

  test("plain form: guard injected once, results identical") {
    // def, not val: Dataset caches queryExecution, and the rule must be
    // installed before analysis for this query's plan to see it
    def q = pairs.filter(levenshtein(col("t1"), col("t2")) <= 3)
    val without = q.collect().map(_.getLong(0)).sorted
    withRule {
      val opt = q.queryExecution.optimizedPlan.toString
      val hits = "abs\\(\\(length\\(".r.findAllIn(opt).length
      assert(hits == 1, s"expected exactly one guard, got $hits:\n$opt")
      assert(q.collect().map(_.getLong(0)).sorted.sameElements(without))
    }
  }

  test("threshold form (q98's shape): guard injected in join condition") {
    val a = pairs.select(col("d1"), col("t1"))
    val b = pairs.select(col("d2"), col("t2"))
    def q = a.join(b, levenshtein(col("t1"), col("t2"), 3) >= 0)
    val without = q.count()
    withRule {
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("abs((length("), s"no guard in join condition:\n$opt")
      assert(q.count() == without)
    }
  }

  test("non-deterministic bound: no guard injected") {
    // k is duplicated into the guard, so a rand()-derived bound would
    // evaluate differently in guard and predicate — the rule must leave
    // such filters alone rather than miscompile them
    def q = pairs.filter(
      levenshtein(col("t1"), col("t2")) <= (rand(42) * 10).cast("int"))
    withRule {
      val opt = q.queryExecution.optimizedPlan.toString
      assert(!opt.contains("abs((length("), s"guard injected for non-deterministic bound:\n$opt")
    }
  }

  test("non-deterministic string argument: no guard injected") {
    // the guard also duplicates the levenshtein ARGUMENTS (inside
    // length), so a non-deterministic string input is just as unsafe as
    // a non-deterministic bound — the whole conjunct must be deterministic
    def q = pairs.filter(
      levenshtein(
        concat(col("t1"), when(rand(7) < 0.5, lit("x")).otherwise(lit(""))),
        col("t2")) <= 3)
    withRule {
      val opt = q.queryExecution.optimizedPlan.toString
      assert(!opt.contains("abs((length("),
        s"guard injected for non-deterministic levenshtein argument:\n$opt")
    }
  }

  test("q98 end-to-end result unchanged under the rule") {
    val run = SparkEntry.queries("q98_edit_distance")
    val without = run(spark, "/root/testdata/sf0.001").collect().toSeq
    withRule {
      val withR = run(spark, "/root/testdata/sf0.001").collect().toSeq
      assert(withR == without)
    }
  }
}
