package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.LayoutQueries

/** q96's whole point is PLAN SHAPE, not values (the oracle pins those):
  * two tables bucketed on the join key must join with no exchange
  * anywhere below the SortMergeJoin.
  */
class BucketedJoinSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def collectNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
    case other => other +: other.children.flatMap(collectNodes)
  }

  test("bucketed orders⋈lineitem plans a SortMergeJoin with zero exchanges") {
    val joined = LayoutQueries.bucketedJoin(spark, sf)
    assert(joined.count() > 0)
    // inspect the FINAL (post-AQE) plan, after execution
    val nodes = collectNodes(joined.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[SortMergeJoinExec]),
      s"expected a SortMergeJoin in:\n${joined.queryExecution.executedPlan}")
    assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeLike]),
      s"bucketed join must not shuffle, got:\n${joined.queryExecution.executedPlan}")
  }

  test("each bucketed table lands one file per bucket") {
    // bucketedJoinNamed returns THIS call's table names — a max-suffix
    // directory search could pick up a stale dir from a previous JVM
    // (/tmp persists across runs; the suffix counter restarts at 0)
    val (_, ot, lt) = LayoutQueries.bucketedJoinNamed(spark, sf)
    for (table <- Seq(ot, lt)) {
      val loc = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_buckets", table)
      val parquets = java.nio.file.Files.list(loc).toArray.map(_.toString)
        .filter(f => f.endsWith(".parquet") && !f.contains("_SUCCESS"))
      assert(parquets.length == 8, s"$loc: ${parquets.mkString("\n")}")
    }
  }
}
