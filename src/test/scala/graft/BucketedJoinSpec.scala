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
    // table names carry a per-call unique suffix (concurrent-caller
    // safety) — locate THIS call's tables by max numeric suffix
    LayoutQueries.bucketedJoin(spark, sf)
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_buckets")
    for (prefix <- Seq("graft_q96_orders_", "graft_q96_lineitem_")) {
      val loc = java.nio.file.Files.list(root).toArray.map(_.toString)
        .filter(_.getNameAfterSlash.startsWith(prefix))
        .maxBy(_.getNameAfterSlash.stripPrefix(prefix).toLong)
      val parquets = java.nio.file.Files.list(
        java.nio.file.Paths.get(loc)).toArray.map(_.toString)
        .filter(f => f.endsWith(".parquet") && !f.contains("_SUCCESS"))
      assert(parquets.length == 8, s"$loc: ${parquets.mkString("\n")}")
    }
  }

  private implicit class PathName(s: String) {
    def getNameAfterSlash: String = s.substring(s.lastIndexOf('/') + 1)
  }
}
