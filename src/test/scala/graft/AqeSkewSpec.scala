package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join: the RUNTIME answer to key skew, complementing
  * `operators/SaltedJoin` (the declarative one). With adaptive skew-join
  * splitting on, a sort-merge join whose build partition is pathologically
  * large is split into sub-partitions at runtime from the shuffle map
  * stats — no salting column, no plan rewrite, correct results. At 100 TB
  * this is the default first line against skew (salting remains for the
  * cases AQE can't see, e.g. skew under an aggregation rather than a
  * join); this spec pins that the config path actually fires, so a
  * deployment can rely on it instead of hand-salting every join.
  */
class AqeSkewSpec extends AnyFunSuite with SparkSpec {

  test("AQE splits a skewed sort-merge join at runtime (skew=true), result exact") {
    import spark.implicits._
    val confs = Seq(
      // local shuffles are tiny: lower every size threshold so the one
      // hot key registers as skew at test scale
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force SMJ
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows on one hot key + a uniform tail vs a small dim table
      val fact = spark.range(0, 60000)
        .select(when(col("id") < 50000, lit(7L)).otherwise(col("id") % 100).as("k"),
          col("id").as("payload"))
      val dim = spark.range(0, 100)
        .select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))
      val joined = fact.join(dim, "k")
      val agg = joined.groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k").as[(Long, Long)].collect()

      // correctness: hot key sees all 50k rows, tail keys 100 each (the
      // fact tail is id in [50000,60000) → 100 ids per k; k=7 gains 100)
      val expected = (0L until 100L).map(k =>
        k -> (if (k == 7) 50100L else 100L)).toMap
      assert(agg.toMap == expected)

      // the ADAPTIVE final plan must contain a skew-split SMJ
      val qe = joined.queryExecution
      joined.queryExecution.toRdd.count() // finalize the adaptive plan
      val finalPlan = qe.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a.executedPlan
      }.getOrElse(qe.executedPlan)
      val planStr = finalPlan.toString
      assert(planStr.contains("skew=true"),
        s"no skew-split join in adaptive plan:\n$planStr")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
