package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.validate.TableConstraints
import graft.validate.TableConstraints.{ForeignKey, RowCondition, UniqueKey}

/** Pins the table-level data-contract audit: per-class violation
  * semantics (incl. null handling) and the one-scan execution shape for
  * everything but foreign keys.
  */
class TableConstraintsSpec extends AnyFunSuite with SparkSpec {

  private def report(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Boolean)] =
    df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap

  test("row conditions: false and NULL both violate (fail-closed)") {
    import spark.implicits._
    val t = Seq[(java.lang.Long, String)]((1L, "O"), (-2L, "F"), (null, "X"))
      .toDF("amount", "status")
    val got = report(TableConstraints.audit(t, Seq(
      RowCondition("amount_positive", col("amount") > 0), // -2 fails, null fails closed
      RowCondition("status_domain", col("status").isin("O", "F")))))
    assert(got == Map(
      "amount_positive" -> (2L, false),
      "status_domain" -> (1L, false)))
  }

  test("unique key: excess rows per non-null key tuple; null keys exempt") {
    import spark.implicits._
    val t = Seq[(java.lang.Long, String)](
      (1L, "a"), (1L, "a"), (1L, "a"), // 2 excess
      (2L, "b"), (null, "c"), (null, "c")) // nulls never count
      .toDF("k1", "k2")
    val got = report(TableConstraints.audit(t, Seq(
      UniqueKey("pk", Seq("k1", "k2")))))
    assert(got == Map("pk" -> (2L, false)))
  }

  test("foreign key: orphaned non-null keys violate; NULL FK passes") {
    import spark.implicits._
    val fact = Seq[(Long, java.lang.Long)]((1L, 10L), (2L, 11L), (3L, 99L),
      (4L, null)).toDF("id", "fk")
    val dim = Seq(10L, 11L, 12L).toDF("pk")
    val got = report(TableConstraints.audit(fact, Seq(
      ForeignKey("fact_fk", Seq("fk"), dim, Seq("pk")))))
    assert(got == Map("fact_fk" -> (1L, false))) // only the 99 orphan
  }

  test("all-pass contract reports zero violations and pass=true") {
    import spark.implicits._
    val t = Seq((1L, "O"), (2L, "F")).toDF("id", "status")
    val got = report(TableConstraints.audit(t, Seq(
      UniqueKey("pk", Seq("id")),
      RowCondition("status_domain", col("status").isin("O", "F")))))
    assert(got == Map("pk" -> (0L, true), "status_domain" -> (0L, true)))
  }

  test("row conditions + unique keys fold into one scan of the table") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val rows = orders.count()
    val read = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          read.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      TableConstraints.audit(orders, Seq(
        UniqueKey("pk", Seq("o_orderkey")),
        RowCondition("price_positive", col("o_totalprice") > 0),
        RowCondition("status_domain", col("o_orderstatus").isin("O", "F", "P")),
        RowCondition("date_range",
          col("o_orderdate").between("1992-01-01", "1998-12-31")))).collect()
      Thread.sleep(2000) // let the listener bus drain (ScaleSmoke's pattern)
      // input records == table rows exactly: 1 condition or 4, the audit
      // reads the table ONCE (shuffle traffic is not input; the report
      // build is driver-local)
      assert(read.get() == rows,
        s"audit read ${read.get()} input rows for a $rows-row table — " +
          "more than one scan")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
