package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for all suites (getOrCreate — one JVM-wide
  * session, so suites don't pay repeated startup).
  */
trait SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // keep the suite runnable against a TIMESTAMP(NANOS) testdata round
      // (schema inference only honors build-time values — Tables.scala)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
