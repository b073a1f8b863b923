package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata star schema (TESTDATA.md).
  *
  * All engine queries take a `sfDir` (e.g. `/root/testdata/sf0.01`) and read
  * single-parquet tables from it. Reads always go through here so that scan
  * options stay uniform (schema comes from parquet footers — fixed, never
  * inferred from data).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
    * to its microsecond TimestampType. Read it as a raw nanosecond epoch
    * long (`ts_ns`) instead — time-bucket arithmetic then stays in exact
    * integer math (DuckDB oracle side: `epoch_ns(ts)`), with no silent
    * sub-microsecond truncation anywhere.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, d, "events").withColumnRenamed("ts", "ts_ns")
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")

  /** Widen a scan ONLY when it yields fewer splits than the session has
    * cores — the single-parquet testdata tables scan as a handful of
    * row-group splits, starving a CPU-heavy downstream kernel (cosine,
    * quantization, shingling) at local[32]. At scale this is the
    * identity: a 100 TB table scans as thousands of splits, and an
    * unconditional `repartition` there is a full exchange bought for
    * parallelism the scan already provides.
    *
    * Hash on a caller-supplied high-cardinality key, NOT round-robin:
    * `repartition(n)` must stay deterministic under task retry, so Spark
    * first sorts every row by ALL columns
    * (`spark.sql.execution.sortBeforeRepartition`) — measured on q29 a
    * full sort of document text, 2.1 s → 6.9 s. Hash-by-key exchanges
    * without sorting.
    */
  def spread(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores, key) else df
  }
}
