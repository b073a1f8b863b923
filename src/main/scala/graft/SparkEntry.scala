package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 (plus the
  * large-scale training-data extensions) to a Spark plan over a testdata
  * scale-factor directory; `oracleSql` carries the DuckDB-equivalent SQL
  * the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  private def groups: Seq[Seq[QueryDef]] = Seq(
    RelationalQueries.defs,
    DateQueries.defs,
    ValidationQueries.defs,
    TextQueries.defs,
    DedupQueries.defs,
    SimilarityQueries.defs,
    EventQueries.defs,
    CohortQueries.defs,
    StreamQueries.defs,
    GeoQueries.defs,
    SourceQueries.defs,
    AggExtQueries.defs,
    ExtOpQueries.defs,
    LayoutQueries.defs,
    MixQueries.defs
  )

  private lazy val all: Seq[QueryDef] = groups.flatten

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Snowflake join chain + grouped exact aggregate (SURVEY.md §7.2 shape).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q09_join_snowflake")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
