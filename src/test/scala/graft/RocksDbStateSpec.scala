package graft

import org.scalatest.funsuite.AnyFunSuite

/** The stateful streaming operators on the RocksDB state store provider.
  *
  * The default (HDFSBackedStateStoreProvider) keeps every state row on
  * the executor HEAP — fine at test scale, fatal at 100 TB where join /
  * dedup / session state outgrows executor memory. RocksDB is the
  * production provider (native memory + local disk, incremental
  * checkpoint); these cases pin that every stateful operator in the
  * registry produces BIT-IDENTICAL output when the state store is
  * swapped, so the scale path is a pure config change, not a semantics
  * change. Provider class is read per-query from the session conf at
  * stream start, which is what makes the temporary-set pattern sound.
  */
class RocksDbStateSpec extends AnyFunSuite with SparkSpec {

  private val Sf = "/root/testdata/sf0.001"
  private val Key = "spark.sql.streaming.stateStore.providerClass"
  private val Rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run a registered query with the default provider, then with RocksDB,
    * and require identical ordered output (every registered query ends in
    * a deterministic orderBy, so Row-sequence equality is exact).
    */
  private def pinned(name: String): Unit = {
    val run = SparkEntry.queries(name)
    val base = run(spark, Sf).collect().toSeq
    assert(base.nonEmpty, s"$name returned no rows at $Sf")
    val prior = spark.conf.getOption(Key)
    spark.conf.set(Key, Rocks)
    try {
      val rocks = run(spark, Sf).collect().toSeq
      assert(rocks == base, s"$name: RocksDB output differs from default provider")
    } finally prior match {
      case Some(v) => spark.conf.set(Key, v)
      case None => spark.conf.unset(Key)
    }
  }

  test("streaming windowed aggregation state on RocksDB (q36)") {
    pinned("q36_stream_tumbling")
  }

  test("stream-stream join state on RocksDB (q39b inner, q99 outer)") {
    pinned("q39b_stream_stream_join")
    pinned("q99_stream_outer_join")
  }

  test("streaming dedup state on RocksDB (q65)") {
    pinned("q65_stream_dedup")
  }

  test("flatMapGroupsWithState sessionizer state on RocksDB (q38)") {
    pinned("q38_stateful_sessionize")
  }
}
