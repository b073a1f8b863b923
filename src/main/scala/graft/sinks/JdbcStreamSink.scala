package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.DataFrame

/** Exactly-once streaming delivery into a JDBC table — the `foreachBatch`
  * twin of [[IdempotentFileSink]], for the reference's MySQL-shaped target
  * (`db/storage.py`): stream → keyed upsert + batch ledger.
  *
  * `foreachBatch` is at-least-once: after a crash between the user
  * function and the checkpoint commit, the SAME `batchId` replays.
  * Exactly-once against a database therefore needs two properties:
  *
  *  1. **Row idempotence** — the data write is [[JdbcUpsert]]'s keyed
  *     MERGE / ON-DUPLICATE-KEY, so re-running a batch (fully or from a
  *     partially-landed crash: some partitions committed, some not)
  *     converges to the same final rows instead of duplicating. This is
  *     why the protocol works with per-partition transactions at 1000
  *     executors — no cross-connection distributed transaction needed.
  *  2. **A batch ledger** (`<table>_commits(sink_name, batch_id)`,
  *     PK on both) written by the DRIVER after every partition committed.
  *     A replay of a fully-committed batch short-circuits on the ledger
  *     probe and touches no data; downstream consumers read the ledger to
  *     know which batch ids have COMPLETELY landed (mid-batch, readers
  *     may observe a prefix of the batch's rows — the ledger row, not
  *     table visibility, is the commit point, exactly like the file
  *     sink's `_COMMITTED_<id>` marker).
  *
  * The ledger insert uses the PK as the idempotence guard: a duplicate
  * insert (crash between insert and checkpoint commit, then replay) hits
  * the PK violation and is treated as already-committed.
  */
object JdbcStreamSink {

  def ledgerTable(table: String): String = s"${table}_commits"

  /** (url, ledger table) pairs already ensured this JVM — a continuous
    * stream calls [[writeBatch]] every trigger, and re-attempting the
    * CREATE TABLE per micro-batch is a wasted round-trip + failed-DDL
    * log line each time. The ensure is idempotent, so the memo is purely
    * an optimization (a fresh JVM after a dropped ledger re-creates it).
    */
  private val ledgerEnsured =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()

  /** `foreachBatch` body: upsert `df` into `table` exactly once per
    * `batchId`. Safe to call repeatedly with the same id.
    */
  def writeBatch(df: DataFrame, url: String, table: String, keys: Seq[String],
      sinkName: String, batchId: Long, batchSize: Int = 500): Unit = {
    // memoize only AFTER the ensure succeeds: adding first would turn one
    // transient DB outage into "ensured forever" — every later batch in
    // this JVM skipping the CREATE and failing at the ledger probe
    if (!ledgerEnsured.contains((url, table))) {
      ensureLedger(url, table)
      ledgerEnsured.add((url, table))
    }
    if (isCommitted(url, table, sinkName, batchId)) return
    JdbcUpsert.upsert(df, url, table, keys, batchSize)
    commit(url, table, sinkName, batchId)
  }

  /** Create the ledger table if absent (PK = (sink_name, batch_id)). */
  def ensureLedger(url: String, table: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        s"CREATE TABLE ${ledgerTable(table)} (" +
          "sink_name VARCHAR(128) NOT NULL, batch_id BIGINT NOT NULL, " +
          "PRIMARY KEY (sink_name, batch_id))")
      catch {
        // only "table already exists" is expected (Derby X0Y32,
        // MySQL-family 42S01); anything else must surface
        case e: java.sql.SQLException
          if e.getSQLState == "X0Y32" || e.getSQLState == "42S01" => ()
      } finally st.close()
    } finally conn.close()
  }

  def isCommitted(url: String, table: String, sinkName: String,
      batchId: Long): Boolean = {
    val conn = DriverManager.getConnection(url)
    try {
      val ps = conn.prepareStatement(
        s"SELECT 1 FROM ${ledgerTable(table)} WHERE sink_name = ? AND batch_id = ?")
      ps.setString(1, sinkName)
      ps.setLong(2, batchId)
      val rs = ps.executeQuery()
      try rs.next() finally { rs.close(); ps.close() }
    } finally conn.close()
  }

  /** Committed batch ids for a sink, ascending. Downstream readers probe
    * this before the first batch may have landed — creates the (empty)
    * ledger rather than erroring.
    */
  def committedBatches(url: String, table: String, sinkName: String): Seq[Long] = {
    ensureLedger(url, table)
    val conn = DriverManager.getConnection(url)
    try {
      val ps = conn.prepareStatement(
        s"SELECT batch_id FROM ${ledgerTable(table)} WHERE sink_name = ? ORDER BY batch_id")
      ps.setString(1, sinkName)
      val rs = ps.executeQuery()
      try {
        val b = Seq.newBuilder[Long]
        while (rs.next()) b += rs.getLong(1)
        b.result()
      } finally { rs.close(); ps.close() }
    } finally conn.close()
  }

  private def commit(url: String, table: String, sinkName: String,
      batchId: Long): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val ps = conn.prepareStatement(
        s"INSERT INTO ${ledgerTable(table)} (sink_name, batch_id) VALUES (?, ?)")
      ps.setString(1, sinkName)
      ps.setLong(2, batchId)
      try ps.executeUpdate()
      catch {
        // PK violation = a racing/replayed commit of the same batch —
        // the batch is committed either way (SQLState 23xxx integrity
        // violation; Derby 23505, MySQL 23000)
        case e: java.sql.SQLException
          if Option(e.getSQLState).exists(_.startsWith("23")) => ()
      } finally ps.close()
    } finally conn.close()
  }
}
