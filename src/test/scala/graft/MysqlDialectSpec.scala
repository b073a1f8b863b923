package graft

import java.sql.{Connection, Driver, DriverManager, PreparedStatement}
import java.util.Properties
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.JdbcUpsert

/** Executes the MySQL dialect branch of [[JdbcUpsert.upsert]] end-to-end.
  *
  * No MySQL-protocol engine ships in this environment (Derby is the only
  * embedded DB on the classpath, and it rejects `ON DUPLICATE KEY`), so
  * this spec registers [[MiniMysqlDriver]] — a test-scope JDBC driver
  * that accepts `jdbc:mysql:` URLs, STRICTLY parses the one statement
  * shape MySQL's upsert grammar documents
  * (`INSERT INTO t (cols) VALUES (?,…) ON DUPLICATE KEY UPDATE
  * c = VALUES(c), …` — reference `db/storage.py:71-78`), and applies
  * MySQL's documented semantics (match on primary key → apply the update
  * list; else insert) to an in-memory table. The real sink path runs
  * unmodified: `DriverManager.getConnection` inside `foreachPartition`
  * on executor threads, autoCommit off, prepared-statement batching,
  * one commit per partition. A dialect typo (wrong keyword, key column
  * in the update list, wrong placeholder arity) or a parameter-binding
  * order bug fails the parse or produces the wrong final state.
  */
class MysqlDialectSpec extends AnyFunSuite with SparkSpec {

  test("mysql-dialect upsert: insert then update through the real sink path") {
    MiniMysql.reset()
    MiniMysql.createTable("occurrences", keyCols = 1)
    MiniMysqlDriver.ensureRegistered()
    locally {
      import spark.implicits._
      val url = "jdbc:mysql://mini-mysql:3306/graft_test"

      val first = Seq(
        ("occ-1", "2020-01-01", 10L, 3),
        ("occ-2", "2020-01-02", 11L, 5),
        ("occ-3", "2020-01-03", 12L, 7))
        .toDF("id", "eventDate", "speciesId", "individualCount")
        .repartition(3) // exercise multiple partitions/connections
      JdbcUpsert.upsert(first, url, "occurrences", keys = Seq("id"))

      assert(MiniMysql.rows("occurrences").size === 3)
      assert(MiniMysql.rows("occurrences")(List("occ-2")) ===
        List("occ-2", "2020-01-02", 11L, 5))

      // second load: one changed row, one new row — the ON DUPLICATE KEY
      // path must update occ-2 in place and leave occ-1/occ-3 untouched
      val second = Seq(
        ("occ-2", "2020-02-02", 11L, 9),
        ("occ-4", "2020-01-04", 13L, 1))
        .toDF("id", "eventDate", "speciesId", "individualCount")
      JdbcUpsert.upsert(second, url, "occurrences", keys = Seq("id"))

      val rows = MiniMysql.rows("occurrences")
      assert(rows.size === 4)
      assert(rows(List("occ-2")) === List("occ-2", "2020-02-02", 11L, 9))
      assert(rows(List("occ-1")) === List("occ-1", "2020-01-01", 10L, 3))
      assert(rows(List("occ-4")) === List("occ-4", "2020-01-04", 13L, 1))

      // the statement the sink emitted, as parsed by the strict grammar
      val parsed = MiniMysql.lastParsed.get()
      assert(parsed.table === "occurrences")
      assert(parsed.cols === Seq("id", "eventDate", "speciesId", "individualCount"))
      assert(parsed.updateCols === Seq("eventDate", "speciesId", "individualCount"),
        "update list must be exactly the non-key columns")
    }
  }

  test("strict grammar rejects malformed upsert statements") {
    Seq(
      // key column in the update list
      "INSERT INTO t (id, v) VALUES (?, ?) ON DUPLICATE KEY UPDATE id = VALUES(id)",
      // placeholder arity mismatch
      "INSERT INTO t (id, v) VALUES (?) ON DUPLICATE KEY UPDATE v = VALUES(v)",
      // Derby MERGE shape must NOT reach the mysql branch
      "MERGE INTO t USING SYSIBM.SYSDUMMY1 ON t.id = ? WHEN NOT MATCHED THEN INSERT (id) VALUES (?)",
      // mismatched VALUES() reference
      "INSERT INTO t (id, v) VALUES (?, ?) ON DUPLICATE KEY UPDATE v = VALUES(id)")
      .foreach { sql =>
        val e = intercept[java.sql.SQLException] {
          MiniMysql.parse(sql, keyColsOf = _ => 1)
        }
        assert(e.getMessage.contains("mini-mysql"), s"for: $sql")
      }
  }

  test("emitted SQL text matches the documented MySQL grammar verbatim") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("eventDate", StringType),
      StructField("speciesId", LongType)))
    assert(JdbcUpsert.mysqlUpsertSql("occurrences", schema, Seq("id")) ===
      "INSERT INTO occurrences (id, eventDate, speciesId) VALUES (?, ?, ?)" +
        " ON DUPLICATE KEY UPDATE eventDate = VALUES(eventDate)," +
        " speciesId = VALUES(speciesId)")
  }
}

/** Parsed form of the single accepted statement shape. */
final case class ParsedUpsert(table: String, cols: Seq[String],
    updateCols: Seq[String], keyCols: Int)

/** In-memory MySQL-semantics store shared across executor threads (local
  * mode = one JVM). Key = leading `keyCols` column values.
  */
object MiniMysql {
  private val tables =
    new ConcurrentHashMap[String, mutable.LinkedHashMap[List[Any], List[Any]]]()
  private val keyArity = new ConcurrentHashMap[String, Integer]()
  val lastParsed = new java.util.concurrent.atomic.AtomicReference[ParsedUpsert]()

  def reset(): Unit = { tables.clear(); keyArity.clear(); lastParsed.set(null) }

  def createTable(name: String, keyCols: Int): Unit = {
    tables.put(name, mutable.LinkedHashMap.empty)
    keyArity.put(name, keyCols)
  }

  def rows(name: String): Map[List[Any], List[Any]] =
    tables.get(name).synchronized(tables.get(name).toMap)

  private val UpsertRe =
    ("""^INSERT INTO (\w+) \(([\w, ]+)\) VALUES \((\?(?:, \?)*)\)""" +
      """ ON DUPLICATE KEY UPDATE (.+)$""").r
  private val AssignRe = """^(\w+) = VALUES\((\w+)\)$""".r

  /** Accept exactly the documented grammar; anything else throws — a
    * dialect typo in the sink surfaces here, not as silent acceptance.
    */
  def parse(sql: String, keyColsOf: String => Int): ParsedUpsert = sql match {
    case UpsertRe(table, colList, params, updates) =>
      val cols = colList.split(", ").toSeq
      val nParams = params.count(_ == '?')
      if (nParams != cols.size)
        throw new java.sql.SQLException(
          s"mini-mysql: $nParams placeholders for ${cols.size} columns")
      val k = keyColsOf(table)
      val updateCols = updates.split(", ").toSeq.map {
        case AssignRe(c, v) if c == v => c
        case a => throw new java.sql.SQLException(
          s"mini-mysql: bad update assignment '$a'")
      }
      if (updateCols != cols.drop(k))
        throw new java.sql.SQLException(
          s"mini-mysql: update list $updateCols != non-key columns ${cols.drop(k)}")
      ParsedUpsert(table, cols, updateCols, k)
    case _ =>
      throw new java.sql.SQLException(s"mini-mysql: cannot parse: $sql")
  }

  def execute(p: ParsedUpsert, row: List[Any]): Unit = {
    val t = tables.get(p.table)
    if (t == null) throw new java.sql.SQLException(s"mini-mysql: no table ${p.table}")
    t.synchronized {
      val key = row.take(p.keyCols)
      t.get(key) match {
        case Some(existing) =>
          // ON DUPLICATE KEY UPDATE: keep key cells, take update-list cells
          t.put(key, existing.take(p.keyCols) ++ row.drop(p.keyCols))
        case None => t.put(key, row)
      }
    }
  }

  def keyColsOf(table: String): Int = {
    val k = keyArity.get(table)
    if (k == null) throw new java.sql.SQLException(s"mini-mysql: no table $table")
    k.intValue()
  }
}

/** Minimal `jdbc:mysql:` driver over [[MiniMysql]], built with dynamic
  * proxies: only the JDBC surface the sink actually touches is
  * implemented (getConnection → setAutoCommit/prepareStatement/commit/
  * close; statement → setObject/addBatch/executeBatch/close); any other
  * call fails loud.
  */
object MiniMysqlDriver extends Driver {
  private val registered = new java.util.concurrent.atomic.AtomicBoolean(false)
  def ensureRegistered(): Unit =
    if (registered.compareAndSet(false, true)) DriverManager.registerDriver(this)

  override def acceptsURL(url: String): Boolean = url.startsWith("jdbc:mysql:")

  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null
    else proxy[Connection] {
      case ("setAutoCommit" | "commit" | "close" | "rollback", _) => null
      case ("getAutoCommit", _) => java.lang.Boolean.FALSE
      case ("isClosed", _) => java.lang.Boolean.FALSE
      case ("prepareStatement", Array(sql: String)) =>
        val parsed = MiniMysql.parse(sql, MiniMysql.keyColsOf)
        MiniMysql.lastParsed.set(parsed)
        prepared(parsed)
    }

  private def prepared(p: ParsedUpsert): PreparedStatement = {
    // one statement is used by one partition thread; nullable binds are
    // legal, so plain arrays (not a null-rejecting ConcurrentHashMap)
    val current = new Array[Any](p.cols.size)
    val batch = mutable.ArrayBuffer.empty[List[Any]]
    proxy[PreparedStatement] {
      case ("setObject", Array(i: Integer, v)) => current(i - 1) = v; null
      case ("addBatch", _) => batch += current.toList; null
      case ("executeBatch", _) =>
        batch.foreach(MiniMysql.execute(p, _))
        val n = Array.fill(batch.size)(1)
        batch.clear()
        n
      case ("close" | "clearBatch" | "clearParameters", _) => null
    }
  }

  private def proxy[T](handle: PartialFunction[(String, Array[AnyRef]), AnyRef])(
      implicit ct: scala.reflect.ClassTag[T]): T = {
    val iface = ct.runtimeClass
    java.lang.reflect.Proxy.newProxyInstance(
      iface.getClassLoader, Array(iface),
      (_, method, args) => {
        val a = if (args == null) Array.empty[AnyRef] else args
        handle.applyOrElse((method.getName, a),
          (m: (String, Array[AnyRef])) => throw new UnsupportedOperationException(
            s"mini-mysql: unexpected JDBC call ${m._1}"))
      }).asInstanceOf[T]
  }

  override def getPropertyInfo(url: String, info: Properties) =
    Array.empty[java.sql.DriverPropertyInfo]
  override def getMajorVersion: Int = 0
  override def getMinorVersion: Int = 1
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger = throw new java.sql.SQLFeatureNotSupportedException()
}
