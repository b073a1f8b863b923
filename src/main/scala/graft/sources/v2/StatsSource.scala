package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.BatchPlanner

/** Custom DataSourceV2 connector (SURVEY.md §2.1 S1–S3): the engine-side
  * model of the reference's statistics endpoint. Demonstrates the full
  * connector surface the reference's REST source would use in production:
  *
  *  - predicate pushdown: `year` range filters tighten the scan window
  *    before any row is produced (the reference pushes species/date-range
  *    params into API calls, `whalefinder/obis.py:124-139`);
  *  - statistics-driven partition planning: input partitions are the
  *    fetch windows [[BatchPlanner.planBatches]] packs from the per-year
  *    record counts (`obis.py:166-203`) — the ingest cost model decides
  *    the parallelism;
  *  - deterministic synthetic data (no network in this environment): year
  *    y carries `(y · 2654435761) mod 10000` records, a formula the DuckDB
  *    oracle reproduces exactly.
  *
  * Usage: `spark.read.format("graft.sources.v2.StatsSource").load()`,
  * optionally `.option("start", …).option("end", …)`.
  */
class StatsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StatsSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StatsTable(
      Option(properties.get("start")).map(_.toInt).getOrElse(1900),
      Option(properties.get("end")).map(_.toInt).getOrElse(2025))
}

object StatsSource {
  val Schema: StructType = StructType(Seq(
    StructField("year", IntegerType, nullable = false),
    StructField("records", LongType, nullable = false)))

  /** Deterministic per-year record count (both engines compute this). */
  def recordsFor(year: Int): Long = (year.toLong * 2654435761L) % 10000L

  /** Fetch-window size for partition planning (reference: size=10000). */
  val WindowSize = 20000L
}

class StatsTable(start: Int, end: Int) extends Table with SupportsRead {
  override def name(): String = s"stats[$start,$end]"
  override def schema(): StructType = StatsSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StatsScanBuilder(
      options.getInt("start", start), options.getInt("end", end))
}

class StatsScanBuilder(var start: Int, var end: Int)
  extends ScanBuilder with SupportsPushDownFilters {

  private var pushed: Array[Filter] = Array.empty

  /** Tighten [start, end] from year-range predicates; everything else
    * stays post-scan.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("year", v: Int) => start = math.max(start, v); true
      case GreaterThan("year", v: Int) => start = math.max(start, v + 1); true
      case LessThanOrEqual("year", v: Int) => end = math.min(end, v); true
      case LessThan("year", v: Int) => end = math.min(end, v - 1); true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new StatsScan(start, end)
}

final case class StatsWindow(from: Int, to: Int) extends InputPartition

class StatsScan(start: Int, end: Int) extends Scan with Batch {
  override def readSchema(): StructType = StatsSource.Schema
  override def toBatch: Batch = this
  override def description(): String = s"graft-stats [$start..$end]"

  /** Partitions = the cost-model fetch windows: years packed so each
    * partition carries ≤ WindowSize records.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val counts = (start to end).map(y => y -> StatsSource.recordsFor(y))
    BatchPlanner.planBatches(counts, StatsSource.WindowSize)
      .map { case (a, b) => StatsWindow(a, b) }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val w = partition.asInstanceOf[StatsWindow]
      private var y = w.from - 1
      override def next(): Boolean = { y += 1; y <= w.to }
      override def get(): InternalRow =
        InternalRow(y, StatsSource.recordsFor(y))
      override def close(): Unit = ()
    }
}
