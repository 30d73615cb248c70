package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** ClickHouse `numbers(N)` as a real DataSource V2 table (SURVEY.md
  * §2.1 synthetic sources; upstream anchor
  * src/TableFunctions/TableFunctionNumbers.cpp): the generator is
  * split into `partitions` independent range chunks at PLANNING time,
  * so a 10^12-row numbers() scan parallelizes across a cluster with
  * no driver materialization — each task synthesizes its own range.
  *
  *   spark.read.format("graft.sources.NumbersSource")
  *     .option("n", "1000000").option("partitions", "32").load()
  *
  * (spark.range does the same natively; this source exists to
  * exercise the connector surface the engine would use for any
  * external system: TableProvider → Table → ScanBuilder → Batch →
  * InputPartition → PartitionReader.)
  */
class NumbersSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NumbersSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new NumbersTable(
      properties.getOrDefault("n", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object NumbersSource {
  val schema: StructType = new StructType().add("id", LongType, nullable = false)
}

private[sources] class NumbersTable(n: Long, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"numbers($n)"
  override def schema(): StructType = NumbersSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = NumbersSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val chunk = math.max(1L, (n + parts - 1) / parts)
        (0L until n by chunk)
          .map(start => NumbersPartition(start, math.min(start + chunk, n)))
          .toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new NumbersReaderFactory
    }
}

private[sources] case class NumbersPartition(start: Long, end: Long)
    extends InputPartition

private[sources] class NumbersReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[NumbersPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow = { row.update(0, cur); row }
      override def close(): Unit = ()
    }
  }
}
