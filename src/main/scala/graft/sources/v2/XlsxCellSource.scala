package graft.sources.v2

import graft.sources.BronzeStage
import java.util.{Map => JMap}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 face of the xlsx bronze stage: `spark.read
  * .format("graft-xlsx").load(dir)` yields the (path, sheet, row, col,
  * value) cell matrix that feeds [[graft.sources.GridTables.subtableAt]] —
  * the same rows as [[BronzeStage.xlsxCells]], but as a first-class
  * source the planner can reason about:
  *
  *  - **one input partition per workbook** — a million-file bronze layer
  *    fans out across the cluster with no driver-side parse, and Spark's
  *    scheduler (not a flatMap over a binaryFile frame) owns locality,
  *    retries and speculative re-execution of per-file work;
  *  - **column pruning pushed into the reader**
  *    (SupportsPushDownRequiredColumns): a downstream
  *    `select(row, col, value)` never materializes path/sheet strings per
  *    cell — the projection happens as cells are emitted, before anything
  *    reaches the scan exchange (assert via the scan's `description`).
  *
  * File bytes are read through the Hadoop FileSystem API, so the same
  * source serves local paths in tests and distributed stores in
  * production. Parsing is [[BronzeStage.parseXlsx]] — one shared,
  * dependency-free parser for both faces (reference
  * episode_stats/episode_stats_extract.py:421, openpyxl grid load).
  */
class XlsxCellSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-xlsx"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    XlsxCellSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    // fail loudly rather than scanning nothing: multi-path load() fills
    // "paths" (a JSON array) instead of "path"
    require(properties.get("paths") == null,
      "graft-xlsx supports a single load path; pass one directory or glob")
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-xlsx requires a load path"))
    new XlsxCellTable(Seq(path))
  }
}

object XlsxCellSource {
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("sheet", StringType),
    StructField("row", LongType),
    StructField("col", LongType),
    StructField("value", StringType)))
}

private[v2] class XlsxCellTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"graft-xlsx(${paths.mkString(",")})"
  override def schema(): StructType = XlsxCellSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new XlsxScanBuilder(paths)
}

private[v2] class XlsxScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = XlsxCellSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new XlsxScan(paths, required)
}

private[v2] class XlsxScan(paths: Seq[String], required: StructType)
    extends Scan with Batch {
  // the session's Hadoop conf (spark.hadoop.* — credentials, filesystems),
  // captured on the driver and shipped serialized to the readers
  private val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-xlsx ReadSchema: ${required.map(_.name).mkString(",")}"
  override def toBatch: Batch = this

  // driver-side listing only — bytes are read inside each partition
  override def planInputPartitions(): Array[InputPartition] = {
    paths.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(hadoopConf.value)
      val it = fs.listFiles(path, true)
      val files = Seq.newBuilder[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".xlsx"))
          files += f.getPath.toString
      }
      files.result()
    }.sorted.map(XlsxFilePartition(_): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new XlsxReaderFactory(required.map(_.name).toArray, hadoopConf)
}

private[v2] case class XlsxFilePartition(file: String) extends InputPartition

private[v2] class XlsxReaderFactory(
    columns: Array[String],
    hadoopConf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[XlsxFilePartition].file
    new PartitionReader[InternalRow] {
      private val pathUtf8 = UTF8String.fromString(file)
      private val cells: Iterator[BronzeStage.Cell] = {
        val p = new Path(file)
        val in = p.getFileSystem(hadoopConf.value).open(p)
        val bytes =
          try in.readAllBytes()
          finally in.close()
        BronzeStage.parseXlsx(bytes).iterator
      }
      // pruned projection: evaluate only the requested fields per cell
      private val getters: Array[BronzeStage.Cell => Any] = columns.map {
        case "path" => (_: BronzeStage.Cell) => pathUtf8
        case "sheet" => (c: BronzeStage.Cell) => UTF8String.fromString(c.sheet)
        case "row" => (c: BronzeStage.Cell) => c.row
        case "col" => (c: BronzeStage.Cell) => c.col
        case "value" => (c: BronzeStage.Cell) => UTF8String.fromString(c.value)
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (cells.hasNext) {
          val c = cells.next()
          current = InternalRow.fromSeq(getters.toIndexedSeq.map(_(c)))
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
