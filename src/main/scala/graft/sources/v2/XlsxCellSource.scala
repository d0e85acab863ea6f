package graft.sources.v2

import graft.sources.BronzeStage
import java.util.{Map => JMap}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
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
  *    reaches the scan exchange (assert via the scan's `description`);
  *  - **filter pushdown** (SupportsPushDownFilters): sheet equality/
  *    membership and row/col range predicates evaluate as cells are
  *    parsed — out-of-range cells are never materialized, and a sheet
  *    predicate skips non-matching worksheet XML parts before parsing
  *    (the "one sheet, first N rows" scan reads ~one sheet's cells, not
  *    every cell of every workbook).
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
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = XlsxCellSource.Schema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  // sheet/row/col predicates evaluate EXACTLY inside the reader (a sheet
  // equality even skips parsing the other sheet parts), so handled
  // filters need no Spark-side re-evaluation — only the rest return
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, rest) = filters.partition(XlsxFilters.supported)
    pushed = sup
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new XlsxScan(paths, required, pushed)
}

/** The graft-xlsx pushdown dialect: sheet equality/membership and
  * row/col comparisons — the "one sheet, first N rows" scans the grid
  * walk issues. Evaluated per cell as it is parsed; cells outside the
  * predicate are never materialized, and a sheet predicate skips whole
  * worksheet XML parts before parsing. */
private[v2] object XlsxFilters {
  private def long(v: Any): Long = v.asInstanceOf[Number].longValue()

  def supported(f: Filter): Boolean = f match {
    case EqualTo(a, v) =>
      (a == "sheet" && v.isInstanceOf[String]) ||
        ((a == "row" || a == "col") && v.isInstanceOf[Number])
    case In(a, vs) if a == "sheet" => vs.forall(_.isInstanceOf[String])
    case GreaterThan(a, v) => (a == "row" || a == "col") && v.isInstanceOf[Number]
    case GreaterThanOrEqual(a, v) => (a == "row" || a == "col") && v.isInstanceOf[Number]
    case LessThan(a, v) => (a == "row" || a == "col") && v.isInstanceOf[Number]
    case LessThanOrEqual(a, v) => (a == "row" || a == "col") && v.isInstanceOf[Number]
    case _ => false
  }

  /** Conjunction over the pushed filters, per parsed cell. */
  def cellPredicate(fs: Seq[Filter]): BronzeStage.Cell => Boolean = {
    val tests: Seq[BronzeStage.Cell => Boolean] = fs.map {
      case EqualTo("sheet", v) => c => c.sheet == v
      case In("sheet", vs) =>
        val set = vs.map(_.asInstanceOf[String]).toSet
        c => set(c.sheet)
      case EqualTo(a, v) => field(a).andThen(_ == long(v))
      case GreaterThan(a, v) => field(a).andThen(_ > long(v))
      case GreaterThanOrEqual(a, v) => field(a).andThen(_ >= long(v))
      case LessThan(a, v) => field(a).andThen(_ < long(v))
      case LessThanOrEqual(a, v) => field(a).andThen(_ <= long(v))
      case other => throw new IllegalArgumentException(s"unsupported pushed filter $other")
    }
    c => tests.forall(_(c))
  }

  /** The sheet-only slice of the conjunction — decides whether a whole
    * worksheet part is worth parsing. */
  def sheetPredicate(fs: Seq[Filter]): String => Boolean = {
    val tests: Seq[String => Boolean] = fs.collect {
      case EqualTo("sheet", v) => (s: String) => s == v
      case In("sheet", vs) =>
        val set = vs.map(_.asInstanceOf[String]).toSet
        (s: String) => set(s)
    }
    s => tests.forall(_(s))
  }

  private def field(a: String): BronzeStage.Cell => Long = a match {
    case "row" => _.row
    case "col" => _.col
    case other => throw new IllegalArgumentException(s"not a numeric cell field: $other")
  }
}

private[v2] class XlsxScan(paths: Seq[String], required: StructType,
                           pushed: Array[Filter]) extends Scan with Batch {
  // the session's Hadoop conf (spark.hadoop.* — credentials, filesystems),
  // captured on the driver and shipped serialized to the readers
  private val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-xlsx ReadSchema: ${required.map(_.name).mkString(",")}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
  override def toBatch: Batch = this

  // driver-side listing only (glob-expanding — SourceFiles); bytes are
  // read inside each partition
  override def planInputPartitions(): Array[InputPartition] =
    paths.flatMap(SourceFiles.list(_, ".xlsx", hadoopConf.value))
      .map(XlsxFilePartition(_): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new XlsxReaderFactory(required.map(_.name).toArray, pushed, hadoopConf)
}

private[v2] case class XlsxFilePartition(file: String) extends InputPartition

private[v2] class XlsxReaderFactory(
    columns: Array[String],
    pushed: Array[Filter],
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
        BronzeStage.parseXlsx(bytes,
          XlsxFilters.sheetPredicate(pushed.toIndexedSeq),
          XlsxFilters.cellPredicate(pushed.toIndexedSeq)).iterator
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
