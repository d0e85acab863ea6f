package graft.sources.v2

import graft.sources.BronzeStage
import java.util.{Map => JMap}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, StringEndsWith}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 face of the docx bronze stage: `spark.read
  * .format("graft-docx").load(dirOrGlob)` yields the (path, line_no,
  * line) paragraph rows that feed
  * [[graft.domain.Pipelines.parseConfessionalLines]] (rename path →
  * doc_id) — the same rows as [[BronzeStage.docxLines]], but as a
  * first-class source:
  *
  *  - **one input partition per document** — the scheduler (not a flatMap
  *    over a binaryFile frame) owns per-file locality, retries and
  *    speculative re-execution, the production posture for a large
  *    document drop;
  *  - **column pruning pushed into the reader**: a downstream
  *    `select(line)` never materializes path strings per paragraph;
  *  - **filter pushdown** (SupportsPushDownFilters): path equality/
  *    membership/suffix prunes whole INPUT PARTITIONS at plan time — a
  *    single-document lookup against a million-file drop opens one file,
  *    not a million — and `line_no` range predicates evaluate as
  *    paragraphs are walked, with an upper bound terminating the walk
  *    early (paragraphs stream in line_no order), the "head of each
  *    document" scan shape.
  *
  * Parsing is [[BronzeStage.parseDocx]] — the same dependency-free StAX
  * parser as the flatMap face (reference
  * `confessional/confessional_extract.py:26-47`, python-docx paragraph
  * walk). */
class DocxLineSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-docx"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocxLineSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    require(properties.get("paths") == null,
      "graft-docx supports a single load path; pass one directory or glob")
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-docx requires a load path"))
    new DocxLineTable(Seq(path))
  }
}

object DocxLineSource {
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("line_no", LongType),
    StructField("line", StringType)))
}

private[v2] class DocxLineTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"graft-docx(${paths.mkString(",")})"
  override def schema(): StructType = DocxLineSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocxScanBuilder(paths)
}

private[v2] class DocxScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = DocxLineSource.Schema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  // path/line_no predicates evaluate EXACTLY at plan time (path — whole
  // files pruned from the partition list) or per walked paragraph
  // (line_no), so handled filters need no Spark-side re-evaluation
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, rest) = filters.partition(DocxFilters.supported)
    pushed = sup
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new DocxScan(paths, required, pushed)
}

/** The graft-docx pushdown dialect: path equality/membership/suffix
  * (whole-file partition pruning — the pruned file is never listed into a
  * task, let alone opened) and line_no comparisons (per-paragraph, with
  * early termination on upper bounds since paragraphs stream in line_no
  * order). */
private[v2] object DocxFilters {
  private def long(v: Any): Long = v.asInstanceOf[Number].longValue()

  def supported(f: Filter): Boolean = f match {
    case EqualTo(a, v) =>
      (a == "path" && v.isInstanceOf[String]) ||
        (a == "line_no" && v.isInstanceOf[Number])
    case In(a, vs) if a == "path" => vs.forall(_.isInstanceOf[String])
    case StringEndsWith(a, _) => a == "path"
    case GreaterThan(a, v) => a == "line_no" && v.isInstanceOf[Number]
    case GreaterThanOrEqual(a, v) => a == "line_no" && v.isInstanceOf[Number]
    case LessThan(a, v) => a == "line_no" && v.isInstanceOf[Number]
    case LessThanOrEqual(a, v) => a == "line_no" && v.isInstanceOf[Number]
    case _ => false
  }

  /** The path-only slice of the conjunction — decides at PLAN time whether
    * a file becomes an input partition at all. */
  def pathPredicate(fs: Seq[Filter]): String => Boolean = {
    val tests: Seq[String => Boolean] = fs.collect {
      case EqualTo("path", v) => (p: String) => p == v
      case In("path", vs) =>
        val set = vs.map(_.asInstanceOf[String]).toSet
        (p: String) => set(p)
      case StringEndsWith("path", suffix) => (p: String) => p.endsWith(suffix)
    }
    p => tests.forall(_(p))
  }

  /** Inclusive upper bound on line_no across the pushed filters, if any —
    * lets the reader stop walking a document early. */
  def lineNoUpperBound(fs: Seq[Filter]): Option[Long] = {
    val bounds = fs.collect {
      case EqualTo("line_no", v) => long(v)
      case LessThan("line_no", v) => long(v) - 1
      case LessThanOrEqual("line_no", v) => long(v)
    }
    if (bounds.isEmpty) None else Some(bounds.min)
  }

  /** Conjunction over the line_no filters, per walked paragraph. */
  def linePredicate(fs: Seq[Filter]): Long => Boolean = {
    val tests: Seq[Long => Boolean] = fs.collect {
      case EqualTo("line_no", v) => (n: Long) => n == long(v)
      case GreaterThan("line_no", v) => (n: Long) => n > long(v)
      case GreaterThanOrEqual("line_no", v) => (n: Long) => n >= long(v)
      case LessThan("line_no", v) => (n: Long) => n < long(v)
      case LessThanOrEqual("line_no", v) => (n: Long) => n <= long(v)
    }
    n => tests.forall(_(n))
  }
}

private[v2] class DocxScan(paths: Seq[String], required: StructType,
                           pushed: Array[Filter]) extends Scan with Batch {
  private val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-docx ReadSchema: ${required.map(_.name).mkString(",")}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
  override def toBatch: Batch = this

  // driver-side listing only — bytes are read inside each partition; path
  // predicates prune files out of the partition list right here
  override def planInputPartitions(): Array[InputPartition] = {
    val keep = DocxFilters.pathPredicate(pushed.toIndexedSeq)
    paths.flatMap(SourceFiles.list(_, ".docx", hadoopConf.value))
      .filter(keep)
      .map(DocxFilePartition(_): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocxReaderFactory(required.map(_.name).toArray, pushed, hadoopConf)
}

private[v2] case class DocxFilePartition(file: String) extends InputPartition

private[v2] class DocxReaderFactory(
    columns: Array[String],
    pushed: Array[Filter],
    hadoopConf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[DocxFilePartition].file
    new PartitionReader[InternalRow] {
      private val pathUtf8 = UTF8String.fromString(file)
      private val keepLine = DocxFilters.linePredicate(pushed.toIndexedSeq)
      private val upper = DocxFilters.lineNoUpperBound(pushed.toIndexedSeq)
      private val lines: Iterator[BronzeStage.Line] = {
        val p = new Path(file)
        val in = p.getFileSystem(hadoopConf.value).open(p)
        val bytes =
          try in.readAllBytes()
          finally in.close()
        val walked = BronzeStage.parseDocx(bytes).iterator
        // paragraphs stream in line_no order: an upper bound ends the walk
        // instead of testing every remaining paragraph
        val bounded = upper.fold(walked)(u => walked.takeWhile(_.line_no <= u))
        bounded.filter(l => keepLine(l.line_no))
      }
      private val getters: Array[BronzeStage.Line => Any] = columns.map {
        case "path" => (_: BronzeStage.Line) => pathUtf8
        case "line_no" => (l: BronzeStage.Line) => l.line_no
        case "line" => (l: BronzeStage.Line) => UTF8String.fromString(l.line)
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (lines.hasNext) {
          val l = lines.next()
          current = InternalRow.fromSeq(getters.toIndexedSeq.map(_(l)))
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
