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
  *    `select(line)` never materializes path strings per paragraph.
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
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = DocxLineSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new DocxScan(paths, required)
}

private[v2] class DocxScan(paths: Seq[String], required: StructType)
    extends Scan with Batch {
  private val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-docx ReadSchema: ${required.map(_.name).mkString(",")}"
  override def toBatch: Batch = this

  // driver-side listing only — bytes are read inside each partition
  override def planInputPartitions(): Array[InputPartition] =
    paths.flatMap(SourceFiles.list(_, ".docx", hadoopConf.value))
      .map(DocxFilePartition(_): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new DocxReaderFactory(required.map(_.name).toArray, hadoopConf)
}

private[v2] case class DocxFilePartition(file: String) extends InputPartition

private[v2] class DocxReaderFactory(
    columns: Array[String],
    hadoopConf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[DocxFilePartition].file
    new PartitionReader[InternalRow] {
      private val pathUtf8 = UTF8String.fromString(file)
      private val lines: Iterator[BronzeStage.Line] = {
        val p = new Path(file)
        val in = p.getFileSystem(hadoopConf.value).open(p)
        val bytes =
          try in.readAllBytes()
          finally in.close()
        BronzeStage.parseDocx(bytes).iterator
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
