package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bronze ingestion as code: the file-format staging the reference does in
  * Python (xlsx grids via openpyxl, episode_stats_extract.py:421; docx
  * paragraphs via python-docx, confessional_extract.py:103-193; HTML text
  * via BeautifulSoup) re-expressed for Spark with ZERO dependencies — xlsx
  * and docx are zip archives of XML, parsed with the JDK's own StAX
  * stream reader.
  *
  * Scale shape: files load through Spark's `binaryFile` source (one row
  * per file, content as bytes) and parse INSIDE `flatMap` — so a
  * million-workbook bronze layer fans out one file per task across the
  * cluster, and the parsed cell/line rows partition freely downstream.
  * The parsers are pure `Array[Byte] => Seq[...]` functions, so they are
  * unit-testable without Spark and reusable from a streaming ingest.
  *
  * Output contracts match the engine operators downstream:
  *  - [[xlsxCells]] → (path, sheet, row, col, value) — feed
  *    [[GridTables.subtableAt]].
  *  - [[docxLines]] → (path, line_no, line) — feed
  *    [[graft.domain.Pipelines.parseConfessionalLines]] (rename path→doc_id).
  *  - [[stripHtml]] — a column expression (codegen-friendly) for the S1/S2
  *    HTML text scans.
  */
object BronzeStage {

  /** One non-empty spreadsheet cell. Row/col are 0-based (A1 → (0,0)). */
  final case class Cell(sheet: String, row: Long, col: Long, value: String)

  /** One docx paragraph, in document order. */
  final case class Line(line_no: Long, line: String)

  // ───────────────────────────────────────────── pure byte parsers

  /** Parse an xlsx workbook: shared strings + every sheet part under
    * `xl/worksheets/`. Handles shared (`t="s"`), inline (`t="inlineStr"`) and
    * literal value cells; empty cells simply don't appear (the cell-matrix
    * contract — gaps carry meaning for the grid walk). */
  def parseXlsx(bytes: Array[Byte]): Seq[Cell] =
    parseXlsx(bytes, _ => true, _ => true)

  /** [[parseXlsx]] with scan-time pruning hooks (the graft-xlsx filter
    * pushdown): sheet parts failing `sheetKeep` are never XML-parsed at
    * all; cells failing `cellKeep` are never materialized. Both default
    * to keep-everything in the plain face. */
  def parseXlsx(bytes: Array[Byte], sheetKeep: String => Boolean,
                cellKeep: Cell => Boolean): Seq[Cell] = {
    val entries = zipEntries(bytes)
    val shared: IndexedSeq[String] = entries.get("xl/sharedStrings.xml")
      .map(b => collectTagText(b, "si")).getOrElse(IndexedSeq.empty)
    entries.toSeq
      .filter { case (name, _) =>
        name.startsWith("xl/worksheets/") && name.endsWith(".xml")
      }
      .sortBy(_._1)
      .flatMap { case (name, b) =>
        val sheet = name.stripPrefix("xl/worksheets/").stripSuffix(".xml")
        if (sheetKeep(sheet)) parseSheet(sheet, b, shared, cellKeep)
        else Seq.empty
      }
  }

  /** Parse a docx: the `w:p` paragraphs of word/document.xml, each the
    * concatenation of its `w:t` text runs — the same linearization
    * python-docx's `paragraphs` gives the reference. */
  def parseDocx(bytes: Array[Byte]): Seq[Line] = {
    val doc = zipEntries(bytes).getOrElse("word/document.xml",
      throw new IllegalArgumentException("not a docx: word/document.xml missing"))
    collectTagText(doc, "p", textTag = Some("t"))
      .zipWithIndex.map { case (text, i) => Line(i.toLong, text) }
  }

  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e = zis.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out += (e.getName -> zis.readAllBytes())
      e = zis.getNextEntry
    }
    zis.close()
    out.result()
  }

  private def newReader(bytes: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    // no DTD/external-entity resolution: bronze inputs are untrusted
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  /** Concatenated character content of each `container` element, in
    * document order; with `textTag` set, only characters inside that
    * child element count (docx text runs vs formatting metadata). */
  private def collectTagText(bytes: Array[Byte], container: String,
                             textTag: Option[String] = None): IndexedSeq[String] = {
    val r = newReader(bytes)
    val out = IndexedSeq.newBuilder[String]
    var inContainer = false
    var inText = textTag.isEmpty
    val sb = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          if (r.getLocalName == container && !inContainer) {
            inContainer = true; sb.clear()
          } else if (inContainer && textTag.contains(r.getLocalName)) inText = true
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inContainer && inText) sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == container && inContainer) {
            inContainer = false; out += sb.toString
          } else if (inContainer && textTag.contains(r.getLocalName)) inText = false
        case _ => ()
      }
    }
    r.close()
    out.result()
  }

  /** One worksheet part → cells. Cell refs ("B3") give exact positions;
    * per ECMA-376 both the row's `r` and the cell's `r` are OPTIONAL —
    * when absent, position is implied from document order (next row /
    * next column), which streaming xlsx writers rely on. Shared-string
    * cells dereference the workbook table. */
  private def parseSheet(sheet: String, bytes: Array[Byte],
                         shared: IndexedSeq[String],
                         cellKeep: Cell => Boolean = _ => true): Seq[Cell] = {
    val r = newReader(bytes)
    val out = Seq.newBuilder[Cell]
    var curRow = -1L // last materialized row index
    var nextCol = 0L // implied column for a ref-less cell
    var cellRow = 0L; var cellCol = 0L
    var cellType = ""; var inV = false; var inIsT = false
    val sb = new StringBuilder
    def flush(): Unit = if (sb.nonEmpty) {
      val raw = sb.toString
      val value = if (cellType == "s") shared(raw.trim.toInt) else raw
      val c = Cell(sheet, cellRow, cellCol, value)
      if (cellKeep(c)) out += c
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" =>
            curRow = Option(r.getAttributeValue(null, "r"))
              .map(_.toLong - 1).getOrElse(curRow + 1)
            nextCol = 0L
          case "c" =>
            Option(r.getAttributeValue(null, "r")) match {
              case Some(ref) =>
                val (rw, cl) = parseRef(ref); cellRow = rw; cellCol = cl
              case None =>
                cellRow = curRow; cellCol = nextCol
            }
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
            sb.clear()
          case "v" => inV = true
          case "t" => inIsT = true // inlineStr runs
          case _ => ()
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inV || (cellType == "inlineStr" && inIsT)) sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" => inV = false
          case "t" => inIsT = false
          case "c" => flush(); nextCol = cellCol + 1
          case _ => ()
        }
        case _ => ()
      }
    }
    r.close()
    out.result()
  }

  /** "B3" → (2, 1): letters are a base-26 column, digits the 1-based row. */
  def parseRef(ref: String): (Long, Long) = {
    val letters = ref.takeWhile(_.isLetter)
    val digits = ref.drop(letters.length)
    val col = letters.foldLeft(0L)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
    (digits.toLong - 1, col)
  }

  // ───────────────────────────────────────────── Spark faces

  /** All cells of every workbook under `path` (glob ok): one file per
    * task via the binaryFile source, cells fan out from flatMap. */
  def xlsxCells(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        parseXlsx(bytes).map(c => (p, c.sheet, c.row, c.col, c.value))
      }
      .toDF("path", "sheet", "row", "col", "value")
  }

  /** All numbered paragraph lines of every docx under `path`. */
  def docxLines(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        parseDocx(bytes).map(l => (p, l.line_no, l.line))
      }
      .toDF("path", "line_no", "line")
  }

  /** HTML → visible text, as a codegen-friendly column expression:
    * drop script/style subtrees, strip tags, decode the five predefined
    * entities, collapse whitespace. A text-extraction heuristic (like the
    * reference's get_text), not a DOM — sufficient for bronze text scans. */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    val noTags = regexp_replace(noScript, "(?s)<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&" // ampersand LAST or it re-decodes
    ).foldLeft(noTags) { case (acc, (e, ch)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(e), ch)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
