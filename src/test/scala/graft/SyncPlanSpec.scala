package graft

import graft.sources.SyncPlan
import org.apache.spark.sql.functions._

/** S4/S6 planner fidelity (r14 verdict #8): the in-engine halves of the
  * reference's two network-ingestion components, pinned char-for-char /
  * rule-for-rule against hand-executed reference behavior
  * (episode_stats_extract.py:15-66, confessional_extract.py:151-168). */
class SyncPlanSpec extends SparkSpec {
  import spark.implicits._

  test("sheetReadableName replays the reference char pipeline exactly (incl. the [1:] drop)") {
    // hand-run through the Python: lower → -/space → _ → drop :., →
    // drop \n → drop first char
    val cases = Seq(
      ("\n S41: David vs. Goliath", "s41_david_vs_goliath"),
      ("\n Heroes v. Healers-v-Hustlers, Pt.2", "heroes_v_healers_v_hustlers_pt2"),
      // no leading space: the [1:] eats the first REAL character —
      // faithful to the reference, quirk and all
      ("Edge of Extinction", "dge_of_extinction"))
    val out = cases.toDF("t", "want")
      .select(SyncPlan.sheetReadableName($"t").as("got"), $"want")
      .as[(String, String)].collect()
    out.foreach { case (got, want) => assert(got == want, s"got $got") }
  }

  test("sheetsExportPlan: first-anchor rule, KeyError skip, spreadsheet filter, url/file derivation") {
    val pages = Seq(
      // normal block + a second anchor that must be IGNORED (find('a')
      // takes the first), plus a non-cast ul that must not match
      (1L, """<html><ul class="cast">
 <a href="https://docs.google.com/spreadsheets/d/ABC123/">S1: Borneo</a>
 <a href="https://docs.google.com/spreadsheets/d/ZZZ/">x</a></ul>
<ul class="other"><a href="https://docs.google.com/spreadsheets/d/NOPE/">x</a></ul></html>"""),
      // first anchor has no href → KeyError → whole block skipped
      (2L, """<ul class="cast">
 <a name="n"><a href="https://docs.google.com/spreadsheets/d/HID/">S2: X</a></ul>"""),
      // href without 'spreadsheet' → substring-test skip
      (3L, """<ul class="cast">
 <a href="https://example.com/post/9/">S3: Y</a></ul>"""),
      // no trailing slash: [:-1] drops the id's last char — faithful
      (4L, """<ul class="cast">
 <a href="https://docs.google.com/spreadsheets/d/TAIL9">S4: Z</a></ul>"""))
      .toDF("pg", "html")
    val plan = SyncPlan.sheetsExportPlan(pages, "html")
      .select($"pg", $"readable_name", $"sheet_id", $"export_url", $"dest_file")
      .as[(Long, String, String, String, String)].collect().sortBy(_._1)
    assert(plan.map(_._1).toSeq == Seq(1L, 4L))
    val r1 = plan(0)
    // the name includes the second anchor's text: bs4's e.text is the
    // WHOLE ul's text, ignored anchors included — faithful to reference
    assert(r1._2 == "s1_borneo_x" && r1._3 == "ABC123")
    assert(r1._4 == "https://docs.google.com/spreadsheets/d/ABC123/export?format=xlsx&id=ABC123")
    assert(r1._5 == "s1_borneo_x.xlsx")
    assert(plan(1)._3 == "TAIL", "href[:-1] must drop the last char when there is no trailing slash")
  }

  test("sheetsExportPlan subset keeps only names whose first _-segment matches") {
    val pages = Seq(
      (1L, "<ul class=\"cast\">\n <a href=\"https://docs.google.com/spreadsheets/d/A/\">s41 alpha</a></ul>"),
      (2L, "<ul class=\"cast\">\n <a href=\"https://docs.google.com/spreadsheets/d/B/\">s42 beta</a></ul>"))
      .toDF("pg", "html")
    val names = SyncPlan.sheetsExportPlan(pages, "html", Some(Seq("s41")))
      .select($"readable_name").as[String].collect().toSeq
    assert(names == Seq("s41_alpha"))
  }

  test("S4 wiring dress rehearsal: plan rows drive a (simulated) fetch into bronze, S3 parses it") {
    // the out-of-engine half, wired the way a deployment would: collect
    // the plan (a download list is driver-sized by nature), fetch each
    // export_url — here a stub serving xlsx bytes by sheet id — write
    // bytes at dest_file under the bronze dir, then the S3 path
    // (BronzeStage.xlsxCells → GridTables.subtableAt) reads what S4
    // planned. Proves the two halves meet at the file-name contract.
    def zip(entries: (String, String)*): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      entries.foreach { case (n, c) =>
        zos.putNextEntry(new java.util.zip.ZipEntry(n))
        zos.write(c.getBytes("UTF-8")); zos.closeEntry()
      }
      zos.close(); bos.toByteArray
    }
    def workbook(anchor: String): Array[Byte] = zip(
      "xl/sharedStrings.xml" ->
        ("""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
          s"<si><t>VOTE_TABLE</t></si><si><t>H1</t></si><si><t>$anchor</t></si></sst>"),
      "xl/worksheets/sheet1.xml" ->
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
          |<row r="1"><c r="A1" t="s"><v>0</v></c></row>
          |<row r="2"><c r="A2" t="s"><v>1</v></c></row>
          |<row r="3"><c r="A3" t="s"><v>2</v></c></row>
          |</sheetData></worksheet>""".stripMargin)
    val remoteSheets = Map("S41A" -> workbook("alice"), "S42B" -> workbook("bob"))
    val pages = Seq(
      (1L, "<ul class=\"cast\">\n <a href=\"https://docs.google.com/spreadsheets/d/S41A/\">s41 one</a></ul>"),
      (2L, "<ul class=\"cast\">\n <a href=\"https://docs.google.com/spreadsheets/d/S42B/\">s42 two</a></ul>"))
      .toDF("pg", "html")
    val planDf = graft.sources.SyncPlan.sheetsExportPlan(pages, "html")
    val plan = planDf.select($"sheet_id", $"export_url", $"dest_file")
      .as[(String, String, String)].collect()
    assert(plan.length == 2)
    plan.foreach { case (id, url, _) =>
      assert(url == s"https://docs.google.com/spreadsheets/d/$id/export?format=xlsx&id=$id")
    }
    val bronze = java.nio.file.Files.createTempDirectory("graft_s4_bronze").toString
    // the executor seam: a stub transport serving xlsx bytes by the
    // sheet id embedded in the export URL (the stubbed
    // save_survivor_excel), distributed over the plan rows
    val transport: graft.sources.PlanExecutor.Transport = (key: String) =>
      remoteSheets(key.stripPrefix("https://docs.google.com/spreadsheets/d/")
        .takeWhile(_ != '/'))
    graft.sources.PlanExecutor.execute(planDf, "export_url", "dest_file",
      transport, graft.sources.PlanExecutor.DirSink(bronze),
      maxAttempts = 1, baseMs = 0, jitterMs = 0)
    // subtableAt keys on `sheet` — qualify it with the workbook path
    // (every xlsx ships a "sheet1"), exactly as q34's synthetic names do
    val cells = graft.sources.BronzeStage.xlsxCells(spark, bronze)
      .withColumn("sheet", concat_ws(":", $"path", $"sheet"))
    val sub = graft.sources.GridTables.subtableAt(cells, "^VOTE_TABLE$")
    val anchors = sub.select($"sheet").distinct().as[String].collect()
    assert(anchors.length == 2, "both planned workbooks parsed through S3")
  }

  test("S6 wiring dress rehearsal: sync decisions drive a (simulated) download, S5 parses the bronze") {
    // mirror of the S4 rehearsal: the plan's download/overwrite rows
    // drive a stubbed GetContentFile into the local dir (skip rows
    // leave the existing file untouched), then the S5 path
    // (BronzeStage.docxLines → parseConfessionalLines) reads the result.
    def zip(entries: (String, String)*): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      entries.foreach { case (n, c) =>
        zos.putNextEntry(new java.util.zip.ZipEntry(n))
        zos.write(c.getBytes("UTF-8")); zos.closeEntry()
      }
      zos.close(); bos.toByteArray
    }
    def docx(speaker: String): Array[Byte] = {
      def p(t: String) = s"<w:p><w:r><w:t>$t</w:t></w:r></w:p>"
      zip("word/document.xml" ->
        ("""<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>""" +
          p("Day 1") + p(s"$speaker (1/1): the vote") + "</w:body></w:document>"))
    }
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("graft_s6_bronze").toString
    // pre-existing local file: epOld, newer than remote → skip keeps it
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/epOld.docx"),
      docx("Keeper"))
    val remote = Seq(
      ("arch", "epNew", ts("2020-01-10 00:00:00")),   // missing → download
      ("arch", "epOld", ts("2019-01-01 00:00:00")))   // older → skip
      .toDF("folder", "title", "modified")
    val local = Seq(("arch", "epOld.docx", ts("2020-01-01 00:00:00")))
      .toDF("folder", "file_name", "mtime")
    val remoteBytes = Map("epNew" -> docx("Newcomer"))
    val decisions = graft.sources.SyncPlan.driveSyncPlan(
      remote, "folder", "title", "modified",
      local, "folder", "file_name", "mtime")
    // the executor seam: skip rows filtered out, the rest fetched by
    // title through a stub transport (the stubbed download_special_file)
    val transport: graft.sources.PlanExecutor.Transport =
      (key: String) => remoteBytes(key)
    graft.sources.PlanExecutor.execute(
      decisions.filter($"action" =!= "skip"), "title", "dest_file",
      transport, graft.sources.PlanExecutor.DirSink(dir),
      maxAttempts = 1, baseMs = 0, jitterMs = 0)
    val lines = graft.sources.BronzeStage.docxLines(spark, dir)
    val parsed = graft.domain.Pipelines.parseConfessionalLines(
        lines.select($"path".as("doc_id"), $"line_no", $"line"))
      .select($"speaker").distinct().as[String].collect().toSet
    assert(parsed == Set("Keeper", "Newcomer"),
      s"skip must keep the local copy and download must land the remote: $parsed")
  }

  test("driveSyncPlan: missing → download, strictly newer → overwrite, equal/older → skip") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val remote = Seq(
      ("arch1", "epA", ts("2020-01-10 00:00:00")),  // not local → download
      ("arch1", "epB", ts("2020-01-10 00:00:00")),  // local older → overwrite
      ("arch1", "epC", ts("2020-01-10 00:00:00")),  // equal → skip (strict >)
      ("arch2", "epB", ts("2020-01-10 00:00:00")),  // same name, other folder → download
      ("arch1", "epD", ts("2020-01-01 00:00:00")))  // local newer → skip
      .toDF("folder", "title", "modified")
    val local = Seq(
      ("arch1", "epB.docx", ts("2020-01-05 00:00:00")),
      ("arch1", "epC.docx", ts("2020-01-10 00:00:00")),
      ("arch1", "epD.docx", ts("2020-02-01 00:00:00")),
      ("arch1", "unrelated.docx", ts("2020-01-01 00:00:00")))
      .toDF("folder", "file_name", "mtime")
    val plan = SyncPlan.driveSyncPlan(remote, "folder", "title", "modified",
        local, "folder", "file_name", "mtime")
      .select($"folder", $"title", $"action").as[(String, String, String)]
      .collect().map { case (f, t, a) => (f, t) -> a }.toMap
    assert(plan(("arch1", "epA")) == "download")
    assert(plan(("arch1", "epB")) == "overwrite")
    assert(plan(("arch1", "epC")) == "skip")
    assert(plan(("arch2", "epB")) == "download")
    assert(plan(("arch1", "epD")) == "skip")
    assert(plan.size == 5, "one decision per remote file, locals never add rows")
  }

  test("PlanExecutor: flaky transport retries; full-plan replay converges (idempotent sink)") {
    import graft.sources.PlanExecutor
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_planexec").toString
    SyncPlanSpecFlaky.failures.clear()
    SyncPlanSpecFlaky.failures.put("u1", 2) // first two fetches of u1 throw
    val plan = Seq(("u1", "a.bin"), ("u2", "sub/b.bin")).toDF("url", "dest")
    def run(): Unit = PlanExecutor.execute(plan, "url", "dest",
      SyncPlanSpecFlaky.transport, PlanExecutor.DirSink(dir),
      maxAttempts = 3, baseMs = 0, jitterMs = 0)
    run()
    def read(f: String) =
      new String(Files.readAllBytes(Paths.get(dir, f)), "UTF-8")
    assert(read("a.bin") == "payload:u1", "retried past the transient failures")
    assert(read("sub/b.bin") == "payload:u2", "nested dest dirs created")
    // replay the WHOLE plan (what a Spark task retry does to its
    // partition): same end state, no torn/temp files left behind
    run()
    assert(read("a.bin") == "payload:u1" && read("sub/b.bin") == "payload:u2")
    assert(new java.io.File(dir).list().toSet == Set("a.bin", "sub"),
      "atomic temp-then-replace leaves no extra files")
    // a transport that exhausts its retries propagates (loud, not
    // silent) — deliberate failure path, so the task-abort loggers are
    // silenced for exactly this window (the suite-log zero-ERROR rule)
    SyncPlanSpecFlaky.failures.put("u1", 99)
    quietLoggers(Seq(
      "org.apache.spark.executor.Executor",
      "org.apache.spark.scheduler.TaskSetManager",
      "org.apache.spark.scheduler.DAGScheduler",
      "org.apache.spark.util.Utils")) {
      intercept[org.apache.spark.SparkException](run())
      drainListenerBus() // async echoes land inside the quiet window
    }
  }
}

/** Executor-side mutable state for the PlanExecutor flaky-transport test
  * — a top-level object so the lambda ships without dragging the spec
  * instance along (local mode shares the JVM, so the map is visible to
  * tasks). */
object SyncPlanSpecFlaky {
  val failures = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  val transport: graft.sources.PlanExecutor.Transport = (key: String) => {
    val left: Integer = failures.getOrDefault(key, 0)
    if (left > 0) {
      failures.put(key, left - 1)
      throw new RuntimeException(s"transient fetch failure for $key")
    }
    s"payload:$key".getBytes("UTF-8")
  }
}
