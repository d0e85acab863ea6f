package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine halves of the reference's two network-ingestion components,
  * as deterministic PLAN builders (the fetch execution itself stays
  * out-of-engine by design — the sandbox has no network, and a download
  * loop is an ingestion-script concern, not a query-engine one):
  *
  *  - S4 (`episode_stats/episode_stats_extract.py:15-66`): scrape a
  *    catalog page for Google-Sheets links and derive, per sheet, the
  *    normalized file name and the xlsx export URL —
  *    [[sheetsExportPlan]] replays `create_data_dict` +
  *    `save_survivor_excel`'s URL/file-name derivation over an HTML
  *    column, char-for-char (the odd-looking `[1:]` drop included).
  *  - S6 (`confessional/confessional_extract.py:151-168`): compare a
  *    remote Drive listing against the local directory inventory and
  *    decide download / overwrite / skip per file — [[driveSyncPlan]]
  *    replays `sync_confessionals`' decision rules (missing → download,
  *    remote modifiedDate strictly newer → overwrite, else skip).
  *
  * Both are pure DataFrame transforms: the plan rows feed
  * [[PlanExecutor.execute]] — the concrete foreachPartition executor
  * seam (pluggable transport, [[graft.ops.Retry]]-wrapped fetches,
  * idempotent atomic-replace sink) — or any external downloader reading
  * the plan parquet; replayed loads stay idempotent via the K1 upsert.
  * Scale posture: the catalog page parse is a map-side regex projection;
  * the sync compare is one equi-join where the local inventory side is
  * gate-broadcast (directory listings are small; a corpus-sized
  * inventory falls back to the planner's shuffle join).
  */
object SyncPlan {

  /** The reference's exact readable-name pipeline
    * (`episode_stats_extract.py:26-34`): lowercase; '-' and ' ' each →
    * '_'; drop ':', '.', ','; drop newlines; then drop the FIRST char
    * (`[1:]` — the leading space of the element text, by then an '_').
    * Kept as its own column fn so the spec can pin the char-level
    * contract against hand-computed reference outputs. */
  def sheetReadableName(text: Column): Column = {
    val lowered = lower(text)
    val underscored = regexp_replace(regexp_replace(lowered,
      java.util.regex.Pattern.quote("-"), "_"), " ", "_")
    val stripped = Seq(":", ".", ",", "\n").foldLeft(underscored) { (c, ch) =>
      regexp_replace(c, java.util.regex.Pattern.quote(ch), "")
    }
    substring(stripped, 2, Int.MaxValue)
  }

  private val DocsUrlPrefix = "https://docs.google.com/spreadsheets/d/"

  /** S4: per catalog page (an HTML column), one plan row per
    * `<ul class="cast">` block whose FIRST anchor carries an href
    * containing 'spreadsheet' (the reference's `e.find('a')` +
    * KeyError-skip + substring test, `episode_stats_extract.py:20-44`):
    * `(readable_name, sheet_id, export_url, dest_file)` plus the page's
    * pass-through columns. sheet_id = last '/'-segment of the href with
    * its trailing char dropped (`href[:-1].split('/')[-1]`); export_url
    * = the reference's DOCS_URL_TEMPLATE; dest_file = name + '.xlsx'.
    * `subset`: keep only names whose first '_'-segment is in the set
    * (the reference's subset filter). */
  def sheetsExportPlan(pages: DataFrame, htmlCol: String,
                       subset: Option[Seq[String]] = None): DataFrame = {
    val keep = pages.columns.filter(_ != htmlCol).map(col).toSeq
    val blocks = pages.select(keep :+ explode(regexp_extract_all(
        col(htmlCol), lit("(?s)<ul class=\"cast\">.*?</ul>"), lit(0)))
      .as("__block"): _*)
    // first anchor TAG, then its href: an href-less first anchor skips
    // the whole block (the reference's KeyError path) instead of falling
    // through to a later anchor. The attribute NAME is left-anchored to
    // whitespace/quote (bs4's attrs['href'] is an exact-name lookup — an
    // attribute merely ending in "href", e.g. data-href, must not match;
    // \b can't anchor it since '-' is a non-word char)
    val firstA = regexp_extract(col("__block"), "(?s)<a\\b[^>]*>", 0)
    val href = regexp_extract(firstA, "[\\s\"']href=\"([^\"]*)\"", 1)
    // bs4's element.text: text nodes concatenated verbatim (no
    // whitespace collapse — the name pipeline's [1:] depends on it)
    val text = regexp_replace(col("__block"), "(?s)<[^>]*>", "")
    val trimmedHref = expr("substring(__href, 1, length(__href) - 1)")
    val planned = blocks
      .withColumn("__href", href)
      .filter(col("__href") =!= "" && col("__href").contains("spreadsheet"))
      .withColumn("sheet_id", element_at(split(trimmedHref, "/"), -1))
      .withColumn("readable_name", sheetReadableName(text))
      .withColumn("export_url", concat(lit(DocsUrlPrefix), col("sheet_id"),
        lit("/export?format=xlsx&id="), col("sheet_id")))
      .withColumn("dest_file", concat(col("readable_name"), lit(".xlsx")))
    val filtered = subset.fold(planned) { ss =>
      planned.filter(element_at(split(col("readable_name"), "_"), 1)
        .isin(ss: _*))
    }
    filtered.select(keep ++ Seq(col("readable_name"), col("sheet_id"),
      col("export_url"), col("dest_file")): _*)
  }

  /** S6: the Drive-sync decision join
    * (`confessional_extract.py:151-168`). `remote` carries one row per
    * remote file `(folderCol, titleCol, modifiedCol)`; `local` is the
    * directory inventory `(lfolderCol, fileCol, mtimeCol)` with non-null
    * mtimes (a listing has a real mtime for every file it lists). A
    * remote file maps to local name title + '.docx'; missing locally →
    * 'download', remote modified STRICTLY newer → 'overwrite', else
    * 'skip' (equal timestamps keep the local copy, as the reference's
    * `>` does). The inventory side is gate-broadcast — directory
    * listings are small next to a corpus, and the gate falls back to a
    * shuffle join if one isn't. */
  def driveSyncPlan(remote: DataFrame, folderCol: String, titleCol: String,
                    modifiedCol: String,
                    local: DataFrame, lfolderCol: String, fileCol: String,
                    mtimeCol: String): DataFrame = {
    val r = remote.select(col(folderCol).as("folder"),
        col(titleCol).as("title"), col(modifiedCol).as("modified"))
      .withColumn("dest_file", concat(col("title"), lit(".docx")))
    val l = local.select(col(lfolderCol).as("folder"),
      col(fileCol).as("dest_file"), col(mtimeCol).as("mtime"))
    r.join(graft.ops.Relational.gatedBroadcast(l),
        Seq("folder", "dest_file"), "left")
      .withColumn("action",
        when(col("mtime").isNull, lit("download"))
          .when(col("modified") > col("mtime"), lit("overwrite"))
          .otherwise(lit("skip")))
      .select(col("folder"), col("title"), col("dest_file"),
        col("modified"), col("mtime"), col("action"))
  }
}
