package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Materialize, TextAnalysis, TextExtract, UrlCuration}

/** End-to-end web-crawl corpus preparation — the CommonCrawl-shaped
  * front half that feeds [[CorpusPipeline]]'s LLM back half: one
  * composable call takes raw `(doc_id, url, html, lang)` crawl records
  * through
  *
  *   1. HTML→text extraction  (jusText-lite main-content regexes —
  *                             [[TextExtract.mainText]], q184)
  *   2. URL/domain curation   (host → registrable domain → RefinedWeb
  *                             per-domain frequency cap —
  *                             [[UrlCuration.domainCap]], q185)
  *   3. language-ID agreement (n-gram marker prediction must match the
  *                             declared language — [[TextAnalysis
  *                             .predictLang]], q45's heuristic as a
  *                             gate)
  *   4. quality/repetition    ([[CorpusPipeline.qualityFilter]] —
  *                             Gopher-ish hashed-window fractions, q77)
  *   5. exact + near dedup    ([[CorpusPipeline.exactDedup]] +
  *                             [[CorpusPipeline.nearDedup]], q40/q41)
  *
  * Stages 1–4 ([[prepared]]) compose into ONE lazy plan with exactly
  * one exchange (the domain-cap shuffle, which the session extensions
  * lower onto the two-phase [[graft.plans.TopKPerGroup]] heap):
  * extraction, language scoring, and the repetition gate are all
  * per-row Column arithmetic that fuses into the surrounding
  * whole-stage codegen — no barrier, no materialization, no second
  * pass over the crawl bytes (CrawlPipelineSpec asserts the
  * one-exchange shape). Only stage 5's pair graph re-reads an
  * intermediate, through `mat` like every dedup caller.
  *
  * Everything is deterministic and oracle-checkable end to end — q187
  * re-runs the whole chain in DuckDB (the q86 pattern). */
object CrawlPipeline {

  /** Stages 1–4 as one lazy plan over `(doc_id, url, html, lang)`:
    * returns surviving `(doc_id, lang, _domain, text)` rows. */
  def prepared(pages: DataFrame, domainCap: Int = 40,
      cfg: CorpusPipeline.Config = CorpusPipeline.Config()): DataFrame = {
    val extracted = pages.select(col("doc_id"), col("lang"), col("url"),
      TextExtract.mainText(col("html")).as("text"))
    // deterministic preference inside a domain: longest extraction
    // first, doc_id breaking ties
    val capped = UrlCuration.domainCap(extracted, "url", domainCap,
      Seq(length(col("text")).desc, col("doc_id").asc))
    // language-ID agreement gate: marker-score prediction over the
    // EXTRACTED text must match the declared language
    val scored = TextAnalysis.LangMarkers.foldLeft(
        capped.withColumn("lid_toks", TextAnalysis.toks(col("text")))) {
      case (df, (l, ms)) =>
        df.withColumn(s"lid_s_$l", TextAnalysis.markerScore(col("lid_toks"), ms))
    }
    val lid = scored
      .withColumn("lid_pred", TextAnalysis.predictLang(
        TextAnalysis.LangMarkers.map { case (l, _) => l -> col(s"lid_s_$l") }))
      .filter(col("lid_pred") === col("lang"))
      .select(col("doc_id"), col("lang"), col("_domain"), col("text"))
    CorpusPipeline.qualityFilter(lid, cfg)
  }

  /** The full chain. Output: one row per surviving crawl record —
    * `(doc_id, lang, domain, n_chars)`, null domains labeled
    * `(none)`. */
  def run(pages: DataFrame, domainCap: Int = 40,
      cfg: CorpusPipeline.Config = CorpusPipeline.Config(),
      mat: Materialize = Materialize.Local): DataFrame =
    CorpusPipeline.nearDedup(
        CorpusPipeline.exactDedup(prepared(pages, domainCap, cfg)), cfg, mat)
      .select(col("doc_id"), col("lang"),
        coalesce(col("_domain"), lit("(none)")).as("domain"),
        length(col("text")).cast("long").as("n_chars"))
}
