package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.CrawlPipeline

/** The web-crawl capstone assembly ([[CrawlPipeline]], q187): HTML→text
  * → domain cap → language-ID agreement → repetition gate → exact/near
  * dedup. The load-bearing claims here are the PLAN SHAPE (stages 1–4
  * are one lazy plan with exactly ONE exchange — no barrier, no second
  * pass over the crawl bytes) and per-stage behavior on a corpus built
  * to trip each gate. */
class CrawlPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** `n` crawl records: English-marked prose (passes langid for 'en'),
    * wrapped in q184's page boilerplate, urls spread over 3 domains
    * with every 9th null. Every 4th doc declares lang 'ja' (langid
    * drops it); doc 1 is a repetition bomb (quality drops it). */
  private def pages(n: Int): DataFrame =
    (0 until n).map { i =>
      // "the a" carries the en language markers; the w{i}x{j} run makes
      // every doc's shingle set unique (cross-doc Jaccard ≈ 0), so only
      // the deliberate salts pair up in near-dedup
      val body =
        if (i == 1) "the a " + ("spam " * 40).trim // repeated-bigram bomb
        else "the a " + (0 until 12).map(j => s"w${i}x$j").mkString(" ")
      val url = if (i % 9 == 0) null else s"https://www.d${i % 3}.org/p/$i"
      val lang = if (i % 4 == 2) "ja" else "en"
      (i.toLong, url,
        "<html><head><script>var a = 1 < 2;</script></head><body>" +
          s"<div class=\"nav\">Home | About</div><p>$body</p>" +
          "<footer>&copy; 2024</footer></body></html>", lang)
    }.toDF("doc_id", "url", "html", "lang")

  test("plan shape: stages 1-4 (extract -> domain cap -> langid -> " +
      "quality) compose into ONE job with exactly ONE exchange — the " +
      "domain-cap shuffle; extraction and both gates fuse around it") {
    val out = CrawlPipeline.prepared(pages(60), domainCap = 10)
    out.collect() // materialize so AQE finalizes the plan
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange (?!SinglePartition)".r.findAllIn(plan).length
    assert(exchanges === 1,
      s"expected exactly the domain-cap exchange, plan:\n$plan")
    // the cap held through the downstream gates (exact cap behavior is
    // q185/UrlCurationSpec's; langid removes more rows after it)
    val perDomain = out.groupBy("_domain").count()
      .select("count").as[Long].collect()
    assert(perDomain.nonEmpty && perDomain.forall(_ <= 10L))
  }

  test("each gate bites and the survivors are exact: cap per domain, " +
      "langid agreement, repetition gate, exact + near dedup") {
    // salt: doc 100 an exact copy of doc 3, doc 101 a near copy of
    // doc 5; 18 base docs over 3 domains keep every domain under the
    // cap, so the cap can't mask the dedup assertions
    val base = pages(18)
    val salted = base
      .unionByName(base.filter(col("doc_id") === 3)
        .select(lit(100L).as("doc_id"), col("url"), col("html"),
          col("lang")))
      .unionByName(base.filter(col("doc_id") === 5)
        .select(lit(101L).as("doc_id"), col("url"),
          regexp_replace(col("html"), "<p>the a", "<p>zz the a")
            .as("html"),
          col("lang")))
    val out = CrawlPipeline.run(salted, domainCap = 8).collect()
    val ids = out.map(_.getLong(0)).toSet
    // langid: every declared-'ja' doc (English prose) is gone
    assert(ids.forall(i => i % 4 != 2 || i >= 100))
    // quality: the repetition bomb is gone
    assert(!ids.contains(1L))
    // dedup: the exact copy (same extracted text as doc 3) and the
    // near copy (zz-prefixed doc 5) lost to their min-id originals
    assert(!ids.contains(100L) && !ids.contains(101L))
    assert(ids.contains(3L) && ids.contains(5L))
    // domain cap: at most 8 per domain (null domain labeled "(none)")
    val perDomain = out.groupBy(_.getString(2)).view.mapValues(_.size)
    assert(perDomain.values.forall(_ <= 8), s"cap breached: $perDomain")
    assert(perDomain.keySet.subsetOf(
      Set("d0.org", "d1.org", "d2.org", "(none)")))
    // n_chars is the EXTRACTED text length (boilerplate stripped)
    assert(out.forall(r => r.getLong(3) > 0 &&
      r.getLong(3) < 200), "extraction must strip the page chrome")
  }
}
