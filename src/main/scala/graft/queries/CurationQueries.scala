package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.ops.{Examples, Mixture, TextAnalysis}

/** Corpus-curation queries: training-mixture construction and
  * training-example construction — the steps between "which documents"
  * (dedup/selection) and "what the trainer reads" (packing).
  */
object CurationQueries {

  /** The q103 recipe: five sources with 3:2:1:2:1 shares; the other
    * fifteen sources are dropped (weight 0). */
  val MixRecipe: Seq[(String, Int)] = Seq(
    "src0" -> 3, "src3" -> 2, "src7" -> 1, "src12" -> 2, "src19" -> 1)

  // ---- Q103: exact training-mixture downsampling ----

  /** [[Mixture.sampleToMixture]]: kept counts are exactly w_s·u with
    * u = min⌊n_s/w_s⌋; within a source the smallest-hash documents win
    * (deterministic, growth-stable). The oracle recomputes the same
    * counts, ranks, and cutoffs. */
  val q103 = Q("q103_mixture_sample", {
    val values = MixRecipe.map { case (s, w) => s"('$s', $w)" }.mkString(", ")
    s"""WITH c AS (SELECT source, count(*) AS mix_n FROM documents GROUP BY source),
      |w(source, mix_w) AS (VALUES $values),
      |u AS (SELECT min(mix_n // mix_w) AS mix_u FROM c JOIN w USING (source)),
      |k AS (SELECT source, mix_w * mix_u AS mix_k FROM w CROSS JOIN u),
      |r AS (SELECT doc_id, source, ${Mixture.rankSql("doc_id", "source")} AS rn
      |      FROM documents JOIN w USING (source))
      |SELECT doc_id, source FROM r JOIN k USING (source)
      |WHERE rn <= mix_k ORDER BY doc_id""".stripMargin
  }) { (s, dir) =>
    Mixture.sampleToMixture(Tables.documents(s, dir), "doc_id", "source", MixRecipe)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  // ---- Q104: fill-in-the-middle / span-corruption splits ----

  /** [[Examples.fimSplit]]: every document cut into (prefix, middle,
    * suffix) at a hash-derived deterministic offset, middle = ⌊dl/3⌋
    * tokens. Row set identical to the input (short docs pass through
    * prefix-only); reassembling the three fields must reproduce the
    * tokenized document — the oracle checks the fields verbatim. */
  val q104 = Q("q104_fim_split", {
    val (p, m, x) = Examples.fimSplitSql("doc_id", "toks")
    s"""WITH tok AS (SELECT doc_id, ${TextAnalysis.toksSql} AS toks FROM documents)
      |SELECT doc_id, $p AS prefix, $m AS middle, $x AS suffix
      |FROM tok ORDER BY doc_id""".stripMargin
  }) { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.toks(col("text")).as("toks"))
    Examples.fimSplit(docs, "doc_id", "toks").orderBy(col("doc_id"))
  }

  // ---- Q109: k-anonymity release gate ----

  /** [[graft.ops.Privacy.kAnonymous]] on (lang, source) as the
    * quasi-identifier pair, k = 5: only documents whose combination is
    * shared by at least five rows are releasable. */
  val q109 = Q("q109_k_anonymity",
    """WITH g AS (SELECT lang, source, count(*) AS n
      |           FROM documents GROUP BY lang, source)
      |SELECT d.doc_id, d.lang, d.source
      |FROM documents d JOIN g ON g.lang = d.lang AND g.source = d.source
      |WHERE g.n >= 5 ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    graft.ops.Privacy.kAnonymous(
        Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("source")),
        Seq("lang", "source"), 5L)
      .orderBy(col("doc_id"))
  }

  // ---- Q113: adaptive mixture (weights computed in-plan) ----

  /** [[Mixture.sampleToMixtureDF]] with a DATA-DERIVED recipe: each
    * source's share is its language diversity (count of distinct langs,
    * 4 or 5 at sf0.01) — the DoReMi-style shape where the recipe comes
    * from per-domain statistics inside the same plan. The oracle
    * recomputes weights, cutoffs, and hash ranks. */
  val q113 = Q("q113_adaptive_mixture",
    s"""WITH w AS (SELECT source, count(DISTINCT lang) AS mw
      |           FROM documents GROUP BY source),
      |c AS (SELECT source, count(*) AS mix_n FROM documents GROUP BY source),
      |u AS (SELECT min(mix_n // mw) AS mix_u FROM c JOIN w USING (source)),
      |k AS (SELECT source, mw * mix_u AS mix_k FROM w CROSS JOIN u),
      |r AS (SELECT doc_id, source, ${Mixture.rankSql("doc_id", "source")} AS rn
      |      FROM documents JOIN w USING (source))
      |SELECT doc_id, source FROM r JOIN k USING (source)
      |WHERE rn <= mix_k ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val weights = docs.groupBy(col("source"))
      .agg(count_distinct(col("lang")).as("mw"))
    Mixture.sampleToMixtureDF(docs, "doc_id", "source", weights, "mw")
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  // ---- Q112: l-diversity release gate ----

  /** [[graft.ops.Privacy.lDiverse]]: `source` as the quasi-identifier,
    * `lang` as the sensitive attribute — a source releases only if it
    * has ≥ 5 rows AND ≥ 5 distinct languages (closing the homogeneity
    * attack k-anonymity alone permits; at sf0.01 three sources carry
    * only 4 languages and are suppressed, so the gate bites). */
  val q112 = Q("q112_l_diversity",
    """WITH g AS (SELECT source, count(*) AS n, count(DISTINCT lang) AS d
      |           FROM documents GROUP BY source)
      |SELECT doc_id, lang, d2.source AS source
      |FROM documents d2 JOIN g ON g.source = d2.source
      |WHERE g.n >= 5 AND g.d >= 5 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.ops.Privacy.lDiverse(
        Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("source")),
        Seq("source"), "lang", 5L, 5L)
      .orderBy(col("doc_id"))
  }

  // ---- Q111: Unicode NFC normalization ----

  /** [[TextAnalysis.normalizeNfc]] (native expression) over text with a
    * planted decomposed sequence (`e` + U+0301 combining acute): NFC
    * composes it to one codepoint, so the normalized length drops by
    * exactly one while the string stays canonically equivalent. Both
    * engines implement UAX #15, so the forms — and the hashes a dedup
    * would take of them — agree exactly. */
  val q111 = Q("q111_unicode_nfc",
    """SELECT doc_id,
      |  nfc_normalize(text || ' cafe' || chr(769)) AS nfc,
      |  length(text || ' cafe' || chr(769)) AS n_raw,
      |  length(nfc_normalize(text || ' cafe' || chr(769))) AS n_nfc
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val raw = concat(col("text"), lit(" café"))
    Tables.documents(s, dir).select(col("doc_id"),
        TextAnalysis.normalizeNfc(raw).as("nfc"),
        length(raw).cast("long").as("n_raw"),
        length(TextAnalysis.normalizeNfc(raw)).cast("long").as("n_nfc"))
      .orderBy(col("doc_id"))
  }

  // ---- Q126: weighted sampling without replacement (A-ES) ----

  /** [[Mixture.weightedSample]] of documents, weight = n_chars, 20 per
    * language — "prefer substantial documents, proportionally": a doc of
    * 2× the length is 2× as likely to head the sample, but short docs
    * still make it (unlike a length-sort cut). Deterministic hash-derived
    * uniforms make the draw reproducible AND oracle-checkable: the oracle
    * recomputes the identical A-ES keys ((h+0.5)/P31 then pow) and ranks
    * with the window spelling, so the heap-operator path is hash-compared
    * against the textbook formulation, key values included (rounded 6dp —
    * pow is the one non-portably-rounded primitive in the chain). */
  val q126 = Q("q126_weighted_sample",
    s"""WITH h AS (SELECT doc_id, lang, n_chars,
      |  ${Mixture.aesKeySql("doc_id", "n_chars")} AS skey
      |  FROM documents WHERE n_chars > 0),
      |r AS (SELECT doc_id, lang, n_chars, skey,
      |  row_number() OVER (PARTITION BY lang ORDER BY skey DESC, doc_id) AS rnk
      |  FROM h)
      |SELECT lang, rnk, doc_id, n_chars, round(skey, 6) AS skey
      |FROM r WHERE rnk <= 20 ORDER BY lang, rnk""".stripMargin) { (s, dir) =>
    val top = Mixture.weightedSample(
      Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("n_chars")),
      "doc_id", "n_chars", 20, Seq("lang"))
    val w = Window.partitionBy(col("lang")).orderBy(col("skey").desc, col("doc_id"))
    top.withColumn("rnk", row_number().over(w))
      .select(col("lang"), col("rnk"), col("doc_id"), col("n_chars"),
        round(col("skey"), 6).as("skey"))
      .orderBy(col("lang"), col("rnk"))
  }

  // ---- Q132: UniMax water-filling language mixture ----

  /** [[Mixture.unimaxSample]] with a 400-document budget over the five
    * languages (UniMax, Chung et al. ICLR'23): the budget spreads as
    * evenly as possible, capped by each language's actual supply — at
    * sf0.01 the four tail languages saturate (64/70/73/75 docs, all
    * kept) and the dominant `en` is capped at the leftover 118 of its
    * 218, exactly the tail-protecting allocation temperature sampling
    * can't produce. The oracle recomputes the integer water-fill with
    * the same prefix-sum closed form and the same hash-rank selection. */
  val q132 = Q("q132_unimax_mixture", {
    val b = 400L
    s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
      |s AS (SELECT lang, n, row_number() OVER (ORDER BY n, lang) AS i,
      |        coalesce(sum(n) OVER (ORDER BY n, lang
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sp,
      |        count(*) OVER () AS L
      |      FROM c),
      |t AS (SELECT *, (n * (L - i + 1) + sp <= $b) AS sat FROM s),
      |j AS (SELECT max(CASE WHEN sat THEN i ELSE 0 END) AS j,
      |             max(CASE WHEN sat THEN sp + n ELSE 0 END) AS sj FROM t),
      |q AS (SELECT lang,
      |        CASE WHEN sat THEN n
      |             WHEN L - j > 0 THEN ($b - sj) // (L - j)
      |               + (CASE WHEN i - j <= ($b - sj) % (L - j) THEN 1 ELSE 0 END)
      |             ELSE 0 END AS quota
      |      FROM t CROSS JOIN j),
      |r AS (SELECT doc_id, lang, ${Mixture.rankSql("doc_id", "lang")} AS rn
      |      FROM documents)
      |SELECT doc_id, lang FROM r JOIN q USING (lang)
      |WHERE rn <= quota ORDER BY doc_id""".stripMargin
  }) { (s, dir) =>
    Mixture.unimaxSample(
        Tables.documents(s, dir).select(col("doc_id"), col("lang")),
        "doc_id", "lang", 400L)
      .orderBy(col("doc_id"))
  }

  /** [[graft.ops.Outliers.madStats]]: the robust (median/MAD) per-language
    * length-outlier report with the Hampel cut `|x − med| > 3·MAD` — on
    * integer inputs every median is an exact `.0`/`.5` double, so the
    * oracle's `median()` (same linear interpolation) and the boundary
    * compare agree bit-for-bit with no rounding guard. */
  val q136 = Q("q136_mad_outliers",
    s"""WITH med AS (SELECT lang, median(n_chars) AS med
      |  FROM documents GROUP BY lang),
      |dev AS (SELECT d.lang AS lang, d.n_chars AS n_chars, m.med AS med,
      |          abs(d.n_chars - m.med) AS adev
      |        FROM documents d JOIN med m ON m.lang = d.lang),
      |mad AS (SELECT lang, median(adev) AS mad FROM dev GROUP BY lang)
      |SELECT dev.lang AS lang, count(*) AS n,
      |  max(dev.med) AS median, max(mad.mad) AS mad,
      |  CAST(sum(CASE WHEN dev.adev > 3.0 * mad.mad THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_out
      |FROM dev JOIN mad ON mad.lang = dev.lang
      |GROUP BY dev.lang ORDER BY lang""".stripMargin) { (s, dir) =>
    graft.ops.Outliers.madStats(
        Tables.documents(s, dir), "lang", "n_chars", k = 3)
      .orderBy(col("lang"))
  }

  /** HTML -> text extraction (graft.ops.TextExtract — jusText-lite,
    * Pomikalek 2011's shape re-derived as pure Column regex/HOF
    * expressions): the FIRST curation stage of a web-crawl pipeline.
    * Each document is wrapped in a realistic page (head/script/style,
    * nav bar, list items, entity-bearing footer) and the extractor
    * must recover exactly the body prose: containers vanish WITH
    * their content, block tags segment, short boilerplate blocks drop
    * under the minWords gate, entities decode. The oracle runs the
    * SAME RE2-safe patterns in DuckDB ([[TextExtract.mainTextSql]]),
    * so the hash compare proves the two regex engines agree
    * byte-for-byte on the extraction. No UDF, no shuffle — O(doc)
    * per row at scan speed, the 100 TB CommonCrawl shape. */
  val q184 = Q("q184_html_extract",
    s"""WITH pages AS (
      |  SELECT doc_id,
      |    '<html><head><title>doc</title><script>var a = 1 < 2;'
      |    || '</script></head><body><!-- tracker -->'
      |    || '<div class="nav">Home | About</div><p>' || text
      |    || '</p><ul><li>item one</li><li>item two</li></ul>'
      |    || '<p>Tail prose block with exactly seven words here</p>'
      |    || '<footer>&copy; 2024</footer></body></html>' AS html
      |  FROM documents)
      |SELECT doc_id,
      |  ${graft.ops.TextExtract.mainTextSql("html")} AS main_text
      |FROM pages ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import graft.ops.TextExtract
    val pages = Tables.documents(s, dir).select(col("doc_id"),
      concat(
        lit("<html><head><title>doc</title><script>var a = 1 < 2;" +
          "</script></head><body><!-- tracker -->" +
          "<div class=\"nav\">Home | About</div><p>"),
        col("text"),
        lit("</p><ul><li>item one</li><li>item two</li></ul>" +
          "<p>Tail prose block with exactly seven words here</p>" +
          "<footer>&copy; 2024</footer></body></html>")).as("html"))
    pages.select(col("doc_id"),
        TextExtract.mainText(col("html")).as("main_text"))
      .orderBy(col("doc_id"))
  }

  /** URL canonicalization + RefinedWeb-style domain frequency cap
    * ([[graft.ops.UrlCuration]]): each document gets a URL on its
    * source's domain (a twentieth of them null — unparseable crawl
    * records form their own capped group), hosts/registrable domains
    * extract via portable regexes (no parse_url — non-codegen, no
    * DuckDB twin), and at most 10 documents per domain survive,
    * deterministically preferring (n_chars desc, doc_id asc). The
    * rank-limit window lowers onto the two-phase
    * [[graft.plans.TopKPerGroup]] heap under the session extensions,
    * so a hot domain reduces map-side before the shuffle — domain
    * skew, the defining hazard of this gate at crawl scale, never
    * concentrates on a reducer. */
  val q185 = Q("q185_domain_cap",
    s"""WITH urls AS (
      |  SELECT doc_id, n_chars,
      |    CASE WHEN doc_id % 17 = 0 THEN NULL
      |         ELSE 'https://www.' || source || '-site.org/doc/' || doc_id
      |    END AS url
      |  FROM documents),
      |hosts AS (
      |  SELECT doc_id, n_chars,
      |    ${graft.ops.UrlCuration.registrableDomainSql(
             graft.ops.UrlCuration.urlHostSql("url"))} AS domain
      |  FROM urls),
      |ranked AS (
      |  SELECT domain, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY domain
      |      ORDER BY n_chars DESC, doc_id ASC) AS rk
      |  FROM hosts)
      |SELECT coalesce(domain, '(none)') AS domain, doc_id, n_chars
      |FROM ranked WHERE rk <= 10
      |ORDER BY domain, doc_id""".stripMargin) { (s, dir) =>
    import graft.ops.UrlCuration
    val urls = Tables.documents(s, dir).select(col("doc_id"),
      col("n_chars"),
      when(col("doc_id") % 17 === 0, lit(null)).otherwise(
        concat(lit("https://www."), col("source"),
          lit("-site.org/doc/"), col("doc_id").cast("string"))).as("url"))
    UrlCuration.domainCap(urls, "url", cap = 10,
        Seq(col("n_chars").desc, col("doc_id").asc))
      .select(coalesce(col("_domain"), lit("(none)")).as("domain"),
        col("doc_id"), col("n_chars"))
      .orderBy(col("domain"), col("doc_id"))
  }

  /** Cap key rules for q189: four multi-label plain suffixes plus the
    * real PSL's ck block — wildcard `*.ck` (any label under ck is a
    * public suffix) countered by exception `!www.ck`. */
  private val Q189Psl = Seq("co.uk", "gov.uk", "com.au", "k12.ca.us",
    "*.ck", "!www.ck")

  /** PSL-BACKED domain cap ([[graft.ops.UrlCuration.registrableDomain]]
    * with a public-suffix list): half the URLs live under multi-label
    * public suffixes (`<source>.co.uk`, `<source>.com.au`), where the
    * last-two-labels heuristic would collapse EVERY host into one cap
    * key (`co.uk`) — the PSL matcher keys the cap per registrable
    * domain instead. Longest-match, ≤ 4 labels, `isin` → hashed
    * `InSet` per row (no UDF, no join); the oracle runs the SAME
    * longest-match CASE chain, so the hash compare proves the two
    * engines agree on every cap key. */
  val q189 = Q("q189_psl_domain_cap", {
    import graft.ops.UrlCuration
    s"""WITH urls AS (
      |  SELECT doc_id, n_chars,
      |    CASE WHEN doc_id % 17 = 0 THEN NULL
      |         WHEN doc_id % 11 = 0
      |           THEN 'https://pg' || (doc_id % 3) || '.' || source ||
      |                '.ck/doc/' || doc_id
      |         WHEN doc_id % 13 = 0
      |           THEN 'https://sub' || (doc_id % 2) || '.www.ck/doc/' ||
      |                doc_id
      |         WHEN doc_id % 2 = 0
      |           THEN 'https://www.' || source || '.co.uk/doc/' || doc_id
      |         WHEN doc_id % 3 = 0
      |           THEN 'https://' || source || '.com.au/doc/' || doc_id
      |         ELSE 'https://www.' || source || '-site.org/doc/' || doc_id
      |    END AS url
      |  FROM documents),
      |hosts AS (
      |  SELECT doc_id, n_chars,
      |    ${UrlCuration.registrableDomainSql(
             UrlCuration.urlHostSql("url"), Q189Psl)} AS domain
      |  FROM urls),
      |ranked AS (
      |  SELECT domain, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY domain
      |      ORDER BY n_chars DESC, doc_id ASC) AS rk
      |  FROM hosts)
      |SELECT coalesce(domain, '(none)') AS domain, doc_id, n_chars
      |FROM ranked WHERE rk <= 5
      |ORDER BY domain, doc_id""".stripMargin
  }) { (s, dir) =>
    import graft.ops.UrlCuration
    val urls = Tables.documents(s, dir).select(col("doc_id"),
      col("n_chars"),
      when(col("doc_id") % 17 === 0, lit(null))
        .when(col("doc_id") % 11 === 0, // wildcard *.ck: <source>.ck is
          // the public suffix, so the cap key is the full 3-label
          // pgN.<source>.ck (the heuristic would coarsen to source.ck)
          concat(lit("https://pg"), (col("doc_id") % 3).cast("string"),
            lit("."), col("source"), lit(".ck/doc/"),
            col("doc_id").cast("string")))
        .when(col("doc_id") % 13 === 0, // exception !www.ck: every
          // subN.www.ck host collapses to the single key www.ck
          concat(lit("https://sub"), (col("doc_id") % 2).cast("string"),
            lit(".www.ck/doc/"), col("doc_id").cast("string")))
        .when(col("doc_id") % 2 === 0,
          concat(lit("https://www."), col("source"), lit(".co.uk/doc/"),
            col("doc_id").cast("string")))
        .when(col("doc_id") % 3 === 0,
          concat(lit("https://"), col("source"), lit(".com.au/doc/"),
            col("doc_id").cast("string")))
        .otherwise(
          concat(lit("https://www."), col("source"), lit("-site.org/doc/"),
            col("doc_id").cast("string"))).as("url"))
    UrlCuration.domainCap(urls, "url", cap = 5,
        Seq(col("n_chars").desc, col("doc_id").asc),
        publicSuffixes = Q189Psl)
      .select(coalesce(col("_domain"), lit("(none)")).as("domain"),
        col("doc_id"), col("n_chars"))
      .orderBy(col("domain"), col("doc_id"))
  }

  val all: Seq[Q] = Seq(q103, q104, q109, q111, q112, q113, q126, q132,
    q136, q184, q185, q189)
}
