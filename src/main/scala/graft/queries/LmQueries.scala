package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.ops.{HeavyHitters, LangModel, LinearModel, TextAnalysis}

/** Language-model-based corpus curation (CCNet family): train a reference
  * LM, score the whole corpus, bucket by fluency. */
object LmQueries {

  /** Head/middle cut points in nano-units, chosen once from the reference
    * score distribution (median ≈ 33.4M, en-median ≈ 35.5M on the synthetic
    * corpus) and then applied as constants — the production pattern. */
  val HeadMin = 35000000L
  val MidMin = 31000000L

  /** [[LangModel]]: add-one bigram LM trained on the `en` slice (the clean
    * reference), every document scored by mean per-bigram likelihood in
    * nano-units, CCNet head/middle/tail bucketing. */
  val q115 = Q("q115_lm_fluency", {
    val toks = TextAnalysis.toksSql
    s"""WITH tok AS (SELECT doc_id, lang, $toks AS toks FROM documents),
      |big AS (SELECT doc_id, lang, ${LangModel.bigramsSql("toks")} AS bgs,
      |          ${LangModel.prefixesSql("toks")} AS w1s
      |        FROM tok WHERE len(toks) >= 2),
      |refex AS (SELECT unnest(bgs) AS bg, unnest(w1s) AS w1 FROM big
      |          WHERE lang = 'en'),
      |c12 AS (SELECT bg, count(*) AS c12 FROM refex GROUP BY bg),
      |c1 AS (SELECT w1, count(*) AS c1 FROM refex GROUP BY w1),
      |vv AS (SELECT count(DISTINCT w) AS v FROM
      |         (SELECT unnest(toks) AS w FROM tok WHERE lang = 'en') u),
      |ex AS (SELECT doc_id, unnest(bgs) AS bg, unnest(w1s) AS w1 FROM big),
      |sc AS (SELECT e.doc_id AS doc_id,
      |         ${LangModel.nanoSql("c12.c12", "c1.c1", "vv.v")} AS nano
      |       FROM ex e LEFT JOIN c12 ON c12.bg = e.bg
      |       LEFT JOIN c1 ON c1.w1 = e.w1 CROSS JOIN vv),
      |agg AS (SELECT doc_id, count(*) AS n_bigrams,
      |          CAST(sum(nano) AS BIGINT) AS sum_nano,
      |          CAST(sum(nano) // count(*) AS BIGINT) AS mean_nano
      |        FROM sc GROUP BY doc_id)
      |SELECT doc_id, n_bigrams, sum_nano, mean_nano,
      |  ${LangModel.fluencyBucketSql("mean_nano", HeadMin, MidMin)} AS bucket
      |FROM agg ORDER BY doc_id""".stripMargin
  }) { (s, dir) =>
    val tok = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      TextAnalysis.toks(col("text")).as("toks"))
    val lm = LangModel.trainBigram(tok.filter(col("lang") === "en"), "toks")
    LangModel.scoreBigramLm(tok, "doc_id", "toks", lm)
      .withColumn("bucket",
        LangModel.fluencyBucket(col("mean_nano"), HeadMin, MidMin))
      .orderBy(col("doc_id"))
  }

  /** [[HeavyHitters]]: exact bigram heavy hitters (> 1/700 of the bigram
    * stream) via Misra–Gries sketch + exact recount. Capacity 800 sits
    * BELOW the ~916-bigram vocabulary, so the sketch genuinely evicts at
    * this scale while the guarantee window (800+1 > 700) keeps every true
    * heavy hitter in the candidate set; the oracle is the plain
    * GROUP BY/HAVING the two-pass plan must equal exactly. */
  val q116 = Q("q116_heavy_hitters", {
    val toks = TextAnalysis.toksSql
    s"""WITH tok AS (SELECT $toks AS toks FROM documents),
      |ex AS (SELECT unnest(${LangModel.bigramsSql("toks")}) AS term
      |       FROM tok WHERE len(toks) >= 2),
      |t AS (SELECT count(*) AS n FROM ex),
      |c AS (SELECT term, count(*) AS cnt FROM ex GROUP BY term)
      |SELECT term, cnt FROM c CROSS JOIN t
      |WHERE cnt * 700 > n ORDER BY cnt DESC, term""".stripMargin
  }) { (s, dir) =>
    val stream = Tables.documents(s, dir)
      .select(TextAnalysis.toks(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(LangModel.bigramPairs(col("toks"))).as("p"))
      .select(col("p.bg").as("term"))
    HeavyHitters.heavyHitters(stream, "term", k = 800, num = 1L, den = 700L)
      .orderBy(col("cnt").desc, col("term"))
  }

  /** [[graft.ops.Funnel]]: ordered view→click→purchase funnel with
    * per-step value gates and strictly-increasing timestamps — counts of
    * users whose earliest qualifying chain reaches each stage. */
  val q117 = Q("q117_event_funnel",
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' AND value > 120 GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |  JOIN s1 ON s1.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.value > 160 AND e.ts > s1.t1
      |  GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |  JOIN s2 ON s2.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.value > 140 AND e.ts > s2.t2
      |  GROUP BY e.user_id)
      |SELECT 1 AS stage, 'view' AS step, (SELECT count(*) FROM s1) AS users
      |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
      |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
      |ORDER BY stage""".stripMargin) { (s, dir) =>
    graft.ops.Funnel.funnelCounts(Tables.events(s, dir), "user_id", "ts", Seq(
      "view" -> (col("event_type") === "view" && col("value") > 120),
      "click" -> (col("event_type") === "click" && col("value") > 160),
      "purchase" -> (col("event_type") === "purchase" && col("value") > 140)))
      .orderBy(col("stage"))
  }

  /** [[graft.ops.LinearModel]]: fit stopword count ~ β₀ + β₁·n_words +
    * β₂·sum_len by exact-moment least squares, score every document —
    * the in-pipeline trainable quality-scorer shape. The oracle re-runs
    * the identical training, so the WHOLE fit (moments, Cramer solve,
    * micro-quantized predictions) is hash-checked. */
  val q118 = Q("q118_ols_quality", {
    val toks = TextAnalysis.toksSql
    s"""WITH tok AS (SELECT doc_id, $toks AS toks FROM documents),
      |f AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS x1,
      |        ${TextAnalysis.sumTokenLenSql("toks")} AS x2,
      |        CAST(${TextAnalysis.markerScoreSql("toks", TextAnalysis.StopWords)} AS BIGINT) AS y
      |      FROM tok),
      |m AS (SELECT ${LinearModel.momentsSql} FROM f),
      |d AS (SELECT ${LinearModel.castSql} FROM m),
      |c AS (SELECT ${LinearModel.cramerSql} FROM d)
      |SELECT doc_id, x1, x2, y, ${LinearModel.scoreSql("x1", "x2", "y")}
      |FROM f CROSS JOIN c ORDER BY doc_id""".stripMargin
  }) { (s, dir) =>
    val f = Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.toks(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("x1"),
        TextAnalysis.sumTokenLen(col("toks")).as("x2"),
        TextAnalysis.markerScore(col("toks"), TextAnalysis.StopWords)
          .cast("long").as("y"))
    LinearModel.fitScore2(f, col("y"), col("x1"), col("x2"))
      .orderBy(col("doc_id"))
  }

  /** [[LinearModel.fitScore2ByGroup]]: one OLS model PER LANGUAGE from a
    * single grouped-moment pass — the model-per-segment shape (a million
    * segments cost the same plan). Oracle re-runs the grouped training,
    * so per-group moments, solves, and scoring are all hash-checked. */
  val q119 = Q("q119_ols_per_lang", {
    val toks = TextAnalysis.toksSql
    s"""WITH tok AS (SELECT doc_id, lang, $toks AS toks FROM documents),
      |f AS (SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS x1,
      |        ${TextAnalysis.sumTokenLenSql("toks")} AS x2,
      |        CAST(${TextAnalysis.markerScoreSql("toks", TextAnalysis.StopWords)} AS BIGINT) AS y
      |      FROM tok),
      |m AS (SELECT lang, ${LinearModel.momentsSql} FROM f GROUP BY lang),
      |d AS (SELECT lang, ${LinearModel.castSql} FROM m),
      |c AS (SELECT lang, ${LinearModel.cramerSql} FROM d)
      |SELECT doc_id, f.lang AS lang, x1, x2, y,
      |  ${LinearModel.scoreSql("x1", "x2", "y")}
      |FROM f JOIN c ON c.lang = f.lang ORDER BY doc_id""".stripMargin
  }) { (s, dir) =>
    val f = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        TextAnalysis.toks(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"),
        size(col("toks")).cast("long").as("x1"),
        TextAnalysis.sumTokenLen(col("toks")).as("x2"),
        TextAnalysis.markerScore(col("toks"), TextAnalysis.StopWords)
          .cast("long").as("y"))
    LinearModel.fitScore2ByGroup(f, Seq("lang"), col("y"), col("x1"), col("x2"))
      .select(col("doc_id"), col("lang"), col("x1"), col("x2"), col("y"),
        col("pred_micro"), col("resid_micro"))
      .orderBy(col("doc_id"))
  }

  /** Model-gate curation capstone: the three trained-in-pipeline gates of
    * this round composed over one corpus — (1) CCNet fluency ≥ middle,
    * (2) boilerplate share of heavy bigrams ≤ 16%, (3) OLS residual
    * within ±2.5 — with ONE composed oracle re-running all three
    * trainings. Proves the gates compose (shared token frame, three
    * independent model joins, one final cut). */
  val q120 = Q("q120_model_gates", {
    val toks = TextAnalysis.toksSql
    s"""WITH tok AS (SELECT doc_id, lang, $toks AS toks FROM documents),
      |big AS (SELECT doc_id, lang, ${LangModel.bigramsSql("toks")} AS bgs,
      |          ${LangModel.prefixesSql("toks")} AS w1s
      |        FROM tok WHERE len(toks) >= 2),
      |refex AS (SELECT unnest(bgs) AS bg, unnest(w1s) AS w1 FROM big
      |          WHERE lang = 'en'),
      |c12 AS (SELECT bg, count(*) AS c12 FROM refex GROUP BY bg),
      |c1 AS (SELECT w1, count(*) AS c1 FROM refex GROUP BY w1),
      |vv AS (SELECT count(DISTINCT w) AS v FROM
      |         (SELECT unnest(toks) AS w FROM tok WHERE lang = 'en') u),
      |ex AS (SELECT doc_id, unnest(bgs) AS bg, unnest(w1s) AS w1 FROM big),
      |sc AS (SELECT e.doc_id AS doc_id,
      |         ${LangModel.nanoSql("c12.c12", "c1.c1", "vv.v")} AS nano
      |       FROM ex e LEFT JOIN c12 ON c12.bg = e.bg
      |       LEFT JOIN c1 ON c1.w1 = e.w1 CROSS JOIN vv),
      |flu AS (SELECT doc_id, CAST(sum(nano) // count(*) AS BIGINT) AS mean_nano
      |        FROM sc GROUP BY doc_id),
      |t AS (SELECT count(*) AS n FROM ex),
      |hh AS (SELECT bg FROM (SELECT bg, count(*) AS cnt FROM ex GROUP BY bg) c
      |       CROSS JOIN t WHERE cnt * 700 > n),
      |bf AS (SELECT e.doc_id AS doc_id, count(*) AS nb,
      |         count(hh.bg) AS nheavy
      |       FROM ex e LEFT JOIN hh ON hh.bg = e.bg GROUP BY e.doc_id),
      |f AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS x1,
      |        ${TextAnalysis.sumTokenLenSql("toks")} AS x2,
      |        CAST(${TextAnalysis.markerScoreSql("toks", TextAnalysis.StopWords)} AS BIGINT) AS y
      |      FROM tok),
      |m AS (SELECT ${LinearModel.momentsSql} FROM f),
      |d AS (SELECT ${LinearModel.castSql} FROM m),
      |c AS (SELECT ${LinearModel.cramerSql} FROM d),
      |ols AS (SELECT doc_id, ${LinearModel.scoreSql("x1", "x2", "y")}
      |        FROM f CROSS JOIN c)
      |SELECT flu.doc_id AS doc_id, mean_nano, nb, nheavy, resid_micro
      |FROM flu JOIN bf ON bf.doc_id = flu.doc_id
      |JOIN ols ON ols.doc_id = flu.doc_id
      |WHERE mean_nano >= $MidMin AND nheavy * 100 <= nb * 16
      |  AND abs(resid_micro) <= 2500000
      |ORDER BY doc_id""".stripMargin
  }) { (s, dir) =>
    val tok = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      TextAnalysis.toks(col("text")).as("toks"))
    val lm = LangModel.trainBigram(tok.filter(col("lang") === "en"), "toks")
    val flu = LangModel.scoreBigramLm(tok, "doc_id", "toks", lm)
      .select(col("doc_id"), col("mean_nano"))
    val ex = tok.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(LangModel.bigramPairs(col("toks"))).as("p"))
      .select(col("doc_id"), col("p.bg").as("term"))
    val hh = HeavyHitters.heavyHitters(ex, "term", k = 800, num = 1L, den = 700L)
    val bf = ex.join(broadcast(hh), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nb"), count(col("cnt")).as("nheavy"))
    val f = tok.select(col("doc_id"), size(col("toks")).cast("long").as("x1"),
      TextAnalysis.sumTokenLen(col("toks")).as("x2"),
      TextAnalysis.markerScore(col("toks"), TextAnalysis.StopWords)
        .cast("long").as("y"))
    val ols = LinearModel.fitScore2(f, col("y"), col("x1"), col("x2"))
      .select(col("doc_id"), col("resid_micro"))
    flu.join(bf, "doc_id").join(ols, "doc_id")
      .filter(col("mean_nano") >= MidMin &&
        col("nheavy") * 100 <= col("nb") * 16 &&
        abs(col("resid_micro")) <= 2500000L)
      .select(col("doc_id"), col("mean_nano"), col("nb"), col("nheavy"),
        col("resid_micro"))
      .orderBy(col("doc_id"))
  }

  /** [[graft.streaming.FunnelStream]]: q117's funnel as per-user custom
    * streaming state, drained with AvailableNow — same oracle as q117
    * (stream/batch agreement, the q55/q08 pattern). */
  val q121 = Q("q121_stream_funnel",
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' AND value > 120 GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |  JOIN s1 ON s1.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.value > 160 AND e.ts > s1.t1
      |  GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |  JOIN s2 ON s2.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.value > 140 AND e.ts > s2.t2
      |  GROUP BY e.user_id)
      |SELECT 1 AS stage, 'view' AS step, (SELECT count(*) FROM s1) AS users
      |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
      |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
      |ORDER BY stage""".stripMargin) { (s, dir) =>
    import graft.streaming.FunnelStream
    FunnelStream.funnelAvailableNow(s, dir, Seq(
      "view" -> ((e: FunnelStream.FEv) => e.event_type == "view" && e.value > 120),
      "click" -> ((e: FunnelStream.FEv) => e.event_type == "click" && e.value > 160),
      "purchase" -> ((e: FunnelStream.FEv) => e.event_type == "purchase" && e.value > 140)))
  }

  /** [[graft.ops.SnapshotDiff]]: release-to-release corpus changelog.
    * Deterministic fixture: every 17th doc removed, every 13th surviving
    * doc rewritten, every 25th re-added under a new id — the diff must
    * label each key added/removed/changed/same. */
  val q122 = Q("q122_snapshot_diff",
    s"""WITH before AS (SELECT doc_id, TRUE AS in_before,
      |    md5(text) AS h_before FROM documents),
      |after_raw AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 17 <> 0
      |  UNION ALL
      |  SELECT doc_id + 20000 AS doc_id, text FROM documents
      |  WHERE doc_id % 25 = 0),
      |after AS (SELECT doc_id, TRUE AS in_after, md5(text) AS h_after
      |          FROM after_raw)
      |SELECT COALESCE(b.doc_id, a.doc_id) AS doc_id,
      |  ${graft.ops.SnapshotDiff.statusSql("in_before", "in_after",
           "h_before", "h_after")} AS status
      |FROM before b FULL OUTER JOIN after a ON a.doc_id = b.doc_id
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val before = docs.select(col("doc_id"), col("text"))
    val after = docs.filter(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 20000).as("doc_id"), col("text")))
    graft.ops.SnapshotDiff.diff(before, after, "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** [[HeavyHitters.heavyHittersByGroup]]: the MG sketch as a GROUPED
    * aggregate — per-language heavy tokens (> 1/28 of each language's
    * token stream, k = 28 < the 31-term vocabulary so every group's
    * sketch genuinely evicts). Surfaces each language's marker words;
    * oracle = per-group GROUP BY/HAVING. */
  val q123 = Q("q123_heavy_by_lang", {
    val toks = TextAnalysis.toksSql
    s"""WITH ex AS (SELECT lang, unnest($toks) AS term FROM documents),
      |t AS (SELECT lang, count(*) AS n FROM ex GROUP BY lang),
      |c AS (SELECT lang, term, count(*) AS cnt FROM ex GROUP BY lang, term)
      |SELECT c.lang AS lang, c.term AS term, c.cnt AS cnt
      |FROM c JOIN t ON t.lang = c.lang
      |WHERE c.cnt * 28 > t.n ORDER BY lang, cnt DESC, term""".stripMargin
  }) { (s, dir) =>
    val stream = Tables.documents(s, dir)
      .select(col("lang"), explode(TextAnalysis.toks(col("text"))).as("term"))
    HeavyHitters.heavyHittersByGroup(stream, Seq("lang"), "term",
        k = 28, num = 1L, den = 28L)
      .orderBy(col("lang"), col("cnt").desc, col("term"))
  }

  /** [[graft.ops.Profile]]: the documents data card — null rates,
    * cardinalities, integer ranges in one long-format frame from one
    * aggregation pass. */
  val q124 = Q("q124_profile",
    """WITH m AS (SELECT count(*) AS m_rows,
      |  CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS m_doc_id_n_null,
      |  CAST(min(doc_id) AS BIGINT) AS m_doc_id_min,
      |  CAST(max(doc_id) AS BIGINT) AS m_doc_id_max,
      |  CAST(sum(doc_id) AS BIGINT) AS m_doc_id_sum,
      |  CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS m_n_chars_n_null,
      |  CAST(min(n_chars) AS BIGINT) AS m_n_chars_min,
      |  CAST(max(n_chars) AS BIGINT) AS m_n_chars_max,
      |  CAST(sum(n_chars) AS BIGINT) AS m_n_chars_sum,
      |  CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS m_text_n_null,
      |  count(DISTINCT text) AS m_text_n_distinct,
      |  CAST(min(length(text)) AS BIGINT) AS m_text_min_len,
      |  CAST(max(length(text)) AS BIGINT) AS m_text_max_len,
      |  CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS m_lang_n_null,
      |  count(DISTINCT lang) AS m_lang_n_distinct,
      |  CAST(min(length(lang)) AS BIGINT) AS m_lang_min_len,
      |  CAST(max(length(lang)) AS BIGINT) AS m_lang_max_len,
      |  CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS m_source_n_null,
      |  count(DISTINCT source) AS m_source_n_distinct,
      |  CAST(min(length(source)) AS BIGINT) AS m_source_min_len,
      |  CAST(max(length(source)) AS BIGINT) AS m_source_max_len
      |  FROM documents)
      |SELECT col_name, metric, value FROM (
      |  SELECT '_table' AS col_name, 'rows' AS metric, m_rows AS value FROM m
      |  UNION ALL SELECT 'doc_id', 'n_null', m_doc_id_n_null FROM m
      |  UNION ALL SELECT 'doc_id', 'min', m_doc_id_min FROM m
      |  UNION ALL SELECT 'doc_id', 'max', m_doc_id_max FROM m
      |  UNION ALL SELECT 'doc_id', 'sum', m_doc_id_sum FROM m
      |  UNION ALL SELECT 'n_chars', 'n_null', m_n_chars_n_null FROM m
      |  UNION ALL SELECT 'n_chars', 'min', m_n_chars_min FROM m
      |  UNION ALL SELECT 'n_chars', 'max', m_n_chars_max FROM m
      |  UNION ALL SELECT 'n_chars', 'sum', m_n_chars_sum FROM m
      |  UNION ALL SELECT 'text', 'n_null', m_text_n_null FROM m
      |  UNION ALL SELECT 'text', 'n_distinct', m_text_n_distinct FROM m
      |  UNION ALL SELECT 'text', 'min_len', m_text_min_len FROM m
      |  UNION ALL SELECT 'text', 'max_len', m_text_max_len FROM m
      |  UNION ALL SELECT 'lang', 'n_null', m_lang_n_null FROM m
      |  UNION ALL SELECT 'lang', 'n_distinct', m_lang_n_distinct FROM m
      |  UNION ALL SELECT 'lang', 'min_len', m_lang_min_len FROM m
      |  UNION ALL SELECT 'lang', 'max_len', m_lang_max_len FROM m
      |  UNION ALL SELECT 'source', 'n_null', m_source_n_null FROM m
      |  UNION ALL SELECT 'source', 'n_distinct', m_source_n_distinct FROM m
      |  UNION ALL SELECT 'source', 'min_len', m_source_min_len FROM m
      |  UNION ALL SELECT 'source', 'max_len', m_source_max_len FROM m) u
      |ORDER BY col_name, metric""".stripMargin) { (s, dir) =>
    graft.ops.Profile.profile(Tables.documents(s, dir),
        longCols = Seq("doc_id", "n_chars"),
        strCols = Seq("text", "lang", "source"))
      .orderBy(col("col_name"), col("metric"))
  }

  /** [[LangModel.trainClassLm]]/[[LangModel.classifyUnigram]]: the
    * classifier gate (GPT-3's quality classifier / CCNet's langid shape)
    * as class-conditional unigram LMs — every 5th document is the
    * "labeled" training slice (its `lang` is the label), the model scores
    * ALL documents and each is assigned the argmax class of its mean
    * per-token smoothed likelihood in integer nano-units. The oracle
    * re-trains the same counts and replicates the argmax with the same
    * (mean desc, class asc) tie order. */
  val q133 = Q("q133_lm_classifier", {
    val toks = TextAnalysis.toksSql
    s"""WITH tok AS (SELECT doc_id, lang, $toks AS toks FROM documents),
      |lab AS (SELECT lang AS cls, unnest(toks) AS w FROM tok
      |        WHERE doc_id % 5 = 0),
      |counts AS (SELECT cls, w, count(*) AS cwc FROM lab GROUP BY 1, 2),
      |totals AS (SELECT cls, count(*) AS nc FROM lab GROUP BY 1),
      |vv AS (SELECT count(DISTINCT w) AS v FROM lab),
      |corpus AS (SELECT doc_id, unnest(toks) AS w FROM tok
      |           WHERE len(toks) >= 1),
      |sc AS (SELECT c.doc_id AS doc_id, t.cls AS cls,
      |         ${LangModel.nanoSql("cnt.cwc", "t.nc", "vv.v")} AS nano
      |       FROM corpus c CROSS JOIN totals t
      |       LEFT JOIN counts cnt ON cnt.cls = t.cls AND cnt.w = c.w
      |       CROSS JOIN vv),
      |agg AS (SELECT doc_id, cls, count(*) AS n_toks,
      |          CAST(sum(nano) AS BIGINT) AS sum_nano,
      |          CAST(sum(nano) // count(*) AS BIGINT) AS mean_nano
      |        FROM sc GROUP BY 1, 2),
      |r AS (SELECT doc_id, cls, n_toks, mean_nano,
      |        row_number() OVER (PARTITION BY doc_id
      |          ORDER BY mean_nano DESC, cls) AS rn FROM agg)
      |SELECT doc_id, cls AS pred_cls, n_toks, mean_nano
      |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }) { (s, dir) =>
    val tok = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      TextAnalysis.toks(col("text")).as("toks"))
    val lm = LangModel.trainClassLm(
      tok.filter(col("doc_id") % 5 === 0), "lang", "toks")
    LangModel.classifyUnigram(tok, "doc_id", "toks", lm)
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(q115, q116, q117, q118, q119, q120, q121, q122,
    q123, q124, q133)
}
