package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.ops.{Dedup, Hashing, Mixture, Privacy, Sharding, TextAnalysis}

/** The capstone release pipeline: everything between a raw corpus and a
  * publishable training set, as ONE composed plan with ONE composed
  * oracle — Unicode NFC normalization → exact dedup → benchmark
  * decontamination → l-diversity privacy gate → adaptive mixture
  * sampling. Each stage is the already-oracle-proven operator; this
  * query proves the COMPOSITION (stage order, column flow, and the
  * interactions between gates) end to end.
  */
object ReleaseQueries {

  /** Deterministic fixture shaping shared by both engines: every text
    * gets a decomposed `e`+U+0301 suffix (so the NFC stage does real
    * work before hashing), every 25th document re-enters as an exact
    * duplicate under id+10000, and every 50th ORIGINAL document doubles
    * as a held-out eval item (so decontamination must remove its corpus
    * copy — the classic "eval items leaked into train" scenario). */
  val q114 = Q("q114_release_pipeline", {
    val toks = TextAnalysis.toksSql
    val th = s"list_transform(toks, t -> ${Hashing.hash31Sql("t")})"
    s"""WITH base AS (SELECT doc_id, lang, source,
      |    nfc_normalize(text || ' cafe' || chr(769)) AS text FROM documents),
      |corp AS (SELECT * FROM base
      |         UNION ALL
      |         SELECT doc_id + 10000 AS doc_id, lang, source, text
      |         FROM base WHERE doc_id % 25 = 0),
      |ex AS (SELECT doc_id, lang, source, text FROM (
      |    SELECT *, row_number() OVER (PARTITION BY md5(text)
      |      ORDER BY doc_id) AS rn FROM corp) x WHERE rn = 1),
      |tsh AS (SELECT DISTINCT unnest(${Dedup.shingleHashesSql("th", 8)}) AS sh
      |        FROM (SELECT $th AS th FROM
      |          (SELECT $toks AS toks FROM base WHERE doc_id % 50 = 0) t0) t1),
      |csh AS (SELECT doc_id, unnest(${Dedup.shingleHashesSql("th", 8)}) AS sh
      |        FROM (SELECT doc_id, $th AS th FROM
      |          (SELECT doc_id, $toks AS toks FROM ex) e0) e1),
      |hits AS (SELECT DISTINCT c.doc_id FROM csh c JOIN tsh USING (sh)),
      |dec AS (SELECT e.* FROM ex e LEFT JOIN hits h ON h.doc_id = e.doc_id
      |        WHERE h.doc_id IS NULL),
      |g AS (SELECT source, count(*) AS gn, count(DISTINCT lang) AS gd
      |      FROM dec GROUP BY source),
      |ld AS (SELECT d.* FROM dec d JOIN g USING (source)
      |       WHERE g.gn >= 5 AND g.gd >= 4),
      |w AS (SELECT source, count(DISTINCT lang) AS mw FROM ld GROUP BY source),
      |c AS (SELECT source, count(*) AS mix_n FROM ld GROUP BY source),
      |u AS (SELECT min(mix_n // mw) AS mix_u FROM c JOIN w USING (source)),
      |k AS (SELECT source, mw * mix_u AS mix_k FROM w CROSS JOIN u),
      |r AS (SELECT doc_id, lang, source,
      |        ${Mixture.rankSql("doc_id", "source")} AS rn FROM ld),
      |fin AS (SELECT doc_id, lang, source FROM r JOIN k USING (source)
      |        WHERE rn <= mix_k)
      |SELECT doc_id, lang, source FROM fin ORDER BY doc_id""".stripMargin
  }) { (s, dir) =>
    val base = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      col("source"),
      TextAnalysis.normalizeNfc(concat(col("text"), lit(" café"))).as("text"))
    val corp = base.unionByName(base.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 10000).as("doc_id"), col("lang"),
        col("source"), col("text")))
    val ex = graft.pipeline.CorpusPipeline.exactDedup(corp)
    def toToks(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), TextAnalysis.toks(col("text")).as("toks"))
    val flagged = Dedup.decontaminate(toToks(ex),
      toToks(base.filter(col("doc_id") % 50 === 0)), "doc_id", "toks", 8)
      .select(col("doc_id"))
    val dec = ex.join(flagged, Seq("doc_id"), "left_anti")
    val ld = Privacy.lDiverse(dec, Seq("source"), "lang", 5L, 4L)
    val w = ld.groupBy(col("source")).agg(count_distinct(col("lang")).as("mw"))
    Mixture.sampleToMixtureDF(ld, "doc_id", "source", w, "mw")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  // ---- Q128: rendezvous sharding stability ----

  /** [[Sharding.hrwShard]] at n=8 and n=7 per document, aggregated to the
    * (shard8, shard7) transition matrix. The diagonal-dominance the
    * output exhibits IS the minimal-movement property: docs landing on a
    * surviving shard at n=8 keep it at n=7 (HRW argmax over a subset
    * preserves the winner when it survives), so every off-diagonal row
    * has shard8 = 7 — the drained shard redistributing. Both shard maps
    * are one narrow projection; the only shuffle is the final tiny
    * groupBy. The oracle replays the identical pack/argmax hash
    * arithmetic. */
  val q128 = Q("q128_hrw_shards",
    s"""WITH a AS (SELECT doc_id,
      |    ${Sharding.hrwShardSql("doc_id", 8)} AS shard8,
      |    ${Sharding.hrwShardSql("doc_id", 7)} AS shard7
      |  FROM documents)
      |SELECT shard8, shard7, count(*) AS n_docs FROM a
      |GROUP BY shard8, shard7 ORDER BY shard8, shard7""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        Sharding.hrwShard(col("doc_id"), 8).as("shard8"),
        Sharding.hrwShard(col("doc_id"), 7).as("shard7"))
      .groupBy(col("shard8"), col("shard7"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("shard8"), col("shard7"))
  }

  /** [[graft.ops.Expectations]]: the Deequ-style declarative quality gate
    * over a corpus with PLANTED violations — every 30th doc gets an
    * out-of-set lang, every 40th a negative n_chars, every 50th re-enters
    * under its own id (uniqueness surplus) — so every rule's violation
    * count is exercised, not just the all-green path. Scalar rules
    * evaluate in ONE aggregation pass; the oracle recomputes each count
    * with the identical null/set/range semantics. */
  val q134 = Q("q134_expectations_gate",
    s"""WITH corp AS (
      |  SELECT doc_id, text,
      |    CASE WHEN doc_id % 30 = 0 THEN 'xx' ELSE lang END AS lang,
      |    CASE WHEN doc_id % 40 = 0 THEN -1 ELSE n_chars END AS n_chars
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, text, lang, n_chars FROM documents
      |  WHERE doc_id % 50 = 0),
      |m AS (SELECT
      |  CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0,
      |  CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v1,
      |  CAST(sum(CASE WHEN n_chars IS NULL OR n_chars < 1
      |      OR n_chars > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
      |  CAST(sum(CASE WHEN lang IS NULL
      |      OR lang NOT IN ('de','en','es','fr','zh')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS v3,
      |  CAST(CASE WHEN count(*) < 100 THEN 100 - count(*) ELSE 0 END
      |    AS BIGINT) AS v4
      |  FROM corp),
      |u AS (SELECT CAST(COALESCE(sum(c - 1), 0) AS BIGINT) AS v
      |      FROM (SELECT count(*) AS c FROM corp GROUP BY doc_id) g
      |      WHERE c > 1)
      |SELECT rule, violations, violations = 0 AS ok FROM (
      |  SELECT 'not_null(doc_id)' AS rule, v0 AS violations FROM m
      |  UNION ALL SELECT 'not_null(text)', v1 FROM m
      |  UNION ALL SELECT 'in_range(n_chars,1,100000)', v2 FROM m
      |  UNION ALL SELECT 'in_set(lang)', v3 FROM m
      |  UNION ALL SELECT 'min_rows(100)', v4 FROM m
      |  UNION ALL SELECT 'unique(doc_id)', v FROM u) r
      |ORDER BY rule""".stripMargin) { (s, dir) =>
    import graft.ops.Expectations
    import graft.ops.Expectations._
    val base = Tables.documents(s, dir)
    val corp = base.select(col("doc_id"), col("text"),
        when(col("doc_id") % 30 === 0, lit("xx"))
          .otherwise(col("lang")).as("lang"),
        when(col("doc_id") % 40 === 0, lit(-1L))
          .otherwise(col("n_chars")).as("n_chars"))
      .unionByName(base.select(col("doc_id"), col("text"), col("lang"),
        col("n_chars")).filter(col("doc_id") % 50 === 0))
    Expectations.check(corp, Seq(
        NotNull("doc_id"), NotNull("text"),
        InRange("n_chars", 1L, 100000L),
        InSet("lang", Seq("de", "en", "es", "fr", "zh")),
        MinRows(100L), Unique(Seq("doc_id"))))
      .orderBy(col("rule"))
  }

  val all: Seq[Q] = Seq(q114, q128, q134)
}
