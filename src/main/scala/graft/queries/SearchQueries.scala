package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.ops.{Dedup, Hashing, Search, Selection, TextAnalysis}

/** Corpus retrieval + selection queries: BM25 keyword search, benchmark
  * decontamination, and importance-resampling data selection — the three
  * retrieval-shaped capabilities a training-data pipeline runs between
  * dedup and packing (find documents, drop eval leakage, pick the
  * target-like subset).
  *
  * All three oracles are exact-integer by construction (micro-quantized
  * per-term scores, integer sums) — see [[graft.ops.Search]] /
  * [[graft.ops.Selection]] for the determinism contracts.
  */
object SearchQueries {

  /** The fixed query batch for q100: benchmark-sized by design (BM25
    * query sets are user queries / eval probes, not data). */
  val Bm25Queries: Seq[(Int, String)] = Seq(
    1 -> "spark window agg",
    2 -> "customer query join",
    3 -> "vector stream hash",
    4 -> "slow scan filter",
    5 -> "merge batch sort table")

  // ---- Q100: BM25 keyword top-k search ----

  /** [[Search.bm25TopK]]: inverted-index statistics as term-keyed
    * aggregations, query terms broadcast, rational-idf BM25 in integer
    * micro-units, heap top-k per query. */
  val q100 = Q("q100_bm25_topk", {
    val values = Bm25Queries.map { case (i, t) => s"($i, '$t')" }.mkString(", ")
    s"""WITH d2 AS (SELECT doc_id, ${TextAnalysis.toksSql} AS toks,
      |    len(${TextAnalysis.toksSql}) AS dl FROM documents),
      |stats AS (SELECT count(*) AS ndocs, CAST(sum(dl) AS BIGINT) AS sdl FROM d2),
      |ex AS (SELECT doc_id, dl, unnest(toks) AS term FROM d2),
      |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM ex
      |       GROUP BY doc_id, dl, term),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |q(qid, qtext) AS (VALUES $values),
      |qt AS (SELECT DISTINCT qid, unnest(${TextAnalysis.toksSql
        .replace("text", "qtext")}) AS term FROM q),
      |sc AS (SELECT qt.qid AS qid, tf.doc_id AS doc_id,
      |         ${Search.bm25MicroSql("tf.tf", "df.df", "tf.dl", "s.ndocs", "s.sdl")} AS micro
      |       FROM tf JOIN qt ON qt.term = tf.term
      |       JOIN df ON df.term = tf.term CROSS JOIN stats s),
      |agg AS (SELECT qid, doc_id, CAST(sum(micro) AS BIGINT) AS score_micro
      |        FROM sc GROUP BY qid, doc_id),
      |r AS (SELECT qid, doc_id, score_micro,
      |        row_number() OVER (PARTITION BY qid
      |          ORDER BY score_micro DESC, doc_id) AS rnk FROM agg)
      |SELECT qid, rnk, doc_id, score_micro
      |FROM r WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin
  }) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.toks(col("text")).as("toks"))
    val queries = Bm25Queries.toDF("qid", "qtext")
      .select(col("qid"), TextAnalysis.toks(col("qtext")).as("qtoks"))
    Search.bm25TopK(docs, "doc_id", "toks", queries, "qid", "qtoks", 10)
      .orderBy(col("qid"), col("rnk"))
  }

  // ---- Q101: benchmark decontamination (train/test n-gram overlap) ----

  /** Gram width for the contamination check: 8 word-grams — long enough
    * that random word soup rarely collides, short enough that partial
    * copies still trip it (the few-shot-LM papers use 8–13). */
  val ContamN = 8

  /** [[Dedup.decontaminate]]: the held-out set is every doc_id % 50 = 0
    * document; the audited corpus is everything else PLUS planted
    * contaminations — each doc_id % 100 = 0 test document re-enters as
    * doc_id+10000 with two junk tokens prepended, so its interior
    * 8-grams survive verbatim. Expected: exactly the planted docs are
    * flagged (plus any genuine soup collision — identical in both
    * engines by the shared hash spelling). */
  val q101 = Q("q101_decontaminate", {
    val th = s"list_transform(toks, t -> ${Hashing.hash31Sql("t")})"
    s"""WITH tok AS (SELECT doc_id, ${TextAnalysis.toksSql} AS toks FROM documents),
      |test AS (SELECT doc_id, toks FROM tok WHERE doc_id % 50 = 0),
      |corp AS (SELECT doc_id, toks FROM tok WHERE doc_id % 50 <> 0
      |         UNION ALL
      |         SELECT doc_id + 10000 AS doc_id,
      |           list_concat(['zz', 'zz'], toks) AS toks
      |         FROM tok WHERE doc_id % 100 = 0),
      |tsh AS (SELECT DISTINCT unnest(${Dedup.shingleHashesSql("th", ContamN)}) AS sh
      |        FROM (SELECT $th AS th FROM test)),
      |csh AS (SELECT doc_id, unnest(${Dedup.shingleHashesSql("th", ContamN)}) AS sh
      |        FROM (SELECT doc_id, $th AS th FROM corp))
      |SELECT c.doc_id AS doc_id, count(*) AS shared
      |FROM csh c JOIN tsh USING (sh)
      |GROUP BY c.doc_id ORDER BY doc_id""".stripMargin
  }) { (s, dir) =>
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.toks(col("text")).as("toks"))
    val test = base.filter(col("doc_id") % 50 === 0)
    val corp = base.filter(col("doc_id") % 50 =!= 0)
      .unionByName(base.filter(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(array(lit("zz"), lit("zz")), col("toks")).as("toks")))
    Dedup.decontaminate(corp, test, "doc_id", "toks", ContamN)
      .orderBy(col("doc_id"))
  }

  // ---- Q144: cross-source overlap / contamination matrix ----

  /** [[Dedup.crossOverlap]] over the `source` column: which corpus
    * sources share verbatim 8-gram content, and how much (containment =
    * shared / smaller gram set) — the source-level audit that complements
    * q101's document-level decontamination. The oracle spells the pair
    * generation as a shingle-keyed self-join; the Spark side collects the
    * per-fingerprint group set and explodes combinations instead (same
    * counts, because the (group, sh) pairs are pre-distinct in both). */
  val q144 = Q("q144_source_overlap", {
    val th = s"list_transform(toks, t -> ${Hashing.hash31Sql("t")})"
    s"""WITH tok AS (SELECT source, ${TextAnalysis.toksSql} AS toks FROM documents),
      |sh AS (SELECT DISTINCT source, unnest(${Dedup.shingleHashesSql("th", ContamN)}) AS sh
      |       FROM (SELECT source, $th AS th FROM tok)),
      |grams AS (SELECT source, count(*) AS grams FROM sh GROUP BY source),
      |pairs AS (SELECT a.source AS group_a, b.source AS group_b,
      |            count(*) AS shared
      |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
      |          GROUP BY 1, 2)
      |SELECT p.group_a AS group_a, p.group_b AS group_b, p.shared AS shared,
      |  ga.grams AS grams_a, gb.grams AS grams_b,
      |  round(p.shared / least(ga.grams, gb.grams), 6) AS containment
      |FROM pairs p JOIN grams ga ON ga.source = p.group_a
      |JOIN grams gb ON gb.source = p.group_b
      |ORDER BY group_a, group_b""".stripMargin
  }) { (s, dir) =>
    Dedup.crossOverlap(Tables.documents(s, dir)
        .select(col("source"), TextAnalysis.toks(col("text")).as("toks")),
      "source", "toks", ContamN)
      .orderBy(col("group_a"), col("group_b"))
  }

  // ---- Q102: importance-resampling data selection ----

  /** [[Selection.importanceTopK]]: target distribution = the zh-labeled
    * slice, background = the whole corpus; top-50 most target-like
    * documents by mean per-token likelihood ratio. */
  val q102 = Q("q102_importance_select", {
    val toks = TextAnalysis.toksSql
    s"""WITH tok AS (SELECT doc_id, $toks AS toks FROM documents),
      |d2 AS (SELECT doc_id, toks, len(toks) AS dl FROM tok),
      |ex AS (SELECT doc_id, dl, unnest(toks) AS term FROM d2),
      |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM ex
      |       GROUP BY doc_id, dl, term),
      |bg AS (SELECT term, CAST(sum(tf) AS BIGINT) AS bcnt FROM tf GROUP BY term),
      |tgt AS (SELECT unnest($toks) AS term FROM documents WHERE lang = 'zh'),
      |tc AS (SELECT term, count(*) AS tcnt FROM tgt GROUP BY term),
      |st AS (SELECT count(*) AS st FROM tgt),
      |vs AS (SELECT count(*) AS v, CAST(sum(bcnt) AS BIGINT) AS sb FROM bg),
      |wt AS (SELECT bg.term AS term,
      |         ${Selection.ratioMicroSql("COALESCE(tc.tcnt, 0)", "bg.bcnt",
               "st.st", "vs.sb", "vs.v")} AS wmicro
      |       FROM bg LEFT JOIN tc ON tc.term = bg.term
      |       CROSS JOIN st CROSS JOIN vs),
      |sc AS (SELECT t.doc_id AS doc_id, t.dl AS dl,
      |         CAST(sum(t.tf * w.wmicro) AS BIGINT) AS wsum
      |       FROM tf t JOIN wt w ON w.term = t.term GROUP BY t.doc_id, t.dl),
      |fin AS (SELECT doc_id,
      |          CAST(floor(CAST(wsum AS DOUBLE) / dl + 0.5) AS BIGINT) AS score_micro
      |        FROM sc),
      |r AS (SELECT doc_id, score_micro,
      |        row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rnk FROM fin)
      |SELECT rnk, doc_id, score_micro FROM r WHERE rnk <= 50 ORDER BY rnk""".stripMargin
  }) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val corpus = docs.select(col("doc_id"), TextAnalysis.toks(col("text")).as("toks"))
    val target = docs.filter(col("lang") === "zh")
      .select(TextAnalysis.toks(col("text")).as("toks"))
    Selection.importanceTopK(corpus, target, "doc_id", "toks", 50)
      .orderBy(col("rnk"))
  }

  // ---- Q108: blocked fuzzy string join (entity resolution) ----

  /** Character budget for a q108 match (one swapped vocab word ≤ ~8
    * chars away plus a space shift). */
  val FuzzyMaxDist = 12

  /** [[Dedup.fuzzyJoin]] over 5-token "entity names" (each document's
    * first five tokens): every doc_id % 25 = 0 entity re-enters as
    * doc_id+20000 with token 3 replaced — one token edit, so the planted
    * pair shares a deletion-neighborhood block and verifies under the
    * character Levenshtein cap. The oracle recomputes blocks, candidate
    * pairs, and distances. */
  val q108 = Q("q108_fuzzy_join", {
    val toks5 = s"(${TextAnalysis.toksSql})[1:5]"
    s"""WITH ent AS (
      |  SELECT doc_id, array_to_string($toks5, ' ') AS name FROM documents
      |  WHERE len(${TextAnalysis.toksSql}) >= 5
      |  UNION ALL
      |  SELECT doc_id + 20000 AS doc_id, array_to_string(
      |      list_concat(list_concat(($toks5)[1:2], ['zz']), ($toks5)[4:5]), ' ') AS name
      |  FROM documents
      |  WHERE len(${TextAnalysis.toksSql}) >= 5 AND doc_id % 25 = 0),
      |toks AS (SELECT doc_id, name,
      |    list_filter(string_split(name, ' '), w -> w <> '') AS t FROM ent),
      |keyed AS (SELECT doc_id, name, unnest(${Dedup.deletionKeysSql("t")}) AS blk
      |          FROM toks),
      |ok AS (SELECT blk FROM keyed GROUP BY blk HAVING count(*) <= 1000),
      |cap AS (SELECT k.* FROM keyed k JOIN ok USING (blk)),
      |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
      |           a.name AS sa, b.name AS sb
      |         FROM cap a JOIN cap b ON a.blk = b.blk AND a.doc_id < b.doc_id)
      |SELECT id_a, id_b, CAST(levenshtein(sa, sb) AS BIGINT) AS dist
      |FROM cand WHERE levenshtein(sa, sb) <= $FuzzyMaxDist
      |ORDER BY id_a, id_b""".stripMargin
  }) { (s, dir) =>
    val toks5 = slice(TextAnalysis.toks(col("text")), 1, 5)
    val base = Tables.documents(s, dir)
      .filter(size(TextAnalysis.toks(col("text"))) >= 5)
      .select(col("doc_id"), toks5.as("t5"))
    val ent = base.select(col("doc_id"), concat_ws(" ", col("t5")).as("name"))
      .unionByName(base.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat_ws(" ", concat(slice(col("t5"), 1, 2), array(lit("zz")),
            slice(col("t5"), 4, 2))).as("name")))
    Dedup.fuzzyJoin(ent, "doc_id", "name", FuzzyMaxDist)
      .orderBy(col("id_a"), col("id_b"))
  }

  val all: Seq[Q] = Seq(q100, q101, q102, q108, q144)
}
