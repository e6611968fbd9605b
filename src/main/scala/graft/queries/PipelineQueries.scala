package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.ops.{Bucketing, Hashing, TagClean, TagOrder, TagText, Tagger, TextAnalysis}

/** Reference-pipeline composite queries (SURVEY.md §2.9 U1/U3/U4, §3.1):
  * NovelAI tag ordering, clean_tags/clean_caption, the deterministic tagger
  * stub, and the end-to-end modern-pipeline assembly — all over
  * documents-derived anime-shaped inputs so the DuckDB oracle can check
  * them cell for cell (q54 assembly is the one rows-only entry).
  *
  * Scale notes: tag ordering is explode → broadcast-vocab join → one hash
  * re-aggregation (single shuffle); clean_tags/caption and the tagger stub
  * are narrow codegen'd projections; the assembly composes those pieces
  * into one lazy plan with exactly two shuffles (tag-order groupBy + final
  * sort).
  */
object PipelineQueries {
  private val P = Hashing.P31

  // ---- Q50: NovelAI tag ordering (U3) ----

  /** Tags per doc: a prefix tag, a trigger tag, a per-doc unknown
    * (character) tag, plus the doc's sorted distinct words (known to the
    * vocabulary = distinct words of docs 0..99). */
  val q50 = Q("q50_tag_order", {
    val trig = TagText.TriggerNonCharWords
      .map(w => s"contains(t, '$w')").mkString("(", " OR ", ")")
    s"""WITH v0 AS (SELECT DISTINCT unnest(${TextAnalysis.toksSql}) AS vtag
      |  FROM documents WHERE doc_id < 100),
      |v AS (SELECT list(vtag) AS vlist FROM v0),
      |t AS (SELECT doc_id,
      |  list_concat(['1girl', '16:9', 'oc' || CAST(doc_id AS VARCHAR)],
      |    list_sort(list_distinct(${TextAnalysis.toksSql}))) AS tags
      |  FROM documents),
      |cls AS (SELECT doc_id,
      |  list_filter(tags, t -> contains(t, 'girl') OR contains(t, 'boy')) AS pfx,
      |  list_filter(tags, t -> NOT (contains(t, 'girl') OR contains(t, 'boy'))
      |    AND NOT list_contains(vlist, t) AND NOT $trig) AS chars,
      |  list_filter(tags, t -> NOT (contains(t, 'girl') OR contains(t, 'boy'))
      |    AND (list_contains(vlist, t) OR $trig)) AS nonchars
      |  FROM t CROSS JOIN v),
      |j AS (SELECT doc_id,
      |  array_to_string(pfx, ',') AS p,
      |  array_to_string(list_transform(list_sort(list_transform(chars,
      |    t -> lpad(CAST(9999 - length(t) AS VARCHAR), 4, '0') || t)), k -> substr(k, 5)), ',') AS c,
      |  array_to_string(list_transform(list_sort(list_transform(nonchars,
      |    t -> lpad(CAST(9999 - length(t) AS VARCHAR), 4, '0') || t)), k -> substr(k, 5)), ',') AS n
      |  FROM cls)
      |SELECT doc_id, regexp_replace(p || ',' || c || ',' || n, '^,+|,+$$', '', 'g') AS ordered_tags
      |FROM j ORDER BY doc_id""".stripMargin
  }) { (s, dir) =>
    val docs = Tables.documents(s, dir).select(col("doc_id"),
      concat(
        array(lit("1girl"), lit("16:9"), concat(lit("oc"), col("doc_id").cast("string"))),
        array_sort(array_distinct(TextAnalysis.toks(col("text"))))).as("tags"))
    val vocab = Tables.documents(s, dir).filter(col("doc_id") < 100)
      .select(explode(TextAnalysis.toks(col("text"))).as("vtag")).distinct()
    TagOrder.orderTags(docs, "doc_id", "tags", vocab, "vtag")
      .orderBy(col("doc_id"))
  }

  // ---- Q51: clean_tags (T6 multi-person + T7 redundant words) ----

  private val RawTagLineSql =
    "'2girls, long_hair, blonde_hair, blue_eyes, red_eyes, puffy_sleeves, " +
      "ponytail, single_braid, ' || replace(substr(text, 1, 50), ' ', ', ') || ', rating_s'"

  private def rawTagLine = concat(
    lit("2girls, long_hair, blonde_hair, blue_eyes, red_eyes, puffy_sleeves, ponytail, single_braid, "),
    replace(substring(col("text"), 1, 50), lit(" "), lit(", ")),
    lit(", rating_s"))

  val q51 = Q("q51_clean_tags", {
    def rmStep(i: Int, from: String, pat: String): String =
      s"""c$i AS (SELECT doc_id, multi,
        |  CASE WHEN multi AND len(regexp_extract_all(t, '$pat', 0)) > 1
        |       THEN regexp_replace(t, '$pat', '', 'g') ELSE t END AS t
        |  FROM $from)""".stripMargin
    val rmChain = TagClean.PatternsRemoveInMulti.zipWithIndex
      .map { case (p, i) => rmStep(i + 2, if (i == 0) "c1" else s"c${i + 1}", p) }
      .mkString(",\n")
    val last = s"c${TagClean.PatternsRemoveInMulti.size + 1}"
    s"""WITH src AS (SELECT doc_id, $RawTagLineSql AS raw FROM documents),
      |sp AS (SELECT doc_id,
      |  replace(replace(replace(raw, '^_^', '^@@@^'), '_', ' '), '^@@@^', '^_^') AS spaced
      |  FROM src),
      |ct AS (SELECT doc_id, split_part(spaced, ', rating', 1) AS cut FROM sp),
      |c0 AS (SELECT doc_id, ', ' || replace(cut, ', ', ', , ') || ', ' AS t FROM ct),
      |c1 AS (SELECT doc_id, t, (contains(t, 'girls') OR contains(t, 'boys')) AS multi FROM c0),
      |$rmChain,
      |h1 AS (SELECT doc_id, multi, t,
      |  regexp_extract(t, '${TagClean.PatternHairLength}', 0) AS org FROM $last),
      |h2 AS (SELECT doc_id, multi, org,
      |  CASE WHEN multi AND org <> ''
      |       THEN regexp_replace(t, '${TagClean.PatternHairLength}', ', @@@, ', 'g')
      |       ELSE t END AS t FROM h1),
      |h3 AS (SELECT doc_id, multi, org,
      |  CASE WHEN multi AND len(regexp_extract_all(t, '${TagClean.PatternHair}', 0)) > 1
      |       THEN regexp_replace(t, '${TagClean.PatternHair}', '', 'g') ELSE t END AS t
      |  FROM h2),
      |h4 AS (SELECT doc_id,
      |  CASE WHEN multi AND org <> '' THEN replace(t, ', @@@, ', org) ELSE t END AS t
      |  FROM h3),
      |t7 AS (SELECT doc_id,
      |  list_reduce(list_concat([t], regexp_extract_all(t, '${TagClean.PatternWord}', 1)),
      |    (acc, w) -> CASE WHEN regexp_matches(acc, ', ((\\w+) )+' || w || ', ')
      |                     THEN replace(acc, ', ' || w || ', ', '') ELSE acc END) AS t
      |  FROM h4),
      |u AS (SELECT doc_id, replace(t, ', , ', ', ') AS t FROM t7)
      |SELECT doc_id, substr(t, 3, length(t) - 4) AS cleaned
      |FROM u ORDER BY doc_id""".stripMargin
  }) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), TagClean.cleanTags(rawTagLine).as("cleaned"))
      .orderBy(col("doc_id"))
  }

  // ---- Q52: clean_caption (T8, bounded fixpoint) ----

  private val CaptionSql =
    "'young anime woman and a cartoon female , anime women and people . ' || substr(text, 1, 30)"

  val q52 = Q("q52_clean_caption",
    s"""WITH src AS (SELECT doc_id, $CaptionSql AS caption FROM documents)
      |SELECT doc_id, ${TagClean.cleanCaptionBoundedSql("caption")} AS cleaned
      |FROM src ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val caption = concat(
      lit("young anime woman and a cartoon female , anime women and people . "),
      substring(col("text"), 1, 30))
    Tables.documents(s, dir)
      .select(col("doc_id"), TagClean.cleanCaptionBounded(caption).as("cleaned"))
      .orderBy(col("doc_id"))
  }

  // ---- Q53: deterministic tagger stub (U1) + F3 threshold + A7 argmax +
  //      O2 confidence-desc sort ----

  /** Stub vocabulary: fixed word list + the 4 rating categories
    * (`assets/selected_tags.csv` category 9). */
  val StubVocab: Seq[String] =
    (TextAnalysis.LangMarkers.flatMap(_._2) ++ TextAnalysis.StopWords).distinct
  val Ratings: Seq[String] = Seq("general", "sensitive", "questionable", "explicit")

  val q53 = Q("q53_tagger_stub", {
    val vocabLst = StubVocab.map(w => s"'$w'").mkString("[", ", ", "]")
    val ratingConfs = Ratings.map(r =>
      s"${Tagger.stubConfSql("key", s"'$r'")} AS r_${r.take(1)}").mkString(",\n      |  ")
    s"""WITH s AS (SELECT doc_id, 'doc' || CAST(doc_id AS VARCHAR) AS key FROM documents),
      |k AS (SELECT doc_id,
      |  list_filter(list_transform($vocabLst,
      |    t -> {'conf': ${Tagger.stubConfSql("key", "t")}, 'tag': t}),
      |    x -> x.conf > 0.35) AS kept,
      |  $ratingConfs
      |  FROM s)
      |SELECT doc_id,
      |  CASE WHEN r_g >= r_s AND r_g >= r_q AND r_g >= r_e THEN 'general'
      |       WHEN r_s >= r_q AND r_s >= r_e THEN 'sensitive'
      |       WHEN r_q >= r_e THEN 'questionable'
      |       ELSE 'explicit' END AS rating,
      |  len(kept) AS n_kept,
      |  array_to_string(list_transform(list_sort(list_transform(kept,
      |    x -> lpad(CAST(99999999 - CAST(floor(x.conf * 100000000.0) AS BIGINT) AS VARCHAR), 8, '0') || x.tag)),
      |    k -> substr(k, 9)), ',') AS top_tags
      |FROM k ORDER BY doc_id""".stripMargin
  }) { (s, dir) =>
    val key = concat(lit("doc"), col("doc_id").cast("string"))
    val kept = filter(
      transform(typedLit(StubVocab),
        t => struct(Tagger.stubConf(key, t).as("conf"), t.as("tag"))),
      x => x.getField("conf") > 0.35)
    val sortKey = (x: org.apache.spark.sql.Column) =>
      concat(lpad((lit(99999999L) - floor(x.getField("conf") * 100000000.0).cast("long"))
        .cast("string"), 8, "0"), x.getField("tag"))
    val Seq(rg, rs, rq, re) = Ratings.map(r => Tagger.stubConf(key, lit(r)))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        when(rg >= rs && rg >= rq && rg >= re, "general")
          .when(rs >= rq && rs >= re, "sensitive")
          .when(rq >= re, "questionable")
          .otherwise("explicit").as("rating"),
        size(kept).cast("long").as("n_kept"),
        array_join(transform(array_sort(transform(kept, sortKey)),
          k => substring(k, 9, 1 << 24)), ",").as("top_tags"))
      .orderBy(col("doc_id"))
  }

  // ---- Q74: tagger category partition (E6 + per-category F3 thresholds) ----

  /** `tagger.py:34-38,70-82`: the 9k-label prob vector split by category —
    * ratings argmaxed, general kept at conf > 0.35, characters at
    * conf > 0.8 — over the deterministic stub confidences. */
  val CharVocab: Seq[String] = Seq("hatsune miku", "oc alpha", "oc beta", "kagamine rin")

  val q74 = Q("q74_tagger_categories", {
    val genLst = StubVocab.map(w => s"'$w'").mkString("[", ", ", "]")
    val chrLst = CharVocab.map(w => s"'$w'").mkString("[", ", ", "]")
    val ratingConfs = Ratings.map(r =>
      s"${Tagger.stubConfSql("key", s"'$r'")} AS r_${r.take(1)}").mkString(",\n      |  ")
    s"""WITH s AS (SELECT doc_id, 'doc' || CAST(doc_id AS VARCHAR) AS key FROM documents),
      |k AS (SELECT doc_id,
      |  list_filter(list_transform($genLst,
      |    t -> {'conf': ${Tagger.stubConfSql("key", "t")}, 'tag': t}),
      |    x -> x.conf > 0.35) AS gen,
      |  list_filter(list_transform($chrLst,
      |    t -> {'conf': ${Tagger.stubConfSql("key", "t")}, 'tag': t}),
      |    x -> x.conf > 0.8) AS chr,
      |  $ratingConfs
      |  FROM s),
      |m AS (SELECT doc_id, gen, chr,
      |  CASE WHEN r_g >= r_s AND r_g >= r_q AND r_g >= r_e THEN 'general'
      |       WHEN r_s >= r_q AND r_s >= r_e THEN 'sensitive'
      |       WHEN r_q >= r_e THEN 'questionable'
      |       ELSE 'explicit' END AS rating
      |  FROM k)
      |SELECT doc_id, rating, len(gen) AS n_general, len(chr) AS n_char,
      |  list_aggregate(list_transform(gen, x -> x.conf), 'max') AS max_gen_conf
      |FROM m ORDER BY doc_id""".stripMargin
  }) { (s, dir) =>
    val key = concat(lit("doc"), col("doc_id").cast("string"))
    def kept(vocab: Seq[String], thresh: Double) = filter(
      transform(typedLit(vocab),
        t => struct(Tagger.stubConf(key, t).as("conf"), t.as("tag"))),
      x => x.getField("conf") > thresh)
    val Seq(rg, rs, rq, re) = Ratings.map(r => Tagger.stubConf(key, lit(r)))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        when(rg >= rs && rg >= rq && rg >= re, "general")
          .when(rs >= rq && rs >= re, "sensitive")
          .when(rq >= re, "questionable")
          .otherwise("explicit").as("rating"),
        size(kept(StubVocab, 0.35)).cast("long").as("n_general"),
        size(kept(CharVocab, 0.8)).cast("long").as("n_char"),
        array_max(transform(kept(StubVocab, 0.35), x => x.getField("conf")))
          .as("max_gen_conf"))
      .orderBy(col("doc_id"))
  }

  // ---- Q54: modern pipeline assembly (§3.1, flagship) ----

  /** `dataruu/run.py:30-118` as ONE lazy plan over documents-as-images:
    * sidecar parse → synthetic dims → bucket assignment (upscale path) →
    * aesthetic join+filter (broadcast scores) → NovelAI tag ordering →
    * final keyed metadata projection (flat train_w/train_h scalars).
    * Fully oracle-checked end to end: the SQL replays every stage —
    * the q20 parse, q30 bucket argmin, the score join/threshold, and the
    * q50 ordering (with E1 first-occurrence dedup) — in one WITH chain. */
  val q54 = Q("q54_modern_pipeline", {
    val resosSql = Bucketing.resosSqlLiteral(
      Bucketing.makeBucketResolutions(Bucketing.BucketConfig()))
    val trig = TagText.TriggerNonCharWords
      .map(w => s"contains(t, '$w')").mkString("(", " OR ", ")")
    def key(prefix: String) = Hashing.hash31Sql(s"'$prefix' || CAST(doc_id AS VARCHAR)")
    def lenDescJoin(arr: String) =
      s"coalesce(array_to_string(list_transform(list_sort(list_transform($arr,\n" +
        s"      |    t -> lpad(CAST(9999 - length(t) AS VARCHAR), 4, '0') || t)), k -> substr(k, 5)), ','), '')"
    s"""WITH img AS (
      |  SELECT doc_id, 'doc' || CAST(doc_id AS VARCHAR) AS image_key,
      |    CAST(128 + ${key("w")} % 1900 AS INT) AS w,
      |    CAST(128 + ${key("h")} % 1900 AS INT) AS h,
      |    lang || ', ' || replace(text, ' ', ', ') AS line
      |  FROM documents),
      |pr AS (SELECT doc_id, image_key, w, h,
      |    trim(split_part(line, ',', 1)) AS rating,
      |    list_filter(list_transform(string_split(substr(line, instr(line, ',') + 1), ','),
      |      x -> trim(x)), x -> x <> '') AS rawtags
      |  FROM img),
      |dd AS (SELECT *, list_filter(rawtags, (t, i) -> list_position(rawtags, t) = i) AS tags
      |  FROM pr),
      |c AS (SELECT *, w / h AS ar, $resosSql AS resos FROM dd),
      |m AS (SELECT *, list_transform(resos, r -> abs(r.rw / r.rh - ar)) AS errs,
      |  len(list_filter(resos, r -> r.rw = w AND r.rh = h)) > 0 AS exact FROM c),
      |r AS (SELECT *,
      |  CASE WHEN exact THEN w ELSE resos[list_position(errs, list_aggregate(errs, 'min'))].rw END AS reso_w,
      |  CASE WHEN exact THEN h ELSE resos[list_position(errs, list_aggregate(errs, 'min'))].rh END AS reso_h
      |  FROM m),
      |tr AS (SELECT doc_id, image_key, rating, tags,
      |    reso_w - reso_w % 8 AS train_w, reso_h - reso_h % 8 AS train_h FROM r),
      |sc AS (SELECT 'doc' || CAST(doc_id AS VARCHAR) AS image_key,
      |    ${key("s")} / $P.0 AS aesthetic_score
      |  FROM documents
      |  WHERE ${key("doc")} % 13 <> 0),
      |fj AS (SELECT t.*, s.aesthetic_score FROM tr t JOIN sc s ON s.image_key = t.image_key
      |       WHERE s.aesthetic_score >= 0.5),
      |v0 AS (SELECT DISTINCT unnest(${TextAnalysis.toksSql}) AS vtag
      |       FROM documents WHERE doc_id < 100),
      |v AS (SELECT list(vtag) AS vlist FROM v0),
      |cls AS (SELECT image_key, rating, train_w, train_h, aesthetic_score,
      |  list_filter(tags, t -> contains(t, 'girl') OR contains(t, 'boy')) AS pfx,
      |  list_filter(tags, t -> NOT (contains(t, 'girl') OR contains(t, 'boy'))
      |    AND NOT list_contains(vlist, t) AND NOT $trig) AS chars,
      |  list_filter(tags, t -> NOT (contains(t, 'girl') OR contains(t, 'boy'))
      |    AND (list_contains(vlist, t) OR $trig)) AS nonchars
      |  FROM fj CROSS JOIN v),
      |j AS (SELECT image_key, rating, train_w, train_h, aesthetic_score,
      |  coalesce(array_to_string(pfx, ','), '') AS p,
      |  ${lenDescJoin("chars")} AS c,
      |  ${lenDescJoin("nonchars")} AS n
      |  FROM cls)
      |SELECT image_key, train_w, train_h, rating, round(aesthetic_score, 6) AS aesthetic_score,
      |  regexp_replace(p || ',' || c || ',' || n, '^,+|,+$$', '', 'g') AS ordered_tags
      |FROM j ORDER BY image_key""".stripMargin
  }) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val key = col("doc_id").cast("string")
    val images = docs.select(
      col("doc_id"),
      concat(lit("doc"), key).as("image_key"),
      (lit(128) + Hashing.hash31(concat(lit("w"), key)) % 1900).cast("int").as("w"),
      (lit(128) + Hashing.hash31(concat(lit("h"), key)) % 1900).cast("int").as("h"),
      col("lang"), col("text"))
    val line = concat(col("lang"), lit(", "), replace(col("text"), lit(" "), lit(", ")))
    // Aesthetic scores: separate source keyed like run.py:72-76; every 13th
    // image has no score (F2 missing-key drop).
    val scores = docs.select(
      concat(lit("doc"), key).as("image_key"),
      (Hashing.hash31(concat(lit("s"), key)) / lit(P.toDouble)).as("aesthetic_score"))
      .filter(Hashing.hash31(col("image_key")) % 13 =!= 0)
    val vocab = docs.filter(col("doc_id") < 100)
      .select(explode(TextAnalysis.toks(col("text"))).as("vtag")).distinct()
    graft.pipeline.ModernPipeline.run(images, line, "doc_id", scores, vocab, "vtag")
  }

  /** J3+O5+O1 (`legacy/merge_final_train_metadata.py:9-22`): final train
    * merge — ordered-tag records filtered at the 0.8 legacy threshold,
    * inner-joined to bucketing metadata, tags overwritten by ordered_tags,
    * cut at N. The reference's insertion-order `break` is nondeterministic
    * across engines, so the order is pinned with a seeded hash shuffle key
    * (the oracle-portable spelling of `random.shuffle(seed)`, O1). */
  val q58 = Q("q58_final_merge", {
    val shuf = Hashing.hash31Sql("'shuf' || CAST(d.doc_id AS VARCHAR)")
    s"""WITH lat AS (SELECT doc_id,
      |  CAST(128 + ${Hashing.hash31Sql("'w' || CAST(doc_id AS VARCHAR)")} % 1900 AS INT) AS w,
      |  CAST(128 + ${Hashing.hash31Sql("'h' || CAST(doc_id AS VARCHAR)")} % 1900 AS INT) AS h
      |  FROM documents),
      |tr AS (SELECT doc_id, w - w % 8 AS train_w, h - h % 8 AS train_h FROM lat),
      |data AS (SELECT doc_id,
      |  ${Hashing.hash31Sql("'s' || CAST(doc_id AS VARCHAR)")} / 2147483647.0 AS score,
      |  array_to_string(list_sort(list_distinct(list_filter(string_split(text, ' '),
      |    x -> x <> ''))), ',') AS ordered_tags
      |  FROM documents),
      |merged AS (
      |  SELECT d.doc_id, t.train_w, t.train_h, round(d.score, 6) AS aesthetic_score,
      |         d.ordered_tags AS tags, $shuf AS shuf
      |  FROM data d JOIN tr t ON t.doc_id = d.doc_id
      |  WHERE d.score >= 0.8),
      |cut AS (SELECT * FROM merged ORDER BY shuf, doc_id LIMIT 50)
      |SELECT doc_id, train_w, train_h, aesthetic_score, tags
      |FROM cut ORDER BY doc_id""".stripMargin
  }) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val key = col("doc_id").cast("string")
    val tr = docs.select(col("doc_id"),
      (lit(128) + Hashing.hash31(concat(lit("w"), key)) % 1900).cast("int").as("w"),
      (lit(128) + Hashing.hash31(concat(lit("h"), key)) % 1900).cast("int").as("h"))
      .select(col("doc_id"),
        (col("w") - col("w") % 8).as("train_w"), (col("h") - col("h") % 8).as("train_h"))
    val data = docs.select(col("doc_id"),
      (Hashing.hash31(concat(lit("s"), key)) / lit(P.toDouble)).as("aesthetic_score"),
      array_join(array_sort(array_distinct(TextAnalysis.toks(col("text")))), ",")
        .as("ordered_tags"),
      Hashing.hash31(concat(lit("shuf"), key)).as("shuf"))
    graft.pipeline.LegacyMerge
      .finalTrainMerge(data, tr, "doc_id", 0.8, 50, Seq(col("shuf"), col("doc_id")))
      .select(col("doc_id"), col("train_w"), col("train_h"),
        round(col("aesthetic_score"), 6).as("aesthetic_score"), col("tags"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(q50, q51, q52, q53, q54, q58, q74)
}
