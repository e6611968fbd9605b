package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.ops.{Paths, TagText}

/** Anime-pipeline column-operator queries (SURVEY.md §2.3 P1/P2, §2.7 E1/E3,
  * §2.8 T1–T5/T9, §2.6 O3, §2.5 A4/A7), oracle-checked over the `documents`
  * testdata table by constructing sidecar-shaped inputs from `text`.
  *
  * Each query exercises one operator family from graft.ops — the same
  * `Column` builders the pipeline assembly uses — so a green row here is a
  * correctness check of the library function itself.
  *
  * Scale notes: every query is a narrow per-row projection (no join, no
  * shuffle except the final ORDER BY for determinism); all string work is
  * `functions._` builtins inside whole-stage codegen. At 100 TB these run
  * scan-speed, limited by parquet IO.
  */
object AnimeQueries {

  /** The synthetic sidecar line: `"<lang>, w1, w2, …"` — rating-first CSV
    * exactly like `dataruu/run.py:58` reads from `{id}.txt`. Docs where
    * `doc_id % 7 = 0` get a no-comma line (missing-sidecar edge,
    * `run.py:53-55`). */
  private def sidecarLine = {
    val full = concat(col("lang"), lit(", "), regexp_replace(col("text"), " ", ", "))
    when(col("doc_id") % 7 === 0, col("lang")).otherwise(full)
  }
  private val sidecarSql =
    "CASE WHEN doc_id % 7 = 0 THEN lang ELSE lang || ', ' || replace(text, ' ', ', ') END"

  /** P2+F5: rating = first CSV field; tags = rest split/trim/non-empty.
    * (`run.py:58-63`, `prepare_aesthetic_tags_metadata.py:42-47`). */
  val q20 = Q("q20_sidecar_parse",
    s"""WITH src AS (SELECT doc_id, $sidecarSql AS line FROM documents),
      |p AS (SELECT doc_id, trim(split_part(line, ',', 1)) AS rating,
      |  coalesce(list_filter(list_transform(
      |    string_split(CASE WHEN strpos(line, ',') = 0 THEN NULL
      |                      ELSE substr(line, strpos(line, ',') + 1) END, ','),
      |    t -> trim(t)), t -> t <> ''), []) AS tags
      |  FROM src)
      |SELECT doc_id, rating, len(tags) AS n_tags,
      |  tags[1] AS first_tag, tags[len(tags)] AS last_tag
      |FROM p ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val parsed = Tables.documents(s, dir)
      .select(col("doc_id"),
        TagText.ratingOf(sidecarLine).as("rating"),
        TagText.tagsOf(sidecarLine).as("tags"))
    parsed.select(col("doc_id"), col("rating"),
        size(col("tags")).cast("long").as("n_tags"),
        get(col("tags"), lit(0)).as("first_tag"),
        get(col("tags"), size(col("tags")) - 1).as("last_tag"))
      .orderBy(col("doc_id"))
  }

  /** P1: path → image key / dir / extension (`run.py:49-52` splitext +
    * split('_')[0] order). Paths constructed from doc columns. */
  val q21 = Q("q21_image_key",
    """WITH p AS (SELECT doc_id,
      |  '/data/' || source || '/' || CAST(doc_id AS VARCHAR) || '_' || lang || '.v2.jpg' AS path
      |  FROM documents)
      |SELECT doc_id,
      |  split_part(regexp_replace(regexp_replace(path, '^.*/', ''), '\.[^.]*$', ''), '_', 1) AS image_key,
      |  regexp_extract(path, '^(.*)/[^/]*$', 1) AS dir,
      |  lower(regexp_extract(path, '\.([^./]+)$', 1)) AS ext
      |FROM p ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        concat(lit("/data/"), col("source"), lit("/"), col("doc_id").cast("string"),
          lit("_"), col("lang"), lit(".v2.jpg")).as("path"))
      .select(col("doc_id"),
        Paths.imageKey(col("path")).as("image_key"),
        Paths.dirName(col("path")).as("dir"),
        Paths.extension(col("path")).as("ext"))
      .orderBy(col("doc_id"))
  }

  /** T1: `_`→space with the `^_^` kaomoji guard — sentinel swap per
    * `merge_all_to_metadata.py:59-61`. Input re-underscored from text. */
  val q22 = Q("q22_underscore_kaomoji",
    """WITH src AS (SELECT doc_id,
      |  replace(substr(text, 1, 60), ' ', '_') || '_^_^' AS tag FROM documents)
      |SELECT doc_id,
      |  replace(replace(replace(tag, '^_^', '^@@@^'), '_', ' '), '^@@@^', '^_^') AS spaced
      |FROM src ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        concat(regexp_replace(substring(col("text"), 1, 60), " ", "_"), lit("_^_^")).as("tag"))
      .select(col("doc_id"), TagText.underscoreToSpace(col("tag")).as("spaced"))
      .orderBy(col("doc_id"))
  }

  /** T2: paren escaping `(`→`\(` (`tagger.py:85-90`), on a caption shaped
    * `"(lang) text…"`. */
  val q23 = Q("q23_escape_parens",
    """SELECT doc_id,
      |  regexp_replace('(' || lang || ') ' || substr(text, 1, 40) || ' (end)',
      |                 '([()])', '\\\1', 'g') AS escaped
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        TagText.escapeParens(
          concat(lit("("), col("lang"), lit(") "), substring(col("text"), 1, 40), lit(" (end)")))
          .as("escaped"))
      .orderBy(col("doc_id"))
  }

  /** T9+T3: cut at ", rating" then comma-join + strip
    * (`merge_all_to_metadata.py:63-70`, `novelai_order.py:37-38`). */
  val q24 = Q("q24_rating_strip_join",
    """WITH src AS (SELECT doc_id,
      |  replace(substr(text, 1, 80), ' ', ', ') || ', rating, ' || lang AS line
      |  FROM documents),
      |cut AS (SELECT doc_id, split_part(line, ', rating', 1) AS head FROM src),
      |arr AS (SELECT doc_id,
      |  list_filter(list_transform(string_split(head, ','), t -> trim(t)), t -> t <> '') AS tags
      |  FROM cut)
      |SELECT doc_id, array_to_string(tags, ',') AS joined
      |FROM arr ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val line = concat(regexp_replace(substring(col("text"), 1, 80), " ", ", "),
      lit(", rating, "), col("lang"))
    val head = TagText.stripRatingSuffix(line)
    val tags = filter(transform(split(head, ","), t => trim(t)), t => t =!= "")
    Tables.documents(s, dir)
      .select(col("doc_id"), TagText.joinTags(tags).as("joined"))
      .orderBy(col("doc_id"))
  }

  /** E1+E3: dedup + 3-way concat (`novelai_order.py:17,37`). Sorted before
    * join so the reference's nondeterministic set order is pinned the same
    * way in both engines (SURVEY.md §7.4). */
  val q25 = Q("q25_dedup_concat",
    """WITH w AS (SELECT doc_id, lang, source,
      |  list_sort(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS words
      |  FROM documents)
      |SELECT doc_id, array_to_string(list_concat([lang, source], words), ',') AS joined,
      |  len(words) AS n_distinct
      |FROM w ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val words = array_sort(array_distinct(TagText.words(col("text"))))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        array_join(concat(array(col("lang"), col("source")), words), ",").as("joined"),
        size(words).cast("long").as("n_distinct"))
      .orderBy(col("doc_id"))
  }

  /** O3: length-DESC sort with pinned alphabetical tiebreak via the
    * portable lpad sort key (`novelai_order.py:35-36`). */
  val q26 = Q("q26_sort_len_desc",
    """WITH w AS (SELECT doc_id,
      |  list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS words
      |  FROM documents),
      |k AS (SELECT doc_id,
      |  list_sort(list_transform(words,
      |    t -> lpad(CAST(9999 - length(t) AS VARCHAR), 4, '0') || t)) AS keys
      |  FROM w)
      |SELECT doc_id,
      |  array_to_string(list_transform(keys, k -> substr(k, 5)), ',') AS ordered
      |FROM k ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val words = array_distinct(TagText.words(col("text")))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        array_join(TagText.sortByLengthDesc(words), ",").as("ordered"))
      .orderBy(col("doc_id"))
  }

  /** T5+A7: trigger-word membership per doc + per-lang argmax doc
    * (`novelai_order.py:10,24-31`; `tagger.py:70-72` argmax). Tiebreak by
    * doc_id folded into the max_by ordinal so ties can't differ. */
  val q27 = Q("q27_trigger_argmax",
    """WITH t AS (SELECT doc_id, lang, n_chars,
      |  len(list_filter(string_split(text, ' '),
      |      w -> contains(w, 'x') OR contains(w, ':') OR contains(w, 'ratio'))) AS n_trigger
      |  FROM documents)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN n_trigger > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_trigger,
      |  arg_max(doc_id, n_chars * 10000 + doc_id) AS biggest_doc
      |FROM t GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    val trig = filter(TagText.words(col("text")),
      w => TagText.hasTriggerWord(w, Seq("x", ":", "ratio")))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"), size(trig).as("n_trigger"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_trigger") > 0, 1L).otherwise(0L)).as("n_with_trigger"),
        max_by(col("doc_id"), col("n_chars") * 10000 + col("doc_id")).as("biggest_doc"))
      .orderBy(col("lang"))
  }

  /** P4+A4 (`prepare_aesthetic_tags_metadata.py:11-26`): parse
    * `"Name (Series)"` character rows (every 3rd has no parens — the
    * ValueError branch) and report the distinct pairs with counts. */
  val q57 = Q("q57_character_series",
    """WITH src AS (SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN replace(source || '_' || lang, '_', ' ')
      |       ELSE replace(source || '_chan (' || lang || '_world)', '_', ' ') END AS raw
      |  FROM documents),
      |p AS (SELECT
      |  CASE WHEN strpos(raw, '(') > 0
      |       THEN trim(substr(raw, 1, strpos(raw, '(') - 1)) ELSE raw END AS character,
      |  CASE WHEN strpos(raw, '(') > 0
      |       THEN replace(replace(trim(substr(raw, strpos(raw, '(') + 1,
      |              length(raw) - strpos(raw, '(') - 1)), '(', ''), ')', '')
      |       ELSE NULL END AS series
      |  FROM src)
      |SELECT character, series, count(*) AS n
      |FROM p GROUP BY character, series ORDER BY character, series""".stripMargin) { (s, dir) =>
    val raw = when(col("doc_id") % 3 === 0,
      TagText.underscoreToSpace(concat(col("source"), lit("_"), col("lang"))))
      .otherwise(TagText.underscoreToSpace(
        concat(col("source"), lit("_chan ("), col("lang"), lit("_world)"))))
    Tables.documents(s, dir)
      .select(raw.as("raw"))
      .select(TagText.characterOf(col("raw")).as("character"),
        TagText.seriesOf(col("raw")).as("series"))
      .groupBy(col("character"), col("series"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("character"), col("series"))
  }

  /** A8+U5: exact top-5 words per language through the typed
    * [[graft.ops.Aggregators.TopKWords]] Aggregator (registered via
    * `functions.udaf`), over pre-aggregated (word, cnt) rows so the UDAF
    * buffer stays small at scale. Oracle = plain window top-k. */
  val q59 = Q("q59_tag_topk_udaf",
    """WITH w AS (SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
      |  FROM documents),
      |c AS (SELECT lang, word, count(*) AS cnt FROM w GROUP BY lang, word),
      |r AS (SELECT lang, word, cnt,
      |  row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, word) AS rnk FROM c)
      |SELECT lang, rnk, word, cnt FROM r WHERE rnk <= 5
      |ORDER BY lang, rnk""".stripMargin) { (s, dir) =>
    val topk = udaf(new graft.ops.Aggregators.TopKWords(5))
    Tables.documents(s, dir)
      .select(col("lang"), explode(TagText.words(col("text"))).as("word"))
      .groupBy(col("lang"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("lang"))
      .agg(topk(col("word"), col("cnt")).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "wc")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rnk"),
        col("wc.word").as("word"), col("wc.cnt").as("cnt"))
      .orderBy(col("lang"), col("rnk"))
  }

  /** E5 (`novelai_order.py:9`): zip two parallel arrays into one map —
    * the reference's `dict(zip(names, categories))` with `_`→space keys —
    * serialized with `to_json` so the assembled MAP VALUE is what the
    * oracle hash-compares, not just its input arrays (the last §2 ID that
    * was scalatest-only). Keys are the doc's tag-shaped tokens
    * (`[a-z_^]+`, a charset on which JSON escaping is the identity in
    * both engines and `_`→space cannot collide distinct tokens), values
    * their occurrence counts; the zip arrays are sorted by raw token so
    * the JSON field order is deterministic and ASCII-binary in both. */
  val q157 = Q("q157_zip_to_map", {
    val spaced =
      "replace(replace(replace(tok, '^_^', '^@@@^'), '_', ' '), '^@@@^', '^_^')"
    s"""WITH t AS (SELECT doc_id,
      |  unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS tok
      |  FROM documents),
      |c AS (SELECT doc_id, tok, count(*) AS c FROM t
      |  WHERE regexp_matches(tok, '^[a-z_^]+$$') GROUP BY doc_id, tok),
      |m AS (SELECT doc_id,
      |  '{' || string_agg('"' || $spaced || '":' || c, ',' ORDER BY tok)
      |  || '}' AS tag_map FROM c GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(m.tag_map, '{}') AS tag_map
      |FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin
  }) { (s, dir) =>
    val pairs = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(graft.ops.TextAnalysis.toks(col("text"))).as("tok"))
      .filter(col("tok").rlike("^[a-z_^]+$"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    val maps = pairs.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("tok"), col("c")))).as("kv"))
      .select(col("doc_id"), to_json(map_from_arrays(
          transform(col("kv"), p => TagText.underscoreToSpace(p.getField("tok"))),
          transform(col("kv"), p => p.getField("c")))).as("tag_map"))
    Tables.documents(s, dir).select(col("doc_id"))
      .join(maps, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("tag_map"), lit("{}")).as("tag_map"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] =
    Seq(q20, q21, q22, q23, q24, q25, q26, q27, q57, q59, q157)
}
