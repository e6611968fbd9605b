package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Tag-text column library (SURVEY.md §2.3 P2, §2.7 E1/E3, §2.8 T1–T5/T9).
  *
  * All pure `org.apache.spark.sql.functions` — codegen'd, no UDFs. Each
  * function cites the reference behavior it reproduces.
  */
object TagText {
  private val emptyStrArray = array().cast(ArrayType(StringType))

  /** P2 (`dataruu/run.py:58-62`): first CSV field, trimmed — the rating of
    * a sidecar line `"s, 1girl, long hair"`. No comma → whole line. */
  def ratingOf(line: Column): Column = trim(substring_index(line, ",", 1))

  /** P2 (`dataruu/run.py:58-63`): everything after the FIRST comma, split
    * on `,`, each trimmed, empties dropped (F5,
    * `legacy/prepare_aesthetic_tags_metadata.py:42-47`). No comma → empty
    * array. Null-safe: null line → empty array (missing sidecar defaults,
    * `run.py:53-55`). */
  def tagsOf(line: Column): Column = {
    val rest = get(split(line, ",", 2), lit(1)) // null when no comma
    val arr  = filter(transform(split(rest, ","), t => trim(t)), t => t =!= "")
    coalesce(arr, emptyStrArray)
  }

  /** T1 (`legacy/merge_all_to_metadata.py:59-61`,
    * `novelai_order.py:9`): `_`→space with the `^_^` kaomoji guard —
    * sentinel swap exactly as the reference does it. Literal `replace`,
    * no regex. */
  def underscoreToSpace(c: Column): Column = {
    val guarded = replace(c, lit("^_^"), lit("^@@@^"))
    val spaced  = replace(guarded, lit("_"), lit(" "))
    replace(spaced, lit("^@@@^"), lit("^_^"))
  }

  /** T2 (`dataruu/tagger/tagger.py:85-90`): escape `(` and `)` as `\(`,
    * `\)` for prompt syntax. */
  def escapeParens(c: Column): Column =
    regexp_replace(c, "([()])", "\\\\$1")

  /** T3 (`run.py:106-107`, `novelai_order.py:37-38`): comma-join an array
    * then strip leading/trailing commas. */
  def joinTags(arr: Column): Column =
    regexp_replace(array_join(arr, ","), "^,+|,+$", "")

  /** T5 (`novelai_order.py:10,24-31`): true iff any trigger word occurs as
    * a substring of the tag. */
  val TriggerNonCharWords: Seq[String] = Seq(":", "x", "resolution", "aspect", "ratio")

  def hasTriggerWord(tag: Column, words: Seq[String] = TriggerNonCharWords): Column =
    exists(lit(words.toArray), w => contains(tag, w))

  /** T9 (`legacy/merge_all_to_metadata.py:63-70`): cut the string at the
    * first `", rating"` occurrence (keep the part before). */
  def stripRatingSuffix(c: Column): Column =
    get(split(c, ", rating", 2), lit(0))

  /** E1 (`novelai_order.py:17`): dedup. The reference's `list(set(...))`
    * destroys order nondeterministically; we preserve first-occurrence
    * order (documented divergence, SURVEY.md §7.4). */
  def dedupTags(arr: Column): Column = array_distinct(arr)

  /** O3 (`novelai_order.py:35-36`): sort by length DESC; ties broken
    * alphabetically ASC (reference tie order is Python-set order —
    * nondeterministic; we pin it). Implemented with a portable sort key
    * (`lpad(9999-len) || tag`) so the DuckDB oracle can spell the exact
    * same ordering — keeps the whole thing inside codegen'd builtins. */
  def sortByLengthDesc(arr: Column): Column =
    transform(array_sort(transform(arr, t => lengthDescKey(t))), k => substring(k, 5, 1 << 24))

  def lengthDescKey(t: Column): Column =
    concat(lpad((lit(9999) - length(t)).cast("string"), 4, "0"), t)

  /** Whitespace word split with empties dropped — the documents-table
    * analogue of a tag list. */
  def words(text: Column): Column =
    filter(split(text, " +"), w => w =!= "")

  /** P4 (`legacy/prepare_aesthetic_tags_metadata.py:14-23`): parse
    * `"Name (Series)"`. Character = trimmed prefix before the FIRST `(`;
    * no-paren rows keep the whole name (the ValueError branch). */
  def characterOf(raw: Column): Column = {
    val i = instr(raw, "(")
    when(i > 0, trim(raw.substr(lit(1), i - 1))).otherwise(raw)
  }

  /** P4 series: chars after the first `(` up to the last char (reference
    * slices `[index+1:-1]`), trimmed, any remaining parens removed;
    * null for no-paren rows (reference appends no series). */
  def seriesOf(raw: Column): Column = {
    val i = instr(raw, "(")
    val inner = trim(raw.substr(i + 1, length(raw) - i - 1))
    when(i > 0, replace(replace(inner, lit("("), lit("")), lit(")"), lit("")))
      .otherwise(lit(null).cast("string"))
  }
}
