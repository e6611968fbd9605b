package graft.ops

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** clean_tags / clean_caption (SURVEY.md §2.8 T6–T8, §2.9 U4).
  *
  * Reference: `/root/reference/legacy/merge_all_to_metadata.py:14-109`.
  * `clean_tags` is a Scala UDF, exactly as SURVEY.md §7.3 predicted: a
  * pure-builtin spelling exists (each step is `when`/`regexp_replace`/
  * `aggregate`), but every conditional stage embeds its input expression
  * 3×, so eight chained stages grow the Catalyst tree ~3^8× — analysis and
  * codegen blow up. A deterministic per-row UDF is the idiomatic escape
  * hatch for deep scalar pipelines; the DuckDB oracle spells the same
  * steps as linear CTEs (each referenced once, so no blowup there).
  *
  * Scale: both UDFs are pure, deterministic scalar functions —
  * shuffle-free, partition-parallel, linear in rows.
  */
object TagClean {
  /** Regexes exactly as `merge_all_to_metadata.py:14-26`. Python `re`'s
    * `\w` is Unicode-aware by default, so the UDF compiles every pattern
    * with UNICODE_CHARACTER_CLASS to match the reference on non-ASCII tags
    * (common in booru data). The DuckDB oracle regexes stay RE2/ASCII —
    * the driver fixture corpus is ASCII-only, where the two agree; the
    * divergence exists only for non-ASCII input, where the UDF (not the
    * oracle) is the reference-faithful one. */
  val PatternHairLength = ", (long|short|medium) hair, "
  val PatternHairCut    = ", (bob|hime) cut, "
  val PatternHair       = ", ([\\w\\-]+) hair, "
  val PatternWord       = ", ([\\w\\-]+|hair ornament), "
  val PatternsRemoveInMulti: Seq[String] = Seq(
    PatternHairLength,
    PatternHairCut,
    ", [\\w\\-]+ eyes, ",
    ", ([\\w\\-]+ sleeves|sleeveless), ",
    ", (ponytail|braid|ahoge|twintails|[\\w\\-]+ bun|single hair bun|single side bun|two side up|two tails|[\\w\\-]+ braid|sidelocks), ")

  /** Ordered caption replacement pairs (`merge_all_to_metadata.py:28-56`),
    * each applied to fixpoint in order. */
  val CaptionReplacements: Seq[(String, String)] = Seq(
    ("anime anime", "anime"), ("young ", ""), ("anime girl", "girl"),
    ("cartoon female", "girl"), ("cartoon lady", "girl"),
    ("cartoon character", "girl"), ("cartoon woman", "girl"),
    ("cartoon women", "girls"), ("cartoon girl", "girl"),
    ("anime female", "girl"), ("anime lady", "girl"),
    ("anime character", "girl"), ("anime woman", "girl"),
    ("anime women", "girls"), ("lady", "girl"), ("female", "girl"),
    ("woman", "girl"), ("women", "girls"), ("people", "girls"),
    ("person", "girl"), ("a cartoon figure", "a figure"),
    ("a cartoon image", "an image"), ("a cartoon picture", "a picture"),
    ("an anime cartoon image", "an image"),
    ("a cartoon anime drawing", "a drawing"),
    ("a cartoon drawing", "a drawing"), ("girl girl", "girl"))

  /** `", " + tags.replace(", ", ", , ") + ", "` — separator doubling so
    * adjacent tag matches don't overlap (`merge_all_to_metadata.py:72`). */
  def pad(tags: Column): Column =
    concat(lit(", "), replace(tags, lit(", "), lit(", , ")), lit(", "))

  /** Single-pass `", , "`→`", "` then strip the 2-char pad
    * (`merge_all_to_metadata.py:97-99`). */
  def unpad(tags: Column): Column = {
    val t = replace(tags, lit(", , "), lit(", "))
    t.substr(lit(3), length(t) - 4)
  }

  /** Python-`re`-compatible compile: `\w` covers Unicode word chars. */
  private def pyCompile(p: String): Pattern =
    Pattern.compile(p, Pattern.UNICODE_CHARACTER_CLASS)

  private lazy val CompiledRemoveInMulti = PatternsRemoveInMulti.map(pyCompile)
  private lazy val HairLengthP = pyCompile(PatternHairLength)
  private lazy val HairP       = pyCompile(PatternHair)
  private lazy val WordP       = pyCompile(PatternWord)

  /** `if len(pat.findall(t)) > 1: t = pat.sub("", t)` — Python findall
    * counts non-overlapping matches left-to-right; `Matcher.find` ditto. */
  private def removeIfMultipleStr(t: String, p: Pattern): String = {
    val m = p.matcher(t)
    var n = 0
    while (m.find()) n += 1
    if (n > 1) p.matcher(t).replaceAll("") else t
  }

  /** T6+T7 composite `clean_tags` (`merge_all_to_metadata.py:58-100`):
    * underscore→space, rating cut, pad; in multi-person captions remove
    * duplicated hair/eye/sleeve/hairstyle tags with the hair-length
    * placeholder dance; then drop words made redundant by a longer
    * multi-word tag ending in them; unpad. */
  def cleanTagsStr(raw: String): String = {
    // T1 underscore→space with kaomoji guard (`:59-61`).
    var s = raw.replace("^_^", "^@@@^").replace("_", " ").replace("^@@@^", "^_^")
    // T9 rating-suffix cut (`:63-70`).
    val idx = s.indexOf(", rating")
    if (idx >= 0) s = s.substring(0, idx)
    // Pad with doubled separators (`:72`).
    var t = ", " + s.replace(", ", ", , ") + ", "
    val multi = t.contains("girls") || t.contains("boys")
    if (multi) CompiledRemoveInMulti.foreach { p => t = removeIfMultipleStr(t, p) }
    // Hair-length placeholder: shield the length tag while de-duplicating
    // generic "<x> hair" tags, then restore it (`:80-90`).
    val orgM = HairLengthP.matcher(t)
    val org  = if (orgM.find()) orgM.group(0) else ""
    if (multi && org.nonEmpty) t = HairLengthP.matcher(t).replaceAll(", @@@, ")
    if (multi) t = removeIfMultipleStr(t, HairP)
    if (multi && org.nonEmpty) t = t.replace(", @@@, ", org)
    // T7: words found in the CURRENT string (Python findall before the
    // loop), each dropped when a longer multi-word tag ends in it (`:92-95`).
    val fm = WordP.matcher(t)
    val found = scala.collection.mutable.ListBuffer.empty[String]
    while (fm.find()) found += fm.group(1)
    found.foreach { w =>
      if (pyCompile(", ((\\w+) )+" + Pattern.quote(w) + ", ").matcher(t).find())
        t = t.replace(", " + w + ", ", "")
    }
    // Unpad (`:97-99`).
    t = t.replace(", , ", ", ")
    t.substring(2, t.length - 2)
  }

  val cleanTagsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (raw: String) => if (raw == null) null else cleanTagsStr(raw) }

  def cleanTags(raw: Column): Column = cleanTagsUdf(raw)

  /** T8 `clean_caption` (`merge_all_to_metadata.py:102-109`): each pair
    * replaced repeatedly until stable, pairs in order. Pure, deterministic,
    * terminates (every pair strictly shrinks or removes its pattern). */
  val cleanCaptionUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (caption: String) =>
      if (caption == null) null
      else {
        var c = caption
        CaptionReplacements.foreach { case (f, t) =>
          var changed = true
          while (changed) { val b = c; c = c.replace(f, t); changed = b != c }
        }
        c
      }
    }

  /** The same chain as a bounded builtin expression (k applications per
    * pair) — exact whenever no pair needs more than k fixpoint rounds.
    * Used by tests/oracles; production uses the UDF. */
  def cleanCaptionBounded(caption: Column, k: Int = 4): Column =
    CaptionReplacements.foldLeft(caption) { case (c, (f, t)) =>
      (1 to k).foldLeft(c)((acc, _) => replace(acc, lit(f), lit(t)))
    }

  /** DuckDB spelling of [[cleanCaptionBounded]] for oracle SQL. */
  def cleanCaptionBoundedSql(expr: String, k: Int = 4): String =
    CaptionReplacements.foldLeft(expr) { case (e, (f, t)) =>
      (1 to k).foldLeft(e)((acc, _) => s"replace($acc, '$f', '$t')")
    }
}
