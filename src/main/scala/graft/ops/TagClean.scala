package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** clean_tags / clean_caption (SURVEY.md §2.8 T6–T8, §2.9 U4).
  *
  * Reference: `/root/reference/legacy/merge_all_to_metadata.py:14-109`.
  * The whole of `clean_tags` — including the word-redundancy step T7 the
  * survey expected to need a UDF — compiles to builtins: the per-found-word
  * loop is a left fold, which Spark's `aggregate` HOF expresses directly
  * (and DuckDB's `list_reduce`, keeping it oracle-checkable). Only the
  * caption fixpoint T8 (replace-until-stable per pair) is a genuine UDF.
  *
  * Scale: `cleanTags` is one narrow codegen'd projection; `cleanCaptionUdf`
  * is a pure deterministic scalar UDF — both shuffle-free, linear in rows.
  */
object TagClean {
  /** Regexes exactly as `merge_all_to_metadata.py:14-26` (Java and RE2
    * agree with Python `re` on these: no backrefs, ASCII word chars). */
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

  /** `if len(pat.findall(t)) > 1: t = pat.sub("", t)` as a column step. */
  def removeIfMultiple(t: Column, pattern: String): Column =
    when(size(regexp_extract_all(t, lit(pattern), lit(1))) > 1,
      regexp_replace(t, pattern, "")).otherwise(t)

  /** T6+T7 composite `clean_tags` (`merge_all_to_metadata.py:58-100`):
    * underscore→space, rating cut, pad; in multi-person captions remove
    * duplicated hair/eye/sleeve/hairstyle tags with the hair-length
    * placeholder dance; then drop words made redundant by a longer
    * multi-word tag ending in them; unpad. */
  def cleanTags(raw: Column): Column = {
    val spaced = TagText.underscoreToSpace(raw)
    val cut    = TagText.stripRatingSuffix(spaced)
    val padded = pad(cut)
    val multi  = contains(padded, lit("girls")) || contains(padded, lit("boys"))
    val afterMulti = PatternsRemoveInMulti.foldLeft(padded) { (t, p) =>
      when(multi, removeIfMultiple(t, p)).otherwise(t)
    }
    // Hair-length placeholder: shield the length tag while de-duplicating
    // generic "<x> hair" tags, then restore it (`:80-90`).
    val org    = regexp_extract(afterMulti, PatternHairLength, 0)
    val hasLen = org =!= ""
    val t1 = when(multi && hasLen,
      regexp_replace(afterMulti, PatternHairLength, ", @@@, ")).otherwise(afterMulti)
    val t2 = when(multi, removeIfMultiple(t1, PatternHair)).otherwise(t1)
    val t3 = when(multi && hasLen, replace(t2, lit(", @@@, "), org)).otherwise(t2)
    // T7: fold over words found in the ORIGINAL t3 (like Python's findall
    // before the loop), dropping ", w, " when ", ((\w+) )+w, " matches.
    val found = regexp_extract_all(t3, lit(PatternWord), lit(1))
    val t4 = aggregate(found, t3, (acc, w) =>
      when(regexp_like(acc, concat(lit(", ((\\w+) )+"), w, lit(", "))),
        replace(acc, concat(lit(", "), w, lit(", ")), lit(""))).otherwise(acc))
    unpad(t4)
  }

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
