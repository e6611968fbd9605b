package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TagClean

/** T6–T8 against the reference semantics of
  * `legacy/merge_all_to_metadata.py:14-109` (FIXTURES.md §7 corpus). */
class TagCleanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("T6: multi-person duplicate removal fires only with girls/boys") {
    // 2 eye tags + girls → both removed; hair shielded by length placeholder.
    val in = "2girls, long_hair, blonde_hair, blue_eyes, red_eyes, smile"
    val out = TagClean.cleanTagsStr(in)
    assert(out === "2girls, long hair, blonde hair, smile")
    // Same tags without the multi marker → untouched (just underscore→space).
    val in1 = "1girl, long_hair, blonde_hair, blue_eyes, red_eyes, smile"
    assert(TagClean.cleanTagsStr(in1) === "1girl, long hair, blonde hair, blue eyes, red eyes, smile")
  }

  test("T6: hair-length placeholder keeps the length tag, drops generic hair dups") {
    // 3 generic hair tags; "long hair" survives via the @@@ placeholder.
    val in = "2boys, long_hair, blonde_hair, black_hair, smile"
    assert(TagClean.cleanTagsStr(in) === "2boys, long hair, smile")
  }

  test("T6: single match of a pattern is kept (needs >1 to remove)") {
    val in = "2girls, blue_eyes, smile"
    assert(TagClean.cleanTagsStr(in) === "2girls, blue eyes, smile")
  }

  test("T7: word redundant with a longer multi-word tag is dropped") {
    // "hair ornament" ends in "ornament"? T7 drops tag w when ", ((\w+) )+w, "
    // matches — "frilled hair ornament" makes plain "ornament" redundant.
    val in = "frilled_hair_ornament, ornament, smile"
    assert(TagClean.cleanTagsStr(in) === "frilled hair ornament, smile")
  }

  test("T9 inside clean_tags: rating suffix cut before padding") {
    val in = "1girl, smile, rating_s"
    assert(TagClean.cleanTagsStr(in) === "1girl, smile")
  }

  test("T8: caption fixpoint cascades (anime woman → girl, girl girl → girl)") {
    val f = TagClean.CaptionReplacements
    val r = Seq("a young anime woman and an anime woman").toDF("c")
      .select(TagClean.cleanCaptionUdf($"c")).collect()(0).getString(0)
    assert(!r.contains("anime woman") && !r.contains("young"))
    assert(r === "a girl and an girl") // faithful to the reference's literal replaces
    assert(f.nonEmpty)
  }

  test("T8: clean_caption is idempotent (fixpoint property)") {
    val caption = concat(
      lit("young anime woman and a cartoon female , anime women and people . "),
      substring($"text", 1, 30))
    val once = TagClean.cleanCaptionUdf(caption)
    val twice = TagClean.cleanCaptionUdf(once)
    val d = Tables.documents(spark, TestSpark.Sf0001).select(once.as("a"), twice.as("b"))
    assert(d.filter($"a" =!= $"b").count() === 0)
  }

  test("P2/T3 roundtrip: tagsOf(rating + joinTags(tags)) == tags for clean inputs") {
    import graft.ops.TagText
    import org.scalacheck.Gen
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val tagsGen = Gen.nonEmptyListOf(word).map(_.distinct)
    val samples = Iterator.continually(tagsGen.sample).flatten.take(60).toSeq
    val df = samples.map(t => ("s, " + t.mkString(","), t)).toDF("line", "expected")
      .select(TagText.tagsOf($"line").as("got"), $"expected")
    assert(df.filter($"got" =!= $"expected").count() === 0)
  }

  test("T8: UDF fixpoint == bounded builtin expansion on the q52 corpus") {
    val caption = concat(
      lit("young anime woman and a cartoon female , anime women and people . "),
      substring($"text", 1, 30))
    val d = Tables.documents(spark, TestSpark.Sf0001)
      .select(TagClean.cleanCaptionUdf(caption).as("u"),
        TagClean.cleanCaptionBounded(caption).as("b"))
    assert(d.filter($"u" =!= $"b").count() === 0)
  }
}
