package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Paths, TagText}

/** P1/P2/T1–T5/T9/E1/O3 column functions against FIXTURES.md §1/§7 shapes. */
class TagTextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(line: String): (String, Seq[String]) = {
    val r = Seq(line).toDF("line")
      .select(TagText.ratingOf($"line").as("r"), TagText.tagsOf($"line").as("t"))
      .collect()(0)
    (r.getString(0), r.getSeq[String](1))
  }

  test("P2: rating-first sidecar parse with trim and empty-drop") {
    assert(one("s, 1girl, long hair,  blue eyes") === (("s", Seq("1girl", "long hair", "blue eyes"))))
    assert(one("s, a,, b ,") === (("s", Seq("a", "b"))))
  }

  test("P2: no-comma line = rating only, empty tags (run.py:53-55 default)") {
    assert(one("general") === (("general", Seq())))
  }

  test("P2: null line → empty tags") {
    val r = Seq((1, null: String)).toDF("id", "line")
      .select(TagText.tagsOf($"line").as("t")).collect()(0)
    assert(r.getSeq[String](0) === Seq())
  }

  test("T1: underscore→space preserves ^_^ kaomoji (merge_all_to_metadata.py:59-61)") {
    val r = Seq("long_hair_^_^_smile").toDF("s")
      .select(TagText.underscoreToSpace($"s")).collect()(0).getString(0)
    assert(r === "long hair ^_^ smile")
  }

  test("T2: paren escaping (tagger.py:85-90)") {
    val r = Seq("samus_aran_(metroid)").toDF("s")
      .select(TagText.escapeParens($"s")).collect()(0).getString(0)
    assert(r === "samus_aran_\\(metroid\\)")
  }

  test("T3: join + strip outer commas keeps interior double comma") {
    val r = Seq(1).toDF("i")
      .select(TagText.joinTags(typedLit(Seq("", "a", "", "b", ""))).as("j"))
      .collect()(0).getString(0)
    assert(r === "a,,b")
  }

  test("T9: rating-suffix strip cuts at first ', rating'") {
    val r = Seq("a, b, rating s, c").toDF("s")
      .select(TagText.stripRatingSuffix($"s")).collect()(0).getString(0)
    assert(r === "a, b")
  }

  test("T5: trigger-word substring match (novelai_order.py:10)") {
    val r = Seq(("16:9"), ("1024x768"), ("plain")).toDF("t")
      .select(TagText.hasTriggerWord($"t").as("h")).collect().map(_.getBoolean(0))
    assert(r.toSeq === Seq(true, true, false))
  }

  test("O3: length-desc sort, alphabetical tiebreak (novelai_order.py:35-36)") {
    val r = Seq(1).toDF("i")
      .select(TagText.sortByLengthDesc(typedLit(Seq("bb", "a", "ccc", "aa"))).as("s"))
      .collect()(0).getSeq[String](0)
    assert(r === Seq("ccc", "aa", "bb", "a"))
  }

  test("P1: image key = basename, strip last ext, before first '_' (run.py:49-52)") {
    val r = Seq("/data/img/123_tail.v2.jpg", "/d/a.b.png", "/d/x")
      .toDF("p").select(Paths.imageKey($"p").as("k")).collect().map(_.getString(0))
    assert(r.toSeq === Seq("123", "a.b", "x"))
  }

  test("E5: zip names+categories to map with _-to-space keys (novelai_order.py:9)") {
    val r = Seq(1).toDF("i")
      .select(map_from_arrays(
        transform(typedLit(Seq("long_hair", "^_^")), t => TagText.underscoreToSpace(t)),
        typedLit(Seq(0, 4))).as("m"))
      .collect()(0).getMap[String, Int](0)
    assert(r === Map("long hair" -> 0, "^_^" -> 4))
  }

  test("P1: sidecar path derivation") {
    val r = Seq("/data/img/123_tail.jpg").toDF("p")
      .select(Paths.sidecarPath($"p", "txt")).collect()(0).getString(0)
    assert(r === "/data/img/123.txt")
  }
}
