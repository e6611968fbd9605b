package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextExtract

/** HTML → text extraction ([[TextExtract]]): golden main-text cases,
  * boilerplate gating, entity decoding, and the malformed-markup
  * degrade-don't-fail contract. */
class TextExtractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def extract(html: String, minWords: Int = 5): String =
    Seq(html).toDF("h")
      .select(TextExtract.mainText(col("h"), minWords).as("t"))
      .as[String].head()

  test("golden: scripts/styles/head/comments vanish WITH their content, " +
      "short boilerplate blocks drop, body prose survives with decoded " +
      "entities, blocks join on single newlines") {
    val html =
      """<html><head><title>My Page</title>
        |<style>p { color: red; }</style>
        |<script>var nav = "Home"; if (a < b) { x(); }</script></head>
        |<body>
        |<!-- tracking pixel -->
        |<div class="nav">Home | About</div>
        |<h1>Short title</h1>
        |<p>This is the first real paragraph of body prose, long enough
        |to survive the boilerplate gate &amp; carrying an &lt;entity&gt;
        |or two.</p>
        |<ul><li>item one</li><li>item two</li></ul>
        |<p>The second paragraph also carries more than five words.</p>
        |<footer>&copy; 2024</footer>
        |</body></html>""".stripMargin.replace("\n", " ")
    val got = extract(html)
    val blocks = got.split("\n").toSeq
    assert(blocks.size === 2, s"got blocks: $blocks")
    assert(blocks.head.startsWith("This is the first real paragraph"))
    assert(blocks.head.contains("& carrying an <entity> or two."))
    assert(blocks(1) === "The second paragraph also carries more than " +
      "five words.")
    assert(!got.contains("Home") && !got.contains("item one") &&
      !got.contains("color: red") && !got.contains("My Page") &&
      !got.contains("2024"))
  }

  test("the minWords gate is the block-survival knob; minWords = 1 " +
      "keeps every nonempty block") {
    val html = "<p>one two three</p><p>a much longer block with many " +
      "words in it</p>"
    assert(extract(html, 5).split("\n").length === 1)
    assert(extract(html, 1).split("\n").length === 2)
    assert(extract(html, 1).startsWith("one two three"))
  }

  test("malformed markup degrades to whitespace, never an error; " +
      "plain text passes through; empty input stays empty") {
    assert(extract("<p>an unclosed paragraph of sufficiently many words",
      5) === "an unclosed paragraph of sufficiently many words")
    assert(extract("<div><<<weird>>> nested <b stuff with seven words " +
      "here</div>", 3).nonEmpty)
    assert(extract("just plain prose with no markup at all") ===
      "just plain prose with no markup at all")
    assert(extract("") === "")
    assert(extract("<script>only code();</script>") === "")
  }

  test("Spark and the DuckDB SQL spelling agree structurally: the " +
      "SQL string builds (smoke) and the Spark plan is UDF-free") {
    assert(TextExtract.mainTextSql("html").contains("regexp_replace"))
    val df = Seq("<p>hello world of words and more</p>").toDF("html")
      .select(TextExtract.mainText(col("html")).as("t"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("batchevalpython") &&
      !plan.contains("ScalaUDF"))
    assert(df.as[String].head() === "hello world of words and more")
  }
}
