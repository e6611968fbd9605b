package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TagOrder

/** U3 NovelAI ordering (`novelai_order.py:12-40`) on a hand-checked fixture. */
class TagOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("U3: prefix / character / non-character partition with length-desc sorts") {
    val docs = Seq(
      // 1girl → prefix; hatsune_miku-ish unknowns → character (length desc);
      // known vocab + trigger words → non-character (length desc).
      (1L, Seq("1girl", "hatsune miku", "oc", "long hair", "smile", "16:9")),
      (2L, Seq("smile")),
      (3L, Seq("unknown tag"))).toDF("doc_id", "tags")
    val vocab = Seq("long hair", "smile", "blue eyes").toDF("vtag")
    val out = TagOrder.orderTags(docs, "doc_id", "tags", vocab, "vtag")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    // doc 1: prefix=[1girl]; chars=[hatsune miku, oc] len-desc; non=[long hair, smile, 16:9] len-desc
    assert(out(0) === ((1L, "1girl,hatsune miku,oc,long hair,smile,16:9")))
    // doc 2: only a known tag → empty prefix+char segments stripped
    assert(out(1) === ((2L, "smile")))
    // doc 3: unknown, no trigger → character segment only
    assert(out(2) === ((3L, "unknown tag")))
  }

  test("U3: interior empty segment keeps double comma (reference join shape)") {
    val docs = Seq((1L, Seq("1girl", "smile"))).toDF("doc_id", "tags")
    val vocab = Seq("smile").toDF("vtag")
    val out = TagOrder.orderTags(docs, "doc_id", "tags", vocab, "vtag").collect()(0).getString(1)
    assert(out === "1girl,,smile") // empty character group between the commas
  }
}
