package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

/** [[TextAnalysis.chunkWindows]] semantics: window grid, coverage, and
  * overlap invariants. */
class ChunkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def doc(id: Long, n: Int) =
    (id, (1 to n).map(i => s"t$i").mkString(" "))

  test("chunkWindows: window grid, short-doc and final-partial-window cases") {
    val docs = Seq(doc(1L, 80), doc(2L, 10), doc(3L, 33)).toDF("doc_id", "text")
    val out = TextAnalysis.chunkWindows(docs, "doc_id", "text", 32, 24)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // 80 toks: ceil((80-32)/24)=2 → starts 0,24,48; all full windows
    assert(out.filter(_._1 == 1L).map(x => (x._2, x._3)).toSeq ===
      Seq((0L, 32L), (1L, 32L), (2L, 32L)))
    assert(out.find(x => x._1 == 1L && x._2 == 1L).get._4.startsWith("t25 "))
    // 10 toks (≤ window): exactly one short chunk, the whole doc
    assert(out.filter(_._1 == 2L).map(x => (x._2, x._3)).toSeq === Seq((0L, 10L)))
    // 33 toks: ceil(1/24)=1 → final window [25..33] is 9 toks
    assert(out.filter(_._1 == 3L).map(x => (x._2, x._3)).toSeq ===
      Seq((0L, 32L), (1L, 9L)))
    assert(out.find(x => x._1 == 3L && x._2 == 1L).get._4 ===
      (25 to 33).map(i => s"t$i").mkString(" "))
  }

  test("chunkWindows: every token covered; adjacent chunks overlap window-stride") {
    val (w, st) = (32, 24)
    val docs = Seq(doc(1L, 100), doc(2L, 32), doc(3L, 55)).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkWindows(docs, "doc_id", "text", w, st)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3).split(" ").toSeq))
    for ((id, n) <- Seq((1L, 100), (2L, 32), (3L, 55))) {
      val cs = chunks.filter(_._1 == id).sortBy(_._2).map(_._3)
      // coverage: union of chunk tokens = the whole token stream
      assert(cs.flatten.distinct.sorted.toSeq ===
        (1 to n).map(i => s"t$i").sorted)
      // overlap: chunk i+1 re-reads the last window-stride tokens of the
      // grid (full windows), i.e. starts exactly stride after chunk i
      cs.sliding(2).filter(_.size == 2).foreach { pair =>
        assert(pair(1).head === pair(0)(st))
      }
    }
  }
}
