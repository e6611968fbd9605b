package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.9 U5, §2.5 A8): an exact top-k
  * word-frequency `Aggregator` — the reference ships tag frequencies
  * precomputed in `assets/selected_tags.csv` (`count` column); this is the
  * engine-side computation of that column plus a top-k fold.
  *
  * Scale contract: feed PRE-AGGREGATED (word, cnt) rows (groupBy.count
  * first — map-side partial aggregation does the heavy lifting), so the
  * buffer holds at most the distinct words of one group, not raw tokens.
  * Tie-break is pinned (cnt desc, word asc) so results are deterministic
  * and oracle-checkable.
  */
object Aggregators {
  final case class WordCount(word: String, cnt: Long)

  final class TopKWords(k: Int)
      extends Aggregator[WordCount, Map[String, Long], Seq[WordCount]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(m: Map[String, Long], in: WordCount): Map[String, Long] =
      m.updated(in.word, m.getOrElse(in.word, 0L) + in.cnt)
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      b.foldLeft(a) { case (m, (w, c)) => m.updated(w, m.getOrElse(w, 0L) + c) }
    def finish(m: Map[String, Long]): Seq[WordCount] =
      m.toSeq.map { case (w, c) => WordCount(w, c) }
        .sortBy(wc => (-wc.cnt, wc.word)).take(k)
    def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Seq[WordCount]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
