package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operator family for the LLM-training-data extension
  * (brief: language-ID n-gram/marker heuristic, quality scoring, token
  * counting, document fingerprinting — over `documents`).
  *
  * All codegen'd builtins over the token array; the quality formula uses
  * only +·×·÷ (no libm transcendentals) so Spark and the DuckDB oracle
  * produce bit-identical doubles. Narrow per-row projections — scan-speed
  * at any scale, no shuffle.
  */
object TextAnalysis {

  /** Single-space tokenization matching the oracle's string_split(text,' ')
    * with empties dropped. */
  def toks(text: Column): Column = filter(split(text, " "), w => w =!= "")
  val toksSql: String = "list_filter(string_split(text, ' '), w -> w <> '')"

  /** Marker-stopword language profiles. The testdata corpus shares one
    * synthetic vocabulary across langs, so these are frequency markers, not
    * real linguistics — the operator shape (per-language marker scoring +
    * fixed-precedence argmax) is what a real lang-ID heuristic uses. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "scan"),
    "es" -> Seq("data", "query", "row"),
    "fr" -> Seq("fast", "slow", "merge"),
    "de" -> Seq("join", "hash", "batch"),
    "zh" -> Seq("filter", "sort", "line"))

  /** Overlapping token-window chunking — the context-window construction
    * step of an LLM training / retrieval pipeline: each document's token
    * stream splits into windows of `window` tokens advancing by `stride`
    * (stride < window ⇒ adjacent chunks overlap by window−stride tokens,
    * so no boundary context is lost; the final window may be short).
    * A document of n ≤ window tokens yields exactly one chunk.
    *
    * Spelled as a generator (explode of an integer sequence) + array
    * slice — a narrow per-row fan-out with NO shuffle, no UDF, and no
    * driver involvement; at 100 TB it runs at scan speed and the output
    * inherits the input partitioning. All arithmetic is integer
    * (`div`-ceil for the window count), so the chunk grid is identical
    * across engines. Returns (idCol, chunk_idx, n_toks, chunk_text). */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
                   window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs.select(col(idCol), toks(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        when(col("n") <= window, lit(0L))
          .otherwise(expr(s"(n - $window + $stride - 1) div $stride")
            .cast("long")))))
      .select(col(idCol), col("chunk_idx"),
        slice(col("toks"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(window)).as("c"))
      .select(col(idCol), col("chunk_idx"),
        size(col("c")).cast("long").as("n_toks"),
        array_join(col("c"), " ").as("chunk_text"))
  }

  /** 1-based indices of a sequence's adjacent pairs — empty for < 2
    * elements. Shared guard for the descending-`sequence` trap
    * (`sequence(1, 0)` counts DOWN and fabricates phantom pairs): used by
    * [[LangModel.bigramPairs]] and [[BpeTrainer.pairsOf]]. */
  def adjacentIdx(arr: Column): Column =
    when(size(arr) < 2, array().cast("array<int>"))
      .otherwise(sequence(lit(1), size(arr) - 1))

  /** Occurrence count of marker words (multiset). */
  def markerScore(toksCol: Column, markers: Seq[String]): Column =
    size(filter(toksCol, w => w.isin(markers.map(m => m: Any): _*)))

  def markerScoreSql(toks: String, markers: Seq[String]): String = {
    val lst = markers.map(m => s"'$m'").mkString("[", ", ", "]")
    s"len(list_filter($toks, w -> list_contains($lst, w)))"
  }

  /** Fixed-precedence argmax over the marker scores: the first language in
    * [[LangMarkers]] order whose score is >= all later ones wins (ties go
    * to the earlier language — deterministic in both engines). */
  def predictLang(scores: Seq[(String, Column)]): Column = {
    val langs = scores.map(_._1)
    scores.zipWithIndex.foldRight(lit("unk")) { case (((lang, s), i), els) =>
      val rest = scores.drop(i + 1).map(_._2)
      val isMax = rest.foldLeft(lit(true))((acc, o) => acc && s >= o)
      when(isMax, lit(lang)).otherwise(els)
    }
  }

  def predictLangSql(scores: Seq[(String, String)]): String = {
    val cases = scores.zipWithIndex.map { case ((lang, s), i) =>
      val rest = scores.drop(i + 1).map(_._2)
      val cond = if (rest.isEmpty) "TRUE" else rest.map(o => s"$s >= $o").mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }
    s"CASE ${cases.mkString(" ")} ELSE 'unk' END"
  }

  /** BPE-ish token pattern: letter runs, digit runs, single punctuation. */
  val BpeTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0))).cast("long")

  def bpeTokenCountSql(text: String): String =
    s"len(regexp_extract_all($text, '$BpeTokenPattern'))"

  /** Total character length of all tokens (for mean word length). */
  def sumTokenLen(toksCol: Column): Column =
    aggregate(toksCol, lit(0L), (acc, t) => acc + length(t))

  def sumTokenLenSql(toks: String): String =
    s"CAST(list_sum(list_transform($toks, t -> length(t))) AS BIGINT)"

  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  // ---- PII redaction (training-data scrubbing) ----

  /** Simple-by-design patterns (char classes + quantifiers only, so Java
    * regex and DuckDB's RE2 agree exactly). */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]+"
  val PhonePattern = "\\+1-[0-9]{3}-[0-9]{4}"

  /** Unicode NFC normalization ([[graft.plans.NfcNormalize]], native
    * codegen'd): canonically-equivalent text collapses to one form so
    * downstream hashing/dedup signatures agree. Run it FIRST in any
    * cleaning chain. DuckDB twin: `nfc_normalize(expr)`. */
  def normalizeNfc(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.plans.NfcNormalize(
      org.apache.spark.sql.GraftSqlBridge.expression(c)))

  def normalizeNfcSql(c: String): String = s"nfc_normalize($c)"

  /** Replace every e-mail / phone match with a typed placeholder — the
    * standard pre-training scrub pass. Codegen'd regexp_replace; at scale
    * a narrow per-row projection. */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  def redactPiiSql(c: String): String =
    s"regexp_replace(regexp_replace($c, '$EmailPattern', '<EMAIL>', 'g'), " +
      s"'$PhonePattern', '<PHONE>', 'g')"

  def piiCount(c: Column, pattern: String): Column = regexp_count(c, lit(pattern))
  def piiCountSql(c: String, pattern: String): String =
    s"len(regexp_extract_all($c, '$pattern'))"

  // ---- Repetition signals (Gopher-style quality filtering) ----

  /** Fixed-width token chunks ("lines" of n tokens) — the unit for the
    * duplicate-line-fraction repetition signal when the corpus has no
    * physical line structure. */
  def tokenChunks(toksCol: Column, n: Int): Column =
    // empty-array guard: sequence(0, -1) would turn descending and
    // fabricate two phantom chunks where the DuckDB twin yields none
    when(size(toksCol) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), floor((size(toksCol) - 1) / lit(n)).cast("int")),
        i => concat_ws(" ", slice(toksCol, i * n + 1, lit(n)))))

  def tokenChunksSql(toks: String, n: Int): String =
    s"list_transform(range(0, CAST(floor((len($toks) - 1) / $n) AS BIGINT) + 1), " +
      s"i -> array_to_string(($toks)[i*$n+1:i*$n+$n], ' '))"

  /** Repeated-element fraction `1 - distinct/total` of an array — applied
    * to token chunks, bigrams, and words it gives the duplicate-line /
    * repeated-bigram / repeated-word signals a Gopher-style repetition
    * filter thresholds on. */
  def repeatedFrac(arr: Column): Column =
    lit(1.0) - size(array_distinct(arr)).cast("double") / size(arr)

  def repeatedFracSql(arr: String): String =
    s"1.0 - len(list_distinct($arr)) / CAST(len($arr) AS DOUBLE)"

  /** Hashed repetition fraction — `repeatedFrac` of the mix31 hashes of
    * the token windows (width n, step `stride`, trailing partial window
    * when `partial`) computed in ONE native pass
    * ([[graft.plans.RepeatedHashFrac]]): no window strings are built,
    * which is what makes the [[graft.pipeline.CorpusPipeline]] quality
    * gate scan-speed. A mix collision merges the same two windows in the
    * oracle too ([[repeatedHashFracSql]] spells the identical hash), so
    * values stay engine-exact. */
  def repeatedHashFrac(toks: Column, n: Int, stride: Int, partial: Boolean): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.plans.RepeatedHashFrac(
      org.apache.spark.sql.GraftSqlBridge.expression(toks), n, stride, partial))

  /** DuckDB spelling of [[repeatedHashFrac]] over a token-HASH list
    * expression `th` (`list_transform(toks, t -> hash31(t))`). The
    * mix-from-zero fold equals `list_reduce` seeded by the first element
    * because `(0*A + h) mod P = h` for h < P. */
  def repeatedHashFracSql(th: String, n: Int, stride: Int, partial: Boolean): String = {
    val hb =
      if (partial)
        s"list_transform(range(0, CAST(floor((len($th) - 1) / $stride) AS BIGINT) + 1), " +
          s"i -> list_reduce(($th)[i*$stride+1:i*$stride+$n], " +
          s"(x, y) -> (x * ${Hashing.MixA}::BIGINT + y) % ${Hashing.P31}::BIGINT))"
      else
        s"list_transform(range(1, len($th) - ${n - 2}), " +
          s"i -> list_reduce(($th)[i:i+${n - 1}], " +
          s"(x, y) -> (x * ${Hashing.MixA}::BIGINT + y) % ${Hashing.P31}::BIGINT))"
    s"(1.0 - len(list_distinct($hb)) / CAST(len($hb) AS DOUBLE))"
  }

  /** Heuristic quality score in rational arithmetic only (deterministic
    * across engines): rewards stopword density and longer words, damps
    * very long documents. */
  def qualityScore(nStop: Column, nWords: Column, sumLen: Column): Column =
    (lit(2.0) * (nStop / nWords) + (sumLen / nWords) / lit(10.0)) /
      (lit(1.0) + nWords / lit(500.0))

  def qualityScoreSql(nStop: String, nWords: String, sumLen: String): String =
    s"(2.0 * ($nStop / $nWords) + ($sumLen / $nWords) / 10.0) / (1.0 + $nWords / 500.0)"
}
