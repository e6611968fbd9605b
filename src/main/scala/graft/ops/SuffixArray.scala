package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed suffix-array machinery over the corpus token stream —
  * prefix-doubling suffix ranks (Manber–Myers) and the exact longest
  * duplicated n-gram, the substring-level extension of
  * [[Dedup.duplicateSpanStats]] (fixed-`w` spans can say "8-token span
  * duplicated"; the suffix ranks say exactly HOW LONG the longest
  * duplicated run is, the Lee et al. ACL'22 §4 statistic that decides the
  * span width worth deduplicating at).
  *
  * The corpus is one virtual string: documents in `doc_id` order, each
  * terminated by a separator token unique to that document
  * (`\u0001<doc_id>` — `\u0001` never appears in tokenized text, and
  * uniqueness guarantees no match ever spans a document boundary, so every
  * reported duplicate is a real within-document or cross-document n-gram).
  * Global positions come from a [[PrefixSum]] ledger of document lengths —
  * no driver-side offset table, no `monotonically_increasing_id`.
  *
  * Prefix doubling: level-k ranks order every position's depth-2^k prefix;
  * level k+1 re-ranks the pair (r_k[i], r_k[i+2^k]) — each round is ONE
  * self-join on a shifted position key plus ONE [[GlobalRank.denseRank]],
  * all distributed. After ⌈log₂ cap⌉ rounds the ranks order suffixes to
  * depth `cap`. Total work O(n log cap) rows shuffled, vs the naive
  * enumerate-every-length oracle's O(n · cap) rows with length-`cap` gram
  * payloads — the log-vs-linear gap is the whole reason suffix doubling
  * exists, and it widens with the cap (a 100 TB corpus hunting 1k-token
  * duplicated runs does 10 rounds, not 1000 gram scans).
  */
object SuffixArray {

  /** Separator prefix — `\u0001` (ASCII SOH) sorts below every printable token byte
    * and cannot occur inside whitespace-split tokens of real text. */
  val Sep = "\u0001"

  /** One row per token occurrence plus one separator row per document:
    * `(gid, doc_id, pos, tok)` — `gid` is the global position of the
    * token in the doc_id-ordered corpus string, `pos` the 0-based offset
    * within its document (the separator sits at pos = doc length).
    *
    * `docs` must carry a unique long `idCol` and an array-of-string
    * `toksCol`. The doc-offset ledger is the [[PrefixSum]] two-phase
    * running sum — exact longs, distributed, oracle-equivalent to
    * `sum(len+1) OVER (ORDER BY doc_id)`.
    *
    * `docsPerBucket` is the ledger's [[PrefixSum]] bucket width and
    * therefore the output's PARALLELISM FLOOR: the exploded position
    * stream inherits the ledger windows' partitioning (one group per
    * doc-id bucket), and downstream broadcast-hash joins PRESERVE the
    * probe side's partitioning — an output squeezed into few partitions
    * here stays squeezed through every doubling level. The default keeps
    * a bucket's explosion ~1024 docs × tokens, small enough for one task
    * at any doc length while leaving corpus/1024 partitions of
    * parallelism. */
  def positions(docs: DataFrame, idCol: String, toksCol: String,
      docsPerBucket: Long = 1024L): DataFrame = {
    val base = docs
      .select(col(idCol).cast("long").as("doc_id"), col(toksCol).as("toks"))
      .withColumn("len1", (size(col("toks")) + 1).cast("long"))
      .withColumn("sa_g", lit(1))
    val withOff = PrefixSum.exclusiveRunningSum(
      base, "sa_g", "doc_id", "len1", "doc_off", docsPerBucket)
    withOff
      .select(col("doc_id"), col("doc_off"),
        posexplode(concat(col("toks"),
          array(concat(lit(Sep), col("doc_id"))))).as(Seq("pos", "tok")))
      .select((col("doc_off") + col("pos")).as("gid"),
        col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
  }

  /** All doubling levels 0..rounds over a [[positions]] table: element k
    * maps `gid → r`, the dense rank of the depth-2^k prefix of the suffix
    * at gid (corpus lexicographic order, rank 1 smallest). Every level is
    * materialized — level k is read twice by level k+1 (the shifted
    * self-join) and once more by each [[lcpWalk]] step. */
  def rankLevels(pos: DataFrame, rounds: Int,
      mat: Materialize = Materialize.Local): Seq[DataFrame] = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val r0 = mat(GlobalRank.denseRank(pos.select(col("gid"), col("tok")),
      Seq("tok"), "r", mat = mat).select(col("gid"), col("r")))
    (1 to rounds).scanLeft(r0) { (prev, k) =>
      val step = 1L << (k - 1)
      val shifted = prev.select((col("gid") - step).as("gid"), col("r").as("r2"))
      val paired = prev.join(shifted, Seq("gid"), "left")
        .select(col("gid"), col("r").as("r1"),
          coalesce(col("r2"), lit(0L)).as("r2"))
      mat(GlobalRank.denseRank(paired, Seq("r1", "r2"), "rn", mat = mat)
        .select(col("gid"), col("rn").as("r")))
    }
  }

  /** Suffix ranks at depth 2^rounds for every real token position:
    * `(gid, doc_id, pos, r)` — separator rows participate in the ranking
    * (they terminate every suffix) but are filtered from the output. */
  def suffixRanks(docs: DataFrame, idCol: String, toksCol: String,
      rounds: Int, mat: Materialize = Materialize.Local,
      docsPerBucket: Long = 1024L): DataFrame = {
    val pos = mat(positions(docs, idCol, toksCol, docsPerBucket))
    val last = rankLevels(pos, rounds, mat).last
    pos.filter(substring(col("tok"), 1, 1) =!= Sep)
      .join(last, Seq("gid"))
      .select(col("gid"), col("doc_id"), col("pos"), col("r"))
  }

  /** LCP of each pair `(i, j)` of global positions by greedy descent over
    * the doubling levels: at level k (largest first), if the depth-2^k
    * ranks at `i+off` and `j+off` match, the next 2^k tokens match —
    * advance `off` by 2^k. Each level is two distributed lookups (left
    * equi-joins of the pair table against the level's rank table on a
    * shifted key); a missing lookup (past corpus end) or rank mismatch
    * contributes nothing. Exact for any LCP ≤ 2^(rounds+1)−1; unique
    * separators guarantee a matched window never spans a document. */
  def lcpWalk(pairs: DataFrame, levels: Seq[DataFrame],
      iCol: String = "i", jCol: String = "j",
      out: String = "lcp"): DataFrame = {
    val walked = levels.zipWithIndex.reverse.foldLeft(
      pairs.withColumn(out, lit(0L))) { case (p, (lev, k)) =>
      val step = 1L << k
      p.join(lev.select(col("gid").as("sa_ig"), col("r").as("sa_ri")),
          col(iCol) + col(out) === col("sa_ig"), "left")
        .join(lev.select(col("gid").as("sa_jg"), col("r").as("sa_rj")),
          col(jCol) + col(out) === col("sa_jg"), "left")
        .withColumn(out, col(out) +
          when(col("sa_ri").isNotNull && col("sa_rj").isNotNull &&
            col("sa_ri") === col("sa_rj"), lit(step)).otherwise(lit(0L)))
        .drop("sa_ig", "sa_ri", "sa_jg", "sa_rj")
    }
    walked
  }

  /** Exact longest duplicated token n-gram in the corpus, capped at
    * 2^rounds: ONE row `(max_dup_len, n_dup_grams, top_gram)` —
    * the length of the longest token run occurring ≥2 times (within or
    * across documents; exact whenever the true value is < cap, reported
    * as cap otherwise), how many DISTINCT grams of that length are
    * duplicated, and the lexicographically smallest of them.
    *
    * Shape: suffix ranks to depth cap; a global total order
    * ([[GlobalRank.rowNumber]] on (r, gid)); SA-adjacent pairs (the
    * classic result: the maximum LCP is achieved by a pair adjacent in
    * suffix order — with sub-cap ties impossible below the true maximum,
    * the tie-broken order is the true order whenever the answer is below
    * cap); an [[lcpWalk]]; then one targeted gram pass AT the discovered
    * length — the data-dependent scalar rides in-plan as a broadcast
    * 1-row cross join, never a driver-side branch. */
  def longestDupNgram(docs: DataFrame, idCol: String, toksCol: String,
      rounds: Int, mat: Materialize = Materialize.Local,
      docsPerBucket: Long = 1024L): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val cap = 1L << rounds
    val pos = mat(positions(docs, idCol, toksCol, docsPerBucket))
    val levels = rankLevels(pos, rounds, mat)
    val order = mat(GlobalRank.rowNumber(levels.last, Seq("r", "gid"), "fr",
      mat = mat).select(col("gid"), col("fr")))
    val pairs = order.select(col("fr"), col("gid").as("i"))
      .join(order.select((col("fr") - 1).as("fr"), col("gid").as("j")),
        Seq("fr"))
      .select(col("i"), col("j"))
    val maxRow = mat(lcpWalk(pairs, levels)
      .agg(least(coalesce(max(col("lcp")), lit(0L)), lit(cap))
        .as("max_dup_len")))
    val grams = docs
      .select(col(idCol).as("doc_id"), col(toksCol).as("toks"))
      .crossJoin(broadcast(maxRow))
      .filter(col("max_dup_len") >= 1 &&
        size(col("toks")) >= col("max_dup_len"))
      .select(col("max_dup_len"),
        explode(sequence(lit(1),
          size(col("toks")) - col("max_dup_len").cast("int") + 1)).as("p"),
        col("toks"))
      .select(array_join(slice(col("toks"), col("p"),
        col("max_dup_len").cast("int")), " ").as("gram"))
    val dupAgg = grams.groupBy(col("gram")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .agg(count(lit(1)).as("n_dup_grams"), min(col("gram")).as("top_gram"))
    maxRow.crossJoin(broadcast(dupAgg))
      .select(col("max_dup_len").cast("long").as("max_dup_len"),
        col("n_dup_grams"), col("top_gram"))
  }
}
