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
  * Construction = jump-start + doubling refinement: ONE
  * [[GlobalRank.sparseRank]] over the depth-2^k0 truncated window string
  * (provably the depth-2^k0 doubling rank — [[positionsWindows]]), then
  * per-round Manber–Myers [[refine]] steps that re-rank ONLY still-tied
  * positions, whose count shrinks geometrically. Total work O(n) window
  * bytes once plus O(tied_k) per deeper round, vs the naive
  * enumerate-every-length oracle's O(n · cap) rows with length-`cap`
  * gram payloads — the gap widens with the cap (a 100 TB corpus hunting
  * 1k-token duplicated runs refines ~6 shrinking rounds above the jump,
  * not 1000 corpus-wide gram scans).
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

  /** [[positions]] plus the sep-truncated window STRING of each width
    * 2^0..2^k0 at every position: `(gid, doc_id, pos, w1, w2, …, w{2^k0})`
    * — `wW` is the next W tokens of the suffix joined by spaces,
    * truncated at (and including) the document's unique separator.
    *
    * The point: for any two positions, comparing these truncated windows
    * is IDENTICAL to comparing depth-W prefixes of the virtual corpus
    * string — a pairwise comparison resolves at or before the first
    * separator (separators are unique, so two different suffixes can
    * never still be tied when one reaches its separator), and what lies
    * beyond a separator therefore never matters. So `rank() OVER
    * (ORDER BY wW)` IS the depth-W doubling rank, computable in ONE pass
    * — the jump-start that skips the doubling's expensive shallow
    * rounds, where nearly every position is still tied. */
  def positionsWindows(docs: DataFrame, idCol: String, toksCol: String,
      width: Int, docsPerBucket: Long = 1024L): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    val base = docs
      .select(col(idCol).cast("long").as("doc_id"), col(toksCol).as("toks"))
      .withColumn("len1", (size(col("toks")) + 1).cast("long"))
      .withColumn("sa_g", lit(1))
    val withOff = PrefixSum.exclusiveRunningSum(
      base, "sa_g", "doc_id", "len1", "doc_off", docsPerBucket)
      // the terminated token array MUST be a bound column, not an inline
      // expression tree: slice() duplicated per position would re-build
      // the concat for every window — O(len²) per document, the
      // expression-embedding trap documented on TagClean
      .withColumn("sa_arr",
        concat(col("toks"), array(concat(lit(Sep), col("doc_id")))))
    val structs = transform(sequence(lit(0), size(col("sa_arr")) - 1), p =>
      struct(p.as("pos"),
        array_join(slice(col("sa_arr"), p + 1, lit(width)), " ").as("w")))
    withOff
      .select(col("doc_id"), col("doc_off"), explode(structs).as("s"))
      .select((col("doc_off") + col("s.pos")).as("gid"), col("doc_id"),
        col("s.pos").cast("long").as("pos"), col("s.w").as("w"))
  }

  /** Length of the common token prefix of two space-joined windows (0
    * when either side is missing — a lookup past the corpus end). The
    * windows are sep-truncated, so the count can never run past a
    * document boundary: separators are unique per document and two
    * distinct positions can never hold the same separator at the same
    * window index. */
  private def prefixTokens(a: Column, b: Column): Column = {
    val za = split(a, " "); val zb = split(b, " ")
    val firstDiff = array_position(zip_with(za, zb, (x, y) => x === y), false)
    when(a.isNull || b.isNull, lit(0L))
      .otherwise(when(firstDiff === 0,
        least(size(za), size(zb)).cast("long")).otherwise(firstDiff - 1))
  }

  /** One Manber–Myers refinement round: given level-k SPARSE ranks
    * (SQL `rank()` numbering: 1 + positions with a strictly smaller
    * prefix), produce level k+1 by re-ranking ONLY the still-tied
    * positions. Sparse numbering is what makes that sound — a position
    * whose rank is unique at depth 2^k keeps that exact rank at every
    * deeper level (untrue under `dense_rank()`), and a tie group's
    * members renumber as r + (members of the group with a smaller
    * continuation class):
    *
    *   - tie groups: a combinable count on `r`;
    *   - tied rows pair with the rank at gid+step (one uniform gid join
    *     against the full level — rank 0 = past-end, shorter-first);
    *   - the within-group offset is an exclusive running member-count
    *     over the group's DISTINCT continuation classes — a window
    *     whose partition is one tie group's class table, SMALL exactly
    *     where ties are heavy (a million-copy duplicated document is
    *     one giant tie group with ONE continuation class).
    *
    * Bit-identical to re-ranking every position with `rank()` over
    * (r, r@gid+step) — the recurrence the q151 oracle spells — while the
    * tied set shrinks geometrically for natural corpora. */
  private def refine(prev: DataFrame, step: Long,
      mat: Materialize): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // `tied` rides on every level (emitted by the sparseRank scan, then
    // maintained here), so tie detection is a FILTER — never a
    // corpus-wide aggregate — and the full level only ever flows through
    // narrow scans: the rank lookup is semi-join-reduced to the tied
    // gids first, and the passthrough join's other side is the (small)
    // re-ranked delta. When the tied set is NOT small — a pathologically
    // duplicated corpus — the same plan degrades gracefully to shuffle
    // joins; nothing here assumes broadcastability.
    val tied = prev.filter(col("tied")).select(col("gid"), col("r"))
    val lookupGids = tied.select((col("gid") + step).as("gid"))
    val shifted = prev.select(col("gid"), col("r").as("r2"))
      .join(lookupGids, Seq("gid"), "leftsemi")
      .select((col("gid") - step).as("gid"), col("r2"))
    val tp = tied.join(shifted, Seq("gid"), "left")
      .select(col("gid"), col("r").as("r1"),
        coalesce(col("r2"), lit(0L)).as("r2"))
    val sub = tp.groupBy(col("r1"), col("r2")).agg(count(lit(1)).as("sa_c"))
    val w = Window.partitionBy(col("r1")).orderBy(col("r2"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = sub
      .withColumn("sa_off", coalesce(sum(col("sa_c")).over(w), lit(0L)))
      .select(col("r1"), col("r2"), col("sa_off"), (col("sa_c") >= 2).as("sa_t"))
    // only the DELTA materializes — it is small (the still-tied set),
    // and the composed level stays a narrow scan of the jump-start
    // checkpoint plus one small-side join, cheap for every consumer
    val newRanks = mat(tp.join(offs, Seq("r1", "r2"))
      .select(col("gid"), (col("r1") + col("sa_off")).as("sa_rn"), col("sa_t")))
    prev.join(newRanks, Seq("gid"), "left")
      .select(col("gid"), coalesce(col("sa_rn"), col("r")).as("r"),
        coalesce(col("sa_t"), lit(false)).as("tied"))
  }

  /** Suffix ranks at depth 2^rounds for every real token position:
    * `(gid, doc_id, pos, r)` — separator rows participate in the ranking
    * (they terminate every suffix) but are filtered from the output.
    *
    * Spelled as ONE [[GlobalRank.sparseRank]] over the depth-2^rounds
    * truncated window string — the jump-start identity
    * ([[positionsWindows]]): truncated-window order IS virtual-string
    * prefix order. The q151 oracle deliberately spells the OTHER side of
    * that identity (the full prefix-doubling recurrence, one `rank()`
    * window per round over the virtual corpus string, suffixes
    * continuing across documents), so the driver hash-compare proves the
    * equivalence the fast path rests on — not just the implementation. */
  def suffixRanks(docs: DataFrame, idCol: String, toksCol: String,
      rounds: Int, mat: Materialize = Materialize.Local,
      docsPerBucket: Long = 1024L): DataFrame = {
    require(rounds >= 0 && rounds <= 20, s"unreasonable rounds: $rounds")
    val pw = mat(positionsWindows(docs, idCol, toksCol,
      1 << rounds, docsPerBucket))
    GlobalRank.sparseRank(pw, Seq("w"), "r")
      .filter(substring(col("w"), 1, 1) =!= Sep)
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
      out: String = "lcp", baseExp: Int = 0): DataFrame = {
    val walked = levels.zipWithIndex.reverse.foldLeft(
      pairs.withColumn(out, lit(0L))) { case (p, (lev, k)) =>
      val step = 1L << (baseExp + k)
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
  /** Shared plumbing for the duplicated-run queries: positions (with
    * window strings), ranks, and the LCP-walked SA-adjacent pair table
    * `(i, j, lcp)`. Ties at depth 2^rounds sort consecutively (the total
    * order is (r, gid)), so every tie-group member touches an adjacent
    * pair with lcp ≥ cap — the capped semantics hold per pair.
    *
    * Rank construction JUMP-STARTS at depth 2^k0 (k0 = min(4, rounds)):
    * one [[GlobalRank.sparseRank]] over the truncated window string
    * w{2^k0} — identical to running the doubling that far (see
    * [[positionsWindows]]) — then [[refine]] rounds for the remaining
    * depths, each touching only the still-tied positions. The shallow
    * walk levels (< 2^k0) need no rank tables at all: the walk only
    * tests EQUALITY, and window-string equality IS depth-2^k prefix
    * equality, so those levels are served by the position table's own
    * `wW` columns. Skipping the shallow doubling rounds matters because
    * they are the expensive ones — at depth ≤ 4 nearly every position
    * of a natural corpus is still tied, so the refinement has no
    * leverage there, while one string rank at depth 16 settles ~95% of
    * positions in a single pass. */
  /** Window table + refined rank levels (k0..rounds) — shared between
    * the LCP walk and the cap-saturation short-circuit. `private[graft]`
    * so ScaleSpec can measure refinement depth: the per-level `tied`
    * column is the refinement's working set, and its decay at cap 1024
    * is a recorded scorecard bound. */
  private[graft] def rankStack(docs: DataFrame, idCol: String, toksCol: String,
      rounds: Int, mat: Materialize, docsPerBucket: Long)
      : (Int, DataFrame, Seq[DataFrame]) = {
    val k0 = math.min(4, rounds)
    val width = 1 << k0
    val pw = mat(positionsWindows(docs, idCol, toksCol, width, docsPerBucket))
    val rk0 = mat(GlobalRank.sparseRank(pw.select(col("gid"), col("w")),
      Seq("w"), "r", tiedOut = Some("tied"))
      .select(col("gid"), col("r"), col("tied")))
    val deeper = ((k0 + 1) to rounds).scanLeft(rk0) { (prev, k) =>
      refine(prev, 1L << (k - 1), mat)
    }
    (k0, pw, deeper)
  }

  private def adjacentLcp(docs: DataFrame, idCol: String, toksCol: String,
      rounds: Int, mat: Materialize, docsPerBucket: Long)
      : (DataFrame, DataFrame) = {
    val (k0, pw, deeper) =
      rankStack(docs, idCol, toksCol, rounds, mat, docsPerBucket)
    walkStack(k0, pw, deeper)
  }

  /** SA-adjacent pairs + LCP walk over a [[rankStack]]. */
  private def walkStack(k0: Int, pw: DataFrame, deeper: Seq[DataFrame])
      : (DataFrame, DataFrame) = {
    // order is rowNumber's zipWithIndex-backed frame: both pair sides
    // share its RDD, so no materialization barrier is needed
    val order = GlobalRank.rowNumber(deeper.last, Seq("r", "gid"), "fr")
      .select(col("gid"), col("fr"))
    val pairs = order.select(col("fr"), col("gid").as("i"))
      .join(order.select((col("fr") - 1).as("fr"), col("gid").as("j")),
        Seq("fr"))
      .select(col("i"), col("j"))
    // deep walk over the rank levels (steps 2^rounds … 2^k0), then ONE
    // window fetch closes the sub-2^k0 remainder exactly: after the
    // deep walk the remaining common prefix is < 2^k0 whenever the true
    // LCP is below cap (greedy binary decomposition — powers ≥ 2^k0 from
    // the rank levels, remainder from the token-prefix expression), and
    // any larger value already exceeds cap, which the caller clamps.
    val finished = lcpWalk(pairs, deeper, baseExp = k0)
      .join(pw.select(col("gid").as("sa_ig"), col("w").as("sa_wi")),
        col("i") + col("lcp") === col("sa_ig"), "left")
      .join(pw.select(col("gid").as("sa_jg"), col("w").as("sa_wj")),
        col("j") + col("lcp") === col("sa_jg"), "left")
      .withColumn("lcp",
        col("lcp") + prefixTokens(col("sa_wi"), col("sa_wj")))
      .drop("sa_ig", "sa_wi", "sa_jg", "sa_wj")
    (pw, finished)
  }

  def longestDupNgram(docs: DataFrame, idCol: String, toksCol: String,
      rounds: Int, mat: Materialize = Materialize.Local,
      docsPerBucket: Long = 1024L): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val cap = 1L << rounds
    val (k0, pw, deeper) =
      rankStack(docs, idCol, toksCol, rounds, mat, docsPerBucket)
    // CAP-SATURATION SHORT-CIRCUIT: a position still tied at depth cap
    // shares its full cap-window with another position, so the answer
    // is the cap and the tied set IS the occurrence set of duplicated
    // cap-grams — the whole LCP walk is unnecessary. One scalar
    // existence probe on the (already materialized) deepest level picks
    // the plan; raw corpora with whole-document copies take this path.
    val saturated =
      !deeper.last.filter(col("tied")).select(col("gid")).isEmpty
    val (maxRow, cand) = if (saturated) {
      (mat(deeper.last.limit(1).select(lit(cap).as("max_dup_len"))),
        deeper.last.filter(col("tied")).select(col("gid")))
    } else {
      val (_, walked) = walkStack(k0, pw, deeper)
      val walkedM = mat(walked.select(col("i"), col("j"), col("lcp")))
      val mr = mat(walkedM
        .agg(least(coalesce(max(col("lcp")), lit(0L)), lit(cap))
          .as("max_dup_len")))
      // gram reconstruction touches CANDIDATE positions only: an
      // occurrence of a duplicated ℓ*-gram shares its ℓ*-prefix with
      // some other suffix, so its SA-adjacent pair on that side walks
      // to lcp ≥ ℓ* — the candidate set is exactly the occurrence set,
      // and conversely every candidate's ℓ*-prefix is shared with its
      // neighbor, so no count filter is needed. The corpus-wide
      // every-position gram explode this replaces is the oracle's job.
      (mr, walkedM.crossJoin(broadcast(mr))
        .filter(col("max_dup_len") >= 1 && col("lcp") >= col("max_dup_len"))
        .select(explode(array(col("i"), col("j"))).as("gid"))
        .distinct())
    }
    val grams = cand
      .join(pw.select(col("gid"), col("doc_id"), col("pos")), Seq("gid"))
      .join(docs.select(col(idCol).cast("long").as("doc_id"),
        col(toksCol).as("toks")), Seq("doc_id"))
      .crossJoin(broadcast(maxRow))
      .filter(size(col("toks")) - col("pos") >= col("max_dup_len"))
      .select(array_join(slice(col("toks"), col("pos").cast("int") + 1,
        col("max_dup_len").cast("int")), " ").as("gram"))
    val dupAgg = grams.distinct()
      .agg(count(lit(1)).as("n_dup_grams"), min(col("gram")).as("top_gram"))
    maxRow.crossJoin(broadcast(dupAgg))
      .select(col("max_dup_len").cast("long").as("max_dup_len"),
        col("n_dup_grams"), col("top_gram"))
  }

  /** Per-document longest duplicated run, capped at 2^rounds: one row
    * `(doc_id, max_dup_len)` for EVERY input document — the length of
    * the longest token run of the doc that occurs ≥2 times corpus-wide
    * (the other occurrence anywhere: another doc, elsewhere in the same
    * doc, or self-overlapping), 0 when nothing repeats. This is the Lee
    * et al. ACL'22 per-document statistic a curation pipeline thresholds
    * to decide WHICH documents need substring-level cleaning, where
    * [[longestDupNgram]] answers the corpus-level "how long".
    *
    * Correctness rests on the suffix-array locality of best matches: the
    * longest match of the suffix at i is with an SA-ADJACENT suffix (any
    * farther pair's LCP is the min of the adjacent LCPs between them),
    * so the per-doc max over adjacent pairs touching the doc equals the
    * per-doc max over ALL pairs. Each walked pair attributes its lcp to
    * BOTH endpoint documents — one explode, one uniform gid join, one
    * per-doc max aggregate on top of the shared [[adjacentLcp]] plumbing. */
  def perDocDupRun(docs: DataFrame, idCol: String, toksCol: String,
      rounds: Int, mat: Materialize = Materialize.Local,
      docsPerBucket: Long = 1024L): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val cap = 1L << rounds
    val (pos, walked) =
      adjacentLcp(docs, idCol, toksCol, rounds, mat, docsPerBucket)
    val touched = walked.select(col("i").as("gid"), col("lcp"))
      .unionByName(walked.select(col("j").as("gid"), col("lcp")))
      .join(pos.select(col("gid"), col("doc_id")), Seq("gid"))
      .groupBy(col("doc_id"))
      .agg(least(max(col("lcp")), lit(cap)).as("dup_len"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(touched, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("dup_len"), lit(0L)).as("max_dup_len"))
  }
}
