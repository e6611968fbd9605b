package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deduplication operator family for the LLM-training-data extension
  * (brief: exact, MinHash+LSH, SimHash, n-gram Jaccard — over `documents`).
  *
  * Everything here is a pure `Column` builder over token/shingle arrays —
  * codegen'd builtins, no UDFs — parameterized by the oracle-portable
  * [[Hashing.hash31]] so the DuckDB oracle can compute bit-identical
  * signatures. Production runs can swap [[Hashing.fastHash]] in.
  *
  * Scale design (the part that matters at 100 TB):
  *   - signatures/fingerprints are narrow per-row projections — no shuffle;
  *   - near-dup candidate generation is LSH banding: explode to (band,
  *     band_hash) keys and self-join on the band key. The join shuffles on
  *     band_hash — uniformly distributed — so it parallelizes across
  *     executors; there is never an all-pairs comparison. Candidate pairs
  *     are then verified with exact Jaccard, touching only collided pairs.
  */
object Dedup {
  import Hashing.P31

  /** Distinct word n-gram shingles of a token array; arrays shorter than
    * n yield an EMPTY shingle set, matching the DuckDB twin's empty
    * `range` (Spark's `sequence(1, x)` turns DESCENDING for x < 1, which
    * would fabricate bogus window starts — the guard closes that trap). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))

  /** DuckDB spelling of [[shingles]] (1-based inclusive list slicing). */
  def shinglesSql(toks: String, n: Int): String =
    s"list_distinct(list_transform(range(1, len($toks) - ${n - 2}), " +
      s"i -> array_to_string(($toks)[i:i+${n - 1}], ' ')))"

  /** Distinct hashed word n-gram shingles from a PRE-HASHED token array:
    * shingle hash = [[Hashing.mix31]] of the n consecutive token hashes.
    * The shingle strings are never needed downstream, so this skips
    * building them just to md5 them — each token is hashed once and every
    * shingle is pure integer mixing (q41's hot path; the mix is spelled
    * identically in DuckDB via [[shingleHashesSql]], so a rare mix
    * collision is the SAME collision in both engines).
    *
    * PERF CONTRACT (same as [[minhashSig]]): `tokHashes` must be a
    * MATERIALIZED column, not an inline `transform(toks, hash)` — the n
    * `element_at`s per shingle each re-evaluate their input expression in
    * interpreted HOF mode, which would re-hash the whole token array per
    * shingle (measured 20× slower end to end). */
  def shingleHashes(tokHashes: Column, n: Int): Column =
    // short-array guard: without it the descending sequence drives
    // element_at(·, 0), which THROWS — a single sub-n document would
    // fail the whole job instead of contributing zero shingles
    when(size(tokHashes) < n, array().cast("array<long>"))
      .otherwise(array_distinct(transform(sequence(lit(1), size(tokHashes) - (n - 1)),
        i => Hashing.mix31((0 until n).map(j => element_at(tokHashes, i + j))))))

  /** Fused tokens → distinct shingle hashes in ONE native expression
    * ([[graft.plans.TokenShingleHash31]]): md5-hash31 each token once in a
    * local array, mix the windows, dedup — identical values to
    * `shingleHashes(hash31Array(toks), n)` WITHOUT the materialized
    * token-hash intermediate the two-stage chain requires (one less
    * checkpoint per index build). */
  def tokenShingleHashes(toks: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.plans.TokenShingleHash31(
      org.apache.spark.sql.GraftSqlBridge.expression(toks), n))

  def shingleHashesSql(th: String, n: Int): String =
    s"list_distinct(list_transform(range(1, len($th) - ${n - 2}), " +
      s"i -> ${Hashing.mix31Sql((0 until n).map(j => s"($th)[i + $j]"))}))"

  /** Non-distinct shingle bag (multiset features, e.g. for SimHash votes). */
  def shingleBag(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  def shingleBagSql(toks: String, n: Int): String =
    s"list_transform(range(1, len($toks) - ${n - 2}), " +
      s"i -> array_to_string(($toks)[i:i+${n - 1}], ' '))"

  /** MinHash signature: for each of k affine permutations (a_j·h + b_j) mod
    * P31, the minimum over the shingle-hash array. Returns array<long>[k].
    *
    * PERF CONTRACT: pass a MATERIALIZED hash-array column (e.g. via
    * `localCheckpoint` of the `transform(shingles, hash31)` projection),
    * not the raw hash expression — the k per-slot mins each re-evaluate
    * their input, so an inline md5 transform would be hashed k times.
    * Over stored longs each slot is pure integer math. (A single-fold
    * zip_with spelling avoids the re-evaluation but allocates two arrays
    * per element in interpreted HOF mode — measured slower end to end.) */
  def minhashSig(shingleHashes: Column, k: Int): Column =
    array(Hashing.permCoeffs(k).map { case (a, b) =>
      array_min(transform(shingleHashes, h => (lit(a) * h + lit(b)) % lit(P31)))
    }: _*)

  /** The k signature slots as DuckDB expressions over a hash-array column. */
  def minhashSigSql(hs: String, k: Int): Seq[String] =
    Hashing.permCoeffs(k).map { case (a, b) =>
      s"list_min(list_transform($hs, h -> (${a}::BIGINT * h + ${b}::BIGINT) % ${P31}::BIGINT))"
    }

  /** LSH banding: slice the signature into `bands` bands of `r` rows and
    * combine each band's slots into one key via pure integer mixing
    * ([[Hashing.mix31]] — no md5 re-hash of the already-hashed longs).
    * Returns array<struct<band:int, bh:long>> for explode + equi-join on
    * (band, bh). A mix collision only adds a candidate pair that the exact
    * verify stage rejects — correctness is unaffected. */
  def bandHashes(sig: Column, bands: Int, r: Int): Column =
    array((0 until bands).map { b =>
      val parts = (0 until r).map(i => element_at(sig, b * r + i + 1))
      struct(lit(b).as("band"), Hashing.mix31(parts).as("bh"))
    }: _*)

  /** Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  def jaccardSql(a: String, b: String): String =
    s"len(list_intersect($a, $b)) / (len($a) + len($b) - len(list_intersect($a, $b)))"

  /** 16-bit SimHash over a bag of 31-bit feature hashes: bit j is set iff
    * the ±1 votes of feature bit j sum non-negative. Multiset semantics
    * (duplicates vote repeatedly), matching the classic definition.
    * Native codegen'd single pass ([[graft.plans.SimHash16]]) — exact
    * integer equivalence with the 16-fold HOF spelling [[simhash16Hof]]
    * is proven in VectorExprsSpec. */
  def simhash16(featureHashes: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.plans.SimHash16(
      org.apache.spark.sql.GraftSqlBridge.expression(featureHashes)))

  /** The 16-fold builtin vote spelling — equivalence baseline for the
    * native expression. Same PERF CONTRACT as [[minhashSig]]: feed a
    * materialized hash column — each of the 16 per-bit votes re-evaluates
    * its input. */
  def simhash16Hof(featureHashes: Column): Column =
    (0 until 16).map { j =>
      val vote = aggregate(featureHashes, lit(0L),
        (acc, h) => acc + (shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1))
      when(vote >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  def simhash16Sql(hs: String): String =
    "CAST(" + (0 until 16).map { j =>
      s"(CASE WHEN list_sum(list_transform($hs, h -> ((h >> $j) & 1)*2 - 1)) >= 0 " +
        s"THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ") + " AS BIGINT)"

  /** Character n-gram 31-bit hashes of a string (positions 1..len-n+1).
    * Native one-pass expression ([[graft.plans.CharGramHash31]]); the HOF
    * twin [[charGramHashesHof]] stays as the equivalence baseline. Only
    * defined for strings of >= n chars (callers filter shorter). */
  def charGramHashes(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.plans.CharGramHash31(
      org.apache.spark.sql.GraftSqlBridge.expression(text), n))

  def charGramHashesHof(text: Column, n: Int): Column =
    transform(sequence(lit(1), length(text) - (n - 1)),
      i => Hashing.hash31(text.substr(i, lit(n))))

  def charGramHashesSql(text: String, n: Int): String =
    s"list_transform(range(1, length($text) - ${n - 2}), " +
      s"i -> ${Hashing.hash31Sql(s"substr($text, i, $n)")})"

  /** The full MinHash+LSH near-duplicate operator over (id, tokens):
    * shingle → hash → k-slot signature → banding → band-hash equi-join →
    * exact-Jaccard verification. Returns (doc_a, doc_b, jaccard) pairs at
    * or above `threshold`. `hashFn` picks the hash (oracle-portable
    * [[Hashing.hash31]] for checked runs, [[Hashing.fastHash]]-based for
    * production).
    *
    * Scale shape: the hash arrays are materialized once via `mat`
    * ([[Materialize.Local]] for local runs, `Persist`/`Stage` at cluster
    * scale) per the PERF CONTRACT; candidates come from a uniformly-keyed
    * equi-join, with buckets over `maxBucket` dropped (boilerplate-dup
    * skew guard). Only the HASH arrays are stored and verified against —
    * Jaccard over the distinct hash sets equals Jaccard over the shingle
    * strings for every pair both engines see identically (the hash is
    * deterministic, so even a collision is the same collision on both
    * sides), and longs intersect far cheaper than strings. */
  /** The (shingle-hash table, exploded band table) pair for a corpus —
    * `sh(doc_id, hs)` and `bands(doc_id, band, bh)`. These ARE the dedup
    * index: a production pipeline stores both and matches new data against
    * them ([[incrementalNearDup]]) instead of re-deriving the corpus side.
    * Token hashes are materialized BEFORE shingling (PERF CONTRACT on
    * [[shingleHashes]]/[[minhashSig]] — Catalyst would otherwise collapse
    * the projections and re-hash the token array once per shingle
    * element). `tokHash` maps the whole token array to its hash array:
    * oracle-portable default [[Hashing.hash31Array]]; production swap
    * `arr => transform(arr, xxhash64(_))`. */
  /** The un-materialized shingle-hash projection `(doc_id, hs)` — shared
    * by [[shingleBandIndex]] (checkpoint materialization) and
    * [[buildIndex]] (parquet staging). */
  private def shingleProjection(df: org.apache.spark.sql.DataFrame,
      idCol: String, toksCol: String, tokHash: Column => Column, n: Int,
      mat: Materialize): org.apache.spark.sql.DataFrame = {
    val filtered = df.filter(size(col(toksCol)) >= n)
    // Oracle-portable default hash → the fused single-expression path
    // (tokens → shingle hashes in one pass, no token-hash intermediate
    // to checkpoint); a custom tokHash (production xxhash64) keeps the
    // two-stage chain with the PERF-CONTRACT materialization between.
    if (tokHash eq Hashing.DefaultTokHash)
      filtered.select(col(idCol).as("doc_id"),
        tokenShingleHashes(col(toksCol), n).as("hs"))
    else {
      val th = mat(filtered
        .select(col(idCol).as("doc_id"), tokHash(col(toksCol)).as("th")))
      th.select(col("doc_id"), shingleHashes(col("th"), n).as("hs"))
    }
  }

  /** The band table derived from a (materialized or stored) shingle
    * table. */
  private def bandsFromShingles(sh: org.apache.spark.sql.DataFrame,
      k: Int, bands: Int): org.apache.spark.sql.DataFrame =
    sh.select(col("doc_id"), minhashSig(col("hs"), k).as("sig"))
      .select(col("doc_id"), explode(bandHashes(col("sig"), bands, k / bands)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))

  def shingleBandIndex(df: org.apache.spark.sql.DataFrame, idCol: String, toksCol: String,
      tokHash: Column => Column = Hashing.DefaultTokHash, n: Int = 3, k: Int = 12,
      bands: Int = 4, mat: Materialize = Materialize.Local)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val sh = mat(shingleProjection(df, idCol, toksCol, tokHash, n, mat))
    (sh, mat(bandsFromShingles(sh, k, bands)))
  }

  /** Build a corpus index DIRECTLY into its stored [[writeIndex]] layout —
    * the one-pass production spelling of `shingleBandIndex` + `writeIndex`:
    * the shingle projection streams straight into `path/shingles` (no
    * checkpoint copy first), the band table derives from the STORED
    * shingle table (so the corpus is tokenized exactly once), and the
    * manifest is written last. Returns the loaded index. */
  def buildIndex(spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame, idCol: String, toksCol: String,
      path: String, tokHash: Column => Column = Hashing.DefaultTokHash,
      n: Int = 3, k: Int = 12, bands: Int = 4,
      mat: Materialize = Materialize.Local): StoredIndex = {
    shingleProjection(df, idCol, toksCol, tokHash, n, mat)
      .write.mode("overwrite").parquet(s"$path/shingles")
    val sh = spark.read.parquet(s"$path/shingles")
    bandsFromShingles(sh, k, bands)
      .write.mode("overwrite").parquet(s"$path/bands")
    import spark.implicits._
    Seq((IndexFormatVersion, n, k, bands)).toDF("version", "n", "k", "bands")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    loadIndex(spark, path)
  }

  def nearDupPairs(df: org.apache.spark.sql.DataFrame, idCol: String, toksCol: String,
      tokHash: Column => Column = Hashing.DefaultTokHash, n: Int = 3, k: Int = 12,
      bands: Int = 4, threshold: Double = 0.5, maxBucket: Int = 1000,
      mat: Materialize = Materialize.Local): org.apache.spark.sql.DataFrame = {
    val (sh, bandsDf) = shingleBandIndex(df, idCol, toksCol, tokHash, n, k, bands, mat)
    val ok = bandsDf.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("bn")).filter(col("bn") <= maxBucket)
      .select(col("band"), col("bh"))
    // Materialized: both self-join sides read the capped table — without
    // this the bucket-count aggregate and cap join are PLANNED TWICE
    // (observed in the executed plan), once per side.
    val capped = mat(bandsDf.join(ok, Seq("band", "bh")))
    val cand = capped.as("x").join(capped.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sa = sh.select(col("doc_id").as("doc_a"), col("hs").as("sa"))
    val sb = sh.select(col("doc_id").as("doc_b"), col("hs").as("sb"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(jaccard(col("sa"), col("sb")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Substring-level exact-duplication statistics — the shingle-grained,
    * shuffle-friendly form of suffix-array substring dedup (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", ACL'22:
    * fixed-width token windows stand in for arbitrary-length repeated
    * substrings, the standard scalable approximation). A SPAN is a
    * `w`-token rolling-hash shingle, counted once per document
    * ([[tokenShingleHashes]] set semantics); a span is DUPLICATED if its
    * hash occurs in ≥ `minDocs` DISTINCT documents (internal repetition
    * within one doc does not count — that is the q77 repetition gate's
    * job). Returns `(doc_id, n_spans, n_dup_spans, dup_frac)` over the
    * distinct spans of each doc — the gate a corpus-prep pipeline uses
    * to drop or re-clean documents built from copied text.
    *
    * Relation to the EXACT per-doc statistic
    * ([[graft.ops.SuffixArray.perDocDupRun]]), asserted on planted cases
    * in DedupSimilaritySpec ("duplicateSpanStats … vs perDocDupRun"):
    * `n_dup_spans > 0` implies an exact dup run ≥ `w` (every shared
    * window IS a repeated run), but not conversely — within-doc
    * repetition raises the exact statistic while this cross-doc
    * approximation stays 0 by the `minDocs` DISTINCT-documents contract.
    *
    * Scale shape: one narrow (doc_id, h) explode (~token-count rows of
    * two longs), one partial-aggregated groupBy(h) for the cross-doc
    * distinct counts, one equi-join back on h, one groupBy(doc_id).
    * Never all-pairs, nothing on the driver; the keys are uniform
    * hashes, so none of the three shuffles skews. The span table is
    * materialized once (`mat`) because both the dup-set aggregate and
    * the join read it. */
  def duplicateSpanStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      toksCol: String, w: Int = 8, minDocs: Int = 2,
      mat: Materialize = Materialize.Local): org.apache.spark.sql.DataFrame = {
    val spans = mat(df.filter(size(col(toksCol)) >= w)
      .select(col(idCol).as("doc_id"),
        explode(tokenShingleHashes(col(toksCol), w)).as("h")))
    val dup = spans.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("h"), lit(1L).as("is_dup"))
    spans.join(dup, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_spans"))
      .withColumn("dup_frac",
        round(col("n_dup_spans").cast("double") / col("n_spans"), 6))
  }

  /** Paragraph-level exact dedup (C4 §2.2 / Dolma-style: duplicate
    * PARAGRAPHS are removed globally while their host documents survive),
    * on fixed `w`-token segments standing in for paragraphs — the
    * testdata's token streams carry no newline structure
    * (`FIXTURES.md` §8), so the segment grid is the paragraph boundary.
    *
    * An occurrence of a segment survives iff it is the FIRST occurrence
    * of that segment's content corpus-wide (order: (doc id, position) —
    * deterministic, growth-stable). Each document is then reassembled
    * from its surviving segments in position order; documents whose
    * every segment was seen earlier vanish entirely (they are exact
    * sub-duplicates), which subsumes exact doc-level dedup.
    *
    * Scale shape: explode to one row per segment (rows ≈ tokens/w), ONE
    * uniform shuffle keyed by segment hash for the keep-first rank — a
    * `row_number ≤ 1` window that [[graft.plans.RankLimitRewrite]]
    * rewrites onto the two-phase TopKPerGroup heap, so map tasks emit at
    * most one candidate per local segment hash before the exchange —
    * then one shuffle keyed by doc id to reassemble. Per-doc state is
    * bounded by document length (same bound as holding one document).
    * Never all-pairs; nothing driver-side. */
  def segmentDedup(df: org.apache.spark.sql.DataFrame, idCol: String,
      toksCol: String, w: Int = 16,
      hash: Column => Column = Hashing.hash31): org.apache.spark.sql.DataFrame = {
    require(w > 0, s"segment width must be positive, got $w")
    val toks = col(toksCol)
    // ⌈len/w⌉ segment starts; explicit empty for empty docs (sequence()
    // turns descending for stop < start — the shingles() trap again)
    val nSeg = ((size(toks) + lit(w - 1)) / lit(w)).cast("long")
    val idxs = when(size(toks) === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), nSeg.cast("int") - 1))
    val segs = df
      .select(col(idCol).as("doc_id"), nSeg.as("total_segs"),
        posexplode(transform(idxs, i => array_join(slice(toks, i * w + 1, lit(w)), " "))))
      .withColumnRenamed("pos", "seg_idx").withColumnRenamed("col", "seg")
      .withColumn("seg_h", hash(col("seg")))
    keepFirstReassemble(segs)
  }

  /** Exact-substring deduplication — the Lee et al. ACL'22 ExactSubstr
    * TRANSFORM (their `deduplicate.py`), completing the family whose
    * statistics live in [[duplicateSpanStats]] (span fractions),
    * [[graft.ops.SuffixArray.longestDupNgram]] (corpus max run) and
    * [[graft.ops.SuffixArray.perDocDupRun]] (per-doc max run): every
    * occurrence of a duplicated `L`-token run EXCEPT the corpus-first
    * one (order: (doc id, position)) is CUT from its document, and the
    * surviving tokens reassemble in order. Window granularity: each
    * sliding `L`-window whose content occurred earlier marks its L
    * positions for removal; overlapping marks merge, so a duplicated
    * run of ANY length ≥ L is cut as one span on later occurrences
    * while the first occurrence survives untouched. Fully-duplicated
    * documents come back with empty text (n_removed = n_tokens) —
    * sliding windows make this shift-robust where [[segmentDedup]]'s
    * fixed grid is not.
    *
    * Returns `(doc_id, n_tokens, n_removed, text)` for EVERY input doc.
    *
    * Window identity is decided by HASH equality alone (gram content is
    * never re-compared — carrying the L-token gram text through the
    * shuffle would multiply the exploded stream's payload by L), so the
    * hash width bounds the silent-miscut risk: the default is the 60-bit
    * [[Hashing.hash60]] (still DuckDB-portable), for which the birthday
    * bound keeps the expected number of colliding window pairs below one
    * up to ~10^9 distinct windows — a 31-bit hash crosses that line at
    * ~10^5, i.e. within a single large document. At 100 TB pass
    * `hash = xxhash64-based` (64-bit) the same way.
    *
    * Scale shape: one window explode (O(n) rows of (doc, pos, hash) —
    * never the O(n·L) covered-position explode the oracle spells);
    * first-occurrence detection is a map-side-combinable `min(struct)`
    * per window hash (NOT a rank window partitioned by hash — a
    * boilerplate window duplicated millions of times would funnel its
    * whole group through one rank task, while the aggregate collapses
    * it to one row; the join back on the hash is the one skew point,
    * split by AQE); interval merging is the gaps-and-islands window
    * per DOCUMENT over removed intervals only (bounded by doc length);
    * reassembly filters each doc's token array against its own merged
    * spans — per-row HOF work, one doc-keyed shuffle. */
  def exactSubstrDedup(df: org.apache.spark.sql.DataFrame, idCol: String,
      toksCol: String, L: Int = 16,
      hash: Column => Column = Hashing.hash60): org.apache.spark.sql.DataFrame = {
    require(L > 0, s"window length must be positive, got $L")
    val win = org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).cast("long").as("doc_id"),
      col(toksCol).as("toks"))
    val starts = when(size(col("toks")) < L, array().cast("array<int>"))
      .otherwise(sequence(lit(0), size(col("toks")) - L))
    val wins = base.select(col("doc_id"),
        explode(transform(starts, ws => struct(ws.as("ws"),
          hash(array_join(slice(col("toks"), ws + 1, lit(L)), " ")).as("h"))))
          .as("w"))
      .select(col("doc_id"), col("w.ws").as("ws"), col("w.h").as("h"))
    val firsts = wins.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("ws"))).as("f"),
        count(lit(1)).as("esd_c"))
    val removed = wins.join(firsts, Seq("h"))
      .filter(col("esd_c") >= 2 &&
        !(col("doc_id") === col("f.doc_id") && col("ws") === col("f.ws")))
      .select(col("doc_id"), col("ws").as("s"), (col("ws") + (L - 1)).as("e"))
    val wDoc = win.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
    val spans = removed
      .withColumn("esd_maxe",
        max(col("e")).over(wDoc.rowsBetween(win.unboundedPreceding, -1)))
      .withColumn("esd_new",
        when(col("esd_maxe").isNull || col("s") > col("esd_maxe"), 1)
          .otherwise(0))
      .withColumn("esd_isl", sum(col("esd_new")).over(
        wDoc.rowsBetween(win.unboundedPreceding, win.currentRow)))
      .groupBy(col("doc_id"), col("esd_isl"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("ivs"))
    base.join(spans, Seq("doc_id"), "left")
      .withColumn("ivs",
        coalesce(col("ivs"), array().cast("array<struct<s:int,e:int>>")))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        filter(col("toks"), (_, i) =>
          !exists(col("ivs"), iv =>
            i >= iv.getField("s") && i <= iv.getField("e"))).as("esd_kept"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - size(col("esd_kept"))).cast("long").as("n_removed"),
        array_join(col("esd_kept"), " ").as("text"))
  }

  /** Shared tail of [[segmentDedup]] and [[contentChunkDedup]]: global
    * keep-first on segment hash (first occurrence by (doc id, position)
    * survives — the RankLimitRewrite `row_number ≤ 1` path) and
    * position-order reassembly per document. Input contract:
    * `(doc_id, total_segs, seg_idx, seg, seg_h)`. */
  private def keepFirstReassemble(
      segs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("seg_h")).orderBy(col("doc_id"), col("seg_idx"))
    segs.withColumn("sd_rn", row_number().over(win))
      .filter(col("sd_rn") === 1)
      .groupBy(col("doc_id"))
      .agg(max(col("total_segs")).as("total_segs"),
        count(lit(1)).as("kept_segs"),
        array_join(transform(
          array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
          s => s.getField("seg")), " ").as("text"))
  }

  /** Content-defined chunking dedup — the shift-robust refinement of
    * [[segmentDedup]] (LBFS, Muthitacharoen et al. SOSP'01; FastCDC,
    * Xia et al. ATC'16): segment boundaries come from the CONTENT (cut
    * after token `i+w−1` whenever the hash of the `w`-token window at
    * `i` falls in the `% every == 0` residue class) instead of a fixed
    * grid, so inserting one token near a document's head shifts every
    * grid segment but leaves all content-defined boundaries beyond the
    * edit untouched — the duplicated tail still dedups. Expected segment
    * length ≈ `every` tokens; same keep-first global semantics and
    * reassembly contract as [[segmentDedup]] (first occurrence by
    * (doc id, position) survives; fully-duplicate documents vanish).
    *
    * Scale shape: identical to [[segmentDedup]] — the boundary pass is
    * per-row array arithmetic (no shuffle), then one uniform shuffle on
    * segment hash for the keep-first rank (RankLimitRewrite → two-phase
    * heap) and one on doc id to reassemble. The window hash is injectable
    * like every dedup hash here: [[Hashing.hash31]] when oracle-compared,
    * xxhash64 for pure-Spark production runs. */
  def contentChunkDedup(df: org.apache.spark.sql.DataFrame, idCol: String,
      toksCol: String, w: Int = 4, every: Int = 16,
      hash: Column => Column = Hashing.hash31): org.apache.spark.sql.DataFrame = {
    require(w > 0, s"window must be positive, got $w")
    require(every > 1, s"boundary modulus must exceed 1, got $every")
    val tk = col(toksCol)
    // window hashes at 1-based starts 1..len-w+1; both `when` guards dodge
    // Spark's descending-sequence trap (sequence(1, 0) counts DOWN)
    val wh = when(size(tk) < w, array().cast("array<long>"))
      .otherwise(transform(sequence(lit(1), size(tk) - lit(w - 1)),
        i => hash(concat_ws(" ", slice(tk, i, lit(w))))))
    val base = df.filter(size(tk) >= 1)
      .select(col(idCol).as("doc_id"), tk.as("cdc_tk"), wh.as("cdc_wh"))
    val cuts = when(size(col("cdc_wh")) === 0, array().cast("array<int>"))
      .otherwise(filter(sequence(lit(1), size(col("cdc_wh"))),
        i => element_at(col("cdc_wh"), i) % every === 0 &&
          (i + lit(w - 1)) < size(col("cdc_tk"))))
    val bounds = concat(array(lit(0)),
      transform(cuts, i => i + lit(w - 1)), array(size(col("cdc_tk"))))
    val segs = base.withColumn("cdc_b", bounds)
      .select(col("doc_id"), (size(col("cdc_b")) - 1).cast("long").as("total_segs"),
        posexplode(transform(sequence(lit(1), size(col("cdc_b")) - 1),
          k => concat_ws(" ", slice(col("cdc_tk"),
            element_at(col("cdc_b"), k) + 1,
            element_at(col("cdc_b"), k + 1) - element_at(col("cdc_b"), k))))))
      .withColumnRenamed("pos", "seg_idx").withColumnRenamed("col", "seg")
      .withColumn("seg_h", hash(col("seg")))
    keepFirstReassemble(segs)
  }

  /** DuckDB twin of the [[contentChunkDedup]] segment expansion: CTE body
    * producing (doc_id, n_total, seg_idx, seg) from a `tok(doc_id, toks)`
    * relation — pair with the identical keep-first window + reassembly.
    * Boundary arithmetic mirrors the Spark spelling node for node
    * ([[Hashing.hash31Sql]] window hashes, cut after `i+w−1` on the
    * `% every == 0` class, never at the document end). */
  def contentChunksSql(w: Int, every: Int): String = {
    val winHash = Hashing.hash31Sql(s"array_to_string(toks[i:i+${w - 1}], ' ')")
    s"""cdc0 AS (SELECT doc_id, toks,
       |    CASE WHEN len(toks) >= $w THEN
       |      list_transform(range(1, len(toks) - ${w - 2}), i -> $winHash)
       |    ELSE CAST([] AS BIGINT[]) END AS wh
       |  FROM tok WHERE len(toks) >= 1),
       |cdc1 AS (SELECT doc_id, toks,
       |    [CAST(0 AS BIGINT)] ||
       |    list_transform(list_filter(range(1, len(wh) + 1),
       |      i -> wh[i] % $every = 0 AND i + ${w - 1} < len(toks)),
       |      i -> i + ${w - 1}) || [len(toks)] AS b
       |  FROM cdc0),
       |seg0 AS (SELECT doc_id, len(b) - 1 AS n_total,
       |    list_transform(range(len(b) - 1),
       |      k -> struct_pack(seg_idx := k,
       |             seg := array_to_string(toks[b[k + 1] + 1:b[k + 2]], ' '))) AS pairs
       |  FROM cdc1),
       |seg AS (SELECT doc_id, n_total, unnest(pairs, recursive := true) FROM seg0)""".stripMargin
  }

  /** DuckDB twin of the [[segmentDedup]] segment expansion: CTE body
    * producing (doc_id, seg_idx, seg, n_total) from a `tok(doc_id, toks)`
    * relation — pair with the identical keep-first window + reassembly. */
  def segmentsSql(w: Int): String =
    s"""seg0 AS (SELECT doc_id,
       |    CAST((len(toks) + ${w - 1}) // $w AS BIGINT) AS n_total,
       |    list_transform(range((len(toks) + ${w - 1}) // $w),
       |      i -> struct_pack(seg_idx := i,
       |             seg := array_to_string(toks[(i*$w+1):(i*$w+$w)], ' '))) AS pairs
       |  FROM tok),
       |seg AS (SELECT doc_id, n_total, unnest(pairs, recursive := true) FROM seg0)""".stripMargin

  /** Incremental near-dup: match a NEW batch of documents against an
    * already-indexed corpus — the ingestion shape at 100 TB, where the
    * corpus index ([[shingleBandIndex]]: shingle-hash + band tables) is
    * stored once and each arriving batch probes it, instead of
    * re-running the corpus×corpus self-join per batch. Returns one row
    * per DUPLICATE batch doc: `(batch_id, dup_of, jaccard)` with the best
    * corpus match (max jaccard, ties to min corpus id); batch docs with
    * no match at `threshold` are absent (the caller anti-joins to keep
    * them).
    *
    * Scale shape: the probe is an equi-join on (band, band-hash) between
    * the small batch band table and the corpus index — broadcast the
    * batch side when it fits (`broadcastBatch`, default true: a batch is
    * ordinarily orders of magnitude smaller than the corpus), making the
    * whole match a map-side pass over the index with NO corpus shuffle.
    * Hot corpus bands (boilerplate) are capped at `maxBucket` like
    * [[nearDupPairs]]. Exact-Jaccard verification touches only collided
    * pairs. */
  def incrementalNearDup(corpus: org.apache.spark.sql.DataFrame,
      batch: org.apache.spark.sql.DataFrame, idCol: String, toksCol: String,
      tokHash: Column => Column = Hashing.DefaultTokHash, n: Int = 3, k: Int = 12,
      bands: Int = 4, threshold: Double = 0.5, maxBucket: Int = 1000,
      broadcastBatch: Boolean = true,
      mat: Materialize = Materialize.Local): org.apache.spark.sql.DataFrame = {
    val (csh, cbands) = shingleBandIndex(corpus, idCol, toksCol, tokHash, n, k, bands, mat)
    probeIndex(csh, cbands, batch, idCol, toksCol, tokHash, n, k, bands,
      threshold, maxBucket, broadcastBatch, mat)
  }

  /** [[incrementalNearDup]] against a PREBUILT corpus index — the repeated-
    * ingestion entry point: build ([[shingleBandIndex]]) or load the
    * (shingle-hash, band) tables once, then probe them per batch / per
    * micro-batch ([[graft.streaming.DocIngest]]) without recomputing the
    * corpus side. */
  def probeIndex(csh: org.apache.spark.sql.DataFrame,
      cbands: org.apache.spark.sql.DataFrame,
      batch: org.apache.spark.sql.DataFrame, idCol: String, toksCol: String,
      tokHash: Column => Column = Hashing.DefaultTokHash, n: Int = 3, k: Int = 12,
      bands: Int = 4, threshold: Double = 0.5, maxBucket: Int = 1000,
      broadcastBatch: Boolean = true,
      mat: Materialize = Materialize.Local): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (bsh, bbandsRaw) = shingleBandIndex(batch, idCol, toksCol, tokHash, n, k, bands, mat)
    val ok = cbands.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("bn")).filter(col("bn") <= maxBucket)
      .select(col("band"), col("bh"))
    val capped = cbands.join(ok, Seq("band", "bh"))
    val bbands = if (broadcastBatch) broadcast(bbandsRaw) else bbandsRaw
    val cand = bbands.select(col("doc_id").as("batch_id"), col("band"), col("bh"))
      .join(capped.select(col("doc_id").as("corpus_id"), col("band"), col("bh")),
        Seq("band", "bh"))
      .select(col("batch_id"), col("corpus_id")).distinct()
    val verified = cand
      .join(bsh.select(col("doc_id").as("batch_id"), col("hs").as("bs")), "batch_id")
      .join(csh.select(col("doc_id").as("corpus_id"), col("hs").as("cs")), "corpus_id")
      .select(col("batch_id"), col("corpus_id"),
        round(jaccard(col("bs"), col("cs")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    val best = Window.partitionBy(col("batch_id"))
      .orderBy(col("jaccard").desc, col("corpus_id"))
    verified.withColumn("rn", row_number().over(best)).filter(col("rn") === 1)
      .select(col("batch_id"), col("corpus_id").as("dup_of"), col("jaccard"))
  }

  // ---- persisted index lifecycle (the production ingestion shape) ----

  /** Index format version written by [[writeIndex]] / required by
    * [[loadIndex]]. Bump on any change to the shingle/band table schemas
    * or hashing so an old stored index fails FAST at load instead of
    * silently matching nothing. */
  val IndexFormatVersion = 1

  /** A [[shingleBandIndex]] loaded from disk, with the signature
    * parameters it was built with — probe with THESE (n, k, bands), not
    * the caller's defaults: mismatched parameters produce disjoint band
    * hashes and a probe that silently finds no duplicates. */
  final case class StoredIndex(shingles: org.apache.spark.sql.DataFrame,
      bands: org.apache.spark.sql.DataFrame, n: Int, k: Int, bandCount: Int)

  /** Persist a built [[shingleBandIndex]] as two parquet tables plus a
    * one-row version/params manifest — the 100 TB lifecycle: the corpus
    * index is built ONCE, stored, and every later ingestion run (batch
    * [[probeIndex]] or the streaming gate
    * [[graft.streaming.DocIngest]]) loads and probes it with zero corpus
    * recompute. */
  def writeIndex(csh: org.apache.spark.sql.DataFrame,
      cbands: org.apache.spark.sql.DataFrame, path: String,
      n: Int = 3, k: Int = 12, bands: Int = 4): Unit = {
    csh.write.mode("overwrite").parquet(s"$path/shingles")
    cbands.write.mode("overwrite").parquet(s"$path/bands")
    val spark = csh.sparkSession
    import spark.implicits._
    Seq((IndexFormatVersion, n, k, bands)).toDF("version", "n", "k", "bands")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Fold a NEW batch of documents into a stored [[writeIndex]] layout —
    * the cadence step of the ingestion lifecycle: probe batches against
    * the index ([[probeIndex]] / [[graft.streaming.DocIngest]]), keep the
    * clean ones, then append THEIR signatures so later batches dedup
    * against them too. Signature parameters come from the manifest (never
    * the caller — mismatched params would write unfindable rows), and the
    * append touches only the new docs: O(batch), no corpus recompute.
    * Caller contract: don't append the same doc_id twice (the index
    * stores it twice and probes return duplicate candidates). */
  def appendToIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      newDocs: org.apache.spark.sql.DataFrame, idCol: String, toksCol: String,
      tokHash: Column => Column = Hashing.DefaultTokHash,
      mat: Materialize = Materialize.Local): Unit = {
    val ix = loadIndex(spark, path) // validates the format version
    val (sh, bands) = shingleBandIndex(newDocs, idCol, toksCol, tokHash,
      ix.n, ix.k, ix.bandCount, mat)
    sh.write.mode("append").parquet(s"$path/shingles")
    bands.write.mode("append").parquet(s"$path/bands")
  }

  /** Load a [[writeIndex]] layout, failing fast on a format-version
    * mismatch. */
  def loadIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): StoredIndex = {
    val m = spark.read.parquet(s"$path/meta")
      .select("version", "n", "k", "bands").head()
    require(m.getInt(0) == IndexFormatVersion,
      s"stored index at $path has format version ${m.getInt(0)}; " +
        s"this build reads version $IndexFormatVersion — rebuild the index")
    StoredIndex(spark.read.parquet(s"$path/shingles"),
      spark.read.parquet(s"$path/bands"), m.getInt(1), m.getInt(2), m.getInt(3))
  }

  /** Connected components over an undirected pair list — the cluster
    * assignment a dedup pipeline runs AFTER pair generation
    * ([[nearDupPairs]]): near-duplication is transitive in intent (A≈B and
    * B≈C ⇒ keep one of {A,B,C}) even when A and C themselves fall below
    * the pair threshold, so pairs must be closed into groups before
    * keep-one selection. Returns `(node, cluster_id)` where `cluster_id`
    * is the MINIMUM node id of the component — the deterministic "keep
    * the first copy" representative.
    *
    * Algorithm: distributed min-label propagation — each round every node
    * takes the min of its own label and its neighbors' labels (one
    * equi-join on node id + one min-aggregate per round), until a round
    * changes nothing. Converges in O(component diameter) rounds; dedup
    * components are near-stars/cliques (a duplicate matches most of its
    * group), so 2–4 rounds in practice. For adversarially path-shaped
    * graphs the large-star/small-star rewiring (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) brings
    * rounds to O(log n); the simple fixpoint is kept here because dedup
    * graphs are shallow by construction and each extra round is one
    * cheap shuffle of (node, label) pairs — never the documents.
    *
    * Scale shape: edges are materialized once and labels re-materialized
    * per round via `mat`, cutting the iterative lineage (the classic
    * iterative-plan blowup); every shuffle is keyed on node id. The
    * convergence check is one count per round over the label join. */
  def connectedComponents(pairs: org.apache.spark.sql.DataFrame,
      aCol: String, bCol: String, mat: Materialize = Materialize.Local,
      maxRounds: Int = 50): org.apache.spark.sql.DataFrame = {
    val sym = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
    val edges = mat(sym.distinct())
    // Initialize each node at min(self, neighbors) — the first propagation
    // round fused into one aggregation (no join, same node-keyed shuffle).
    // Stars and cliques — the common dedup components — converge HERE, so
    // the loop below only runs its one confirming round for them.
    var labels = mat(edges.groupBy("dst").agg(min("src").as("m"))
      .select(col("dst").as("node"), least(col("dst"), col("m")).as("lbl")))
    // Convergence via a content signature instead of a per-round join:
    // the node set is fixed and each node carries exactly one label, so
    // the label table changed iff the XOR of per-row hashes changed
    // (rows are unique (node, lbl) pairs, so the XOR is a set signature;
    // a missed change needs a 2^-64 hash coincidence). XOR — unlike a
    // long SUM of labels — cannot overflow (no ANSI throw, no silent
    // wrap-to-equal at extreme scale). One partial-aggregated scalar per
    // round (no shuffle) replaces the old labels⋈next changed-count
    // join, which shuffled both label tables every round.
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(col("node"), col("lbl")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var prev = sig(labels)
    var done = prev._1 == 0L // no edges → nothing to propagate
    var round = 0
    while (!done && round < maxRounds) {
      val viaNeighbor = edges.join(labels, edges("src") === labels("node"))
        .select(edges("dst").as("node"), labels("lbl"))
      val next = mat(labels.unionByName(viaNeighbor)
        .groupBy("node").agg(min("lbl").as("lbl")))
      val cur = sig(next)
      labels = next
      if (cur == prev) done = true else prev = cur
      round += 1
    }
    require(done, s"connectedComponents did not converge in $maxRounds rounds")
    labels.select(col("node"), col("lbl").as("cluster_id"))
  }

  /** Connected components by alternating large-star / small-star edge
    * rewiring (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — same contract as [[connectedComponents]]
    * (`(node, cluster_id = component min)`), but O(log n) rounds on ANY
    * graph shape versus min-label propagation's O(diameter). Use this
    * when components can be deep (chained near-duplicates: A≈B≈C≈…,
    * each link above threshold, endpoints unrelated) — a 10k-long chain
    * converges in ~a dozen rounds here and would time out the label
    * propagator. Per round: two node-keyed aggregations + two joins over
    * the CURRENT edge set, which contracts toward one star per
    * component.
    *
    *  - large-star(u): attach every neighbor LARGER than u to the
    *    minimum of u's closed neighborhood — long tails fold in half;
    *  - small-star(u): attach u and its smaller neighbors to their
    *    minimum — stars flatten onto the root.
    *
    * Fixpoint = the edge set stops changing; it is then a union of
    * depth-1 stars rooted at each component's min node. */
  def connectedComponentsStar(pairs: org.apache.spark.sql.DataFrame,
      aCol: String, bCol: String, mat: Materialize = Materialize.Local,
      maxRounds: Int = 30): org.apache.spark.sql.DataFrame = {
    // canonical (hi > lo) edges
    var edges = mat(pairs
      .select(greatest(col(aCol), col(bCol)).as("hi"),
        least(col(aCol), col(bCol)).as("lo"))
      .filter(col("hi") =!= col("lo")).distinct())
    var done = false
    var round = 0
    // one scalar-aggregate job per round: the edge table is a DISTINCT
    // set, so (count, XOR of per-row xxhash64) is a set signature —
    // unchanged iff the edge set is unchanged (2^-64 coincidence risk),
    // exactly the [[connectedComponents]] convergence scheme. Replaces
    // the old count + exceptAll-subset probe (a join job on every
    // count-equal round); XOR cannot overflow, so no ANSI throw and no
    // silent wrap at any scale.
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(col("hi"), col("lo")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var edgeSig = sig(edges)
    done = edgeSig._1 == 0L
    while (!done && round < maxRounds) {
      val sym = edges.select(col("hi").as("u"), col("lo").as("v"))
        .unionByName(edges.select(col("lo").as("u"), col("hi").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      // NOT distinct'd: duplicate (hi, lo) rows here only produce
      // duplicate rows in `next`, which IS distinct'd — skipping the
      // intermediate dedup saves one full shuffle per round
      val large = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo")) // v > u ≥ m
        .filter(col("hi") =!= col("lo"))
      val smins = large.groupBy("hi").agg(min(col("lo")).as("m"))
      val withS = large.join(smins, "hi")
      val next = mat(withS.select(col("hi"), col("m").as("lo"))
        .unionByName(withS.filter(col("lo") =!= col("m"))
          .select(col("lo").as("hi"), col("m").as("lo")))
        .distinct())
      val nextSig = sig(next)
      if (nextSig == edgeSig) done = true
      else { edges = next; edgeSig = nextSig }
      round += 1
    }
    require(done, s"connectedComponentsStar did not converge in $maxRounds rounds")
    edges.select(col("hi").as("node"), col("lo").as("cluster_id"))
      .unionByName(edges.select(col("lo").as("node"), col("lo").as("cluster_id"))
        .distinct())
      .distinct()
  }

  /** Benchmark decontamination: flag corpus documents that share any word
    * n-gram with a held-out test set — the standard train/test overlap
    * check an LLM training pipeline runs before a corpus ships (n-gram
    * collision against eval benchmarks, e.g. the 13-gram check of Brown
    * et al., "Language Models are Few-Shot Learners", NeurIPS'20 §4).
    *
    * Returns `(idCol, shared)` for contaminated documents only, where
    * `shared` counts the DISTINCT offending n-grams — the triage signal
    * (1 shared 8-gram = likely a stock phrase; dozens = an embedded copy
    * of a test item).
    *
    * Scale shape: the test set is benchmark-sized by contract →
    * its distinct shingle hashes BROADCAST onto the exploded corpus
    * shingles, so the corpus is one scan + one doc-keyed aggregation of
    * the (rare) matching rows. Never all-pairs, and the corpus side never
    * shuffles its shingles — only hits reach the exchange. Shingles are
    * hashed ([[shingleHashes]]) so the broadcast is fixed-width longs; a
    * mix collision can only ADD a flagged gram, and the identical
    * spelling in the oracle ([[shingleHashesSql]]) makes it the same
    * collision in both engines. */
  def decontaminate(corpus: org.apache.spark.sql.DataFrame,
      testSet: org.apache.spark.sql.DataFrame, idCol: String, toksCol: String,
      n: Int = 8): org.apache.spark.sql.DataFrame = {
    def sh(df: org.apache.spark.sql.DataFrame) = df.select(col(idCol),
      explode(tokenShingleHashes(col(toksCol), n)).as("sh"))
    val testSh = sh(testSet).select(col("sh")).distinct()
    sh(corpus).join(broadcast(testSh), "sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("shared")) // shingle hashes are pre-distinct per doc
  }

  /** Pairwise cross-corpus overlap matrix: for every pair of groups
    * (sources/splits/snapshots), how many DISTINCT token n-gram
    * fingerprints they share, and the containment ratio
    * `shared / min(|grams_a|, |grams_b|)` — the dataset-level
    * contamination report ([[decontaminate]] answers "which documents";
    * this answers "which SOURCES leak into each other", the audit a
    * mixture design reads before weighting corpora).
    *
    * Returns `(group_a, group_b, shared, grams_a, grams_b, containment)`
    * for unordered pairs (group_a < group_b) with shared > 0.
    *
    * Scale shape: one distinct over (group, shingle-hash) — shuffle ∝
    * distinct grams, the corpus never moves — then ONE groupBy(sh)
    * collecting the ≤|groups| group-set per fingerprint, and pair counts
    * emitted by exploding each set's combinations: S groups yield
    * ≤ S(S−1)/2 rows per shared fingerprint, NO sh-keyed self-join (a
    * join spelling fans the same pairs out of a wider exchange; the
    * collect_set spelling caps per-key state at S, which is dozens while
    * fingerprints are billions). The group-count join at the end is
    * groups-sized — broadcast. */
  def crossOverlap(docs: org.apache.spark.sql.DataFrame, groupCol: String,
      toksCol: String, n: Int = 8): org.apache.spark.sql.DataFrame = {
    val sh = docs.select(col(groupCol).as("g"),
        explode(tokenShingleHashes(col(toksCol), n)).as("sh"))
      .distinct()
    val grams = sh.groupBy(col("g")).agg(count(lit(1)).as("grams"))
    val combos = sh.groupBy(col("sh"))
      .agg(sort_array(collect_set(col("g"))).as("gs"))
      .filter(size(col("gs")) > 1)
      .select(explode(flatten(transform(col("gs"), (a, i) =>
        transform(slice(col("gs"), i + lit(2), size(col("gs"))),
          b => struct(a.as("ga"), b.as("gb")))))).as("p"))
      .groupBy(col("p.ga").as("group_a"), col("p.gb").as("group_b"))
      .agg(count(lit(1)).as("shared"))
    combos
      .join(broadcast(grams).withColumnRenamed("g", "group_a")
        .withColumnRenamed("grams", "grams_a"), "group_a")
      .join(broadcast(grams).withColumnRenamed("g", "group_b")
        .withColumnRenamed("grams", "grams_b"), "group_b")
      .select(col("group_a"), col("group_b"), col("shared"),
        col("grams_a"), col("grams_b"),
        round(col("shared") / least(col("grams_a"), col("grams_b")), 6)
          .as("containment"))
  }

  /** Token-level deletion-neighborhood keys for [[fuzzyJoin]] (FastSS,
    * Bocek et al. 2007, "Fast Similarity Search in Large and Sparse
    * Dictionaries"): the hash of the token sequence itself plus the hash
    * of every leave-one-out subsequence. Two strings within one token
    * edit (substitute / insert / delete) share at least one key. */
  def deletionKeys(toks: Column): Column =
    array_distinct(transform(sequence(lit(0), size(toks)),
      i => Hashing.hash31(when(i === 0, concat_ws(" ", toks))
        .otherwise(concat_ws(" ", concat(
          slice(toks, lit(1), i - 1),
          slice(toks, i + 1, size(toks) - i)))))))

  /** DuckDB spelling of [[deletionKeys]]; COALESCE because DuckDB's
    * array_to_string of an EMPTY list is NULL where Spark's concat_ws
    * is ''. */
  def deletionKeysSql(toks: String): String = {
    val joined = s"COALESCE(array_to_string(CASE WHEN i = 0 THEN $toks " +
      s"ELSE list_concat(($toks)[1:i - 1], ($toks)[i + 1:len($toks)]) END, ' '), '')"
    s"list_distinct(list_transform(range(0, len($toks) + 1), " +
      s"i -> ${Hashing.hash31Sql(joined)}))"
  }

  /** Blocked fuzzy string self-join — entity resolution over a name-like
    * column: candidate pairs share a [[deletionKeys]] block (≤ one token
    * edit apart), then verify with CHARACTER-level Levenshtein ≤
    * `maxDist`. Returns `(id_a, id_b, dist)`, id_a < id_b.
    *
    * Scale shape: exactly the LSH-band pattern — keys are a narrow
    * (n+1)-per-row explode, the join shuffles on the block key only,
    * `maxBucket` caps degenerate blocks (stopword-like tokens shared by
    * everything), and verification touches candidates only. NEVER
    * all-pairs: without a shared block no pair is ever considered (the
    * method's documented recall bound: > 1 token edit needs a fuzzier
    * blocker, e.g. the MinHash bands of [[nearDupPairs]]). */
  def fuzzyJoin(df: org.apache.spark.sql.DataFrame, idCol: String,
      strCol: String, maxDist: Int,
      maxBucket: Int = 1000): org.apache.spark.sql.DataFrame = {
    val keyed = df.select(col(idCol), col(strCol),
      explode(deletionKeys(filter(split(col(strCol), " "), t => t =!= "")))
        .as("blk"))
    val ok = keyed.groupBy(col("blk")).agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= maxBucket).select(col("blk"))
    val capped = keyed.join(ok, "blk")
    val cand = capped.select(col("blk"), col(idCol).as("id_a"), col(strCol).as("sa"))
      .join(capped.select(col("blk"), col(idCol).as("id_b"), col(strCol).as("sb")),
        Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sa"), col("sb")).distinct()
    cand.select(col("id_a"), col("id_b"),
        levenshtein(col("sa"), col("sb")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** Winnowing fingerprint (Schleimer et al., SIGMOD'03): the distinct
    * per-window minima of the gram-hash sequence, window size w. A document
    * sketch robust to local edits — the rolling-hash fingerprint the brief
    * asks for. Native monotonic-deque pass, O(len)
    * ([[graft.plans.WinnowMin]]); HOF twin [[winnowFingerprintsHof]] is
    * the O(len·w) equivalence baseline. */
  def winnowFingerprints(gramHashes: Column, w: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.plans.WinnowMin(
      org.apache.spark.sql.GraftSqlBridge.expression(gramHashes), w))

  def winnowFingerprintsHof(gramHashes: Column, w: Int): Column =
    when(size(gramHashes) < w, array().cast("array<long>"))
      .otherwise(array_distinct(transform(sequence(lit(1), size(gramHashes) - (w - 1)),
        i => array_min(slice(gramHashes, i, lit(w))))))

  def winnowFingerprintsSql(grams: String, w: Int): String =
    s"list_distinct(list_transform(range(1, len($grams) - ${w - 2}), " +
      s"i -> list_min(($grams)[i:i+${w - 1}])))"
}
