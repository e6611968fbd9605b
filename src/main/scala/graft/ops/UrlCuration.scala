package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/domain-level curation — the stage between HTML extraction
  * ([[TextExtract]]) and content quality gates in a web-crawl pipeline
  * (the RefinedWeb/C4 shape: URL canonicalization, then a PER-DOMAIN
  * FREQUENCY CAP so boilerplate-heavy mega-domains can't dominate the
  * training mixture).
  *
  * All pure Column expressions (regex extraction — deliberately NOT
  * `parse_url`, whose expression is non-codegen and has no DuckDB
  * twin), so every operator has an exact oracle spelling and runs
  * inside whole-stage codegen.
  *
  * Scale shape: host/domain extraction is per-row projection at scan
  * speed; the cap is ONE shuffle by domain feeding a rank-limit window
  * that [[graft.plans.TopKPerGroup]]'s rewrite lowers onto the
  * two-phase (map-side partial) heap operator under the session
  * extensions — a hot domain's millions of rows reduce to `cap` per
  * map task before the exchange, so domain skew never concentrates on
  * one reducer. */
object UrlCuration {

  /** Lowercased host of a URL, `www.`-stripped; null on strings that
    * don't parse as `scheme://[user@]host…`. Userinfo and port are
    * excluded from the host. */
  def urlHost(url: Column): Column = {
    val h = lower(regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1))
    when(h === "", lit(null)).otherwise(regexp_replace(h, "^www\\.", ""))
  }

  /** The DuckDB spelling of [[urlHost]] over column `col`. */
  def urlHostSql(col: String): String =
    s"CASE WHEN lower(regexp_extract($col, " +
      s"'^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1)) = ''" +
      s" THEN NULL ELSE regexp_replace(lower(regexp_extract($col, " +
      s"'^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1)), " +
      s"'^www\\.', '') END"

  /** Registrable domain of a host — last two labels. A deliberate
    * public-suffix-list-less heuristic (exact PSL handling is a data
    * file, not an algorithm); wrong only for multi-label public
    * suffixes (`*.co.uk`), where it is conservatively COARSER — a
    * frequency cap keyed on a coarser domain only tightens. Hosts
    * without a dot (localhost, IPs are out of scope) pass through. */
  def registrableDomain(host: Column): Column =
    when(host.isNull, lit(null)).otherwise(
      coalesce(nullif(regexp_extract(host, "([^.]+\\.[^.]+)$", 1), lit("")),
        host))

  /** The DuckDB spelling of [[registrableDomain]] over `col`. */
  def registrableDomainSql(col: String): String =
    s"CASE WHEN $col IS NULL THEN NULL ELSE coalesce(nullif(" +
      s"regexp_extract($col, '([^.]+\\.[^.]+)$$', 1), ''), $col) END"

  /** Deepest public suffix the PSL-backed matcher tests (real PSL rules
    * top out at 4 labels). */
  private val MaxSuffixLabels = 4

  /** PSL-BACKED registrable domain: the longest entry of
    * `publicSuffixes` that is a proper label-suffix of the host, plus
    * one label — `a.b.co.uk` with `co.uk` listed → `b.co.uk`. Hosts
    * matching no entry fall back to the last-two-labels heuristic
    * ([[registrableDomain]]), so an EMPTY list reproduces it exactly
    * (the no-data default).
    *
    * Pure Column logic: label-suffix candidates (≤ 4 labels, the real
    * PSL's depth) probe the suffix set via `isin`, which Catalyst
    * compiles to an O(1) hashed `InSet` per row — no UDF, no join, no
    * shuffle; a 9k-rule PSL rides the plan as one broadcast-sized
    * literal set. Wildcard (`*.ck`) and exception (`!www.ck`) rules are
    * NOT modeled ([[loadPublicSuffixes]] drops them): for the
    * frequency-cap use the divergence only shifts CAP KEYS — a missing
    * wildcard rule makes the key one label coarser (the cap tightens,
    * never leaks), the same direction as the no-data heuristic's
    * multi-label blindness. */
  def registrableDomain(host: Column, publicSuffixes: Seq[String]): Column = {
    if (publicSuffixes.isEmpty) return registrableDomain(host)
    val suffixes = publicSuffixes.map(_.toLowerCase)
    val labels = split(host, "\\.")
    val n = size(labels)
    def lastK(k: Int): Column = array_join(slice(labels, -k, k), ".")
    // longest match wins: try 4-label suffixes first, each needs at
    // least one label LEFT of it to be registrable
    val matched = (MaxSuffixLabels to 1 by -1).foldRight(
        registrableDomain(host)) { (k, fallback) =>
      when(n > k && lastK(k).isin(suffixes: _*), lastK(k + 1))
        .otherwise(fallback)
    }
    when(host.isNull, lit(null)).otherwise(matched)
  }

  /** The DuckDB spelling of [[registrableDomain]] with suffixes —
    * the same longest-match CASE chain, so the PSL-backed cap is
    * oracle-checkable too. */
  def registrableDomainSql(col: String, publicSuffixes: Seq[String]): String = {
    if (publicSuffixes.isEmpty) return registrableDomainSql(col)
    val inList = publicSuffixes.map(s =>
      s"'${s.toLowerCase.replace("'", "''")}'").mkString(", ")
    def lastK(k: Int) =
      s"array_to_string(list_slice(string_split($col, '.'), -$k, -1), '.')"
    def nLabels = s"len(string_split($col, '.'))"
    val chain = (MaxSuffixLabels to 1 by -1).foldRight(
        registrableDomainSql(col)) { (k, fallback) =>
      s"CASE WHEN $nLabels > $k AND ${lastK(k)} IN ($inList) " +
        s"THEN ${lastK(k + 1)} ELSE $fallback END"
    }
    s"CASE WHEN $col IS NULL THEN NULL ELSE $chain END"
  }

  /** Parse a standard-format public-suffix-list file (one rule per
    * line, `//` comments, blank lines; the publicsuffix.org shape) into
    * the plain rules [[registrableDomain]] consumes. Wildcard and
    * exception rules are dropped with the documented cap-key caveat.
    * Driver-side, O(file) — the PSL is ~240 KB. */
  def loadPublicSuffixes(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[String] =
    spark.read.textFile(path).collect().toSeq
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//") &&
        !l.startsWith("*") && !l.startsWith("!"))

  /** RefinedWeb-style domain frequency cap: keep at most `cap` rows per
    * registrable domain of `urlCol`, deterministically preferring rows
    * by `order` (e.g. quality desc, id asc). Null/unparseable URLs form
    * their own null-domain group (kept under the same cap — refusing
    * them is a separate gate's job). Emits the input columns plus
    * `_domain`. */
  def domainCap(df: DataFrame, urlCol: String, cap: Int,
      order: Seq[Column],
      publicSuffixes: Seq[String] = Seq.empty): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    // reserved working columns — overwriting a caller's same-named
    // column via withColumn would silently corrupt its data (the
    // SnapshotTable.requireCols reserved-name discipline)
    Seq("_domain", "_rk").foreach(r => require(!df.columns.contains(r),
      s"input already has a '$r' column — rename it; domainCap " +
        "reserves _domain (emitted) and _rk (internal)"))
    val withDomain = df.withColumn("_domain",
      registrableDomain(urlHost(col(urlCol)), publicSuffixes))
    // rank-limit window: the session extensions lower this onto the
    // two-phase TopKPerGroup heap (map-side partial top-k), so a hot
    // domain reduces to `cap` rows per task before the shuffle
    withDomain
      .withColumn("_rk",
        row_number().over(Window.partitionBy(col("_domain"))
          .orderBy(order: _*)))
      .filter(col("_rk") <= cap)
      .drop("_rk")
  }
}
