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

  /** Split raw PSL rules into (plain by label count, wildcard PARENTS
    * by the wildcard rule's label count, exceptions by label count),
    * lowercased — `*.ck` stores parent `ck` under k=2 (the rule `*.ck`
    * is 2 labels); `!www.ck` stores `www.ck` under k=2. */
  private def splitRules(rules: Seq[String]): (Map[Int, Seq[String]],
      Map[Int, Seq[String]], Map[Int, Seq[String]]) = {
    def labelsOf(s: String) = s.count(_ == '.') + 1
    val lc = rules.map(_.toLowerCase)
    val plain = lc.filter(s => !s.startsWith("*.") && !s.startsWith("!"))
    val wild = lc.collect { case s if s.startsWith("*.") => s.drop(2) }
    val exc = lc.collect { case s if s.startsWith("!") => s.drop(1) }
    (plain.groupBy(labelsOf), wild.groupBy(labelsOf(_) + 1),
      exc.groupBy(labelsOf))
  }

  /** PSL-BACKED registrable domain, full publicsuffix.org semantics:
    *
    *   - EXCEPTION rules prevail over everything (`!www.ck` makes
    *     `www.ck` itself registrable — the public suffix is the rule
    *     minus its leftmost label), then
    *   - the LONGEST matching rule wins: a plain rule `co.uk` makes a
    *     host's last 2 labels the public suffix; a WILDCARD rule `*.ck`
    *     makes ⟨any-label⟩.ck one (the rule is 2 labels long);
    *   - registrable domain = public suffix + one label; a host EQUAL
    *     to a public suffix, or matching no rule, falls back to the
    *     last-two-labels heuristic ([[registrableDomain]]) — the PSL's
    *     implicit `*` rule. An EMPTY rule list reproduces the
    *     heuristic exactly (the no-data default).
    *
    * Pure Column logic: label-suffix candidates (≤ 4 labels, the real
    * PSL's depth) probe per-length rule sets via `isin`, which Catalyst
    * compiles to an O(1) hashed `InSet` per row — no UDF, no join, no
    * shuffle; a 9k-rule PSL rides the plan as broadcast-sized literal
    * sets. A wildcard probe is an `isin` on the PARENT suffix
    * (`lastK(k-1)`), an exception probe on the candidate itself. */
  def registrableDomain(host: Column, publicSuffixes: Seq[String]): Column = {
    if (publicSuffixes.isEmpty) return registrableDomain(host)
    val (plainByK, wildByK, excByK) = splitRules(publicSuffixes)
    val labels = split(host, "\\.")
    val n = size(labels)
    def lastK(k: Int): Column = array_join(slice(labels, -k, k), ".")
    // longest match wins: try 4-label suffixes first, each needs at
    // least one label LEFT of it to be registrable
    val suffixChain = (MaxSuffixLabels to 1 by -1).foldRight(
        registrableDomain(host)) { (k, fallback) =>
      val hits = Seq(
        plainByK.get(k).map(ps => lastK(k).isin(ps: _*)),
        wildByK.get(k).filter(_ => k >= 2)
          .map(ws => lastK(k - 1).isin(ws: _*))).flatten
      if (hits.isEmpty) fallback
      else when(n > k && hits.reduce(_ || _), lastK(k + 1))
        .otherwise(fallback)
    }
    // exceptions first — they prevail over ANY other matching rule
    val matched = (MaxSuffixLabels to 1 by -1).foldRight(suffixChain) {
      (k, rest) =>
        excByK.get(k).fold(rest)(es =>
          when(n >= k && lastK(k).isin(es: _*), lastK(k)).otherwise(rest))
    }
    when(host.isNull, lit(null)).otherwise(matched)
  }

  /** The DuckDB spelling of [[registrableDomain]] with suffixes —
    * the same exception-then-longest-match CASE chain, so the
    * PSL-backed cap is oracle-checkable too. */
  def registrableDomainSql(col: String, publicSuffixes: Seq[String]): String = {
    if (publicSuffixes.isEmpty) return registrableDomainSql(col)
    val (plainByK, wildByK, excByK) = splitRules(publicSuffixes)
    def inList(ss: Seq[String]) = ss.map(s =>
      s"'${s.replace("'", "''")}'").mkString(", ")
    def lastK(k: Int) =
      s"array_to_string(list_slice(string_split($col, '.'), -$k, -1), '.')"
    def nLabels = s"len(string_split($col, '.'))"
    val suffixChain = (MaxSuffixLabels to 1 by -1).foldRight(
        registrableDomainSql(col)) { (k, fallback) =>
      val hits = Seq(
        plainByK.get(k).map(ps => s"${lastK(k)} IN (${inList(ps)})"),
        wildByK.get(k).filter(_ => k >= 2)
          .map(ws => s"${lastK(k - 1)} IN (${inList(ws)})")).flatten
      if (hits.isEmpty) fallback
      else s"CASE WHEN $nLabels > $k AND (${hits.mkString(" OR ")}) " +
        s"THEN ${lastK(k + 1)} ELSE $fallback END"
    }
    val chain = (MaxSuffixLabels to 1 by -1).foldRight(suffixChain) {
      (k, rest) =>
        excByK.get(k).fold(rest)(es =>
          s"CASE WHEN $nLabels >= $k AND ${lastK(k)} IN (${inList(es)}) " +
            s"THEN ${lastK(k)} ELSE $rest END")
    }
    s"CASE WHEN $col IS NULL THEN NULL ELSE $chain END"
  }

  /** Parse a standard-format public-suffix-list file (one rule per
    * line, `//` comments, blank lines; the publicsuffix.org shape) into
    * the rules [[registrableDomain]] consumes — plain, wildcard
    * (`*.ck`) and exception (`!www.ck`) rules all kept. Driver-side,
    * O(file) — the PSL is ~240 KB. */
  def loadPublicSuffixes(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[String] =
    spark.read.textFile(path).collect().toSeq
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//"))

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
