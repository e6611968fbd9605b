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

  /** RefinedWeb-style domain frequency cap: keep at most `cap` rows per
    * registrable domain of `urlCol`, deterministically preferring rows
    * by `order` (e.g. quality desc, id asc). Null/unparseable URLs form
    * their own null-domain group (kept under the same cap — refusing
    * them is a separate gate's job). Emits the input columns plus
    * `_domain`. */
  def domainCap(df: DataFrame, urlCol: String, cap: Int,
      order: Seq[Column]): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    // reserved working columns — overwriting a caller's same-named
    // column via withColumn would silently corrupt its data (the
    // SnapshotTable.requireCols reserved-name discipline)
    Seq("_domain", "_rk").foreach(r => require(!df.columns.contains(r),
      s"input already has a '$r' column — rename it; domainCap " +
        "reserves _domain (emitted) and _rk (internal)"))
    val withDomain = df.withColumn("_domain",
      registrableDomain(urlHost(col(urlCol))))
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
