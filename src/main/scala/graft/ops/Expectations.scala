package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the Deequ-style release gate
  * (Schelter et al., "Automating Large-Scale Data Quality Verification",
  * VLDB 2018): a pipeline declares the invariants a corpus must satisfy
  * before it ships (no null keys, values in range, labels from a closed
  * set, key uniqueness, minimum volume) and gets back one verdict row per
  * rule. Reference analogue: the ad-hoc count/assert sprinkles of
  * `dataruu/legacy/merge_all_to_metadata.py:114-118` (missing-key counts)
  * and `pipeline.py`'s drop-and-count gates, generalized into one
  * declarative surface.
  *
  * 100 TB shape: ALL scalar rules ([[NotNull]]/[[InRange]]/[[InSet]]/
  * [[MinRows]]) compile into ONE aggregation pass over the corpus —
  * adding a rule adds a conditional-sum column, not a scan — and the
  * partial aggregates are map-side-combined, so the exchange carries one
  * row per map task regardless of corpus size. Each [[Unique]] rule is
  * necessarily its own key-hashed aggregation (uniqueness is a global
  * property of the key space); its exchange carries one row per distinct
  * key after partial aggregation. Nothing is collected to the driver; the
  * result is a rule-count-sized DataFrame a caller can gate on
  * (`require(report.filter(!col("ok")).isEmpty)` or route to a ledger).
  */
object Expectations {

  /** One declared invariant. `name` is the stable report key — rule
    * parameters are baked into it so a report line is self-describing. */
  sealed trait Rule { def name: String }

  /** `column` contains no nulls. */
  final case class NotNull(column: String) extends Rule {
    def name = s"not_null($column)"
  }

  /** `column` (numeric) lies in [lo, hi]; null violates (a missing
    * measurement is not an in-range measurement). */
  final case class InRange(column: String, lo: Long, hi: Long) extends Rule {
    def name = s"in_range($column,$lo,$hi)"
  }

  /** `column` (string) is one of `values`; null violates. */
  final case class InSet(column: String, values: Seq[String]) extends Rule {
    def name = s"in_set($column)"
  }

  /** The corpus has at least `n` rows; violations = the shortfall. */
  final case class MinRows(n: Long) extends Rule {
    def name = s"min_rows($n)"
  }

  /** `columns` form a unique key; violations = surplus rows beyond the
    * first per duplicated key (the rows a dedup would remove). */
  final case class Unique(columns: Seq[String]) extends Rule {
    def name = s"unique(${columns.mkString(",")})"
  }

  /** Conditional-sum column for one scalar rule (always non-null: the
    * empty-corpus sum coalesces to 0 so `MinRows` is the only rule an
    * empty input can fail). */
  private def violations(r: Rule): Column = r match {
    case NotNull(c) =>
      coalesce(sum(when(col(c).isNull, lit(1L)).otherwise(lit(0L))), lit(0L))
    case InRange(c, lo, hi) =>
      coalesce(sum(when(col(c).isNull.or(col(c) < lo).or(col(c) > hi),
        lit(1L)).otherwise(lit(0L))), lit(0L))
    case InSet(c, vs) =>
      coalesce(sum(when(col(c).isNull.or(!col(c).isin(vs: _*)),
        lit(1L)).otherwise(lit(0L))), lit(0L))
    case MinRows(n) => greatest(lit(n) - count(lit(1)), lit(0L))
    case u: Unique => throw new IllegalArgumentException(
      s"${u.name} is not a scalar rule") // partitioned out by check()
  }

  /** Evaluate every rule; returns `(rule, violations, ok)` with one row
    * per rule (report order is the caller's to impose — sort by `rule`
    * for a deterministic ledger). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "declare at least one expectation")
    val (uniq, scalar) = rules.partition(_.isInstanceOf[Unique])
    // all scalar rules in one aggregation pass
    val scalarDf = if (scalar.isEmpty) Nil else {
      val aggs = scalar.zipWithIndex.map { case (r, i) =>
        violations(r).as(s"xp_v$i")
      }
      Seq(df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(scalar.zipWithIndex.map { case (r, i) =>
          struct(lit(r.name).as("rule"), col(s"xp_v$i").as("violations"))
        }: _*)).as("xp"))
        .select(col("xp.rule").as("rule"), col("xp.violations").as("violations")))
    }
    val uniqDfs = uniq.collect { case u @ Unique(cols) =>
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("xp_c"))
        .filter(col("xp_c") > 1)
        .agg(coalesce(sum(col("xp_c") - lit(1L)), lit(0L)).as("violations"))
        .select(lit(u.name).as("rule"), col("violations"))
    }
    (scalarDf ++ uniqDfs).reduce(_ unionByName _)
      .withColumn("ok", col("violations") === lit(0L))
  }
}
