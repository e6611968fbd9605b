package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mixture construction: downsample a multi-source corpus so the
  * kept documents hit a TARGET source mixture exactly — the "data recipe"
  * step of LM corpus assembly (fixed domain proportions à la Pile/DoReMi
  * mixtures; weights are the recipe, not learned here).
  *
  * Given integer weights w_s, the kept counts are k_s = w_s · u with
  * u = min_s ⌊n_s / w_s⌋ — the largest multiple of the recipe every
  * source can fill. Selection within a source is hash-rank sampling:
  * keep the k_s documents with the SMALLEST md5-derived hash of their id
  * ([[Hashing.hash31]]) — deterministic, uniform, engine-portable, and
  * stable under corpus growth (a doc already kept stays kept unless
  * strictly-smaller hashes displace it; no RNG state).
  *
  * Scale shape: per-source counts are one tiny aggregation; the recipe
  * and the derived k_s table are broadcast; the rank is a per-source
  * window — the one true shuffle, keyed on source. Source counts are
  * FEW-AND-LARGE by construction (domains, not keys), so the window sort
  * is the bottleneck at extreme scale; the drop-in degrade path is
  * threshold sampling (keep hash < k_s/n_s · P31 — no sort, ±√n count
  * noise), same hash, same contract minus exactness. Exactness is the
  * default because training recipes are audited by exact counts.
  */
object Mixture {

  /** Kept rows of `docs` (all columns), hitting the `weights` mixture
    * exactly; sources absent from `weights` are dropped (weight 0).
    *
    * @param weights integer recipe shares per source, e.g.
    *                `Seq("web" -> 3, "code" -> 1)` = 3:1
    */
  def sampleToMixture(docs: DataFrame, idCol: String, srcCol: String,
                      weights: Seq[(String, Int)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive, got $weights")
    val spark = docs.sparkSession
    import spark.implicits._
    sampleToMixtureDF(docs, idCol, srcCol, weights.toDF(srcCol, "w"), "w")
  }

  /** [[sampleToMixture]] with the recipe as a DATAFRAME `(srcCol, wCol)`
    * — the adaptive-mixture shape (DoReMi-style reweighting: weights
    * computed from per-domain statistics in the SAME plan, never
    * collected to the driver). Non-positive and absent weights drop the
    * source; duplicate source rows in `weights` are a caller error. */
  def sampleToMixtureDF(docs: DataFrame, idCol: String, srcCol: String,
                        weights: DataFrame, wCol: String): DataFrame = {
    // uniquified working prefix — caller columns named mix_* must not
    // collide with the recipe/cutoff/rank columns added here
    val p = Iterator.from(0).map(i => s"mix${i}_")
      .find(pf => !docs.columns.exists(_.startsWith(pf))).get
    val w = weights.select(col(srcCol), col(wCol).cast("long").as(s"${p}w"))
      .filter(col(s"${p}w") > 0)
    val counts = docs.groupBy(col(srcCol)).agg(count(lit(1)).as(s"${p}n"))
    // u = min_s floor(n_s / w_s): integer div keeps this exact at any n
    val u = counts.join(broadcast(w), srcCol)
      .select(expr(s"`${p}n` div `${p}w`").as(s"${p}q"))
      .agg(min(col(s"${p}q")).as(s"${p}u"))
    val ks = broadcast(w.crossJoin(broadcast(u))
      .select(col(srcCol), (col(s"${p}w") * col(s"${p}u")).as(s"${p}k")))
    val win = Window.partitionBy(col(srcCol))
      .orderBy(Hashing.hash31(col(idCol).cast("string")), col(idCol))
    docs.join(ks, srcCol)
      .withColumn(s"${p}rn", row_number().over(win))
      .filter(col(s"${p}rn") <= col(s"${p}k"))
      .select(docs.columns.map(col).toIndexedSeq: _*) // caller's column order
  }

  /** DuckDB spelling of the selection rank for one source partition —
    * pair with `rn <= w*u` exactly as [[sampleToMixture]] does. */
  def rankSql(idExpr: String, srcExpr: String): String =
    s"row_number() OVER (PARTITION BY $srcExpr " +
      s"ORDER BY ${Hashing.hash31Sql(s"CAST($idExpr AS VARCHAR)")}, $idExpr)"

  /** Weighted random sampling WITHOUT replacement, k per group (Efraimidis
    * & Spirakis, IPL 97(5) 2006, algorithm A-ES): item i draws key
    * u_i^(1/w_i) with u_i ~ U(0,1); the k largest keys are distributed per
    * the weights (P(i first) = w_i / Σw). Here u_i is the oracle-portable
    * hash of the id mapped into (0,1) — `(h31(id)+0.5)/2^31-1` — so the
    * sample is DETERMINISTIC: reproducible across engines, runs, and
    * retries, and auditable (the key is a pure function of the row id),
    * the same no-RNG-state stance as [[sampleToMixture]].
    *
    * Rows with non-positive weight are dropped (zero weight = never
    * sampled; A-ES keys are undefined for w ≤ 0).
    *
    * Scale shape: the keys are one narrow projection; the per-group top-k
    * runs on the two-phase [[graft.plans.TopKPerGroup]] heap operator, so
    * map tasks cut to ≤ k rows per group BELOW the exchange and at most
    * k·groups·tasks rows ever shuffle — the dominant group never funnels
    * its corpus through one sort. Returns the caller's columns plus
    * `keyOut` (the A-ES key), unranked — rank downstream over ≤ k·groups
    * rows if needed (q126 does).
    */
  def weightedSample(docs: DataFrame, idCol: String, wCol: String, k: Int,
                     groupCols: Seq[String], keyOut: String = "skey"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(groupCols.nonEmpty, "groupCols must be non-empty (use a constant column for a global sample)")
    val keyed = docs.filter(col(wCol) > 0).withColumn(keyOut,
      pow((Hashing.hash31(col(idCol).cast("string")) + lit(0.5)) /
        lit(Hashing.P31.toDouble), lit(1.0) / col(wCol).cast("double")))
    graft.plans.TopK.perGroup(keyed, groupCols,
      Seq((keyOut, false), (idCol, true)), k)
  }

  /** DuckDB spelling of the A-ES key for [[weightedSample]] — identical
    * arithmetic ((h+0.5)/P31 then pow), so oracle comparisons on the
    * ROUNDED key are exact. */
  def aesKeySql(idExpr: String, wExpr: String): String =
    s"pow((${Hashing.hash31Sql(s"CAST($idExpr AS VARCHAR)")} + 0.5) / " +
      s"${Hashing.P31}.0, 1.0 / CAST($wExpr AS DOUBLE))"

  /** UniMax budget allocation (Chung et al., ICLR 2023): spread a total
    * document budget as EVENLY as possible across groups (languages),
    * capped by what each group actually has — the water-filling answer to
    * "temperature sampling starves tail languages, proportional sampling
    * drowns them". Groups smaller than the even share contribute
    * everything they have; the freed budget re-levels among the rest.
    *
    * Exact integer form (so the allocation is auditable and
    * oracle-portable): with groups sorted by (n, name) ascending, group i
    * is SATURATED iff n_i·(L−i+1) + S_{i−1} ≤ B (a prefix property — see
    * the monotonicity note in the tests); unsaturated groups get
    * ⌊avail/m⌋ each, with the `avail mod m` remainder going one-each to
    * the first unsaturated groups in the same sort order. Σquota = min(B,
    * Σn), quota_i ≤ n_i, and the allocation is deterministic.
    *
    * Runs ENTIRELY in-plan: the water-fill is window arithmetic over the
    * per-group count aggregate — a metadata-sized frame (one row per
    * language), so its single-partition global windows are free; nothing
    * is collected to the driver.
    *
    * Input `counts(grpCol, nCol)`; output `(grpCol, quota)`. */
  def unimaxQuotas(counts: DataFrame, grpCol: String, nCol: String,
                   budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    require(!counts.columns.exists(c => c != nCol && c.startsWith("ux_")),
      "counts must not carry ux_* working columns")
    val ord = Window.orderBy(col(nCol), col(grpCol))
    val all = Window.partitionBy()
    counts
      .withColumn("ux_i", row_number().over(ord).cast("long"))
      .withColumn("ux_sp", coalesce(sum(col(nCol))
        .over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("ux_L", count(lit(1)).over(all))
      .withColumn("ux_sat",
        col(nCol) * (col("ux_L") - col("ux_i") + 1) + col("ux_sp") <= budget)
      .withColumn("ux_j", max(when(col("ux_sat"), col("ux_i")).otherwise(0L)).over(all))
      .withColumn("ux_sj",
        max(when(col("ux_sat"), col("ux_sp") + col(nCol)).otherwise(0L)).over(all))
      .withColumn("ux_m", col("ux_L") - col("ux_j"))
      .withColumn("ux_avail", lit(budget) - col("ux_sj"))
      .withColumn("ux_share", expr("ux_avail div greatest(ux_m, 1)"))
      .withColumn("ux_rem", expr("ux_avail % greatest(ux_m, 1)"))
      .select(col(grpCol),
        when(col("ux_sat"), col(nCol))
          .when(col("ux_m") > 0, col("ux_share") +
            when(col("ux_i") - col("ux_j") <= col("ux_rem"), 1L).otherwise(0L))
          .otherwise(0L).cast("long").as("quota"))
  }

  /** Pure sequential reference of [[unimaxQuotas]] (greedy ascending
    * water-fill) for property tests — same sort, same integer split. */
  def unimaxQuotasSeq(counts: Seq[(String, Long)], budget: Long): Map[String, Long] = {
    val sorted = counts.sortBy { case (g, n) => (n, g) }
    var b = budget
    var m = sorted.length
    val out = Map.newBuilder[String, Long]
    var unsat = List.empty[String]
    sorted.foreach { case (g, n) =>
      if (m > 0 && n * m <= b && unsat.isEmpty) { out += g -> n; b -= n; m -= 1 }
      else unsat = g :: unsat
    }
    val rest = unsat.reverse
    val share = if (m > 0) b / m else 0L
    val rem = if (m > 0) b % m else 0L
    rest.zipWithIndex.foreach { case (g, i) =>
      out += g -> (share + (if (i < rem) 1L else 0L))
    }
    out.result()
  }

  /** Keep a UniMax-allocated sample of `docs`: quotas from
    * [[unimaxQuotas]] over the live per-group counts, selection within a
    * group by the same hash-rank rule as [[sampleToMixture]]
    * (deterministic, growth-stable; [[rankSql]] is the oracle spelling).
    * Same scale caveat as sampleToMixture: the per-group rank window is
    * the one true shuffle, with threshold sampling as the degrade path. */
  def unimaxSample(docs: DataFrame, idCol: String, grpCol: String,
                   budget: Long): DataFrame = {
    val counts = docs.groupBy(col(grpCol)).agg(count(lit(1)).as("ux_n"))
    val quotas = broadcast(unimaxQuotas(counts, grpCol, "ux_n", budget))
    val win = Window.partitionBy(col(grpCol))
      .orderBy(Hashing.hash31(col(idCol).cast("string")), col(idCol))
    docs.join(quotas, grpCol)
      .withColumn("ux_rn", row_number().over(win))
      .filter(col("ux_rn") <= col("quota"))
      .select(docs.columns.map(col).toIndexedSeq: _*)
  }
}
