package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Aspect-ratio bucketing math (SURVEY.md §2.8 M1–M6, §2.9 U2) as pure
  * codegen'd column expressions — no UDF, no driver-side per-row work.
  *
  * Reference: `/root/reference/dataruu/bucketing/bucket_manager.py`.
  * Semantics pinned exactly (SURVEY.md §7.4):
  *   - Python `int(x + 0.5)` = `floor(x + 0.5)` for the positive values here
  *     (NOT SQL `round`, which half-evens);
  *   - numpy `argmin` takes the FIRST index on ties → `array_position` of
  *     the min (first occurrence) in both Spark and DuckDB;
  *   - Python float `// 2` = `floor(x / 2)` as double.
  *
  * Scale: the predefined reso table is ~40 rows — it travels as a literal
  * array inside the expression (the Catalyst analogue of a broadcast
  * variable), so bucket assignment is a narrow map over images: no shuffle,
  * no join, linear in row count at any scale.
  */
object Bucketing {

  /** Defaults per `dataruu/run.py:19-22`. */
  final case class BucketConfig(
      maxW: Int = 1024, maxH: Int = 1024,
      minSize: Int = 256, maxSize: Int = 1024, steps: Int = 64) {
    def maxArea: Long = maxW.toLong * maxH
  }

  /** M2 (`bucket_manager.py:8-27`): enumerate the bucket resolution grid —
    * the max-area square plus both orientations of each width sweep.
    * Driver-side (≈40 rows), sorted lexicographically like the reference. */
  def makeBucketResolutions(cfg: BucketConfig = BucketConfig()): Seq[(Int, Int)] = {
    val maxArea = cfg.maxArea
    val resos = scala.collection.mutable.Set.empty[(Int, Int)]
    val sq = ((math.floor(math.sqrt(maxArea.toDouble)).toLong / cfg.steps) * cfg.steps).toInt
    resos += ((sq, sq))
    var width = cfg.minSize
    while (width <= cfg.maxSize) {
      val height = math.min(cfg.maxSize.toLong, (maxArea / width) / cfg.steps * cfg.steps).toInt
      if (height >= cfg.minSize) { resos += ((width, height)); resos += ((height, width)) }
      width += cfg.steps
    }
    resos.toSeq.sorted
  }

  /** The reso grid as a literal array-of-structs column (broadcast-in-plan). */
  def resosLit(resos: Seq[(Int, Int)]): Column =
    array(resos.map { case (w, h) => struct(lit(w).as("rw"), lit(h).as("rh")) }: _*)

  /** Same grid as a DuckDB list literal, for oracle SQL. */
  def resosSqlLiteral(resos: Seq[(Int, Int)]): String =
    resos.map { case (w, h) => s"{'rw': $w, 'rh': $h}" }.mkString("[", ", ", "]")

  /** M1 (`bucket_manager.py:95-97`): `int(x + 0.5)` then floor to steps. */
  def roundToSteps(x: Column, steps: Int): Column = {
    val i = floor(x + lit(0.5))
    (i - i % steps).cast("int")
  }

  /** M3+M6 (`bucket_manager.py:99-118`): upscale path of select_bucket.
    * Exact grid match keeps (w,h); otherwise argmin |AR error| over the
    * grid (first index on ties, like np.argmin); then scale the binding
    * side and round resized dims with `int(x*scale+0.5)`.
    * Returns struct(reso_w, reso_h, resized_w, resized_h, ar_error). */
  def selectBucketUpscale(w: Column, h: Column, resos: Seq[(Int, Int)]): Column = {
    val ar = w / h
    val rl = resosLit(resos)
    val errs = transform(rl, r => abs(r.getField("rw") / r.getField("rh") - ar))
    val isExact = exists(rl, r => r.getField("rw") === w && r.getField("rh") === h)
    val best = element_at(rl, array_position(errs, array_min(errs)).cast("int"))
    val resoW = when(isExact, w).otherwise(best.getField("rw"))
    val resoH = when(isExact, h).otherwise(best.getField("rh"))
    val arReso = resoW / resoH
    val scale = when(ar > arReso, resoH / h).otherwise(resoW / w)
    struct(
      resoW.as("reso_w"), resoH.as("reso_h"),
      floor(w * scale + 0.5).as("resized_w"),
      floor(h * scale + 0.5).as("resized_h"),
      (arReso - ar).as("ar_error"))
  }

  /** M3+M6 via the native argmin expression ([[graft.plans.BucketArgMin]])
    * — identical values to [[selectBucketUpscale]] (q61 ≡ q30 proves the
    * argmins agree, including the exact-match branch and np.argmin tie
    * order), but the argmin is ONE codegen'd primitive loop instead of a
    * per-struct-field HOF tree: the builtin spelling embeds the
    * exists/array_position/transform walk in every output field, and HOFs
    * are CodegenFallback so nothing de-duplicates them. This variant stays
    * inside whole-stage codegen, where common subexpressions are
    * eliminated. Used by the pipeline assembly; q30 keeps the builtin
    * spelling as the oracle-checked reference. */
  def selectBucketUpscaleNative(w: Column, h: Column, resos: Seq[(Int, Int)]): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{column => toCol, expression => toExpr}
    val idx = toCol(graft.plans.BucketArgMin(toExpr(w), toExpr(h),
      resos.map(_._1).toArray, resos.map(_._2).toArray))
    val best  = element_at(resosLit(resos), idx)
    val resoW = best.getField("rw")
    val resoH = best.getField("rh")
    val ar = w / h
    val arReso = resoW / resoH
    val scale = when(ar > arReso, resoH / h).otherwise(resoW / w)
    struct(
      resoW.as("reso_w"), resoH.as("reso_h"),
      floor(w * scale + 0.5).as("resized_w"),
      floor(h * scale + 0.5).as("resized_h"),
      (arReso - ar).as("ar_error"))
  }

  /** M4 (`bucket_manager.py:120-154`): no-upscale path. Oversized images
    * shrink to max_area preserving AR, rounding whichever side keeps AR
    * error smaller; then the bucket is the resized size floored to steps. */
  def selectBucketNoUpscale(w: Column, h: Column, cfg: BucketConfig): Column = {
    val ar = w / h
    val maxArea = lit(cfg.maxArea.toDouble)
    val tooBig = w.cast("long") * h.cast("long") > lit(cfg.maxArea)
    val rwF = sqrt(maxArea * ar)
    val rhF = maxArea / rwF
    val bwR = roundToSteps(rwF, cfg.steps)
    val bhInWr = roundToSteps(bwR / ar, cfg.steps)
    val arWr = bwR / bhInWr
    val bhR = roundToSteps(rhF, cfg.steps)
    val bwInHr = roundToSteps(bhR * ar, cfg.steps)
    val arHr = bwInHr / bhR
    val useW = abs(arWr - ar) < abs(arHr - ar)
    val resizedW = when(tooBig,
      when(useW, bwR.cast("long")).otherwise(floor(bhR * ar + 0.5))).otherwise(w.cast("long"))
    val resizedH = when(tooBig,
      when(useW, floor(bwR / ar + 0.5)).otherwise(bhR.cast("long"))).otherwise(h.cast("long"))
    val bw = resizedW - resizedW % cfg.steps
    val bh = resizedH - resizedH % cfg.steps
    // Degenerate inputs smaller than one step floor to a 0-sized bucket;
    // numpy would yield nan for 0/0 — we pin null (ANSI mode would throw).
    struct(
      bw.as("reso_w"), bh.as("reso_h"),
      resizedW.as("resized_w"), resizedH.as("resized_h"),
      when(bh =!= 0, bw / bh - ar).as("ar_error"))
  }

  /** P3 (`bucket_manager.py:196`): latent-unit floor `(x - x%8, y - y%8)`. */
  def trainResolution(resoW: Column, resoH: Column): Column =
    struct((resoW - resoW % 8).as("train_w"), (resoH - resoH % 8).as("train_h"))

  /** M5 (`bucket_manager.py:161-179`): center-crop LTRB box of the
    * AR-preserving resize into the bucket. Doubles throughout, with
    * Python float `//2` = `floor(/2)`. */
  def cropLtrb(bw: Column, bh: Column, iw: Column, ih: Column): Column = {
    val bAr = bw / bh
    val iAr = iw / ih
    val rw  = when(bAr > iAr, bh * iAr).otherwise(bw.cast("double"))
    val rh  = when(bAr > iAr, bh.cast("double")).otherwise(bw / iAr)
    val cl  = floor((bw - rw) / 2).cast("double")
    val ct  = floor((bh - rh) / 2).cast("double")
    struct(cl.as("crop_left"), ct.as("crop_top"),
      (cl + rw).as("crop_right"), (ct + rh).as("crop_bottom"))
  }
}
