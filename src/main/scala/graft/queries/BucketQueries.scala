package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.ops.Bucketing
import graft.ops.Bucketing.BucketConfig

/** Bucketing-math queries (SURVEY.md §2.8 M1–M6, §2.9 U2, §2.5 A1/A2):
  * synthetic image dimensions derived from `part`, pushed through the exact
  * select_bucket arithmetic, oracle-checked step for step in DuckDB.
  *
  * Every float here is computed by the identical IEEE expression tree on
  * both engines (same literals, same op order), so outputs compare exactly
  * without rounding.
  */
object BucketQueries {
  private val cfg   = BucketConfig()
  private val resos = Bucketing.makeBucketResolutions(cfg)
  private val resosSql = Bucketing.resosSqlLiteral(resos)

  /** Synthetic image dims: broad (128..2027) range; every 11th row is an
    * exact grid reso (640x1024) to hit the exact-match branch
    * (`bucket_manager.py:104-106`). */
  private def srcWH(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(
      col("p_partkey").as("id"),
      when(col("p_partkey") % 11 === 0, 640)
        .otherwise((lit(128) + (col("p_partkey") * 37) % 1900).cast("int")).as("w"),
      when(col("p_partkey") % 11 === 0, 1024)
        .otherwise((lit(128) + (col("p_partkey") * 53) % 1900).cast("int")).as("h"))

  private val srcSql =
    """SELECT p_partkey AS id,
      |  CASE WHEN p_partkey % 11 = 0 THEN 640
      |       ELSE CAST(128 + (p_partkey * 37) % 1900 AS INT) END AS w,
      |  CASE WHEN p_partkey % 11 = 0 THEN 1024
      |       ELSE CAST(128 + (p_partkey * 53) % 1900 AS INT) END AS h
      |FROM part""".stripMargin

  /** M3/M6/P3: upscale-path bucket selection + train resolution. */
  val q30 = Q("q30_bucket_upscale",
    s"""WITH src AS ($srcSql),
      |c AS (SELECT *, w / h AS ar, $resosSql AS resos FROM src),
      |m AS (SELECT *,
      |  list_transform(resos, r -> abs(r.rw / r.rh - ar)) AS errs,
      |  len(list_filter(resos, r -> r.rw = w AND r.rh = h)) > 0 AS exact
      |  FROM c),
      |r AS (SELECT *,
      |  CASE WHEN exact THEN w
      |       ELSE resos[list_position(errs, list_aggregate(errs, 'min'))].rw END AS reso_w,
      |  CASE WHEN exact THEN h
      |       ELSE resos[list_position(errs, list_aggregate(errs, 'min'))].rh END AS reso_h
      |  FROM m),
      |s AS (SELECT *,
      |  CASE WHEN ar > reso_w / reso_h THEN reso_h / h ELSE reso_w / w END AS scale
      |  FROM r)
      |SELECT id, w, h, reso_w, reso_h,
      |  CAST(floor(w * scale + 0.5) AS BIGINT) AS resized_w,
      |  CAST(floor(h * scale + 0.5) AS BIGINT) AS resized_h,
      |  reso_w - reso_w % 8 AS train_w, reso_h - reso_h % 8 AS train_h,
      |  reso_w / reso_h - ar AS ar_error
      |FROM s ORDER BY id""".stripMargin) { (s, dir) =>
    val b = Bucketing.selectBucketUpscale(col("w"), col("h"), resos)
    val t = Bucketing.trainResolution(col("reso_w"), col("reso_h"))
    srcWH(s, dir)
      .withColumn("b", b)
      .select(col("id"), col("w"), col("h"),
        col("b.reso_w").as("reso_w"), col("b.reso_h").as("reso_h"),
        col("b.resized_w").as("resized_w"), col("b.resized_h").as("resized_h"),
        col("b.ar_error").as("ar_error"))
      .withColumn("t", t)
      .select(col("id"), col("w"), col("h"), col("reso_w"), col("reso_h"),
        col("resized_w"), col("resized_h"),
        col("t.train_w").as("train_w"), col("t.train_h").as("train_h"), col("ar_error"))
      .orderBy(col("id"))
  }

  /** M4/M1: no-upscale path — sqrt shrink, dual rounding, floor-to-steps. */
  val q31 = Q("q31_bucket_noupscale",
    s"""WITH src AS ($srcSql),
      |c AS (SELECT *, w / h AS ar,
      |  CAST(w AS BIGINT) * CAST(h AS BIGINT) > ${cfg.maxArea} AS too_big FROM src),
      |f AS (SELECT *, sqrt(${cfg.maxArea.toDouble} * ar) AS rw_f FROM c),
      |g AS (SELECT *, ${cfg.maxArea.toDouble} / rw_f AS rh_f FROM f),
      |r1 AS (SELECT *,
      |  CAST(floor(rw_f + 0.5) - floor(rw_f + 0.5) % ${cfg.steps} AS INT) AS bw_r,
      |  CAST(floor(rh_f + 0.5) - floor(rh_f + 0.5) % ${cfg.steps} AS INT) AS bh_r
      |  FROM g),
      |r2 AS (SELECT *,
      |  CAST(floor(bw_r / ar + 0.5) - floor(bw_r / ar + 0.5) % ${cfg.steps} AS INT) AS bh_in_wr,
      |  CAST(floor(bh_r * ar + 0.5) - floor(bh_r * ar + 0.5) % ${cfg.steps} AS INT) AS bw_in_hr
      |  FROM r1),
      |ch AS (SELECT *,
      |  abs(bw_r / bh_in_wr - ar) < abs(bw_in_hr / bh_r - ar) AS use_w
      |  FROM r2),
      |rs AS (SELECT *,
      |  CASE WHEN too_big THEN
      |    CASE WHEN use_w THEN CAST(bw_r AS BIGINT)
      |         ELSE CAST(floor(bh_r * ar + 0.5) AS BIGINT) END
      |  ELSE CAST(w AS BIGINT) END AS resized_w,
      |  CASE WHEN too_big THEN
      |    CASE WHEN use_w THEN CAST(floor(bw_r / ar + 0.5) AS BIGINT)
      |         ELSE CAST(bh_r AS BIGINT) END
      |  ELSE CAST(h AS BIGINT) END AS resized_h
      |  FROM ch)
      |SELECT id, w, h,
      |  resized_w - resized_w % ${cfg.steps} AS reso_w,
      |  resized_h - resized_h % ${cfg.steps} AS reso_h,
      |  resized_w, resized_h,
      |  (resized_w - resized_w % ${cfg.steps}) / (resized_h - resized_h % ${cfg.steps}) - ar AS ar_error
      |FROM rs ORDER BY id""".stripMargin) { (s, dir) =>
    val b = Bucketing.selectBucketNoUpscale(col("w"), col("h"), cfg)
    srcWH(s, dir)
      .withColumn("b", b)
      .select(col("id"), col("w"), col("h"),
        col("b.reso_w").as("reso_w"), col("b.reso_h").as("reso_h"),
        col("b.resized_w").as("resized_w"), col("b.resized_h").as("resized_h"),
        col("b.ar_error").as("ar_error"))
      .orderBy(col("id"))
  }

  /** M5: center-crop LTRB of the upscale-path bucket vs the original dims
    * (`bucket_manager.py:161-179`; float `//2` = floor as double). */
  val q32 = Q("q32_crop_ltrb",
    s"""WITH src AS ($srcSql),
      |c AS (SELECT *, w / h AS ar, $resosSql AS resos FROM src),
      |m AS (SELECT *,
      |  list_transform(resos, r -> abs(r.rw / r.rh - ar)) AS errs,
      |  len(list_filter(resos, r -> r.rw = w AND r.rh = h)) > 0 AS exact
      |  FROM c),
      |r AS (SELECT *,
      |  CASE WHEN exact THEN w
      |       ELSE resos[list_position(errs, list_aggregate(errs, 'min'))].rw END AS bw,
      |  CASE WHEN exact THEN h
      |       ELSE resos[list_position(errs, list_aggregate(errs, 'min'))].rh END AS bh
      |  FROM m),
      |x AS (SELECT *, bw / bh AS b_ar, w / h AS i_ar FROM r),
      |y AS (SELECT *,
      |  CASE WHEN b_ar > i_ar THEN bh * i_ar ELSE CAST(bw AS DOUBLE) END AS rw,
      |  CASE WHEN b_ar > i_ar THEN CAST(bh AS DOUBLE) ELSE bw / i_ar END AS rh
      |  FROM x)
      |SELECT id, bw, bh,
      |  floor((bw - rw) / 2) AS crop_left,
      |  floor((bh - rh) / 2) AS crop_top,
      |  floor((bw - rw) / 2) + rw AS crop_right,
      |  floor((bh - rh) / 2) + rh AS crop_bottom
      |FROM y ORDER BY id""".stripMargin) { (s, dir) =>
    // native argmin spelling (== builtin, proven by q61/BucketingSpec);
    // q30 keeps the builtin tree as the oracle-checked reference.
    val b = Bucketing.selectBucketUpscaleNative(col("w"), col("h"), resos)
    val crop = Bucketing.cropLtrb(col("bw"), col("bh"), col("w"), col("h"))
    srcWH(s, dir)
      .withColumn("b", b)
      .select(col("id"), col("w"), col("h"),
        col("b.reso_w").as("bw"), col("b.reso_h").as("bh"))
      .withColumn("c", crop)
      .select(col("id"), col("bw"), col("bh"),
        col("c.crop_left").as("crop_left"), col("c.crop_top").as("crop_top"),
        col("c.crop_right").as("crop_right"), col("c.crop_bottom").as("crop_bottom"))
      .orderBy(col("id"))
  }

  /** A1/A2 (`bucket_manager.py:225-226`, `bucketing_to_metadata.py:126-131`):
    * bucket histogram + mean |AR error| report over the upscale assignment. */
  val q33 = Q("q33_bucket_histogram",
    s"""WITH src AS ($srcSql),
      |c AS (SELECT *, w / h AS ar, $resosSql AS resos FROM src),
      |m AS (SELECT *,
      |  list_transform(resos, r -> abs(r.rw / r.rh - ar)) AS errs,
      |  len(list_filter(resos, r -> r.rw = w AND r.rh = h)) > 0 AS exact
      |  FROM c),
      |r AS (SELECT *,
      |  CASE WHEN exact THEN w
      |       ELSE resos[list_position(errs, list_aggregate(errs, 'min'))].rw END AS reso_w,
      |  CASE WHEN exact THEN h
      |       ELSE resos[list_position(errs, list_aggregate(errs, 'min'))].rh END AS reso_h
      |  FROM m)
      |SELECT reso_w, reso_h, count(*) AS n_images,
      |  round(avg(abs(reso_w / reso_h - ar)), 6) AS mean_ar_error
      |FROM r GROUP BY reso_w, reso_h ORDER BY reso_w, reso_h""".stripMargin) { (s, dir) =>
    val b = Bucketing.selectBucketUpscaleNative(col("w"), col("h"), resos)
    srcWH(s, dir)
      .withColumn("b", b)
      .groupBy(col("b.reso_w").as("reso_w"), col("b.reso_h").as("reso_h"))
      .agg(count(lit(1)).as("n_images"),
        round(avg(abs(col("b.ar_error"))), 6).as("mean_ar_error"))
      .orderBy(col("reso_w"), col("reso_h"))
  }

  /** U2 native path: the bucket argmin as a custom codegen'd Catalyst
    * expression ([[graft.plans.BucketArgMin]], registered on the session
    * via [[graft.plans.GraftFunctions.register]] and callable as SQL
    * `graft_bucket_argmin(w, h)`), composed with a literal-array lookup.
    * Same oracle as the builtin q30 selection — the two implementations
    * must agree cell for cell. */
  val q61 = Q("q61_bucket_argmin_native",
    s"""WITH src AS ($srcSql),
      |c AS (SELECT *, w / h AS ar, $resosSql AS resos FROM src),
      |m AS (SELECT *,
      |  list_transform(resos, r -> abs(r.rw / r.rh - ar)) AS errs,
      |  len(list_filter(resos, r -> r.rw = w AND r.rh = h)) > 0 AS exact
      |  FROM c),
      |r AS (SELECT *,
      |  CASE WHEN exact THEN w
      |       ELSE resos[list_position(errs, list_aggregate(errs, 'min'))].rw END AS reso_w,
      |  CASE WHEN exact THEN h
      |       ELSE resos[list_position(errs, list_aggregate(errs, 'min'))].rh END AS reso_h
      |  FROM m)
      |SELECT id, reso_w, reso_h FROM r ORDER BY id""".stripMargin) { (s, dir) =>
    graft.plans.GraftFunctions.register(s, cfg)
    val best = element_at(Bucketing.resosLit(resos),
      call_function(graft.plans.GraftFunctions.BucketArgMinName, col("w"), col("h")))
    srcWH(s, dir)
      .select(col("id"),
        best.getField("rw").as("reso_w"), best.getField("rh").as("reso_h"))
      .orderBy(col("id"))
  }

  /** U2 dynamic-reso state (`bucket_manager.py:87-93,156` add_if_new_reso):
    * the no-upscale path grows the bucket set as new shapes appear; since
    * each bucket derives deterministically from (w,h), the "shared state"
    * is just derive-then-dropDuplicates (SURVEY §2.9) — no mutable state,
    * fully distributed. Output = the discovered bucket list with first
    * image id per bucket. */
  val q73 = Q("q73_dynamic_resos",
    s"""WITH src AS ($srcSql),
      |c AS (SELECT *, w / h AS ar,
      |  CAST(w AS BIGINT) * CAST(h AS BIGINT) > ${cfg.maxArea} AS too_big FROM src),
      |f AS (SELECT *, sqrt(${cfg.maxArea.toDouble} * ar) AS rw_f FROM c),
      |g AS (SELECT *, ${cfg.maxArea.toDouble} / rw_f AS rh_f FROM f),
      |r1 AS (SELECT *,
      |  CAST(floor(rw_f + 0.5) - floor(rw_f + 0.5) % ${cfg.steps} AS INT) AS bw_r,
      |  CAST(floor(rh_f + 0.5) - floor(rh_f + 0.5) % ${cfg.steps} AS INT) AS bh_r
      |  FROM g),
      |r2 AS (SELECT *,
      |  CAST(floor(bw_r / ar + 0.5) - floor(bw_r / ar + 0.5) % ${cfg.steps} AS INT) AS bh_in_wr,
      |  CAST(floor(bh_r * ar + 0.5) - floor(bh_r * ar + 0.5) % ${cfg.steps} AS INT) AS bw_in_hr
      |  FROM r1),
      |ch AS (SELECT *,
      |  abs(bw_r / bh_in_wr - ar) < abs(bw_in_hr / bh_r - ar) AS use_w
      |  FROM r2),
      |rs AS (SELECT *,
      |  CASE WHEN too_big THEN
      |    CASE WHEN use_w THEN CAST(bw_r AS BIGINT)
      |         ELSE CAST(floor(bh_r * ar + 0.5) AS BIGINT) END
      |  ELSE CAST(w AS BIGINT) END AS resized_w,
      |  CASE WHEN too_big THEN
      |    CASE WHEN use_w THEN CAST(floor(bw_r / ar + 0.5) AS BIGINT)
      |         ELSE CAST(bh_r AS BIGINT) END
      |  ELSE CAST(h AS BIGINT) END AS resized_h
      |  FROM ch)
      |SELECT resized_w - resized_w % ${cfg.steps} AS reso_w,
      |  resized_h - resized_h % ${cfg.steps} AS reso_h,
      |  count(*) AS n_images, min(id) AS first_id
      |FROM rs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    srcWH(s, dir)
      .withColumn("b", Bucketing.selectBucketNoUpscale(col("w"), col("h"), cfg))
      .groupBy(col("b.reso_w").as("reso_w"), col("b.reso_h").as("reso_h"))
      .agg(count(lit(1)).as("n_images"), min(col("id")).as("first_id"))
      .orderBy(col("reso_w"), col("reso_h"))
  }

  val all: Seq[Q] = Seq(q30, q31, q32, q33, q61, q73)
}
