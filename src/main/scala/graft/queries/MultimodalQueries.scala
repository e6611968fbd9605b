package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.ops.{Bucketing, Multimodal}

/** Multimodal binary-column queries: documents' text re-encoded as opaque
  * binary content (the oracle-visible stand-in for image bytes), with the
  * full decode → corrupt-drop → bucket pipeline over it.
  *
  * Scale notes: binary metadata extraction is a narrow projection over the
  * scan; the only shuffle is the final histogram groupBy (~40 bucket keys,
  * map-side partial agg first).
  */
object MultimodalQueries {
  private val resos = Bucketing.makeBucketResolutions()
  private val resosSql = Bucketing.resosSqlLiteral(resos)

  /** Binary ingest + stub decode + F4 corrupt-drop + bucket histogram
    * (every 97th "image" is corrupt and must be skipped, like
    * `bucket_manager.py:183-189`). Dims come from the content hash —
    * identical arithmetic in [[Multimodal.StubDecoder]], the column path
    * used here, and the DuckDB oracle. */
  val q56 = Q("q56_multimodal_buckets",
    s"""WITH m AS (SELECT doc_id,
      |    CASE WHEN doc_id % 97 = 0 THEN NULL ELSE encode(text) END AS content
      |  FROM documents),
      |d AS (SELECT doc_id, octet_length(content) AS n_bytes, md5(decode(content)) AS chash
      |      FROM m WHERE content IS NOT NULL),
      |w AS (SELECT doc_id, n_bytes,
      |  ${Multimodal.stubWidthSql("chash")} AS w,
      |  ${Multimodal.stubHeightSql("chash")} AS h
      |  FROM d),
      |c AS (SELECT *, w / h AS ar, $resosSql AS resos FROM w),
      |x AS (SELECT *,
      |  list_transform(resos, r -> abs(r.rw / r.rh - ar)) AS errs,
      |  len(list_filter(resos, r -> r.rw = w AND r.rh = h)) > 0 AS exact
      |  FROM c),
      |r AS (SELECT *,
      |  CASE WHEN exact THEN w
      |       ELSE resos[list_position(errs, list_aggregate(errs, 'min'))].rw END AS reso_w,
      |  CASE WHEN exact THEN h
      |       ELSE resos[list_position(errs, list_aggregate(errs, 'min'))].rh END AS reso_h
      |  FROM x)
      |SELECT reso_w, reso_h, count(*) AS n_images,
      |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |  round(avg(abs(reso_w / reso_h - ar)), 6) AS mean_ar_error
      |FROM r GROUP BY reso_w, reso_h ORDER BY reso_w, reso_h""".stripMargin) { (s, dir) =>
    val content = when(col("doc_id") % 97 === 0, lit(null).cast("binary"))
      .otherwise(encode(col("text"), "UTF-8"))
    val decoded = Tables.documents(s, dir)
      .select(col("doc_id"), content.as("content"))
      .filter(col("content").isNotNull) // F4: corrupt rows dropped
      .select(col("doc_id"),
        octet_length(col("content")).cast("long").as("n_bytes"),
        Multimodal.contentHash(col("content")).as("chash"))
      .select(col("doc_id"), col("n_bytes"),
        Multimodal.stubWidth(col("chash")).as("w"),
        Multimodal.stubHeight(col("chash")).as("h"))
    decoded
      .withColumn("b", Bucketing.selectBucketUpscaleNative(col("w"), col("h"), resos))
      .groupBy(col("b.reso_w").as("reso_w"), col("b.reso_h").as("reso_h"))
      .agg(count(lit(1)).as("n_images"),
        sum("n_bytes").as("total_bytes"),
        round(avg(abs(col("b.ar_error"))), 6).as("mean_ar_error"))
      .orderBy(col("reso_w"), col("reso_h"))
  }

  val all: Seq[Q] = Seq(q56)
}
