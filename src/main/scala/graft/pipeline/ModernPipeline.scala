package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{Bucketing, TagOrder, TagText}
import graft.ops.Bucketing.BucketConfig

/** The modern pipeline (`/root/reference/dataruu/run.py:30-118`, SURVEY.md
  * §3.1) as ONE composable lazy plan over a DataFrame of images:
  *
  *   images(key, w, h, sidecar line)
  *     → sidecar parse (P2: rating + tags)           run.py:46-68
  *     → bucket assignment + train resolution        run.py:44, bucket_manager
  *     → aesthetic inner join + threshold (J2/F1/F2) run.py:70-92
  *     → NovelAI tag ordering (U3)                   run.py:94-113
  *     → keyed metadata projection                   run.py:117-118
  *
  * Each stage is a DataFrame→DataFrame function usable on its own; `run`
  * chains them. Shuffle inventory of the whole plan: ONE broadcast (the
  * score table), ONE hash exchange (tag-order re-aggregation), plus the
  * caller's final sort — everything else is narrow codegen'd projection.
  */
object ModernPipeline {

  final case class Config(
      bucket: BucketConfig = BucketConfig(),
      aestheticThreshold: Double = 0.5) // run.py:24

  /** P2 sidecar parse: `line` is the raw first line `rating, tag1, …`. */
  def parseSidecar(images: DataFrame, line: Column): DataFrame =
    images.select(images.columns.map(col) :+
      TagText.ratingOf(line).as("rating") :+
      TagText.tagsOf(line).as("tags"): _*)

  /** Bucket assignment (upscale path) + P3 train resolution from (w, h).
    * Uses the NATIVE argmin spelling (one codegen'd loop; q61 proves it
    * equal to the builtin q30 tree, which would otherwise re-embed the
    * HOF argmin walk in every struct field). */
  def assignBuckets(df: DataFrame, cfg: BucketConfig = BucketConfig()): DataFrame = {
    val resos = Bucketing.makeBucketResolutions(cfg)
    df.withColumn("b", Bucketing.selectBucketUpscaleNative(col("w"), col("h"), resos))
      .withColumn("train_resolution",
        Bucketing.trainResolution(col("b.reso_w"), col("b.reso_h")))
  }

  /** J2+F1+F2: inner join to the (broadcast) score table on `image_key`,
    * keep rows at or above the threshold — missing keys drop, like
    * `run.py:83-88`. */
  def aestheticFilter(df: DataFrame, scores: DataFrame, threshold: Double): DataFrame =
    df.join(broadcast(scores), Seq("image_key"), "inner")
      .filter(col("aesthetic_score") >= threshold)

  /** U3: add `ordered_tags` via the broadcast-vocabulary NovelAI ordering. */
  def orderTags(df: DataFrame, idCol: String, vocab: DataFrame, vocabCol: String): DataFrame =
    df.join(TagOrder.orderTags(df.select(col(idCol), col("tags")), idCol, "tags",
      vocab, vocabCol), Seq(idCol))

  /** Final keyed-metadata projection (the K1/K2 sink schema). The
    * `train_resolution` struct is flattened to scalar `train_w`/`train_h`
    * here — structs stay internal; the sink row is flat like the
    * reference's final JSON values (`run.py:117-118`). */
  def finalMetadata(df: DataFrame): DataFrame =
    df.select(col("image_key"),
        col("train_resolution.train_w").as("train_w"),
        col("train_resolution.train_h").as("train_h"),
        col("rating"),
        round(col("aesthetic_score"), 6).as("aesthetic_score"), col("ordered_tags"))
      .orderBy(col("image_key"))

  /** The full chain. `images` needs (idCol, image_key, w, h); `line` is
    * the sidecar text column expression. */
  def run(images: DataFrame, line: Column, idCol: String,
          scores: DataFrame, vocab: DataFrame, vocabCol: String,
          cfg: Config = Config()): DataFrame = {
    val parsed   = parseSidecar(images, line)
    val bucketed = assignBuckets(parsed, cfg.bucket)
    val filtered = aestheticFilter(bucketed, scores, cfg.aestheticThreshold)
    val ordered  = orderTags(filtered, idCol, vocab, vocabCol)
    finalMetadata(ordered)
  }
}
