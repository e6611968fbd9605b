package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (binary) column plumbing (brief: treat image/audio/video as
  * opaque `binary` columns with typed metadata; decode/feature-extract/
  * resize/frame-sample as partition-parallel functions).
  *
  * Reference behavior being reproduced: `dataruu/bucketing/bucket_manager
  * .py:183-202` (PIL open → RGB convert → size → bucket math; corrupt
  * files logged and skipped) and `dataruu/tagger/tagger.py:49-62`
  * (decode → preprocess → batched model input).
  *
  * The actual image codecs are NOT in this container, so [[StubDecoder]]
  * is a clearly-marked deterministic fake (dims derived from the content
  * hash) — but every Spark-side piece is real: the binaryFile source
  * schema, the per-partition decoder lifecycle in mapPartitions (the
  * Scala analogue of a pandas mapInPandas batch UDF), the nullable-decode
  * → filter (F4) corrupt handling, and the downstream bucket/resize math
  * shared with [[Bucketing]].
  *
  * Scale: decode is embarrassingly parallel over partitions (no shuffle);
  * binaryFile scans split per file, so 100 TB of images parallelize across
  * executors by file. Metadata-only passes (dims, mime, length) should
  * prefer header sniffing over full decode — the Decoder contract takes
  * raw bytes and may stop reading early.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque content bytes. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate", IntegerType)))

  /** S1/S2: binary directory scan — `binaryFile` gives (path,
    * modificationTime, length, content). */
  def loadBinaryDir(spark: SparkSession, dir: String,
                    glob: String = "*.{jpg,png,jpeg}",
                    recursive: Boolean = false): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", recursive.toString)
      .load(dir)

  final case class Decoded(mime: String, width: Int, height: Int,
                           nFrames: Int, sampleRate: Int)

  /** Decoder contract: bytes → metadata, None for corrupt input
    * (`bucket_manager.py:183-189`: log + skip). Implementations are
    * Serializable and constructed once per partition. */
  trait Decoder extends Serializable {
    def decode(path: String, bytes: Array[Byte]): Option[Decoded]
  }

  /** DETERMINISTIC FAKE decoder (no image libs in this container): dims
    * are derived from the md5 of the content — the same arithmetic as
    * [[stubWidth]]/[[stubHeight]] so column-path and mapPartitions-path
    * agree bit for bit. Inputs shorter than 8 bytes are "corrupt". */
  final class StubDecoder extends Decoder {
    @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
    private def h31(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % Hashing.P31
    }
    def decode(path: String, bytes: Array[Byte]): Option[Decoded] = {
      if (bytes == null || bytes.length < 8) None
      else {
        val chash = md.digest(bytes).map(b => f"$b%02x").mkString
        Some(Decoded("image/fake",
          (128 + h31(chash + "w") % 1900).toInt,
          (128 + h31(chash + "h") % 1900).toInt,
          (1 + h31(chash + "f") % 64).toInt,
          16000))
      }
    }
  }

  /** Column-expression spelling of the stub dims (oracle-portable; equals
    * [[StubDecoder]] on the same bytes). */
  def contentHash(content: Column): Column = md5(content)
  def stubWidth(chash: Column): Column =
    (lit(128) + Hashing.hash31(concat(chash, lit("w"))) % 1900).cast("int")
  def stubHeight(chash: Column): Column =
    (lit(128) + Hashing.hash31(concat(chash, lit("h"))) % 1900).cast("int")
  def stubWidthSql(chash: String): String =
    s"CAST(128 + ${Hashing.hash31Sql(s"$chash || 'w'")} % 1900 AS INT)"
  def stubHeightSql(chash: String): String =
    s"CAST(128 + ${Hashing.hash31Sql(s"$chash || 'h'")} % 1900 AS INT)"

  /** U1-shaped integration: decode every (path, content) row via
    * mapPartitions with per-partition decoder init; corrupt rows keep a
    * null meta for the caller's F4 filter. */
  def decodeDF(df: DataFrame, mkDecoder: () => Decoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col("path").cast("string"), col("content")).as[(String, Array[Byte])]
    rows.mapPartitions { it =>
      val dec = mkDecoder() // per-partition codec init
      it.map { case (p, bytes) =>
        dec.decode(p, bytes) match {
          case Some(d) => (p, d.mime, d.width, d.height, d.nFrames, d.sampleRate, true)
          case None    => (p, null: String, 0, 0, 0, 0, false)
        }
      }
    }.toDF("path", "mime", "width", "height", "n_frames", "sample_rate", "ok")
  }

  /** Frame sampling: every `step`-th frame index of a clip. */
  def frameSampleIndices(nFrames: Column, step: Int): Column =
    sequence(lit(0), nFrames - 1, lit(step))

  def frameSampleIndicesSql(nFrames: String, step: Int): String =
    s"range(0, $nFrames, $step)"
}
