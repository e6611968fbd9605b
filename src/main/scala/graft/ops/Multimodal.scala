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
  * Full pixel decode is stubbed ([[StubDecoder]], a clearly-marked
  * deterministic fake whose dims the DuckDB oracle can recompute — q56),
  * but the metadata pass is REAL: [[HeaderDecoder]] parses JPEG/PNG/GIF
  * headers for (mime, width, height) with pure JVM byte reads, which is
  * all the reference's bucketing decode actually consumes. Every
  * Spark-side piece is real for both: the binaryFile source schema, the
  * per-partition decoder lifecycle in mapPartitions (the Scala analogue
  * of a pandas mapInPandas batch UDF), the nullable-decode → filter (F4)
  * corrupt handling, and the downstream bucket/resize math shared with
  * [[Bucketing]].
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

  /** REAL decoder: parses JPEG/PNG/GIF headers for (mime, width, height)
    * with pure JVM byte reads — no codec libraries, no pixel decode. The
    * reference's decode (`bucket_manager.py:183-189`) exists to get dims
    * + RGB for bucketing; dims come from the header, so the metadata pass
    * at 100 TB should never touch pixel data (the Decoder contract's
    * "may stop reading early"). Malformed/unknown headers → None
    * (corrupt-skip, F4). Frame count / sample rate aren't in these
    * headers → 1 / 0. */
  final class HeaderDecoder extends Decoder {
    def decode(path: String, bytes: Array[Byte]): Option[Decoded] =
      HeaderDecoder.sniff(bytes).map { case (mime, w, h) => Decoded(mime, w, h, 1, 0) }
  }

  object HeaderDecoder {
    private def u8(b: Array[Byte], i: Int): Int  = b(i) & 0xff
    private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def be32(b: Array[Byte], i: Int): Int =
      (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

    /** (mime, width, height) from the first bytes of a JPEG/PNG/GIF. */
    def sniff(b: Array[Byte]): Option[(String, Int, Int)] = {
      if (b == null) None
      else if (isPng(b)) {
        val w = be32(b, 16); val h = be32(b, 20)
        if (w > 0 && h > 0) Some(("image/png", w, h)) else None
      } else if (isGif(b)) {
        val w = le16(b, 6); val h = le16(b, 8)
        if (w > 0 && h > 0) Some(("image/gif", w, h)) else None
      } else if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) jpegDims(b)
      else None
    }

    private def isPng(b: Array[Byte]): Boolean =
      b.length >= 24 && u8(b, 0) == 0x89 && u8(b, 1) == 'P' && u8(b, 2) == 'N' &&
        u8(b, 3) == 'G' && u8(b, 4) == 0x0d && u8(b, 5) == 0x0a &&
        u8(b, 6) == 0x1a && u8(b, 7) == 0x0a &&
        // IHDR must be the first chunk (PNG spec) — dims sit at fixed offsets
        u8(b, 12) == 'I' && u8(b, 13) == 'H' && u8(b, 14) == 'D' && u8(b, 15) == 'R'

    private def isGif(b: Array[Byte]): Boolean =
      b.length >= 10 && u8(b, 0) == 'G' && u8(b, 1) == 'I' && u8(b, 2) == 'F' &&
        u8(b, 3) == '8' && (u8(b, 4) == '7' || u8(b, 4) == '9') && u8(b, 5) == 'a'

    /** Count the top-level image descriptors (0x2C) of a GIF — the REAL
      * animation frame count, by walking the block structure: header +
      * logical screen descriptor (+ global color table), then extension
      * blocks (0x21, length-prefixed sub-blocks), image descriptors
      * (0x2C: 9-byte descriptor + optional local color table + LZW min
      * code byte + data sub-blocks), trailer (0x3B). Malformed → None. */
    def gifFrames(b: Array[Byte]): Option[Int] = {
      if (!isGif(b)) return None
      var i = 13 // header(6) + logical screen descriptor(7)
      val packed = u8(b, 10)
      if ((packed & 0x80) != 0) i += 3 * (1 << ((packed & 0x07) + 1)) // global color table
      var frames = 0
      def skipSubBlocks(): Boolean = {
        while (i < b.length && u8(b, i) != 0) {
          i += 1 + u8(b, i)
          if (i > b.length) return false
        }
        if (i >= b.length) return false
        i += 1 // block terminator
        true
      }
      while (i < b.length) {
        u8(b, i) match {
          case 0x3b => return if (frames > 0) Some(frames) else None // trailer
          case 0x21 => // extension: label byte then sub-blocks
            i += 2
            if (!skipSubBlocks()) return None
          case 0x2c => // image descriptor
            if (i + 10 > b.length) return None
            val lp = u8(b, i + 9)
            i += 10
            if ((lp & 0x80) != 0) i += 3 * (1 << ((lp & 0x07) + 1)) // local color table
            i += 1 // LZW minimum code size
            if (!skipSubBlocks()) return None
            frames += 1
          case _ => return None // desync → corrupt
        }
      }
      None // ran off the end without a trailer
    }

    /** WAV (RIFF) audio metadata: (sample_rate, n_samples) from the fmt
      * and data chunks — real chunk walking, no codec. */
    def wavMeta(b: Array[Byte]): Option[(Int, Int)] = {
      def le32(i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8) |
        (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
      def tag(i: Int, t: String): Boolean =
        i + 4 <= b.length && (0 until 4).forall(j => u8(b, i + j) == t.charAt(j))
      if (b == null || b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
      var i = 12
      var rate = 0
      var blockAlign = 0
      while (i + 8 <= b.length) {
        val size = le32(i + 4)
        if (size < 0) return None
        if (tag(i, "fmt ")) {
          if (i + 8 + 16 > b.length) return None
          rate = le32(i + 12)
          blockAlign = le16(b, i + 20)
        } else if (tag(i, "data")) {
          if (rate <= 0 || blockAlign <= 0) return None
          return Some((rate, size / blockAlign))
        }
        // advance with a Long bound check: a corrupt chunk size near
        // Int.MaxValue would overflow `i` negative and index the array at
        // a negative offset (AIOOBE → task failure, breaking the
        // malformed→None contract) if added in Int arithmetic
        val adv = i.toLong + 8L + size + (size & 1) // chunks are word-aligned
        if (adv > b.length) return None
        i = adv.toInt
      }
      None
    }

    /** Walk JPEG marker segments to the first SOFn frame header. */
    private def jpegDims(b: Array[Byte]): Option[(String, Int, Int)] = {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xff) return None // desync → corrupt
        var m = u8(b, i + 1)
        while (m == 0xff && i + 2 < b.length) { i += 1; m = u8(b, i + 1) } // fill bytes
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2 // standalone
        else if (m == 0xd9) return None // EOI before any SOF
        else {
          val len = be16(b, i + 2)
          if (len < 2) return None
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (i + 8 >= b.length) return None
            val h = be16(b, i + 5); val w = be16(b, i + 7)
            return if (w > 0 && h > 0) Some(("image/jpeg", w, h)) else None
          }
          i += 2 + len
        }
      }
      None
    }
  }

  /** REAL cross-media decoder — the "image/audio/video as opaque binary +
    * typed metadata" surface in one Decoder: image headers (JPEG/PNG/GIF
    * dims via [[HeaderDecoder.sniff]]), GIF ANIMATION frame counts
    * (real block walk — the n_frames that [[frameSampleIndices]]
    * consumes), and WAV audio (sample_rate + sample count from the RIFF
    * chunk list). All pure JVM byte reads that stop early — the 100 TB
    * metadata pass never touches pixel/sample payloads. */
  final class MediaDecoder extends Decoder {
    def decode(path: String, bytes: Array[Byte]): Option[Decoded] =
      HeaderDecoder.sniff(bytes) match {
        case Some((mime @ "image/gif", w, h)) =>
          Some(Decoded(mime, w, h, HeaderDecoder.gifFrames(bytes).getOrElse(1), 0))
        case Some((mime, w, h)) => Some(Decoded(mime, w, h, 1, 0))
        case None =>
          HeaderDecoder.wavMeta(bytes).map { case (rate, samples) =>
            Decoded("audio/wav", 0, 0, samples, rate)
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
