package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tagger interface + deterministic stub (SURVEY.md §2.9 U1).
  *
  * Reference: `/root/reference/dataruu/tagger/tagger.py:40-93` — an ONNX
  * model scoring each image against a 9k-tag vocabulary, returning
  * tag→confidence maps that downstream stages threshold (F3), argmax (A7)
  * and confidence-sort (O2).
  *
  * The model itself is out of the data plane (offline env, SURVEY.md §7.4);
  * what the engine owns is the *integration shape*: a per-partition-
  * initialized opaque scorer (the Spark analogue of the reference's
  * per-process ONNX session) whose output feeds relational stages. Two
  * implementations, proven equal in `TaggerSpec`:
  *
  *  - [[stubConf]]: the deterministic stub as a codegen'd column expression
  *    (oracle-checkable — used by the q53 driver query);
  *  - [[scoreDF]]: the same scores through `mapPartitions` with explicit
  *    per-partition scorer init — the real integration path a model plugs
  *    into. Partition-parallel, no shuffle, no driver collect.
  */
object Tagger {

  /** Scorer contract: batch of keys → per-key confidences over `vocab`.
    * Implementations must be Serializable (shipped to executors) and are
    * initialized once per partition (session init amortized like
    * `tagger.py:25`'s InferenceSession). */
  trait Scorer extends Serializable {
    def vocab: Seq[String]
    def confidences(key: String): Seq[Double]
  }

  /** Deterministic stub: conf(key, tag) = hash31(key + "|" + tag) / P31 —
    * the exact arithmetic of [[Hashing.hash31]], computed JVM-side. */
  final class StubScorer(val vocab: Seq[String]) extends Scorer {
    @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
    def confidences(key: String): Seq[Double] = vocab.map { t =>
      val hex = md.digest(s"$key|$t".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16) % Hashing.P31).toDouble / Hashing.P31
    }
  }

  /** The stub as a column expression: identical value to [[StubScorer]]. */
  def stubConf(key: Column, tag: Column): Column =
    Hashing.hash31(concat(key, lit("|"), tag)) / lit(Hashing.P31.toDouble)

  def stubConfSql(key: String, tag: String): String =
    s"${Hashing.hash31Sql(s"$key || '|' || $tag")} / ${Hashing.P31}.0"

  /** Vectorized scorer contract: score a whole batch in one call — the
    * `session.run(batch)` shape real ONNX inference wants (the reference
    * runs batch=1, `tagger.py:62` `np.expand_dims`; this generalizes it —
    * the brief's `mapInPandas` batch-UDF analogue). Must return one
    * confidence row per input key, in order. */
  trait BatchScorer extends Serializable {
    def vocab: Seq[String]
    def scoreBatch(keys: Seq[String]): Seq[Seq[Double]]
  }

  /** Any row-at-a-time [[Scorer]] lifted to the batch contract. */
  final class RowwiseBatch(inner: Scorer) extends BatchScorer {
    def vocab: Seq[String] = inner.vocab
    def scoreBatch(keys: Seq[String]): Seq[Seq[Double]] = keys.map(inner.confidences)
  }

  /** Tensor-input batch scorer — the contract a REAL ONNX session
    * implements: one float32 HWC tensor per image (the batch Seq is the
    * NHWC batch dimension), one confidence row per tensor, in order.
    * Fed by [[ImagePreproc.scoreImagesDF]] with real decoded pixels;
    * only the model behind this trait is out of the data plane. */
  trait TensorBatchScorer extends Serializable {
    def vocab: Seq[String]
    def scoreBatch(tensors: Seq[Array[Float]]): Seq[Seq[Double]]
  }

  /** Deterministic stand-in model (no ONNX runtime in this container):
    * conf(tensor, tag_j) = hash-mix of the tensor's exact integer pixel
    * sum with j — a pure function of the REAL preprocessed pixels, so
    * golden tests pin end-to-end decode → preprocess → score values. */
  final class StubTensorScorer(val vocab: Seq[String]) extends TensorBatchScorer {
    def scoreBatch(tensors: Seq[Array[Float]]): Seq[Seq[Double]] =
      tensors.map { t =>
        var s = 0L
        var i = 0
        while (i < t.length) { s += t(i).toLong; i += 1 } // exact: uint8 values
        vocab.indices.map { j =>
          ((s * Hashing.MixA + j) % Hashing.P31).toDouble / Hashing.P31
        }
      }
  }

  /** Production scorer chooser for [[ImagePreproc.scoreImagesDF]]: the
    * env-gated REAL ONNX session when configured (`GRAFT_ONNX_MODEL` —
    * [[OnnxScorer.ifConfigured]]; its own labels file supplies the
    * vocabulary), else the deterministic stub over `vocab` (this
    * sandbox — every oracle query pins the stub's values, so flipping
    * the env var never changes a CORRECTNESS row, only the model). */
  def tensorScorer(vocab: Seq[String]): TensorBatchScorer =
    OnnxScorer.ifConfigured().getOrElse(new StubTensorScorer(vocab))

  /** U1 integration path: score every row's `keyCol` against the scorer's
    * vocabulary via mapPartitions (scorer constructed once per partition),
    * producing (key, tags array<struct<tag, conf>>). */
  def scoreDF(df: DataFrame, keyCol: String, mkScorer: () => Scorer): DataFrame =
    scoreDFBatched(df, keyCol, () => new RowwiseBatch(mkScorer()), batchSize = 1)

  /** Batched variant: rows are fed to the scorer `batchSize` at a time
    * (grouped lazily inside each partition — no partition-wide
    * materialization), amortizing per-call model overhead exactly like the
    * batch dimension of an ONNX input tensor. */
  def scoreDFBatched(df: DataFrame, keyCol: String, mkScorer: () => BatchScorer,
                     batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("string")).as[String]
    keys.mapPartitions { it =>
      val scorer = mkScorer() // per-partition init, like an ONNX session
      val vocab = scorer.vocab
      it.grouped(batchSize).flatMap { batch =>
        batch.zip(scorer.scoreBatch(batch)).map { case (k, confs) =>
          (k, vocab.zip(confs))
        }
      }
    }.toDF(keyCol, "scores")
      .withColumn("scores",
        transform(col("scores"), s =>
          struct(s.getField("_1").as("tag"), s.getField("_2").as("conf"))))
  }
}
