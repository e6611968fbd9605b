package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.ops.Similarity

/** Streaming vector ingestion into the IVF bucket-partitioned ANN layout —
  * the [[DocIngest]] twin for the embedding side: vectors arrive as a file
  * stream, each micro-batch is bucket-coded and APPENDED to the stored
  * layout ([[graft.ops.Similarity.appendBucketed]] — new files land in
  * their bucket's partition directory, existing data never rewrites), so
  * probes running against the layout see new vectors as soon as their
  * batch commits.
  *
  * Scale shape: per micro-batch work is one narrow projection + a
  * partitioned parquet append of THAT batch — no state store, no shuffle
  * of the existing corpus, no layout rewrite. The bucket function (the
  * `planes`) is the layout contract and must match the original
  * [[graft.ops.Similarity.writeBucketed]] call. Pass a stable
  * `checkpoint` for incremental exactly-once drains (same contract as
  * [[DocIngest.ingestWithIndex]]). */
object VecIngest {

  /** Parquet schema of the embeddings table (TESTDATA.md). */
  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Drain `srcDir`'s embeddings into the layout at `layoutPath` with
    * Trigger.AvailableNow. The layout must already exist (write it with
    * [[graft.ops.Similarity.writeBucketed]], possibly from an empty
    * frame). */
  def ingestAvailableNow(spark: SparkSession, srcDir: String,
      layoutPath: String, planes: Seq[Seq[Int]],
      checkpoint: Option[String] = None): Unit = {
    val writer0 = spark.readStream.schema(vecSchema)
      .parquet(s"$srcDir/embeddings.parque[t]")
      .writeStream
    val writer = checkpoint.fold(writer0)(c => writer0.option("checkpointLocation", c))
    val q = writer
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        Similarity.appendBucketed(
          batch.toDF().select(col("vec_id"),
            Similarity.toDouble(col("embedding")).as("v")),
          planes, layoutPath)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
