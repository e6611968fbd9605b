package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance pass every long-running
  * ingest needs: streaming micro-batches and per-task writers leave
  * thousands of KB-scale parquet files, and at 100 TB the resulting
  * footer/open overhead dominates scan time (one task per file, ~100k
  * wasted tasks). Compaction rewrites a directory to ⌈total/target⌉
  * right-sized files.
  *
  * Sizing uses the ACTUAL on-disk byte totals from the file system
  * listing, not row counts — compression ratios vary too much across
  * columns for row-based sizing to hold. The rewrite is `coalesce` by
  * default (narrow, shuffle-free — each output task concatenates input
  * splits); pass `shuffle = true` to rebalance pathologically skewed
  * inputs through a round-robin exchange, or `sortBy` to restore a
  * clustering (e.g. a [[ZOrder]] key) while compacting.
  *
  * At cluster scale one compaction job per partition directory (date/
  * lang/…) keeps the unit of work bounded; this operator is that unit.
  */
object Compaction {

  /** Data-file listing of a table directory: (path, bytes) per part file,
    * recursive, metadata/hidden files excluded. EVERY path segment below
    * the root is checked (as Spark's own file index does) — a part file
    * under `_temporary/` left by a killed writer is invisible to
    * `spark.read` and must not inflate the sizing either. */
  def dataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootDepth = p.toUri.getPath.split("/").count(_.nonEmpty)
    val it = fs.listFiles(p, true)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      val segs = f.getPath.toUri.getPath.split("/").filter(_.nonEmpty)
        .drop(rootDepth)
      if (!segs.exists(s => s.startsWith("_") || s.startsWith(".")))
        out += ((f.getPath.toString, f.getLen))
    }
    out.toSeq
  }

  /** Compaction plan: (fileCount, totalBytes, targetFileCount). */
  def plan(spark: SparkSession, dir: String, targetBytes: Long): (Int, Long, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val files = dataFiles(spark, dir)
    val total = files.map(_._2).sum
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    (files.length, total, n)
  }

  /** Rewrite `dir` into `outDir` as ⌈totalBytes/targetBytes⌉ files.
    * Returns the target file count. */
  def compact(spark: SparkSession, dir: String, outDir: String,
              targetBytes: Long, shuffle: Boolean = false,
              sortBy: Seq[String] = Nil): Int = {
    val (_, _, n) = plan(spark, dir, targetBytes)
    val df = spark.read.parquet(dir)
    val sized: DataFrame =
      if (sortBy.nonEmpty)
        // one range exchange gives both the file count and the clustering
        df.repartitionByRange(n, sortBy.map(col): _*)
          .sortWithinPartitions(sortBy.map(col): _*)
      else if (shuffle) df.repartition(n)
      // coalesce can only SHRINK the partition count — splitting few big
      // files into many smaller ones needs the exchange
      else if (n > df.rdd.getNumPartitions) df.repartition(n)
      else df.coalesce(n)
    sized.write.mode("overwrite").parquet(outDir)
    n
  }
}
