package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Compaction

/** Compaction contract: content-preserving, hits the computed file count,
  * honors the three rewrite modes (narrow coalesce, rebalancing shuffle,
  * sort-restoring range write). */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_compact").toString

  private def writeFragmented(dir: String, parts: Int): Unit =
    (1 to 1000).map(i => (i.toLong, s"doc$i", i % 7))
      .toDF("id", "name", "grp")
      .repartition(parts)
      .write.mode("overwrite").parquet(dir)

  test("plan counts data files and sizes the target from actual bytes") {
    val dir = freshDir()
    writeFragmented(dir, 40)
    val (nFiles, total, _) = Compaction.plan(spark, dir, 1L << 20)
    assert(nFiles == 40 && total > 0)
    // a huge target always plans a single file
    assert(Compaction.plan(spark, dir, Long.MaxValue / 2)._3 == 1)
    // a 1-byte target plans one file per byte bucket, bounded by total
    assert(Compaction.plan(spark, dir, total)._3 == 1)
    assert(Compaction.plan(spark, dir, total / 4 + 1)._3 == 4)
  }

  test("coalesce compaction: content identical, file count reduced to plan") {
    val dir = freshDir(); val out = freshDir()
    writeFragmented(dir, 40)
    val (_, total, _) = Compaction.plan(spark, dir, 1L << 20)
    val n = Compaction.compact(spark, dir, out, total / 3 + 1)
    assert(n == 3)
    val files = Compaction.dataFiles(spark, out).filter(_._1.endsWith(".parquet"))
    assert(files.length == 3, s"got ${files.map(_._1)}")
    val before = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    val after = spark.read.parquet(out).collect().map(_.toSeq).toSet
    assert(after == before)
  }

  test("hidden-directory files are excluded from sizing, like spark.read") {
    val dir = freshDir()
    writeFragmented(dir, 4)
    val (n0, total0, _) = Compaction.plan(spark, dir, 1L << 20)
    // plant a ghost part file under _temporary (killed-writer debris)
    val ghost = new java.io.File(s"$dir/_temporary/0")
    ghost.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_temporary/0/part-ghost.parquet"),
      Array.fill[Byte](4096)(1))
    val (n1, total1, _) = Compaction.plan(spark, dir, 1L << 20)
    assert(n1 == n0 && total1 == total0,
      s"ghost file leaked into sizing: $n0/$total0 vs $n1/$total1")
  }

  test("compaction can GROW the file count past the read partitioning") {
    val dir = freshDir(); val out = freshDir()
    writeFragmented(dir, 1) // one file; read yields 1 partition
    val (_, total, _) = Compaction.plan(spark, dir, 1L << 20)
    val n = Compaction.compact(spark, dir, out, total / 4 + 1)
    assert(n == 4)
    val files = Compaction.dataFiles(spark, out).filter(_._1.endsWith(".parquet"))
    assert(files.length == 4, s"coalesce silently capped growth: ${files.length}")
    assert(spark.read.parquet(out).collect().map(_.toSeq).toSet ==
      spark.read.parquet(dir).collect().map(_.toSeq).toSet)
  }

  test("shuffle compaction balances output files") {
    val dir = freshDir(); val out = freshDir()
    writeFragmented(dir, 40)
    val (_, total, _) = Compaction.plan(spark, dir, 1L << 20)
    Compaction.compact(spark, dir, out, total / 4 + 1, shuffle = true)
    val sizes = Compaction.dataFiles(spark, out)
      .filter(_._1.endsWith(".parquet")).map(_._2)
    assert(sizes.length == 4)
    // round-robin balance: no output file more than 2x the smallest
    assert(sizes.max <= sizes.min * 2, s"unbalanced: $sizes")
  }

  test("sortBy compaction restores clustering while compacting") {
    val dir = freshDir(); val out = freshDir()
    writeFragmented(dir, 40)
    val (_, total, _) = Compaction.plan(spark, dir, 1L << 20)
    Compaction.compact(spark, dir, out, total / 2 + 1, sortBy = Seq("id"))
    val after = spark.read.parquet(out)
    assert(after.collect().map(_.toSeq).toSet ==
      spark.read.parquet(dir).collect().map(_.toSeq).toSet)
    // range partitioning: per-file id ranges must not overlap
    val ranges = Compaction.dataFiles(spark, out)
      .filter(_._1.endsWith(".parquet")).map(_._1).map { f =>
        val ids = spark.read.parquet(f).select(col("id")).collect().map(_.getLong(0))
        (ids.min, ids.max)
      }.sortBy(_._1)
    assert(ranges.sliding(2).forall {
      case Seq((_, hi), (lo, _)) => hi < lo
      case _ => true
    }, s"overlapping file ranges: $ranges")
  }
}
