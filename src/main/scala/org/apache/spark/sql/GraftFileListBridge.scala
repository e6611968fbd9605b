package org.apache.spark.sql

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation, NoopCache, PartitionSpec, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Parquet reads over an EXPLICIT file list (name + exact length), the
  * way manifest-backed table formats read: the snapshot manifest records
  * every data file at commit time, so a scan needs ZERO filesystem
  * listings — no per-dir `listStatus` round trips and, critically, none
  * of the distributed "listing leaf files" jobs Spark launches when a
  * multi-dir read crosses `parallelPartitionDiscovery.threshold` (guide
  * §6: manifest metadata avoids directory listing altogether; the
  * strongest practical argument for table formats at scale). Same
  * package-located-accessor rationale as [[GraftParquetBridge]]: Delta's
  * `TahoeFileIndex` and Iceberg's `SparkScanBuilder` are this exact
  * shape over Spark's non-public scan internals. */
object GraftFileListBridge {

  /** A [[PartitioningAwareFileIndex]] serving a fully-known file list:
    * every method answers from memory. Lengths come from the commit-time
    * walk of immutable dirs, so split planning sees exact sizes.
    * Paths are QUALIFIED at construction (pure string work, no IO) —
    * `allFiles()` qualifies each root before its map lookup, so
    * scheme-less manifest paths would otherwise never match. */
  final class StaticFileIndex(spark: SparkSession, files0: Seq[FileStatus])
      extends PartitioningAwareFileIndex(spark, Map.empty, None, NoopCache) {
    private val files: Seq[FileStatus] = {
      val conf = spark.asInstanceOf[classic.SparkSession]
        .sessionState.newHadoopConf()
      files0.map { f =>
        val p = f.getPath
        val q = p.getFileSystem(conf).makeQualified(p)
        if (q == p) f
        else new FileStatus(f.getLen, false, f.getReplication,
          f.getBlockSize, f.getModificationTime, q)
      }
    }
    private val byDir: Map[Path, Array[FileStatus]] =
      files.groupBy(_.getPath.getParent)
        .map { case (d, fs) => d -> fs.toArray }
    private val lf = {
      val m = scala.collection.mutable.LinkedHashMap.empty[Path, FileStatus]
      files.foreach(f => m.put(f.getPath, f))
      m
    }
    override val rootPaths: Seq[Path] = byDir.keys.toSeq
    override def leafFiles
        : scala.collection.mutable.LinkedHashMap[Path, FileStatus] = lf
    override def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] = byDir
    override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec
    override def refresh(): Unit = ()
  }

  private def statuses(files: Seq[(String, Long)]): Seq[FileStatus] =
    files.map { case (p, len) =>
      // modTime/blockSize are never consulted for batch parquet splits;
      // length is, and it is exact (recorded from the post-write walk)
      new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, new Path(p))
    }

  /** V1 DataFrame over explicit parquet files under an explicit schema —
    * the listing-free twin of `spark.read.schema(s).parquet(dirs: _*)`. */
  def parquetDf(spark: SparkSession, files: Seq[(String, Long)],
      schema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val rel = HadoopFsRelation(new StaticFileIndex(spark, statuses(files)),
      StructType(Nil), schema, None, new ParquetFileFormat, Map.empty)(cs)
    classic.Dataset.ofRows(cs, LogicalRelation(rel, isStreaming = false))
  }

  /** V2 ScanBuilder over explicit files — the listing-free twin of
    * [[GraftParquetBridge.parquetScanBuilder]]. */
  def parquetScanBuilderFiles(spark: SparkSession,
      files: Seq[(String, Long)], schema: StructType): ScanBuilder =
    ParquetScanBuilder(spark, new StaticFileIndex(spark, statuses(files)),
      schema, schema,
      new CaseInsensitiveStringMap(java.util.Collections.emptyMap()))
}
