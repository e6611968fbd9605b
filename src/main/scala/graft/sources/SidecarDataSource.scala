package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's sidecar-file layout
  * (SURVEY.md §2.1 S4/S5): a directory of `{id}.txt` / `{id}.caption`
  * files next to images, one row per file —
  * `(image_key = basename sans extension, line = first line)`, the same
  * relation [[graft.ops.Sources.sidecarText]] builds over `binaryFile`.
  *
  *   spark.read.format("graft.sources.SidecarDataSource")
  *     .option("ext", "txt").load(dir)
  *
  * Why a connector and not just the binaryFile spelling: it exercises the
  * full DSv2 surface (TableProvider → Table → ScanBuilder → Scan/Batch →
  * InputPartition → PartitionReader) the way a production format would —
  * driver-side listing once, then file-granularity input partitions that
  * scale out by file count exactly like binaryFile. Readers stream one
  * file at a time (only the first line is decoded — sidecars are tiny).
  */
class SidecarDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SidecarDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SidecarTable(properties.asScala.toMap)
}

object SidecarDataSource {
  val schema: StructType = StructType(Seq(
    StructField("image_key", StringType, nullable = false),
    StructField("line", StringType, nullable = true)))
  val Name = "graft.sources.SidecarDataSource"
}

private[sources] class SidecarTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"sidecar(${props.getOrElse("path", "")})"
  override def schema(): StructType = SidecarDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val path = Option(options.get("path"))
      .orElse(props.get("path"))
      .getOrElse(throw new IllegalArgumentException("sidecar source needs a path"))
    val ext = Option(options.get("ext")).orElse(props.get("ext")).getOrElse("txt")
    // Column pruning pushes into the source: a key-only projection never
    // OPENS the sidecar files — the key is derived from the listing alone.
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = SidecarDataSource.schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = SidecarScan(path, ext, required)
    }
  }
}

private[sources] case class SidecarScan(path: String, ext: String,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SidecarScan(path=$path, ext=$ext, columns=${required.fieldNames.mkString(",")})"

  /** Driver-side listing, once; one partition per file so a directory of
    * millions of sidecars fans out across executors like binaryFile. */
  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration)
    fs.listStatus(p).iterator
      .filter(st => st.isFile && st.getPath.getName.endsWith(s".$ext"))
      .map(st => SidecarFilePartition(st.getPath.toString): InputPartition)
      .toArray
  }

  /** The session's Hadoop configuration is shipped to the executor-side
    * readers (SerializableConfiguration), so custom FS settings — s3a
    * credentials, endpoints, defaultFS — resolve the SAME filesystem the
    * driver listed. A fresh `new Configuration()` on the executor would
    * silently drop them. */
  override def createReaderFactory(): PartitionReaderFactory =
    new SidecarReaderFactory(required.fieldNames,
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))
}

private[sources] case class SidecarFilePartition(file: String) extends InputPartition

private[sources] class SidecarReaderFactory(columns: Array[String],
    hadoopConf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[SidecarFilePartition].file
    new PartitionReader[InternalRow] {
      private var done = false
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (done) return false
        val p = new Path(file)
        // Open the file ONLY if the pruned schema asks for `line`.
        lazy val line: String = {
          val fs = p.getFileSystem(hadoopConf.value)
          val in = fs.open(p)
          try {
            val br = new java.io.BufferedReader(
              new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
            br.readLine() // only the first line, like the reference parse
          } finally in.close()
        }
        val base = p.getName
        val key = base.substring(0, base.lastIndexOf('.'))
        val values: Array[Any] = columns.map {
          case "image_key" => UTF8String.fromString(key)
          case "line" => if (line == null) null else UTF8String.fromString(line)
        }
        row = InternalRow.fromSeq(values.toIndexedSeq)
        done = true
        true
      }

      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
