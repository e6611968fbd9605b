package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource V2 `TableCatalog` over a warehouse directory of
  * [[SnapshotTable]] roots — the pure-SQL surface of the snapshot
  * format, so a SQL-only user never touches the object API:
  *
  * {{{
  *   spark.sql.catalog.snap           = graft.sources.SnapshotCatalog
  *   spark.sql.catalog.snap.warehouse = /data/warehouse
  *
  *   CREATE TABLE snap.db.docs (doc_id BIGINT, lang STRING)
  *     PARTITIONED BY (bucket(16, doc_id))          -- keys + buckets
  *   INSERT INTO snap.db.docs SELECT ...            -- manifest append
  *   INSERT OVERWRITE snap.db.docs SELECT ...       -- overwrite commit
  *   SELECT * FROM snap.db.docs VERSION AS OF 2     -- time travel
  *   SELECT * FROM snap.db.docs TIMESTAMP AS OF '...'
  *   ALTER TABLE snap.db.docs ADD COLUMN score DOUBLE
  *   ALTER TABLE snap.db.docs RENAME TO snap.db.docs2
  *   DROP TABLE snap.db.docs
  * }}}
  *
  * Layout is directory-per-namespace under the warehouse root, with a
  * table = any directory holding a `_manifests` catalog — the metadata
  * IS the filesystem, so there is no extra service to run and
  * `listTables` is one directory listing (the Delta "path-based tables
  * plus a thin name mapping" shape, not a Hive metastore port).
  *
  * Reads resolve through [[SnapshotV2Table]], so SQL queries get the
  * same snapshot pinning, bucket pruning, data-skipping stats, and
  * vectorized parquet scan as `spark.read.format("graft-snapshot")`;
  * `VERSION AS OF` / `TIMESTAMP AS OF` land on the connector's
  * `versionAsOf` / `timestampAsOf` (Spark hands the catalog timestamps
  * in MICROseconds; manifests stamp millis). Writes ride the V2→V1
  * `InsertableRelation` bridge ([[TableCapability.V1_BATCH_WRITE]]):
  * `INSERT INTO` is a manifest append, `INSERT OVERWRITE` an overwrite
  * commit — both the same atomic publish protocol as library callers,
  * and history stays readable through time travel afterwards.
  *
  * Scale note: every catalog operation is O(manifests) driver metadata
  * (+ one directory listing for DDL); no data files are read or moved
  * except by DROP (delete) and ALTER RENAME (one filesystem rename +
  * an O(versions) manifest rewrite, see [[SnapshotTable.rename]]).
  */
class SnapshotCatalog extends TableCatalog with SupportsNamespaces {

  private var catName: String = _
  private var warehouse: String = _

  private def spark = SparkSession.active
  private def fsys: FileSystem =
    new Path(warehouse).getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = Option(options.get("warehouse")).map(_.stripSuffix("/"))
      .getOrElse(throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.warehouse must point at the warehouse root"))
  }

  override def name(): String = catName

  /** One path segment of an identifier — rejected rather than escaped,
    * so a crafted table name can never traverse out of the warehouse. */
  private def segment(s: String): String = {
    require(s.nonEmpty && s != "." && s != ".." && !s.contains("/") &&
      !s.startsWith("_") && !s.startsWith("."),
      s"illegal catalog name segment '$s'")
    s
  }

  private def nsPath(namespace: Seq[String]): Path =
    namespace.foldLeft(new Path(warehouse))((p, s) => new Path(p, segment(s)))

  private def tableRoot(ident: Identifier): String =
    new Path(nsPath(ident.namespace.toSeq), segment(ident.name)).toString

  private def isTableDir(p: Path): Boolean =
    fsys.exists(new Path(p, "_manifests"))

  // ---- tables ----

  override def tableExists(ident: Identifier): Boolean =
    SnapshotTable.versions(spark, tableRoot(ident)).nonEmpty

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsPath(namespace.toSeq)
    if (!fsys.exists(dir)) throw new NoSuchNamespaceException(
      catName +: namespace)
    fsys.listStatus(dir).toSeq
      .filter(st => st.isDirectory && isTableDir(st.getPath))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  private def load(ident: Identifier, opts: Map[String, String]): Table = {
    val root = tableRoot(ident)
    if (SnapshotTable.versions(spark, root).isEmpty)
      throw new NoSuchTableException(
        (catName +: ident.namespace.toSeq :+ ident.name).toArray.toSeq)
    val resolved = SnapshotV2Table.resolve(new CaseInsensitiveStringMap(
      (opts + ("path" -> root)).asJava))
    new SnapshotCatalogTable(root, resolved.snapshot)
  }

  override def loadTable(ident: Identifier): Table = load(ident, Map.empty)

  /** `VERSION AS OF n`. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Map("versionAsOf" -> version))

  /** `TIMESTAMP AS OF t` — Spark passes MICROseconds since the epoch;
    * manifest commit stamps are millis. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    load(ident, Map("timestampAsOf" -> (timestamp / 1000L).toString))

  /** `bucket(n, cols…)` partition transform → the table's key columns +
    * bucket count (the format's native layout). Anything else has no
    * snapshot-table meaning and is rejected loudly. */
  private def parseBucket(t: Transform): (Int, Seq[String]) = {
    // structural, not a BucketTransform type match (that class is
    // private[sql]): a bucket transform is name "bucket" with one int
    // literal argument (the count) and the key columns as references
    if (t.name != "bucket") throw new UnsupportedOperationException(
      s"snapshot tables only support PARTITIONED BY (bucket(n, keys…)), " +
        s"got $t")
    val n = t.arguments.collectFirst { case l: Literal[_] =>
      l.value.toString.toInt }
    val cols = t.arguments.collect { case r: NamedReference =>
      r.fieldNames.mkString(".") }.toSeq
    (n.getOrElse(sys.error(s"bucket transform without a count: $t")), cols)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val root = tableRoot(ident)
    if (tableExists(ident)) throw new TableAlreadyExistsException(
      (catName +: ident.namespace.toSeq :+ ident.name).toArray.toSeq)
    val props = properties.asScala
    def prop(k: String): Option[String] =
      props.get(k).orElse(props.get(TableCatalog.OPTION_PREFIX + k))
    // keys/buckets from the bucket transform (preferred), else properties
    val (buckets, keys) = partitions.toSeq match {
      case Seq() => (
        prop("buckets").map(_.toInt).getOrElse(16),
        prop("keys").map(_.split(",").toSeq.filter(_.nonEmpty))
          .getOrElse(Seq.empty))
      case Seq(one) => parseBucket(one)
      case many => throw new UnsupportedOperationException(
        s"snapshot tables take ONE bucket(n, keys…) transform, got $many")
    }
    val statsCols = prop("statscols")
      .map(s => s.split(",").toSeq.filter(_.nonEmpty))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    SnapshotTable.create(empty, root, keys, buckets, statsCols)
    loadTable(ident)
  }

  /** ADD COLUMNS only (the format's add-column evolution): an empty
    * append commit with the extended schema — no data file is touched,
    * old versions keep their own schema under time travel. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val root = tableRoot(ident)
    val cur = SnapshotTable.versions(spark, root).lastOption.getOrElse(
      throw new NoSuchTableException(
        (catName +: ident.namespace.toSeq :+ ident.name).toArray.toSeq))
    val adds = changes.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          s"nested ADD COLUMN unsupported: ${a.fieldNames.mkString(".")}")
        require(a.position == null,
          "ADD COLUMN positions unsupported: new columns append")
        org.apache.spark.sql.types.StructField(
          a.fieldNames.head, a.dataType, nullable = true)
      case other => throw new UnsupportedOperationException(
        s"snapshot tables only support ALTER TABLE … ADD COLUMNS, " +
          s"got $other")
    }
    val extended = StructType(StructType.fromDDL(cur.schemaDdl).fields ++ adds)
    SnapshotTable.append(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], extended),
      root, mergeSchema = true)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val root = new Path(tableRoot(ident))
    if (!fsys.exists(root) || !isTableDir(root)) false
    else fsys.delete(root, true)
  }

  override def renameTable(from: Identifier, to0: Identifier): Unit = {
    // Spark hands RENAME TO's destination through UNstripped: for
    // `ALTER TABLE cat.t RENAME TO cat.t2` the target arrives as
    // Identifier(["cat"], "t2") — drop the leading catalog-name segment
    // or the table nests under a phantom namespace named like us
    val to =
      if (to0.namespace.headOption.contains(catName))
        Identifier.of(to0.namespace.drop(1), to0.name)
      else to0
    if (!tableExists(from)) throw new NoSuchTableException(
      (catName +: from.namespace.toSeq :+ from.name).toArray.toSeq)
    if (tableExists(to)) throw new TableAlreadyExistsException(
      (catName +: to.namespace.toSeq :+ to.name).toArray.toSeq)
    SnapshotTable.rename(spark, tableRoot(from), tableRoot(to))
  }

  // ---- namespaces: directories without a _manifests catalog ----

  private def listNs(parent: Path): Seq[Array[String]] =
    if (!fsys.exists(parent)) Seq.empty
    else fsys.listStatus(parent).toSeq
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".") && !isTableDir(st.getPath))
      .map(st => Array(st.getPath.getName))

  override def listNamespaces(): Array[Array[String]] =
    listNs(new Path(warehouse)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val dir = nsPath(namespace.toSeq)
    if (!fsys.exists(dir)) throw new NoSuchNamespaceException(
      catName +: namespace)
    listNs(dir).map(namespace ++ _).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (fsys.exists(nsPath(namespace.toSeq)) &&
        !isTableDir(nsPath(namespace.toSeq)))

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(catName +: namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(namespace) && namespace.nonEmpty)
      throw new NamespaceAlreadyExistsException(catName +: namespace)
    fsys.mkdirs(nsPath(namespace.toSeq))
    ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "snapshot catalog namespaces carry no metadata to alter")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    val dir = nsPath(namespace.toSeq)
    if (!cascade && fsys.listStatus(dir).nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
        catName +: namespace)
    fsys.delete(dir, true)
  }
}

/** A catalog-loaded snapshot table: the connector's read surface
  * ([[SnapshotV2Table]] scan building — pruning, stats skipping,
  * streaming source) PLUS the SQL write surface via the V2→V1
  * `InsertableRelation` bridge, so `INSERT INTO` / `INSERT OVERWRITE` /
  * CTAS land on the same manifest commit protocol as the object API.
  * The path-based `TableProvider` table deliberately does NOT carry
  * this capability — `df.write.format("graft-snapshot")` keeps its
  * richer V1 seam (create-on-first-write options, op=upsert/delete). */
private[sources] class SnapshotCatalogTable(path: String,
    snapshot: SnapshotTable.Snapshot)
    extends SnapshotV2Table(path, snapshot) with SupportsWrite {

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new SnapshotCatalogWriteBuilder(path)
}

/** INSERT INTO → manifest append; truncate (INSERT OVERWRITE's
  * always-true filter) → overwrite commit. Both keep history readable
  * through time travel — "overwrite" replaces the LIVE entry list, it
  * deletes no data file (vacuum does that, with its in-flight guard). */
private[sources] class SnapshotCatalogWriteBuilder(path: String)
    extends WriteBuilder with SupportsTruncate {

  private var overwriteAll = false

  override def truncate(): WriteBuilder = { overwriteAll = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: org.apache.spark.sql.DataFrame,
            overwrite: Boolean): Unit = {
          if (overwriteAll || overwrite) SnapshotTable.overwrite(data, path)
          else SnapshotTable.append(data, path)
          ()
        }
      }
  }
}
