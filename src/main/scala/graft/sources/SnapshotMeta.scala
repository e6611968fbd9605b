package graft.sources

import java.util

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types.{StructType, StructField, LongType, IntegerType, StringType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Metadata tables for the snapshot format — the Iceberg `t$history` /
  * `t.files` introspection surface (Iceberg spec "Metadata tables";
  * Delta spells the same as `DESCRIBE HISTORY`): the table's own commit
  * log, live file list, and named refs, queryable as ordinary relations
  * so operators debug a 100 TB table with SQL instead of filesystem
  * spelunking.
  *
  * SQL (through [[SnapshotCatalog]], Iceberg's multipart spelling —
  * the metadata name is one extra identifier part after the table):
  *
  * {{{
  *   SELECT * FROM graftcat.db.t.history           -- one row per commit
  *   SELECT * FROM graftcat.db.t.files             -- live entries, latest
  *   SELECT * FROM graftcat.db.t.files VERSION AS OF 3
  *   SELECT * FROM graftcat.db.t.tags              -- named refs
  *   SELECT * FROM graftcat.db.t.branches          -- WAP lines
  *   SELECT * FROM graftcat.db.t.constraints       -- CHECK rules
  * }}}
  *
  * Object API: [[SnapshotMeta.history]], [[SnapshotMeta.files]],
  * [[SnapshotMeta.tags]], [[SnapshotMeta.branches]],
  * [[SnapshotMeta.constraints]].
  *
  * Scale shape: all five relations are MANIFEST-ONLY — O(versions) or
  * O(live entries) driver rows, never a data-file read, so `history`
  * on a 100 TB table costs the same as on a 100 MB one. They surface
  * as a V2 [[LocalScan]] (driver-local rows, the shape Spark plans as
  * a `LocalTableScan`), which is exactly right for metadata
  * cardinalities: entries ≈ buckets × commits-since-compaction, bounded
  * by the same compaction that bounds manifest size. */
object SnapshotMeta {

  /** `history` schema — one row per published version, ascending.
    * `added_dirs` counts the data dirs FIRST listed by this commit
    * (provenance: carried-forward entries belong to the commit that
    * wrote them, not to every later manifest that re-lists them);
    * `live_rows`/`live_bytes` are the manifest-arithmetic totals
    * ([[SnapshotTable.Snapshot.metadataRowCount]]) and are null when a
    * live dir predates row counting or merge-on-read deltas make
    * per-dir sums non-additive. */
  val HistorySchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("added_dirs", IntegerType, nullable = false),
    StructField("live_dirs", IntegerType, nullable = false),
    StructField("live_rows", LongType, nullable = true),
    StructField("live_bytes", LongType, nullable = true),
    StructField("txn_app", StringType, nullable = true),
    StructField("txn_batch", LongType, nullable = true),
    StructField("change_file", StringType, nullable = true)))

  /** `files` schema — one row per live entry of ONE resolved snapshot:
    * base data dirs (`kind = data`) plus unresolved merge-on-read
    * layers (`kind = rows | tomb`, with `seq` = the layering commit).
    * `added_version` is the first manifest that listed the dir. */
  val FilesSchema: StructType = StructType(Seq(
    StructField("bucket", IntegerType, nullable = false),
    StructField("dir", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("seq", LongType, nullable = true),
    StructField("rows", LongType, nullable = true),
    StructField("bytes", LongType, nullable = true),
    StructField("added_version", LongType, nullable = true),
    // bucket layout the dir was written under; differs from the
    // snapshot's current layout for not-yet-migrated dirs after a
    // rescale — `SELECT count(*) … WHERE layout != <current>` is the
    // migration-progress query
    StructField("layout", IntegerType, nullable = false),
    // decoded partition tuple ("days(ts)=19723/identity(lang)=en");
    // null for unpartitioned tables, delta layers, and staged dirs
    // without partition segments
    StructField("partition", StringType, nullable = true)))

  /** `partitions` schema — the Iceberg partitions-table shape: one row
    * per live partition tuple of ONE resolved snapshot, with dir/row/
    * byte totals (row/byte nulls when any member dir predates
    * counting). Empty on unpartitioned tables. */
  val PartitionsSchema: StructType = StructType(Seq(
    StructField("partition", StringType, nullable = false),
    StructField("dirs", IntegerType, nullable = false),
    StructField("rows", LongType, nullable = true),
    StructField("bytes", LongType, nullable = true)))

  /** `tags` schema — the named refs, one row per tag. */
  val TagsSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("version", LongType, nullable = false)))

  /** `branches` schema — write-audit-publish lines, one row per branch
    * (head == base for a branch with no commits yet). */
  val BranchesSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("base", LongType, nullable = false),
    StructField("head", LongType, nullable = false)))

  /** `constraints` schema — the CHECK constraints of one snapshot. */
  val ConstraintsSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("expression", StringType, nullable = false)))

  /** `defaults` schema — the column DEFAULTs of one snapshot:
    * `expression` is the write-side fill for future inserts;
    * `exists_value` is the frozen `ADD COLUMN … DEFAULT` literal old
    * files read at scan (null for plain write-side defaults). */
  val DefaultsSchema: StructType = StructType(Seq(
    StructField("column", StringType, nullable = false),
    StructField("expression", StringType, nullable = true),
    StructField("exists_value", StringType, nullable = true)))

  val MetaNames: Set[String] =
    Set("history", "files", "tags", "branches", "constraints",
      "partitions", "defaults")

  def schemaOf(kind: String): StructType = kind match {
    case "history" => HistorySchema
    case "files" => FilesSchema
    case "partitions" => PartitionsSchema
    case "tags" => TagsSchema
    case "branches" => BranchesSchema
    case "constraints" => ConstraintsSchema
    case "defaults" => DefaultsSchema
    case other => sys.error(s"unknown metadata table '$other'")
  }

  /** Rows for one metadata relation. `pin`: resolve `files` at this
    * snapshot, truncate `history` to versions ≤ it (so `VERSION AS OF`
    * on a metadata table reads as "the metadata a reader pinned there
    * would see"); None = latest / full history. */
  def rows(spark: SparkSession, root: String, kind: String,
      pin: Option[SnapshotTable.Snapshot]): Seq[Row] = {
    val snaps = SnapshotTable.versions(spark, root)
    require(snaps.nonEmpty, s"no snapshot table at $root")
    // first manifest version listing each dir — provenance for both
    // history.added_dirs and files.added_version, one ascending pass
    val firstListed = scala.collection.mutable.Map.empty[String, Long]
    snaps.foreach { s =>
      (s.entries.map(_._2) ++ s.deltas.map(_.dir)).foreach { d =>
        if (!firstListed.contains(d)) firstListed(d) = s.version
      }
    }
    kind match {
      case "history" =>
        val kept = pin match {
          case Some(p) => snaps.filter(_.version <= p.version)
          case None => snaps
        }
        kept.map { s =>
          val live = s.entries.map(_._2) ++ s.deltas.map(_.dir)
          Row(s.version, s.ts, s.op,
            live.count(d => firstListed(d) == s.version),
            live.size,
            s.metadataRowCount.map(Long.box).orNull,
            s.metadataSizeBytes.map(Long.box).orNull,
            s.txn.map(_._1).orNull,
            s.txn.map(t => Long.box(t._2)).orNull,
            s.cdc.orNull)
        }
      case "files" =>
        val s = pin.getOrElse(snaps.last)
        val base = s.entries.map { case (b, d) =>
          Row(b, d, "data", null,
            s.dirRows.get(d).map(Long.box).orNull,
            s.dirBytes.get(d).map(Long.box).orNull,
            firstListed.get(d).map(Long.box).orNull,
            s.layoutOf(d),
            SnapshotTable.partValuesOf(s.partSpec, d).orNull)
        }
        val layers = s.deltas.map { e =>
          Row(e.bucket, e.dir, e.kind, Long.box(e.seq),
            s.dirRows.get(e.dir).map(Long.box).orNull,
            s.dirBytes.get(e.dir).map(Long.box).orNull,
            firstListed.get(e.dir).map(Long.box).orNull,
            s.buckets, // deltas are always current-layout by invariant
            null) // delta layers carry no partition segments
        }
        base ++ layers
      case "partitions" =>
        val s = pin.getOrElse(snaps.last)
        s.entries.flatMap { case (_, d) =>
          SnapshotTable.partValuesOf(s.partSpec, d).map(_ -> d)
        }.groupBy(_._1).toSeq.sortBy(_._1).map { case (p, ds) =>
          val dirs = ds.map(_._2)
          Row(p, dirs.size,
            (if (dirs.forall(s.dirRows.contains))
              Some(Long.box(dirs.map(s.dirRows).sum)) else None).orNull,
            (if (dirs.forall(s.dirBytes.contains))
              Some(Long.box(dirs.map(s.dirBytes).sum)) else None).orNull)
        }
      case "tags" =>
        SnapshotTable.tags(spark, root).map { case (n, v) => Row(n, v) }
      case "branches" =>
        SnapshotTable.branchList(spark, root).map { case (n, b, h) =>
          Row(n, b, h)
        }
      case "constraints" =>
        val s = pin.getOrElse(snaps.last)
        s.constraints.toSeq.sortBy(_._1).map { case (n, e) => Row(n, e) }
      case "defaults" =>
        val s = pin.getOrElse(snaps.last)
        (s.colDefaults.keySet ++ s.existsDefaults.keySet).toSeq.sorted
          .map(c => Row(c, s.colDefaults.get(c).orNull,
            s.existsDefaults.get(c).orNull))
      case other => sys.error(s"unknown metadata table '$other'")
    }
  }

  /** Commit history as a DataFrame — `DESCRIBE HISTORY` for the object
    * API. */
  def history(spark: SparkSession, root: String): DataFrame =
    toDf(spark, root, "history", None)

  /** Live file list of one snapshot (latest / `version` / `tag` /
    * newest-commit-≤-`asOfTimestamp`, same resolution as
    * [[SnapshotTable.read]]). */
  def files(spark: SparkSession, root: String,
      version: Option[Long] = None,
      asOfTimestamp: Option[Long] = None,
      tag: Option[String] = None): DataFrame = {
    val opts = version.map(v => "versionAsOf" -> v.toString).toMap ++
      asOfTimestamp.map(t => "timestampAsOf" -> t.toString) ++
      tag.map(t => "tagAsOf" -> t)
    toDf(spark, root, "files", Some(opts))
  }

  /** Named refs as a DataFrame. */
  def tags(spark: SparkSession, root: String): DataFrame =
    toDf(spark, root, "tags", None)

  /** Branches as a DataFrame. */
  def branches(spark: SparkSession, root: String): DataFrame =
    toDf(spark, root, "branches", None)

  /** Per-partition dir/row/byte totals of the latest snapshot. */
  def partitions(spark: SparkSession, root: String): DataFrame =
    toDf(spark, root, "partitions", None)

  /** CHECK constraints of the head snapshot as a DataFrame. */
  def constraints(spark: SparkSession, root: String): DataFrame =
    toDf(spark, root, "constraints", None)

  /** Write-side column DEFAULTs of the head snapshot as a DataFrame. */
  def defaults(spark: SparkSession, root: String): DataFrame =
    toDf(spark, root, "defaults", None)

  private def toDf(spark: SparkSession, root: String, kind: String,
      opts: Option[Map[String, String]]): DataFrame = {
    val pin = opts.filter(_.nonEmpty).map(resolvePin(spark, root, _))
    spark.createDataFrame(
      util.Arrays.asList(rows(spark, root, kind, pin): _*),
      schemaOf(kind))
  }

  /** Resolve versionAsOf/tagAsOf/timestampAsOf options to one snapshot
    * with the connector's exact rules (numeric-or-tag `versionAsOf`
    * included). */
  def resolvePin(spark: SparkSession, root: String,
      opts: Map[String, String]): SnapshotTable.Snapshot = {
    import scala.jdk.CollectionConverters._
    SnapshotV2Table.resolve(new CaseInsensitiveStringMap(
      (opts + ("path" -> root)).asJava)).snapshot
  }
}

/** V2 Table serving one metadata relation — rows are materialized ONCE
  * at scan build from the manifests (snapshot-isolated like every other
  * read of the format) and planned as a driver-[[LocalScan]]. */
private[sources] class SnapshotMetaTable(root: String, kind: String,
    pin: Option[SnapshotTable.Snapshot]) extends Table with SupportsRead {

  override def name(): String = s"graft-snapshot($root#$kind)"
  override def schema(): StructType = SnapshotMeta.schemaOf(kind)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = {
        val schema = SnapshotMeta.schemaOf(kind)
        val spark = SparkSession.active
        val data = SnapshotMeta.rows(spark, root, kind, pin)
          .map(toInternal(schema, _)).toArray
        new LocalScan {
          override def rows(): Array[InternalRow] = data
          override def readSchema(): StructType = schema
          override def description(): String =
            s"graft-snapshot metadata $kind($root)"
        }
      }
    }

  /** Metadata schemas are flat long/int/string/null — hand-converted,
    * no encoder machinery. */
  private def toInternal(schema: StructType, r: Row): InternalRow = {
    val vals = schema.fields.indices.map { i =>
      r.get(i) match {
        case null => null
        case s: String => UTF8String.fromString(s)
        case v => v // Long / Integer box — InternalRow stores as-is
      }
    }
    new GenericInternalRow(vals.toArray)
  }
}
