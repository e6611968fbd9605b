package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Snapshot-isolated table format over plain parquet — the manifest-commit
  * protocol that unifies the repo's piecewise transactional spellings
  * (the generation-swap upsert in
  * [[graft.streaming.EventStream.upsertAvailableNow]], the versioned
  * fail-fast index manifest in `Dedup.writeIndex`/`loadIndex`) into one
  * reusable table: atomic commits, time-travel reads, and
  * optimistic-concurrency conflict detection, with no package beyond
  * Spark + Hadoop FS. The protocol is the public Delta/Iceberg commit
  * shape (Armbrust et al., VLDB'20: data files first, then one atomic
  * metadata publish names the snapshot), re-derived minimally — not a
  * port of either.
  *
  * Layout:
  * {{{
  *   <root>/_manifests/v00000001.txt      one immutable file per version
  *   <root>/data/c1-<uuid>/_gb=0/part-….parquet   commit-owned, bucketed
  * }}}
  *
  * Commit protocol: (1) write the commit's data files under a fresh
  * `data/c<v>-<uuid>/` nobody reads yet; (2) write the manifest to a
  * hidden `.tmp` name; (3) publish by renaming it to `v<N+1>` — on a
  * filesystem with atomic no-overwrite rename (HDFS, ABFS) a concurrent
  * committer's rename fails and it throws [[ConcurrentCommitException]];
  * on filesystems whose rename clobbers (POSIX local) the existence
  * check plus a post-publish read-back of the embedded commit uuid
  * adjudicates the race — exactly one writer sees its own uuid, every
  * loser throws. (S3-style stores need an external lock for step 3,
  * the same caveat Delta documents for its LogStore.)
  *
  * Why readers can never see a torn table: a manifest is the ONLY thing
  * that makes data files visible, it is immutable once published, and it
  * appears atomically — a crash before publish leaves orphan data dirs
  * that no reader lists; a crash during the `.tmp` write leaves a hidden
  * file readers skip. Snapshot isolation falls out: a reader resolves
  * its version once and then reads an immutable file list, concurrent
  * commits land as later versions it never consults. Readers never block
  * writers and vice versa.
  *
  * Schema evolution is ADD-COLUMN only (`mergeSchema = true` on
  * append/upsert/overwrite): new nullable columns append to the manifest
  * schema, old data files are never rewritten (the explicit-schema read
  * backfills null), and time travel serves each version under its own
  * schema. Drops/retypes are refused — that rewrite is an explicit
  * overwrite of a fresh table.
  *
  * Scale shape (the 100 TB audit):
  *   - data writes are fully distributed; the driver touches only
  *     manifest lines — O(buckets + retained appends) metadata, the same
  *     envelope as a Delta JSON commit;
  *   - [[append]] writes O(batch) data and re-lists prior entries
  *     verbatim — no read, no rewrite of existing data;
  *   - [[upsert]] is merge-on-write confined to HIT buckets: batch keys
  *     hash to `pmod(hash(keys), buckets)`, only those buckets' files
  *     are read+rewritten (and consolidated — upsert doubles as
  *     incremental compaction), untouched buckets carry their manifest
  *     lines forward. Worst case (batch touches all buckets) degrades to
  *     a full rewrite, so size `buckets` such that one bucket ≈ one
  *     comfortable rewrite unit at the deployment's table size;
  *   - the one shuffle per commit is the `repartition` on the bucket
  *     column that aligns write tasks with bucket dirs (≈1 file set per
  *     bucket per commit instead of tasks×buckets small files).
  */
object SnapshotTable {

  final class ConcurrentCommitException(msg: String)
    extends RuntimeException(msg)

  /** One published version: `entries` maps bucket id → data dirs
    * (absolute), in commit order. */
  final case class Snapshot(version: Long, op: String, keys: Seq[String],
      buckets: Int, schemaDdl: String, uuid: String,
      entries: Seq[(Int, String)])

  private val FormatHeader = "graft-snapshot-v1"
  /** Reserved bucket-partition column; inputs must not use it. */
  private val BucketCol = "_gb"

  private def fs(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestDir(root: Path) = new Path(root, "_manifests")
  private def manifestPath(root: Path, v: Long) =
    new Path(manifestDir(root), f"v$v%08d.txt")

  // ---- manifest read side ----

  private def parseManifest(fsys: FileSystem, p: Path, v: Long): Snapshot = {
    val in = fsys.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    require(lines.headOption.contains(FormatHeader),
      s"$p is not a $FormatHeader manifest (header: ${lines.headOption})")
    def field(k: String): String = lines
      .collectFirst { case l if l.startsWith(s"$k=") => l.drop(k.length + 1) }
      .getOrElse(sys.error(s"manifest $p missing field $k"))
    val entries = lines.collect {
      case l if l.startsWith("entry=") =>
        val Array(b, dir) = l.drop("entry=".length).split("\t", 2)
        (b.toInt, dir)
    }
    Snapshot(v, field("op"),
      field("keys").split(",").toSeq.filter(_.nonEmpty),
      field("buckets").toInt, field("schema"), field("uuid"), entries)
  }

  /** All published versions, ascending — the time-travel catalog. */
  def versions(spark: SparkSession, root: String): Seq[Snapshot] = {
    val (fsys, rootP) = fs(spark, root)
    val dir = manifestDir(rootP)
    if (!fsys.exists(dir)) return Seq.empty
    val V = """v(\d{8})\.txt""".r
    fsys.listStatus(dir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case V(n) => Some(parseManifest(fsys, st.getPath, n.toLong))
        case _ => None // hidden .tmp files and strays are invisible
      }
    }.sortBy(_.version)
  }

  private def current(spark: SparkSession, root: String): Snapshot =
    versions(spark, root).lastOption.getOrElse(
      sys.error(s"no snapshot table at $root (no published manifests)"))

  // ---- read side ----

  /** Read the table at `version` (default: latest). The file list is
    * resolved once from one immutable manifest — concurrent commits are
    * invisible to this scan (snapshot isolation). */
  def read(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame = {
    val snaps = versions(spark, root)
    require(snaps.nonEmpty, s"no snapshot table at $root")
    val snap = version.fold(snaps.last) { v =>
      snaps.find(_.version == v).getOrElse(sys.error(
        s"version $v not found at $root " +
          s"(have ${snaps.map(_.version).mkString(",")})"))
    }
    val schema = StructType.fromDDL(snap.schemaDdl)
    if (snap.entries.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      // explicit schema: bucket dirs carry no _gb column (it lives in the
      // dir name) and an explicit schema also pins empty-commit reads
      spark.read.schema(schema).parquet(snap.entries.map(_._2): _*)
  }

  // ---- write side ----

  private def bucketOf(keys: Seq[String], buckets: Int) =
    if (keys.isEmpty) lit(0) // keyless: single bucket, append/overwrite only
    else pmod(hash(keys.map(col): _*), lit(buckets))

  /** Write `df`'s rows bucket-partitioned under a fresh commit dir;
    * returns (bucket → dir) for the buckets that actually received
    * rows. */
  private def writeCommitData(df: DataFrame, root: Path, version: Long,
      keys: Seq[String], buckets: Int, uuid: String,
      fsys: FileSystem): Seq[(Int, String)] = {
    val commitDir = new Path(new Path(root, "data"), s"c$version-$uuid")
    df.withColumn(BucketCol, bucketOf(keys, buckets))
      .repartition(col(BucketCol))
      .write.partitionBy(BucketCol).parquet(commitDir.toString)
    (0 until buckets).flatMap { b =>
      val d = new Path(commitDir, s"$BucketCol=$b")
      if (fsys.exists(d)) Some(b -> d.toString) else None
    }
  }

  private def publish(fsys: FileSystem, root: Path, snap: Snapshot): Unit = {
    val dir = manifestDir(root)
    fsys.mkdirs(dir)
    val target = manifestPath(root, snap.version)
    if (fsys.exists(target))
      throw new ConcurrentCommitException(
        s"version ${snap.version} already committed at $root")
    val tmp = new Path(dir, s".tmp-${snap.uuid}")
    val out = fsys.create(tmp, false)
    try {
      val body = new StringBuilder
      body ++= FormatHeader += '\n'
      body ++= s"op=${snap.op}" += '\n'
      body ++= s"keys=${snap.keys.mkString(",")}" += '\n'
      body ++= s"buckets=${snap.buckets}" += '\n'
      body ++= s"schema=${snap.schemaDdl}" += '\n'
      body ++= s"uuid=${snap.uuid}" += '\n'
      snap.entries.foreach { case (b, d) => body ++= s"entry=$b\t$d" += '\n' }
      out.write(body.toString.getBytes("UTF-8"))
    } finally out.close()
    // Atomic publish. On HDFS-like stores rename-to-existing fails and
    // the loser lands here; on clobbering local rename the read-back
    // adjudicates (exactly one writer sees its own uuid).
    if (!fsys.rename(tmp, target)) {
      fsys.delete(tmp, false)
      throw new ConcurrentCommitException(
        s"lost commit race for version ${snap.version} at $root")
    }
    val won = parseManifest(fsys, target, snap.version).uuid == snap.uuid
    if (!won)
      throw new ConcurrentCommitException(
        s"lost commit race for version ${snap.version} at $root " +
          "(another writer's manifest was published)")
  }

  private def newUuid() = java.util.UUID.randomUUID().toString.take(12)

  /** Test seam: drive [[publish]] directly (the only way to exercise the
    * same-version race deterministically — through the public API every
    * published manifest is immediately visible, so a second writer
    * recomputes a later version instead of colliding). */
  private[graft] def publishManifest(spark: SparkSession, root: String,
      snap: Snapshot): Unit = {
    val (fsys, rootP) = fs(spark, root)
    publish(fsys, rootP, snap)
  }

  /** Fields compared name+type (nullability intentionally ignored:
    * parquet round-trips relax it). */
  private def requireSchema(df: DataFrame, ddl: String): Unit = {
    def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
    require(shape(df.schema) == shape(StructType.fromDDL(ddl)),
      s"batch schema ${df.schema.toDDL} does not match table schema $ddl")
  }

  /** Schema for the commit being built. Strict mode (`mergeSchema =
    * false`) demands an exact match. Merge mode is ADD-COLUMN evolution
    * (the Delta `mergeSchema` semantics): the batch must carry every
    * existing column at its existing type, extra batch columns append to
    * the table schema as nullable fields, and earlier data files simply
    * lack them — the explicit-schema read backfills null, so no old file
    * is ever rewritten and time travel keeps each version's own schema.
    * Dropping or retyping a column is refused either way (that rewrite
    * is [[overwrite]]'s job, on a fresh table). */
  private def commitSchema(df: DataFrame, cur: Snapshot,
      mergeSchema: Boolean): String =
    if (!mergeSchema) { requireSchema(df, cur.schemaDdl); cur.schemaDdl }
    else {
      val curS = StructType.fromDDL(cur.schemaDdl)
      val dfTypes = df.schema.fields.map(f => f.name -> f.dataType).toMap
      curS.fields.foreach(f => require(dfTypes.get(f.name).contains(f.dataType),
        s"schema merge requires every existing column unchanged; " +
          s"'${f.name}: ${f.dataType.simpleString}' is missing or retyped " +
          s"in ${df.schema.toDDL}"))
      val extra = df.schema.fields
        .filterNot(f => curS.fieldNames.contains(f.name))
        .map(f => org.apache.spark.sql.types.StructField(
          f.name, f.dataType, nullable = true))
      StructType(curS.fields ++ extra).toDDL
    }

  /** Project `df` into `ddl`'s column order (writes must align with the
    * manifest schema the readers will apply). */
  private def aligned(df: DataFrame, ddl: String): DataFrame =
    df.select(StructType.fromDDL(ddl).fieldNames.map(col).toIndexedSeq: _*)

  private def requireCols(df: DataFrame, keys: Seq[String]): Unit = {
    require(!df.columns.contains(BucketCol),
      s"column name $BucketCol is reserved by SnapshotTable")
    keys.foreach(k => require(df.columns.contains(k),
      s"key column $k missing from ${df.columns.mkString(",")}"))
  }

  /** Create the table as version 1. `keys` + `buckets` are fixed for the
    * table's life (stored in every manifest); `keys` may be empty for an
    * append/overwrite-only table ([[upsert]] then refuses). */
  def create(df: DataFrame, root: String, keys: Seq[String],
      buckets: Int = 16): Long = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    requireCols(df, keys)
    val (fsys, rootP) = fs(df.sparkSession, root)
    require(versions(df.sparkSession, root).isEmpty,
      s"snapshot table already exists at $root")
    val uuid = newUuid()
    val entries = writeCommitData(df, rootP, 1L, keys, buckets, uuid, fsys)
    publish(fsys, rootP, Snapshot(1L, "create", keys, buckets,
      df.schema.toDDL, uuid, entries))
    1L
  }

  /** Blind append: O(batch) data writes, prior entries re-listed
    * verbatim. No key dedup — append the same key twice and both rows
    * surface (use [[upsert]] for keyed semantics). `mergeSchema = true`
    * allows add-column evolution (see [[commitSchema]]). */
  def append(df: DataFrame, root: String,
      mergeSchema: Boolean = false): Long = {
    val spark = df.sparkSession
    val cur = current(spark, root)
    requireCols(df, cur.keys)
    val ddl = commitSchema(df, cur, mergeSchema)
    val (fsys, rootP) = fs(spark, root)
    val v = cur.version + 1
    val uuid = newUuid()
    val entries = writeCommitData(aligned(df, ddl), rootP, v, cur.keys,
      cur.buckets, uuid, fsys)
    publish(fsys, rootP, Snapshot(v, "append", cur.keys, cur.buckets,
      ddl, uuid, cur.entries ++ entries))
    v
  }

  /** Replace the table's content wholesale (config and history are
    * kept — prior versions stay readable). */
  def overwrite(df: DataFrame, root: String,
      mergeSchema: Boolean = false): Long = {
    val spark = df.sparkSession
    val cur = current(spark, root)
    requireCols(df, cur.keys)
    val ddl = commitSchema(df, cur, mergeSchema)
    val (fsys, rootP) = fs(spark, root)
    val v = cur.version + 1
    val uuid = newUuid()
    val entries = writeCommitData(aligned(df, ddl), rootP, v, cur.keys,
      cur.buckets, uuid, fsys)
    publish(fsys, rootP, Snapshot(v, "overwrite", cur.keys, cur.buckets,
      ddl, uuid, entries))
    v
  }

  /** Keyed last-write-wins merge: batch rows replace current rows with
    * the same key tuple; unmatched batch rows insert. Merge-on-write
    * confined to the buckets the batch's keys hash into — untouched
    * buckets' manifest lines carry forward unread. The batch must be
    * unique per key (checked; a multi-valued key has no deterministic
    * winner). */
  def upsert(df: DataFrame, root: String,
      mergeSchema: Boolean = false): Long = {
    val spark = df.sparkSession
    val cur = current(spark, root)
    require(cur.keys.nonEmpty,
      s"table at $root was created without keys; upsert undefined")
    requireCols(df, cur.keys)
    val ddl = commitSchema(df, cur, mergeSchema)
    val (fsys, rootP) = fs(spark, root)
    val keyCols = cur.keys.map(col)
    val dupKeys = df.groupBy(keyCols: _*).count()
      .filter(col("count") > 1).limit(1).collect() // 1-row guard probe
    require(dupKeys.isEmpty, "upsert batch has duplicate key tuples " +
      s"(e.g. ${dupKeys.headOption.getOrElse("")}); last-write-wins " +
      "needs one row per key — pre-dedup the batch")
    val batch = df.withColumn(BucketCol, bucketOf(cur.keys, cur.buckets))
    // Hit-bucket set: O(buckets) driver list, never data
    val hit = batch.select(col(BucketCol)).distinct()
      .collect().map(_.getInt(0)).toSet
    val hitDirs = cur.entries.filter(e => hit(e._1))
    // prior files read under the COMMIT schema: on an evolving upsert the
    // old files lack the new columns and backfill null, so the merge
    // unions cleanly without rewriting any untouched bucket
    val schema = StructType.fromDDL(ddl)
    val priorHit =
      if (hitDirs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(hitDirs.map(_._2): _*)
    // anti-join on the key: batch wins; both sides already bucket-pruned
    val merged = priorHit
      .join(batch.select(keyCols: _*), cur.keys, "left_anti")
      .unionByName(aligned(batch.drop(BucketCol), ddl))
    val v = cur.version + 1
    val uuid = newUuid()
    val entries =
      writeCommitData(merged, rootP, v, cur.keys, cur.buckets, uuid, fsys)
    publish(fsys, rootP, Snapshot(v, "upsert", cur.keys, cur.buckets,
      ddl, uuid,
      cur.entries.filterNot(e => hit(e._1)) ++ entries))
    v
  }

  /** Keyed delete: rows whose key tuple appears in `keysDf` are removed;
    * absent keys are a no-op. Merge-on-write confined to hit buckets
    * exactly like [[upsert]] (untouched buckets' manifest lines carry
    * forward unread); a bucket emptied by the delete simply drops out of
    * the manifest. `keysDf` needs only the key columns (extras are
    * ignored) and is deduplicated internally. */
  def delete(keysDf: DataFrame, root: String): Long = {
    val spark = keysDf.sparkSession
    val cur = current(spark, root)
    require(cur.keys.nonEmpty,
      s"table at $root was created without keys; delete undefined")
    requireCols(keysDf.select(cur.keys.map(col): _*), cur.keys)
    val (fsys, rootP) = fs(spark, root)
    val keyCols = cur.keys.map(col)
    val batch = keysDf.select(keyCols: _*).distinct()
      .withColumn(BucketCol, bucketOf(cur.keys, cur.buckets))
    val hit = batch.select(col(BucketCol)).distinct()
      .collect().map(_.getInt(0)).toSet
    val hitDirs = cur.entries.filter(e => hit(e._1))
    val schema = StructType.fromDDL(cur.schemaDdl)
    val priorHit =
      if (hitDirs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(hitDirs.map(_._2): _*)
    val kept = priorHit.join(batch.drop(BucketCol), cur.keys, "left_anti")
    val v = cur.version + 1
    val uuid = newUuid()
    val entries =
      writeCommitData(kept, rootP, v, cur.keys, cur.buckets, uuid, fsys)
    publish(fsys, rootP, Snapshot(v, "delete", cur.keys, cur.buckets,
      cur.schemaDdl, uuid,
      cur.entries.filterNot(e => hit(e._1)) ++ entries))
    v
  }

  /** Full compaction: rewrite every bucket to one fresh dir each,
    * collapsing the per-bucket dir lists appends accumulate. Content is
    * unchanged (it is `overwrite(read(latest))` with the plan reading
    * the version being replaced — safe, since that version's files are
    * immutable and stay addressable afterwards). */
  def compact(spark: SparkSession, root: String): Long =
    overwrite(read(spark, root), root)

  /** Expire history — the VACUUM of this format: keep the newest
    * `keepVersions` manifests, delete the expired manifests FIRST (so no
    * new reader can resolve an expired version), then delete every
    * bucket data dir no kept manifest references — which also reclaims
    * orphan dirs from crashed pre-publish commits. Kept versions are
    * untouched (their file lists stay fully present); a reader mid-scan
    * ON an expired version can fail, the documented tradeoff every
    * manifest-format VACUUM carries.
    *
    * Concurrent-writer safety is exact, not time-based: only dirs whose
    * encoded commit version is ≤ the newest KEPT version are deletion
    * candidates. An in-flight writer's data dir always carries version
    * current+1, so it can never be swept out from under its publish —
    * no retention-window heuristic needed.
    *
    * Returns (expired manifest count, deleted data dir count). Driver
    * cost is O(versions + data dirs) metadata listings; deletes are
    * FS-side. */
  def vacuum(spark: SparkSession, root: String,
      keepVersions: Int = 1): (Int, Int) = {
    require(keepVersions >= 1, s"keepVersions must be >= 1: $keepVersions")
    val (fsys, rootP) = fs(spark, root)
    val snaps = versions(spark, root)
    require(snaps.nonEmpty, s"no snapshot table at $root")
    val (expire, keep) =
      snaps.splitAt(math.max(0, snaps.size - keepVersions))
    expire.foreach(s => fsys.delete(manifestPath(rootP, s.version), false))
    val maxKept = keep.map(_.version).max
    val referenced = keep.flatMap(_.entries.map(_._2))
      .map(d => fsys.makeQualified(new Path(d)).toString).toSet
    val CommitV = """c(\d+)-.*""".r
    val dataRoot = new Path(rootP, "data")
    var removedDirs = 0
    if (fsys.exists(dataRoot)) fsys.listStatus(dataRoot).foreach { c =>
      val sweepable = c.getPath.getName match {
        case CommitV(v) => v.toLong <= maxKept // never an in-flight commit
        case _ => false
      }
      if (sweepable) {
        fsys.listStatus(c.getPath).filter(_.isDirectory).foreach { b =>
          if (!referenced(fsys.makeQualified(b.getPath).toString)) {
            fsys.delete(b.getPath, true)
            removedDirs += 1
          }
        }
        if (fsys.listStatus(c.getPath).isEmpty) fsys.delete(c.getPath, true)
      }
    }
    (expire.size, removedDirs)
  }
}
