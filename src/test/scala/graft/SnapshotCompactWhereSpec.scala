package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SnapshotTable

/** Partition-scoped compaction ([[SnapshotTable.compactWhere]] — the
  * maintenance companion to the partition-pinned retention DELETE):
  * consolidate only the dirs PROVABLY inside a predicate region, carry
  * everything else verbatim. Pins: the touched-dir scope (cold-region
  * dirs carry byte-identical), content neutrality, boundary-dir
  * conservatism, the no-op guards (minDirs, delta-bearing tables,
  * no-stats-power predicates), and the SQL procedure. */
class SnapshotCompactWhereSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_cw_$tag")
    d.toFile.deleteOnExit()
    new java.io.File(d.toFile, "tbl").getAbsolutePath
  }

  /** id, ts (one of `days` calendar days), v — partitioned by days. */
  private def dayRows(ids: Range, day: Int) =
    ids.map(i => (i.toLong, s"2024-02-${"%02d".format(day)} 10:00:00",
      i * 10L)).toDF("id", "ts0", "v")
      .select(col("id"), col("ts0").cast("timestamp").as("ts"), col("v"))

  private def content(root: String) =
    SnapshotTable.read(spark, root)
      .select(col("id"), col("ts").cast("long"), col("v"))
      .as[(Long, Long, Long)].collect().toSet

  test("compactWhere consolidates ONLY the predicate-certain day dirs; " +
      "cold dirs carry byte-identical, content is unchanged, and clean " +
      "tailing streams skip the commit") {
    val root = freshRoot("scope")
    // 3 appends into day 1-2 (the hot region), 1 into day 5 (cold)
    SnapshotTable.create(dayRows(0 until 8, 1), root, Seq("id"),
      buckets = 2, statsCols = Some(Seq.empty),
      partitionBy = Seq("days(ts)"))
    SnapshotTable.append(dayRows(8 until 16, 1), root)
    SnapshotTable.append(dayRows(16 until 24, 2), root)
    SnapshotTable.append(dayRows(24 until 32, 5), root)
    val before = SnapshotTable.versions(spark, root).last
    val pre = content(root)
    val cutoff = lit("2024-02-03 00:00:00").cast("timestamp")
    // days(ts) dirs carry the epoch-day number (UTC session)
    val day5 = java.time.LocalDate.parse("2024-02-05").toEpochDay
    val coldDirs = before.entries.map(_._2)
      .filter(_.contains(s"_pt0=$day5")).toSet
    assert(coldDirs.nonEmpty)
    val hotDirs = before.entries.map(_._2).filterNot(coldDirs).toSet

    val v = SnapshotTable.compactWhere(spark, root, col("ts") < cutoff)
    val after = SnapshotTable.versions(spark, root).last
    assert(after.version === v && after.op === "compact")
    // cold dirs carried verbatim; hot dirs consolidated (fewer dirs)
    assert(coldDirs.subsetOf(after.entries.map(_._2).toSet))
    val newHot = after.entries.map(_._2).filterNot(coldDirs)
    assert(newHot.toSet.intersect(hotDirs).isEmpty,
      "hot-region dirs must be rewritten")
    assert(newHot.size < hotDirs.size,
      s"expected consolidation, ${hotDirs.size} -> ${newHot.size}")
    // content-neutral
    assert(content(root) === pre)
    // time travel still serves the pre-compact layout
    assert(SnapshotTable.read(spark, root, Some(before.version))
      .count() === 32L)
    // a clean tailing walk over the history skips the compact commit
    import graft.sources.{SnapshotMicroBatchStream, SnapshotOffset}
    val st = new SnapshotMicroBatchStream(root, _ => null, false)
    val dirs = st.rangeDirs(SnapshotOffset(before.version),
      SnapshotOffset(after.version))
    assert(dirs.isEmpty, "content-neutral commit must not stream")
  }

  test("no-op guards: below minDirs, no stats power, and delta-bearing " +
      "tables all return the current version without committing") {
    val root = freshRoot("noop")
    SnapshotTable.create(dayRows(0 until 8, 1), root, Seq("id"),
      buckets = 2, statsCols = Some(Seq.empty),
      partitionBy = Seq("days(ts)"))
    val v1 = SnapshotTable.versions(spark, root).last.version
    // only day-1 dirs exist and there are < 3 of them
    assert(SnapshotTable.compactWhere(spark, root,
      col("ts") < lit("2024-03-01").cast("timestamp"),
      minDirs = 100) === v1)
    // nondeterministic predicate: no stats power, no-op
    assert(SnapshotTable.compactWhere(spark, root, rand() > 0.5) === v1)
    // unresolved MOR deltas: refuse to partially fold
    SnapshotTable.upsert(Seq((1L, "2024-02-01 10:00:00", 999L))
      .toDF("id", "ts0", "v")
      .select(col("id"), col("ts0").cast("timestamp").as("ts"), col("v")),
      root, mergeOnRead = true)
    val v2 = SnapshotTable.versions(spark, root).last.version
    assert(SnapshotTable.compactWhere(spark, root,
      col("ts") < lit("2024-03-01").cast("timestamp")) === v2)
  }

  test("SQL: CALL system.compact_where consolidates through the " +
      "catalog and the table keeps answering exactly") {
    val d = java.nio.file.Files.createTempDirectory("graft_cw_wh")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.cwcat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.cwcat.warehouse", d.toString)
    val root = s"$d/t"
    SnapshotTable.create(dayRows(0 until 8, 1), root, Seq("id"),
      buckets = 2, statsCols = Some(Seq.empty),
      partitionBy = Seq("days(ts)"))
    SnapshotTable.append(dayRows(8 until 16, 1), root)
    SnapshotTable.append(dayRows(16 until 24, 4), root)
    val pre = content(root)
    val got = spark.sql("CALL cwcat.system.compact_where('t', " +
      "\"ts < timestamp'2024-02-02 00:00:00'\")").collect()
    assert(got.head.getLong(0) ===
      SnapshotTable.versions(spark, root).last.version)
    assert(SnapshotTable.versions(spark, root).last.op === "compact")
    assert(content(root) === pre)
  }
}
