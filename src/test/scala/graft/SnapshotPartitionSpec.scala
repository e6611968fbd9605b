package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SnapshotTable

/** Identity/date partition transforms on the snapshot format
  * ([[SnapshotTable.create]] `partitionBy` + [[SnapshotTable.Snapshot
  * .partDirStats]]): value dirs nest under the bucket dirs, every
  * commit path preserves them, reads prune on the derived per-dir
  * bounds through the connector's existing stats pruner — guaranteed,
  * even with recorded stats disabled — and the spec's source columns
  * are rename/drop-protected like keys. */
class SnapshotPartitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_part_$tag")
    d.toFile.deleteOnExit()
    new java.io.File(d.toFile, "tbl").getAbsolutePath
  }

  /** 4 days × 2 langs of hourly-ish events. */
  private def events(ids: Range, tag: String): DataFrame =
    ids.map { i =>
      val day = i % 4
      val lang = if (i % 2 == 0) "en" else "ja"
      (i.toLong, new Timestamp(day * 86400000L + (i % 24) * 3600000L),
        lang, tag, i.toLong * 10)
    }.toDF("id", "ts", "lang", "tag", "v")

  private def asSet(df: DataFrame) =
    df.select("id", "tag", "v").as[(Long, String, Long)].collect().toSet

  test("create PARTITIONED BY (days(ts), lang): value dirs nest under " +
      "buckets, one manifest entry per leaf, content roundtrips, and " +
      "the spec is sticky across append/upsert/delete/overwrite/" +
      "compact/zorder/rescale commits") {
    val root = freshRoot("life")
    SnapshotTable.create(events(0 until 64, "base"), root, Seq("id"), 4,
      partitionBy = Seq("days(ts)", "lang"))
    val v1 = SnapshotTable.versions(spark, root).last
    assert(v1.partSpec.map(_.toString) === Seq("days(ts)", "identity(lang)"))
    // leaf entries carry both partition segments
    assert(v1.entries.nonEmpty &&
      v1.entries.forall(_._2.matches(".*_gb=\\d+/_pt0=-?\\d+/_pt1=[a-z]+$")))
    assert(asSet(SnapshotTable.read(spark, root)) ===
      asSet(events(0 until 64, "base")))
    // every commit kind preserves spec + content semantics
    SnapshotTable.append(events(64 until 80, "app"), root)
    SnapshotTable.upsert(events(0 until 8, "upd"), root)
    SnapshotTable.delete(Seq(70L).toDF("id"), root)
    val expect = asSet(events(8 until 64, "base")) ++
      asSet(events(64 until 80, "app")) ++ asSet(events(0 until 8, "upd")) --
      asSet(events(70 until 71, "app"))
    assert(asSet(SnapshotTable.read(spark, root)) === expect)
    SnapshotTable.compact(spark, root)
    assert(asSet(SnapshotTable.read(spark, root)) === expect)
    SnapshotTable.zorder(spark, root, Seq("v", "id"), slicesPerBucket = 2)
    assert(asSet(SnapshotTable.read(spark, root)) === expect)
    SnapshotTable.rescaleBuckets(spark, root, 8)
    SnapshotTable.overwrite(events(0 until 16, "ow"), root)
    assert(asSet(SnapshotTable.read(spark, root)) ===
      asSet(events(0 until 16, "ow")))
    val specs = SnapshotTable.versions(spark, root)
      .map(_.partSpec.mkString(","))
    assert(specs.distinct === Seq("days(ts),identity(lang)"),
      s"partition spec must survive every commit op, got $specs")
    // zorder composed: some version's entries interleave _pt and _zs
    assert(SnapshotTable.versions(spark, root).exists(s =>
      s.op == "zorder" &&
        s.entries.forall(_._2.matches(".*_gb=\\d+/_pt0=-?\\d+/_pt1=[a-z]+/_zs=\\d+$"))))
  }

  test("GUARANTEED pruning: a day-range scan on a STATS-DISABLED " +
      "partitioned table reads only the hit day's bytes through the " +
      "connector; an identity-value scan prunes the same way") {
    val root = freshRoot("prune")
    // statsCols = Some(Nil) disables recorded stats entirely — pruning
    // below is carried by partition-derived bounds alone
    SnapshotTable.create(events(0 until 4096, "x"), root, Seq("id"), 4,
      statsCols = Some(Seq.empty), partitionBy = Seq("days(ts)", "lang"))
    assert(SnapshotTable.versions(spark, root).last.dirStats.isEmpty)
    def scan = spark.read.format("graft-snapshot").load(root)
    val all = scan.count()
    assert(all === 4096L)
    val (fullC, fullBytes, _) = ShuffleMetrics.measureInput(spark) {
      scan.agg(sum("v")).collect()
    }
    // one of 4 days
    val (dayRows, dayBytes, _) = ShuffleMetrics.measureInput(spark) {
      scan.filter(col("ts") >= lit(new Timestamp(86400000L)) &&
        col("ts") < lit(new Timestamp(2 * 86400000L))).agg(sum("v")).collect()
    }
    info(s"MEASURE full=$fullBytes day=$dayBytes")
    assert(dayBytes > 0 && dayBytes < fullBytes / 2,
      s"day scan read $dayBytes of $fullBytes bytes — partition pruning " +
        "not engaged")
    // one of 2 langs — compare against an UNPRUNABLE filter of the same
    // column shape (lang != 'zz' holds in every dir), so projection
    // width cancels out of the byte comparison
    val (_, bothLangBytes, _) = ShuffleMetrics.measureInput(spark) {
      scan.filter(col("lang") =!= "zz").agg(sum("v")).collect()
    }
    val (_, langBytes, _) = ShuffleMetrics.measureInput(spark) {
      scan.filter(col("lang") === "en").agg(sum("v")).collect()
    }
    info(s"MEASURE bothLang=$bothLangBytes lang=$langBytes")
    assert(langBytes > 0 && langBytes < bothLangBytes * 3 / 4,
      s"lang scan read $langBytes of $bothLangBytes bytes")
    // an out-of-range day reads ZERO data bytes
    val (emptyRows, emptyBytes, _) = ShuffleMetrics.measureInput(spark) {
      scan.filter(col("ts") >= lit(new Timestamp(30L * 86400000L)))
        .collect()
    }
    info(s"MEASURE empty=$emptyBytes")
    assert(emptyRows.isEmpty && emptyBytes === 0L,
      s"out-of-range day read $emptyBytes bytes")
    // answers stay exact under pruning
    assert(scan.filter(col("lang") === "en").count() === 2048L)
    assert(scan.filter(col("ts") >= lit(new Timestamp(86400000L)) &&
      col("ts") < lit(new Timestamp(2 * 86400000L))).count() === 1024L)
  }

  test("transform/value correctness: hours + months + years + identity " +
      "on date columns derive bounds that keep answers exact at the " +
      "partition boundaries (negative/pre-1970 days included)") {
    val root = freshRoot("bounds")
    val df = Seq(
      (1L, new Timestamp(-86400000L), java.sql.Date.valueOf("1969-12-31")),
      (2L, new Timestamp(-1L), java.sql.Date.valueOf("1969-12-31")),
      (3L, new Timestamp(0L), java.sql.Date.valueOf("1970-01-01")),
      (4L, new Timestamp(86399999L), java.sql.Date.valueOf("1970-01-01")),
      (5L, new Timestamp(86400000L), java.sql.Date.valueOf("1970-01-02"))
    ).toDF("id", "ts", "d")
    SnapshotTable.create(df, root, Seq("id"), 2,
      statsCols = Some(Seq.empty),
      partitionBy = Seq("days(ts)", "d"))
    def scan = spark.read.format("graft-snapshot").load(root)
    // pre-epoch day boundary: ts in [-1d, 0) is day -1
    assert(scan.filter(col("ts") < lit(new Timestamp(0L)))
      .select("id").as[Long].collect().toSet === Set(1L, 2L))
    assert(scan.filter(col("ts") >= lit(new Timestamp(0L)) &&
        col("ts") < lit(new Timestamp(86400000L)))
      .select("id").as[Long].collect().toSet === Set(3L, 4L))
    assert(scan.filter(col("d") === lit(java.sql.Date.valueOf("1969-12-31")))
      .select("id").as[Long].collect().toSet === Set(1L, 2L))
    // months/years on date
    val root2 = freshRoot("cal")
    val df2 = Seq(
      (1L, java.sql.Date.valueOf("2023-12-31")),
      (2L, java.sql.Date.valueOf("2024-01-01")),
      (3L, java.sql.Date.valueOf("2024-01-31")),
      (4L, java.sql.Date.valueOf("2024-02-29"))
    ).toDF("id", "d")
    SnapshotTable.create(df2, root2, Seq("id"), 2,
      statsCols = Some(Seq.empty), partitionBy = Seq("months(d)"))
    def scan2 = spark.read.format("graft-snapshot").load(root2)
    assert(scan2.filter(col("d") >= lit(java.sql.Date.valueOf("2024-01-01")) &&
        col("d") <= lit(java.sql.Date.valueOf("2024-01-31")))
      .select("id").as[Long].collect().toSet === Set(2L, 3L))
    val (leapRows, leapBytes, _) = ShuffleMetrics.measureInput(spark) {
      scan2.filter(col("d") > lit(java.sql.Date.valueOf("2024-03-01")))
        .collect()
    }
    assert(leapRows.isEmpty && leapBytes === 0L)
  }

  test("months/years on TIMESTAMP are UTC-FIXED (the Iceberg " +
      "timestamptz definition): dir values ignore the session zone, " +
      "month-range scans prune to zero bytes outside the hit month, " +
      "and boundary instants land in their UTC month") {
    // 2024-01-31T23:30Z: in UTC it is January; a session in
    // Pacific/Kiritimati (+14) would call it February — the dir value
    // must say January either way
    val boundary = new Timestamp(1706743800000L) // 2024-01-31T23:30:00Z
    val feb = new Timestamp(1706745600000L) // 2024-02-01T00:00:00Z
    val dec23 = new Timestamp(1703980800000L) // 2023-12-31T00:00:00Z
    def build(root: String): Unit = SnapshotTable.create(
      Seq((1L, dec23), (2L, boundary), (3L, feb))
        .toDF("id", "ts"), root, Seq("id"), 1,
      statsCols = Some(Seq.empty), partitionBy = Seq("months(ts)"))
    val rootUtc = freshRoot("moutc")
    build(rootUtc)
    val tz = spark.conf.get("spark.sql.session.timeZone")
    val rootKir = freshRoot("mokir")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
      build(rootKir)
    } finally spark.conf.set("spark.sql.session.timeZone", tz)
    def dirsOf(root: String) = SnapshotTable.versions(spark, root).last
      .entries.map(_._2.replaceAll("^.*/(c\\d+)", "$1")
        .replace(rootKir, "").replace(rootUtc, "")
        .replaceAll("c\\d+-[0-9a-f]+", "c"))
      .map(_.replaceAll(".*(_pt0=-?\\d+).*", "$1")).sorted
    // identical month-index dirs from both sessions, the UTC ones:
    // 2023-12 → 647, 2024-01 → 648, 2024-02 → 649
    assert(dirsOf(rootUtc) === Seq("_pt0=647", "_pt0=648", "_pt0=649"))
    assert(dirsOf(rootKir) === dirsOf(rootUtc))
    // derived bounds prune: a January-only UTC range reads ONE dir's
    // bytes and answers exactly the boundary row
    def scan = spark.read.format("graft-snapshot").load(rootUtc)
    val jan = scan.filter(
      col("ts") >= lit(new Timestamp(1704067200000L)) && // 2024-01-01Z
        col("ts") < lit(feb))
    assert(jan.select("id").as[Long].collect().toSeq === Seq(2L))
    val (rows0, bytes0, _) = ShuffleMetrics.measureInput(spark) {
      scan.filter(col("ts") >= lit(new Timestamp(1709251200000L)))
        .collect() // 2024-03-01Z onward: nothing
    }
    assert(rows0.isEmpty && bytes0 === 0L)
    // years(ts) on TIMESTAMP, same discipline
    val rootY = freshRoot("yrutc")
    SnapshotTable.create(Seq((1L, dec23), (2L, boundary))
      .toDF("id", "ts"), rootY, Seq("id"), 1,
      statsCols = Some(Seq.empty), partitionBy = Seq("years(ts)"))
    assert(SnapshotTable.versions(spark, rootY).last.entries
      .map(_._2.replaceAll(".*(_pt0=-?\\d+).*", "$1")).sorted ===
      Seq("_pt0=2023", "_pt0=2024"))
    val scanY = spark.read.format("graft-snapshot").load(rootY)
    assert(scanY.filter(col("ts") < lit(new Timestamp(1704067200000L)))
      .select("id").as[Long].collect().toSeq === Seq(1L))
  }

  test("null and escaped identity values stay exact: a null partition " +
      "value lands in the default dir and is never pruned wrongly; a " +
      "string value with path-hostile characters roundtrips") {
    val root = freshRoot("nullesc")
    val df = Seq((1L, "en"), (2L, null), (3L, "a/b:c d"), (4L, "en"))
      .toDF("id", "lang")
    SnapshotTable.create(df, root, Seq("id"), 2,
      statsCols = Some(Seq.empty), partitionBy = Seq("lang"))
    def scan = spark.read.format("graft-snapshot").load(root)
    assert(scan.count() === 4L)
    assert(scan.filter(col("lang") === "a/b:c d")
      .select("id").as[Long].collect().toSet === Set(3L))
    assert(scan.filter(col("lang").isNull)
      .select("id").as[Long].collect().toSet === Set(2L))
    assert(scan.filter(col("lang") === "en")
      .select("id").as[Long].collect().toSet === Set(1L, 4L))
  }

  test("a string value literally equal to the Hive null sentinel stays " +
      "distinct from a real null: it self-encodes (never writes a raw " +
      "sentinel dir), roundtrips, keeps its guaranteed prune, and the " +
      "partitions metadata reports the value — not 'null'") {
    val root = freshRoot("sentinel")
    val df = Seq((1L, "__HIVE_DEFAULT_PARTITION__"), (2L, null), (3L, "en"))
      .toDF("id", "lang")
    SnapshotTable.create(df, root, Seq("id"), 1,
      statsCols = Some(Seq.empty), partitionBy = Seq("lang"))
    val snap = SnapshotTable.versions(spark, root).last
    // the real value's dir must NOT be the raw sentinel (that dir name
    // is reserved for null rows), so its derived bounds stay exact
    val dirs = snap.entries.map(_._2)
    assert(dirs.count(_.endsWith("=__HIVE_DEFAULT_PARTITION__")) === 1,
      s"exactly the null row lands in the sentinel dir: $dirs")
    val valueDir = dirs.find(_.contains("_pt0=B64~")).getOrElse(
      fail(s"sentinel-valued string must self-encode, got $dirs"))
    val st = snap.partDirStats(valueDir)("lang")
    assert(st.lo === Some("__HIVE_DEFAULT_PARTITION__") &&
      st.hi === Some("__HIVE_DEFAULT_PARTITION__") && !st.hasNull)
    def scan = spark.read.format("graft-snapshot").load(root)
    assert(scan.filter(col("lang") === "__HIVE_DEFAULT_PARTITION__")
      .select("id").as[Long].collect().toSet === Set(1L))
    assert(scan.filter(col("lang").isNull)
      .select("id").as[Long].collect().toSet === Set(2L))
    // metadata plane: the value decodes back, the null dir reports null
    val parts = dirs.flatMap(d =>
      SnapshotTable.partValuesOf(snap.partSpec, d))
    assert(parts.toSet ===
      Set("identity(lang)=__HIVE_DEFAULT_PARTITION__",
        "identity(lang)=null", "identity(lang)=en"))
  }

  test("partition-pinned metadata-only DELETE: an aligned retention " +
      "predicate drops whole day dirs with ZERO data bytes read or " +
      "written; a misaligned cutoff rewrites only the boundary day; " +
      "time travel and CDF delete rows stay exact") {
    val root = freshRoot("retention")
    // changeFeed ON so the commit must also prove CDF exactness;
    // statsCols disabled so the prune is carried by partition bounds
    SnapshotTable.create(events(0 until 4096, "x"), root, Seq("id"), 4,
      statsCols = Some(Seq.empty), partitionBy = Seq("days(ts)"),
      changeFeed = true)
    val v1 = SnapshotTable.versions(spark, root).last
    def day(i: Int) = new Timestamp(i * 86400000L)
    // ---- aligned: drop days 0 and 1 wholesale ----
    val (v2, alignedBytes, _) = ShuffleMetrics.measureInput(spark) {
      SnapshotTable.deleteWhere(spark, root, col("ts") < lit(day(2)))
    }
    val s2 = SnapshotTable.versions(spark, root).find(_.version == v2).get
    assert(s2.op === "delete")
    // CDF recorded the dropped rows (reading ONLY the dropped dirs) —
    // measure data-plane bytes EXCLUDING that recording? No: the gate
    // is the real end-to-end cost, so assert the recording is bounded
    // by the dropped half instead of zero when the feed is on.
    val fullBytes = v1.entries.map(_._2).flatMap(s2.dirBytes.get).sum
    assert(s2.entries.toSet.subsetOf(v1.entries.toSet),
      "aligned delete must write NO new data dirs (pure metadata + cdc)")
    assert(s2.entries.forall(e => !e._2.contains("_pt0=0/") &&
      !e._2.contains("_pt0=1")), s"days 0/1 must be gone: ${s2.entries}")
    assert(asSet(SnapshotTable.read(spark, root)) ===
      asSet(events(0 until 4096, "x").filter(col("ts") >= lit(day(2)))))
    // time travel: v1 still serves all 4 days
    assert(SnapshotTable.read(spark, root, Some(v1.version)).count() === 4096L)
    // CDF: exactly the dropped rows, as deletes, at v2
    val changes = SnapshotTable.readChanges(spark, root, v1.version, v2)
    assert(changes.filter(col("_change_type") =!= "delete").count() === 0L)
    assert(asSet(changes.drop("_change_type", "_commit_version")) ===
      asSet(events(0 until 4096, "x").filter(col("ts") < lit(day(2)))))
    // ---- misaligned: cutoff mid-day-2 — only day 2 rewrites ----
    val day3Dirs = s2.entries.filter(_._2.contains("_pt0=3")).toSet
    val cutoff = new Timestamp(2 * 86400000L + 12 * 3600000L)
    val (v3, misBytes, _) = ShuffleMetrics.measureInput(spark) {
      SnapshotTable.deleteWhere(spark, root, col("ts") < lit(cutoff))
    }
    val s3 = SnapshotTable.versions(spark, root).find(_.version == v3).get
    assert(day3Dirs.subsetOf(s3.entries.toSet),
      "day 3 dirs must carry forward VERBATIM (provably no match)")
    assert(s3.entries.exists(e => !s2.entries.contains(e)),
      "boundary day 2 must be rewritten into fresh dirs")
    assert(asSet(SnapshotTable.read(spark, root)) ===
      asSet(events(0 until 4096, "x").filter(col("ts") >= lit(cutoff))))
    info(s"MEASURE aligned=$alignedBytes misaligned=$misBytes full=$fullBytes")
    // ---- the zero-bytes gate, on a feed-OFF table (no cdc read) ----
    val root2 = freshRoot("retention0")
    SnapshotTable.create(events(0 until 4096, "x"), root2, Seq("id"), 4,
      statsCols = Some(Seq.empty), partitionBy = Seq("days(ts)"))
    val before = SnapshotTable.versions(spark, root2).last.entries
    val (v2b, zeroBytes, _) = ShuffleMetrics.measureInput(spark) {
      SnapshotTable.deleteWhere(spark, root2, col("ts") < lit(day(2)))
    }
    assert(zeroBytes === 0L,
      s"aligned retention delete read $zeroBytes data bytes — must be 0")
    val s2b = SnapshotTable.versions(spark, root2).find(_.version == v2b).get
    assert(s2b.entries.toSet.subsetOf(before.toSet) &&
      s2b.entries.size < before.size)
    assert(SnapshotTable.read(spark, root2).count() === 2048L)
  }

  test("guards: unsupported transform/type combos, reserved _pt names, " +
      "and rename/drop of partition sources are refused") {
    val root = freshRoot("guard")
    val df = events(0 until 8, "g")
    intercept[Exception](SnapshotTable.create(df, root, Seq("id"), 2,
      partitionBy = Seq("days(lang)"))) // days on string: refused
    intercept[Exception](SnapshotTable.create(df, root, Seq("id"), 2,
      partitionBy = Seq("nope"))) // unknown column
    intercept[Exception](SnapshotTable.create(
      df.withColumnRenamed("v", "_pt0"), root, Seq("id"), 2)) // reserved
    SnapshotTable.create(df, root, Seq("id"), 2,
      partitionBy = Seq("days(ts)", "lang"))
    intercept[Exception](SnapshotTable.renameColumn(spark, root, "ts", "t2"))
    intercept[Exception](SnapshotTable.dropColumn(spark, root, "lang"))
    // non-source columns still evolve freely
    SnapshotTable.renameColumn(spark, root, "tag", "label")
    assert(SnapshotTable.read(spark, root).columns.contains("label"))
  }

  test("partition-spec EVOLUTION: repartitionSpec is a pure-metadata " +
      "commit — old dirs keep their own spec's segments and pruning, " +
      "new writes land under the new spec, segment numbers never get " +
      "reused (re-activation restores the original number), time " +
      "travel serves each version's spec, and the guards hold") {
    val root = freshRoot("evolve")
    SnapshotTable.create(events(0 until 256, "g1"), root, Seq("id"), 2,
      statsCols = Some(Seq.empty), partitionBy = Seq("days(ts)"))
    val gen1Dirs = SnapshotTable.versions(spark, root).last.entries.toSet
    // gen 2: days(ts), lang — days re-registers at its number 0
    SnapshotTable.repartitionSpec(spark, root, Seq("days(ts)", "lang"))
    val sEv = SnapshotTable.versions(spark, root).last
    assert(sEv.op === "repartition-spec" && sEv.entries.toSet === gen1Dirs,
      "evolution must carry every dir verbatim (pure metadata)")
    SnapshotTable.append(events(256 until 512, "g2"), root)
    val s3 = SnapshotTable.versions(spark, root).last
    val gen2Dirs = s3.entries.toSet -- gen1Dirs
    assert(gen2Dirs.nonEmpty &&
      gen2Dirs.forall(_._2.matches(".*_pt0=\\d+/_pt1=[a-z]+$")),
      s"gen-2 dirs carry both segments: $gen2Dirs")
    assert(gen1Dirs.subsetOf(s3.entries.toSet))
    // derived bounds exist for BOTH generations: every gen-1 dir still
    // bounds ts; every gen-2 dir bounds ts AND lang
    gen1Dirs.foreach(e =>
      assert(s3.partDirStats(e._2).keySet === Set("ts")))
    gen2Dirs.foreach(e =>
      assert(s3.partDirStats(e._2).keySet === Set("ts", "lang")))
    // content + pruning stay exact across the mixed layout
    def scan = spark.read.format("graft-snapshot").load(root)
    assert(asSet(scan) === asSet(events(0 until 512, "g1"))
      .map { case (id, _, v) => (id, if (id < 256) "g1" else "g2", v) })
    val (dayRows, dayBytes, _) = ShuffleMetrics.measureInput(spark) {
      scan.filter(col("ts") >= lit(new Timestamp(86400000L)) &&
        col("ts") < lit(new Timestamp(2 * 86400000L))).collect()
    }
    val (allRows, allBytes, _) = ShuffleMetrics.measureInput(spark) {
      scan.collect()
    }
    assert(dayRows.length === 128 && allRows.length === 512)
    assert(dayBytes < allBytes,
      s"day filter must prune dirs of both generations: $dayBytes/$allBytes")
    // gen 3: retire days, lang alone — then RE-ACTIVATE days: number 0
    // comes back, lang keeps 1, nothing ever renumbers
    SnapshotTable.repartitionSpec(spark, root, Seq("lang"))
    SnapshotTable.append(events(512 until 640, "g3"), root)
    val s5 = SnapshotTable.versions(spark, root).last
    assert(s5.partSpec.map(f => (f.toString, f.idx, f.active)).toSet ===
      Set(("identity(lang)", 1, true), ("days(ts)", 0, false)))
    val gen3Dirs = s5.entries.toSet -- s3.entries.toSet
    assert(gen3Dirs.nonEmpty &&
      gen3Dirs.forall(_._2.matches(".*_pt1=[a-z]+$")))
    SnapshotTable.repartitionSpec(spark, root, Seq("days(ts)", "lang"))
    val s6 = SnapshotTable.versions(spark, root).last
    assert(s6.partSpec.map(f => (f.idx, f.active)).toSet ===
      Set((0, true), (1, true)))
    // a brand-new field takes the next free number, never a retired one
    SnapshotTable.repartitionSpec(spark, root, Seq("days(ts)", "tag"))
    val s7 = SnapshotTable.versions(spark, root).last
    assert(s7.partSpec.find(_.col == "tag").map(_.idx) === Some(2))
    assert(s7.partSpec.find(_.col == "lang")
      .map(f => (f.idx, f.active)) === Some((1, false)))
    // time travel serves each version's spec
    assert(SnapshotTable.versions(spark, root)
      .find(_.version == 1L).get.partSpec.map(_.toString) ===
      Seq("days(ts)"))
    // guards: no-op spec, unknown column, retired sources stay frozen
    intercept[Exception](SnapshotTable.repartitionSpec(spark, root,
      Seq("days(ts)", "tag")))
    intercept[Exception](SnapshotTable.repartitionSpec(spark, root,
      Seq("days(nope)")))
    intercept[Exception](SnapshotTable.renameColumn(spark, root,
      "lang", "lang2")) // retired field's source: still frozen
    assert(asSet(scan).size === 640)
  }

  test("RESTORE keeps the target's partition spec (regression: the " +
      "restore manifest used to drop it, silently unpartitioning every " +
      "later write)") {
    val root = freshRoot("restorespec")
    SnapshotTable.create(events(0 until 64, "a"), root, Seq("id"), 2,
      statsCols = Some(Seq.empty), partitionBy = Seq("days(ts)"))
    SnapshotTable.append(events(64 until 128, "b"), root)
    SnapshotTable.restore(spark, root, version = Some(1L))
    val restored = SnapshotTable.versions(spark, root).last
    assert(restored.op === "restore" &&
      restored.partSpec.map(_.toString) === Seq("days(ts)"))
    // later writes still land partitioned and prune
    SnapshotTable.append(events(128 until 192, "c"), root)
    val head = SnapshotTable.versions(spark, root).last
    val fresh = head.entries.toSet -- restored.entries.toSet
    assert(fresh.nonEmpty && fresh.forall(_._2.contains("_pt0=")))
    assert(spark.read.format("graft-snapshot").load(root).count() === 128L)
  }

  test("SQL DDL: PARTITIONED BY (days(ts), lang, bucket(4, id)) through " +
      "the catalog creates the spec; INSERT + pruned SELECT answer " +
      "exactly; partition sources are ALTER-protected") {
    val wh = java.nio.file.Files.createTempDirectory("graft_part_wh")
    wh.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.partcat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.partcat.warehouse", wh.toString)
    spark.sql("CREATE TABLE partcat.ev (id BIGINT, ts TIMESTAMP, " +
      "lang STRING, v BIGINT) PARTITIONED BY (days(ts), lang, bucket(4, id))")
    val root = s"$wh/ev"
    assert(SnapshotTable.versions(spark, root).last.partSpec
      .map(_.toString) === Seq("days(ts)", "identity(lang)"))
    spark.sql("INSERT INTO partcat.ev VALUES " +
      "(1, timestamp'1970-01-01 05:00:00', 'en', 10), " +
      "(2, timestamp'1970-01-02 05:00:00', 'ja', 20), " +
      "(3, timestamp'1970-01-02 06:00:00', 'en', 30)")
    assert(spark.sql("SELECT sum(v) FROM partcat.ev WHERE " +
      "ts >= timestamp'1970-01-02 00:00:00'").as[Long].head() === 50L)
    assert(spark.sql("SELECT count(*) FROM partcat.ev WHERE lang = 'en'")
      .as[Long].head() === 2L)
    intercept[Exception](
      spark.sql("ALTER TABLE partcat.ev RENAME COLUMN ts TO t2"))
    intercept[Exception](
      spark.sql("ALTER TABLE partcat.ev DROP COLUMN lang"))
    // spec evolution through SQL: CALL repartition_spec, then the next
    // INSERT lands under the new spec while old dirs keep theirs
    val v = spark.sql(
      "CALL partcat.system.repartition_spec('ev', 'lang')")
      .as[Long].head()
    assert(SnapshotTable.versions(spark, root)
      .find(_.version == v).get.op === "repartition-spec")
    spark.sql("INSERT INTO partcat.ev VALUES " +
      "(4, timestamp'1970-01-03 05:00:00', 'en', 40)")
    val head = SnapshotTable.versions(spark, root).last
    val fresh = head.entries.filter(_._2.contains(s"c${head.version}-"))
    assert(fresh.nonEmpty && fresh.forall(e =>
      e._2.matches(".*_pt1=[a-z]+$")), s"post-evolution dirs: $fresh")
    assert(spark.sql("SELECT count(*) FROM partcat.ev WHERE lang = 'en'")
      .as[Long].head() === 3L)
  }

  test("composition: merge-on-read deltas and key lookups stay exact on " +
      "a partitioned table; compaction restores partition dirs for " +
      "MOR-staged rows") {
    val root = freshRoot("mor")
    SnapshotTable.create(events(0 until 64, "b"), root, Seq("id"), 4,
      partitionBy = Seq("days(ts)", "lang"))
    SnapshotTable.upsert(events(0 until 4, "MOR"), root, mergeOnRead = true)
    SnapshotTable.delete(Seq(9L).toDF("id"), root, mergeOnRead = true)
    assert(SnapshotTable.readForKeys(Seq(1L).toDF("id"), root)
      .select("tag").as[String].collect().toSeq === Seq("MOR"))
    assert(SnapshotTable.readForKeys(Seq(9L).toDF("id"), root).count() === 0L)
    val expect = asSet(events(0 until 4, "MOR")) ++
      asSet(events(4 until 64, "b")) -- asSet(events(9 until 10, "b"))
    assert(asSet(SnapshotTable.read(spark, root)) === expect)
    SnapshotTable.compact(spark, root)
    val head = SnapshotTable.versions(spark, root).last
    assert(head.deltas.isEmpty &&
      head.entries.forall(_._2.contains("_pt0=")))
    assert(asSet(SnapshotTable.read(spark, root)) === expect)
  }

  test("metadata tables expose the partition layout: files.partition " +
      "carries the decoded tuple, the partitions table aggregates " +
      "dirs/rows/bytes per tuple, and both are SQL-addressable") {
    val root = freshRoot("meta")
    SnapshotTable.create(events(0 until 64, "m"), root, Seq("id"), 2,
      partitionBy = Seq("days(ts)", "lang"))
    val files = graft.sources.SnapshotMeta.files(spark, root)
    assert(files.columns.contains("partition"))
    val parts = files.select("partition").as[String].collect()
    assert(parts.forall(_ != null) &&
      parts.forall(_.matches("days\\(ts\\)=\\d+/identity\\(lang\\)=[a-z]+")))
    val pt = graft.sources.SnapshotMeta.partitions(spark, root)
      .as[(String, Int, Option[Long], Option[Long])].collect()
    // day = i % 4 and lang = i % 2 correlate: even days are all-en,
    // odd days all-ja — exactly 4 live tuples
    assert(pt.length === 4)
    assert(pt.map(_._3.get).sum === 64L) // row totals exact
    assert(pt.forall(_._4.exists(_ > 0L)))
    // unpartitioned table: empty partitions, null files.partition
    val root2 = freshRoot("meta2")
    SnapshotTable.create(events(0 until 8, "m"), root2, Seq("id"), 2)
    assert(graft.sources.SnapshotMeta.partitions(spark, root2).count() === 0L)
    assert(graft.sources.SnapshotMeta.files(spark, root2)
      .filter(col("partition").isNotNull).count() === 0L)
    // SQL route: cat.tbl.partitions
    val wh = java.nio.file.Files.createTempDirectory("graft_pmeta_wh")
    wh.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.pmetacat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.pmetacat.warehouse", wh.toString)
    spark.sql("CREATE TABLE pmetacat.ev (id BIGINT, ts TIMESTAMP, " +
      "v BIGINT) PARTITIONED BY (days(ts), bucket(2, id))")
    spark.sql("INSERT INTO pmetacat.ev VALUES " +
      "(1, timestamp'1970-01-01 05:00:00', 10), " +
      "(2, timestamp'1970-01-02 05:00:00', 20)")
    val sqlPt = spark.sql(
      "SELECT partition, rows FROM pmetacat.ev.partitions ORDER BY 1")
      .as[(String, Long)].collect()
    assert(sqlPt.toSeq === Seq(("days(ts)=0", 1L), ("days(ts)=1", 1L)))
  }

  test("row-level SQL UPDATE on a partitioned table stays exact AND " +
      "keeps partition granularity: executor-staged dirs carry the " +
      "value segments, so replaced buckets keep guaranteed pruning") {
    val wh = java.nio.file.Files.createTempDirectory("graft_prl_wh")
    wh.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.prlcat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.prlcat.warehouse", wh.toString)
    spark.sql("CREATE TABLE prlcat.ev (id BIGINT, ts TIMESTAMP, " +
      "lang STRING, v BIGINT) PARTITIONED BY (days(ts), bucket(2, id))")
    spark.sql("INSERT INTO prlcat.ev SELECT id, " +
      "timestamp_seconds((id % 3) * 86400), " +
      "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'ja' END, id * 10 " +
      "FROM range(30)")
    spark.sql("UPDATE prlcat.ev SET v = v + 1 WHERE id = 7")
    assert(spark.sql("SELECT v FROM prlcat.ev WHERE id = 7")
      .as[Long].head() === 71L)
    assert(spark.sql("SELECT count(*) FROM prlcat.ev").as[Long]
      .head() === 30L)
    val root = s"$wh/ev"
    // every entry — the carried ones AND the executor-staged
    // replacements — carries its partition value segments
    val head = SnapshotTable.versions(spark, root).last
    assert(head.op === "update" &&
      head.entries.forall(_._2.matches(".*_gb=\\d+/_pt0=-?\\d+$")),
      s"entries: ${head.entries.map(_._2)}")
    assert(spark.sql("SELECT sum(v) FROM prlcat.ev").as[Long].head() ===
      (0 until 30).map(_ * 10L).sum + 1L)
    SnapshotTable.compact(spark, root)
    // a day-range scan still prunes on the re-partitioned layout
    assert(spark.sql("SELECT count(*) FROM prlcat.ev WHERE " +
      "ts >= timestamp_seconds(2 * 86400)").as[Long].head() ===
      (0 until 30).count(_ % 3 == 2).toLong)
  }

  test("a partitioned table serves as a STREAMING SOURCE: appended " +
      "partition-value dirs tail exactly like plain appends") {
    val root = freshRoot("stream")
    SnapshotTable.create(events(0 until 16, "s0"), root, Seq("id"), 2,
      partitionBy = Seq("days(ts)"))
    SnapshotTable.append(events(16 until 24, "s1"), root)
    val out = java.nio.file.Files.createTempDirectory("graft_pstream")
    out.toFile.deleteOnExit()
    val q = spark.readStream.format("graft-snapshot").load(root)
      .writeStream.format("memory").queryName("pstream_sink")
      .option("checkpointLocation", s"$out/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(asSet(spark.table("pstream_sink")) ===
      asSet(events(0 until 16, "s0")) ++ asSet(events(16 until 24, "s1")))
    spark.sql("DROP TABLE IF EXISTS pstream_sink")
  }

  test("the CONNECTOR replays keyed MOR deltas on a partitioned table " +
      "(value-dir segments parse in the executor replay's commit-" +
      "version extraction)") {
    val root = freshRoot("morconn")
    SnapshotTable.create(events(0 until 64, "b"), root, Seq("id"), 4,
      partitionBy = Seq("days(ts)", "lang"))
    SnapshotTable.upsert(events(0 until 4, "MOR"), root, mergeOnRead = true)
    SnapshotTable.delete(Seq(9L).toDF("id"), root, mergeOnRead = true)
    val expect = asSet(events(0 until 4, "MOR")) ++
      asSet(events(4 until 64, "b")) -- asSet(events(9 until 10, "b"))
    assert(asSet(spark.read.format("graft-snapshot").load(root)) === expect)
    assert(spark.read.format("graft-snapshot").load(root)
      .filter(col("id") === 1L).select("tag").as[String]
      .collect().toSeq === Seq("MOR"))
  }
}
