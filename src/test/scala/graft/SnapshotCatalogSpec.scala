package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SnapshotTable

/** Pure-SQL surface of the snapshot format through the
  * [[graft.sources.SnapshotCatalog]] plugin: DDL (CREATE with a bucket
  * transform, ALTER ADD COLUMNS, RENAME, DROP), DML (INSERT INTO /
  * INSERT OVERWRITE / CTAS), time travel (`VERSION AS OF` /
  * `TIMESTAMP AS OF`), catalog listings, and parity with the object
  * API on the same roots. */
class SnapshotCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val warehouse: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_snapcat_wh")
    d.toFile.deleteOnExit()
    // catalog instances are cached per session on first use, so the
    // warehouse conf must be set before ANY reference to the name
    spark.conf.set("spark.sql.catalog.snapcat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.snapcat.warehouse", d.toString)
    d.toString
  }

  private def sqlDf(q: String): DataFrame = { warehouse; spark.sql(q) }

  private def asSet(df: DataFrame) =
    df.select("id", "tag", "v").as[(Long, String, Long)].collect().toSet

  test("CREATE TABLE with a bucket transform + INSERT INTO + SELECT: " +
      "SQL writes land as manifest commits readable by the object API, " +
      "and a key point-lookup through SQL prunes to the hit bucket") {
    sqlDf("CREATE TABLE snapcat.t1 (id BIGINT, tag STRING, v BIGINT) " +
      "PARTITIONED BY (bucket(8, id))")
    val root = s"$warehouse/t1"
    val created = SnapshotTable.versions(spark, root)
    assert(created.map(s => (s.version, s.op, s.keys, s.buckets)) ===
      Seq((1L, "create", Seq("id"), 8)))
    sqlDf("INSERT INTO snapcat.t1 VALUES (1, 'a', 10), (2, 'b', 20)")
    sqlDf("INSERT INTO snapcat.t1 SELECT id * 10, 'bulk', id " +
      "FROM range(3) AS r(id)")
    assert(asSet(sqlDf("SELECT * FROM snapcat.t1")) ===
      Set((1L, "a", 10L), (2L, "b", 20L),
        (0L, "bulk", 0L), (10L, "bulk", 1L), (20L, "bulk", 2L)))
    // object-API parity on the same root
    assert(asSet(SnapshotTable.read(spark, root)) ===
      asSet(sqlDf("SELECT * FROM snapcat.t1")))
    // SQL point lookup: answered correctly (pruning path is measured in
    // SnapshotV2Spec / ScaleSpec; here we pin the SQL route's answer)
    assert(asSet(sqlDf("SELECT * FROM snapcat.t1 WHERE id = 10")) ===
      Set((10L, "bulk", 1L)))
  }

  test("INSERT OVERWRITE commits an overwrite; VERSION AS OF and " +
      "TIMESTAMP AS OF read the pre-overwrite history") {
    sqlDf("CREATE TABLE snapcat.t2 (id BIGINT, tag STRING, v BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    sqlDf("INSERT INTO snapcat.t2 VALUES (1, 'old', 1), (2, 'old', 2)")
    val tsBetween = {
      // manifest stamps are millis: sit strictly between commits
      Thread.sleep(5L)
      val t = System.currentTimeMillis()
      Thread.sleep(5L)
      t
    }
    sqlDf("INSERT OVERWRITE snapcat.t2 VALUES (7, 'new', 7)")
    assert(asSet(sqlDf("SELECT * FROM snapcat.t2")) === Set((7L, "new", 7L)))
    assert(asSet(sqlDf("SELECT * FROM snapcat.t2 VERSION AS OF 2")) ===
      Set((1L, "old", 1L), (2L, "old", 2L)))
    assert(asSet(sqlDf("SELECT * FROM snapcat.t2 VERSION AS OF 1")) ===
      Set.empty[(Long, String, Long)])
    // TIMESTAMP AS OF between v2 and v3 resolves to v2
    val iso = new java.sql.Timestamp(tsBetween).toString
    assert(asSet(sqlDf(
      s"SELECT * FROM snapcat.t2 TIMESTAMP AS OF '$iso'")) ===
      Set((1L, "old", 1L), (2L, "old", 2L)))
    val ops = SnapshotTable.versions(spark, s"$warehouse/t2").map(_.op)
    assert(ops === Seq("create", "append", "overwrite"))
  }

  test("CTAS, ALTER TABLE ADD COLUMNS (old versions keep their own " +
      "schema), RENAME TO (reads survive the manifest rewrite), DROP") {
    sqlDf("CREATE TABLE snapcat.t3 PARTITIONED BY (bucket(4, id)) AS " +
      "SELECT id, CAST(id AS STRING) AS tag, id * 2 AS v " +
      "FROM range(5) AS r(id)")
    // staged CTAS (StagingTableCatalog): definition AND data land in
    // ONE atomic create commit — v1 carries the rows
    assert(SnapshotTable.versions(spark, s"$warehouse/t3")
      .map(s => (s.version, s.op)) === Seq((1L, "create")))
    assert(sqlDf("SELECT * FROM snapcat.t3").count() === 5L)
    sqlDf("ALTER TABLE snapcat.t3 ADD COLUMNS (score DOUBLE)")
    // new column reads as null backfill; old version lacks it entirely
    assert(sqlDf("SELECT * FROM snapcat.t3").columns.toSeq ===
      Seq("id", "tag", "v", "score"))
    assert(sqlDf("SELECT * FROM snapcat.t3")
      .filter(col("score").isNull).count() === 5L)
    assert(!sqlDf("SELECT * FROM snapcat.t3 VERSION AS OF 1")
      .columns.contains("score"))
    sqlDf("INSERT INTO snapcat.t3 VALUES (100, 'x', 200, 0.5)")
    sqlDf("ALTER TABLE snapcat.t3 RENAME TO snapcat.t3r")
    assert(sqlDf("SELECT * FROM snapcat.t3r").count() === 6L)
    assert(sqlDf("SELECT * FROM snapcat.t3r VERSION AS OF 1").count() === 5L)
    assert(!new java.io.File(s"$warehouse/t3").exists)
    intercept[Exception](sqlDf("SELECT * FROM snapcat.t3"))
    // listings see the renamed table; DROP removes it
    assert(sqlDf("SHOW TABLES IN snapcat").select("tableName")
      .as[String].collect().toSet.contains("t3r"))
    sqlDf("DROP TABLE snapcat.t3r")
    assert(!sqlDf("SHOW TABLES IN snapcat").select("tableName")
      .as[String].collect().toSet.contains("t3r"))
  }

  test("a multi-change ALTER validates the WHOLE list up front: one " +
      "invalid change leaves NOTHING applied (no half-applied ALTER)") {
    sqlDf("CREATE TABLE snapcat.talter (id BIGINT, tag STRING, v BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    val root = s"$warehouse/talter"
    sqlDf("INSERT INTO snapcat.talter VALUES (1, 'a', 10)")
    val before = SnapshotTable.versions(spark, root).size
    // single-change SQL path works
    sqlDf("ALTER TABLE snapcat.talter RENAME COLUMN tag TO label")
    // drive the catalog API directly to get a genuinely mixed list
    // whose FIRST change is valid and SECOND is not (drops a key)
    import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
    val cat = spark.sessionState.catalogManager.catalog("snapcat")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val ident = Identifier.of(Array.empty[String], "talter")
    val bad = intercept[IllegalArgumentException](cat.alterTable(ident,
      TableChange.renameColumn(Array("label"), "name2"),
      TableChange.deleteColumn(Array("id"), false))) // key: invalid
    assert(bad.getMessage.contains("key"))
    // NOTHING applied: schema unchanged, no new versions beyond the
    // single-change rename above
    val vs = SnapshotTable.versions(spark, root)
    assert(SnapshotTable.read(spark, root).columns.toSeq ===
      Seq("id", "label", "v"))
    assert(vs.size === before + 1) // only the valid single rename landed
    // and a fully-valid mixed list applies in order: rename + drop + add
    cat.alterTable(ident,
      TableChange.renameColumn(Array("label"), "tag2"),
      TableChange.deleteColumn(Array("v"), false),
      TableChange.addColumn(Array("w"),
        org.apache.spark.sql.types.LongType))
    assert(SnapshotTable.read(spark, root).columns.toSeq ===
      Seq("id", "tag2", "w"))
  }

  test("namespaces are directories: CREATE NAMESPACE, qualified table " +
      "names, SHOW TABLES IN ns, DROP NAMESPACE refuses non-empty " +
      "without CASCADE") {
    sqlDf("CREATE NAMESPACE snapcat.db1")
    sqlDf("CREATE TABLE snapcat.db1.inner (id BIGINT, tag STRING, " +
      "v BIGINT) PARTITIONED BY (bucket(2, id))")
    sqlDf("INSERT INTO snapcat.db1.inner VALUES (1, 'n', 1)")
    assert(asSet(sqlDf("SELECT * FROM snapcat.db1.inner")) ===
      Set((1L, "n", 1L)))
    assert(sqlDf("SHOW TABLES IN snapcat.db1").select("tableName")
      .as[String].collect().toSeq === Seq("inner"))
    intercept[Exception](sqlDf("DROP NAMESPACE snapcat.db1"))
    sqlDf("DROP NAMESPACE snapcat.db1 CASCADE")
    assert(!new java.io.File(s"$warehouse/db1").exists)
  }

  test("guard rails: path-traversal identifiers are rejected, CREATE on " +
      "an existing table throws, unsupported transforms are refused, and " +
      "properties fall back when no transform is given") {
    intercept[Exception](sqlDf(
      "CREATE TABLE snapcat.`..`.oops (id BIGINT) "))
    sqlDf("CREATE TABLE snapcat.t5 (id BIGINT, tag STRING, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='4')")
    val snap = SnapshotTable.versions(spark, s"$warehouse/t5").last
    assert((snap.keys, snap.buckets) === (Seq("id"), 4))
    intercept[Exception](sqlDf(
      "CREATE TABLE snapcat.t5 (id BIGINT) "))
    // unsupported transform NAME and unsupported TYPE combos still fail
    intercept[Exception](sqlDf("CREATE TABLE snapcat.t6 (id BIGINT, " +
      "tag STRING) PARTITIONED BY (truncate(4, tag))"))
    intercept[Exception](sqlDf("CREATE TABLE snapcat.t6 (id BIGINT, " +
      "tag STRING) PARTITIONED BY (days(id))"))
    sqlDf("DROP TABLE snapcat.t5")
  }

  test("DELETE FROM picks its commit shape from the predicate: pure key " +
      "equality/IN -> bucket-pruned keyed delete; anything else -> one " +
      "copy-on-write overwrite that keeps NULL-condition rows; TRUNCATE " +
      "TABLE empties the head, history stays readable") {
    sqlDf("CREATE TABLE snapcat.t8 (id BIGINT, tag STRING, v BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    sqlDf("INSERT INTO snapcat.t8 SELECT id, CAST(id % 3 AS STRING), " +
      "IF(id = 7, NULL, id * 2) FROM range(10) AS r(id)")
    val root = s"$warehouse/t8"
    // pure key predicate: manifest op is "delete", not "overwrite"
    sqlDf("DELETE FROM snapcat.t8 WHERE id = 3")
    sqlDf("DELETE FROM snapcat.t8 WHERE id IN (5, 6)")
    assert(sqlDf("SELECT * FROM snapcat.t8").count() === 7L)
    // non-key predicate: copy-on-write overwrite; row id=7 has v NULL —
    // `v < 8` is NULL there, so the row must SURVIVE the delete
    sqlDf("DELETE FROM snapcat.t8 WHERE v < 8")
    assert(sqlDf("SELECT id FROM snapcat.t8 ORDER BY id")
      .as[Long].collect().toSeq === Seq(4L, 7L, 8L, 9L))
    // key-AND-other-column predicate must NOT take the keyed path (it
    // would delete id=8 regardless of tag): id=8 has tag '2', so
    // nothing matches and nothing is deleted — and the stats-pinned
    // classifier PROVES it (tag='nope' is unsatisfiable against every
    // dir's recorded bounds), so the commit is a pure-metadata "delete"
    // that carries every dir verbatim instead of a full rewrite
    sqlDf("DELETE FROM snapcat.t8 WHERE id = 8 AND tag = 'nope'")
    assert(sqlDf("SELECT * FROM snapcat.t8").count() === 4L)
    val ops = SnapshotTable.versions(spark, root).map(_.op)
    assert(ops === Seq("create", "append", "delete", "delete",
      "overwrite", "delete"))
    val last = SnapshotTable.versions(spark, root).last
    assert(last.entries.toSet ===
      SnapshotTable.versions(spark, root).init.last.entries.toSet,
      "a provably-no-match DELETE must be pure metadata")
    sqlDf("TRUNCATE TABLE snapcat.t8")
    assert(sqlDf("SELECT * FROM snapcat.t8").count() === 0L)
    assert(sqlDf(s"SELECT * FROM snapcat.t8 VERSION AS OF ${ops.size}")
      .count() === 4L)
    sqlDf("DROP TABLE snapcat.t8")
  }

  test("CALL snapcat.system.{history, compact, vacuum}: maintenance as " +
      "SQL procedures — history lists commits, targeted compact folds " +
      "only over-fragmented buckets, vacuum expires old versions") {
    sqlDf("CREATE TABLE snapcat.t9 (id BIGINT, tag STRING, v BIGINT) " +
      "PARTITIONED BY (bucket(2, id))")
    (0 until 4).foreach(i => sqlDf(
      s"INSERT INTO snapcat.t9 SELECT id, 'b$i', id FROM range(${i * 10}, ${i * 10 + 10}) AS r(id)"))
    val hist = sqlDf("CALL snapcat.system.history('t9')")
    assert(hist.columns.toSeq ===
      Seq("version", "op", "ts", "n_dirs", "n_rows"))
    assert(hist.select("op").as[String].collect().toSeq ===
      Seq("create") ++ Seq.fill(4)("append"))
    // exact manifest row counts per version: 0 (empty create) then +10
    assert(hist.orderBy("version").select("n_rows").as[Long]
      .collect().toSeq === Seq(0L, 10L, 20L, 30L, 40L))
    // targeted compact: every bucket folds to <= 2 dirs, content intact
    val v = sqlDf("CALL snapcat.system.compact('t9', 2)")
      .select("version").as[Long].head()
    assert(v === 6L)
    val snap = SnapshotTable.versions(spark, s"$warehouse/t9").last
    assert(snap.entries.groupBy(_._1).values.forall(_.size <= 2))
    assert(sqlDf("SELECT * FROM snapcat.t9").count() === 40L)
    // zorder: content-identical clustering commit with slice dirs
    val zv = sqlDf("CALL snapcat.system.zorder('t9', 'id,v', 4)")
      .select("version").as[Long].head()
    assert(zv === 7L)
    val zsnap = SnapshotTable.versions(spark, s"$warehouse/t9").last
    assert(zsnap.op === "zorder" && zsnap.entries.forall(_._2.contains("_zs=")))
    assert(sqlDf("SELECT * FROM snapcat.t9").count() === 40L)
    // vacuum to 1 version: history collapses, old versions unreadable
    val vac = sqlDf("CALL snapcat.system.vacuum('t9', 1)")
    assert(vac.columns.toSeq === Seq("expired_manifests", "deleted_dirs"))
    assert(vac.select("expired_manifests").as[Int].head() === 6)
    assert(sqlDf("CALL snapcat.system.history('t9')").count() === 1L)
    assert(sqlDf("SELECT * FROM snapcat.t9").count() === 40L)
    intercept[Exception](sqlDf("SELECT * FROM snapcat.t9 VERSION AS OF 1")
      .collect())
    sqlDf("DROP TABLE snapcat.t9")
  }

  test("storage-partitioned join: two snapshot tables with the same keys " +
      "and bucket count join on their keys with ZERO shuffle on either " +
      "side, and the result matches the shuffled spelling") {
    sqlDf("CREATE TABLE snapcat.spj_a (id BIGINT, tag STRING, v BIGINT) " +
      "PARTITIONED BY (bucket(8, id))")
    sqlDf("CREATE TABLE snapcat.spj_b (id BIGINT, tag STRING, v BIGINT) " +
      "PARTITIONED BY (bucket(8, id))")
    sqlDf("INSERT INTO snapcat.spj_a SELECT id, concat('a', id), id * 2 " +
      "FROM range(2000) AS r(id)")
    sqlDf("INSERT INTO snapcat.spj_b SELECT id, concat('b', id), id * 3 " +
      "FROM range(500, 2500) AS r(id)")
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      // force the sort-merge path: our reported stats would otherwise
      // broadcast these tiny tables and hide the shuffle question
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption.filter(_ != null) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val q = "SELECT a.id, a.tag, b.tag AS tag_b, a.v + b.v AS vv " +
        "FROM snapcat.spj_a a JOIN snapcat.spj_b b ON a.id = b.id"
      val df = sqlDf(q)
      val rows = df.collect()
      assert(rows.length === 1500)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"expected a zero-shuffle storage-partitioned join:\n$plan")
      // same content as the forced-shuffle spelling
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val shuffled = sqlDf(q)
      assert(shuffled.queryExecution.executedPlan.toString
        .contains("Exchange") || shuffled.collect().length === 1500)
      assert(rows.map(_.toString).sorted.toSeq ===
        shuffled.collect().map(_.toString).sorted.toSeq)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    sqlDf("DROP TABLE snapcat.spj_a"); sqlDf("DROP TABLE snapcat.spj_b")
  }

  test("the catalog table still streams: readStream through a " +
      "catalog-loaded root serves appends with versioned offsets") {
    import org.apache.spark.sql.streaming.Trigger
    sqlDf("CREATE TABLE snapcat.t7 (id BIGINT, tag STRING, v BIGINT) " +
      "PARTITIONED BY (bucket(2, id))")
    sqlDf("INSERT INTO snapcat.t7 VALUES (1, 's', 1)")
    val out = java.nio.file.Files.createTempDirectory("graft_cat_out")
      .toString + "/run"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cat_ckpt")
      .toString
    val q = spark.readStream.format("graft-snapshot")
      .load(s"$warehouse/t7")
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode("append").parquet(out)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(asSet(spark.read.parquet(out)) === Set((1L, "s", 1L)))
    sqlDf("DROP TABLE snapcat.t7")
  }
}
