package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SnapshotTable

/** SQL `UPDATE` / `MERGE INTO` / residual `DELETE` on snapshot catalog
  * tables via Spark's group-based row-level operation protocol
  * ([[graft.sources.SnapshotRowLevelOperation]]): correctness of the
  * rewritten content, manifest commit shapes, time travel across the
  * replacement commits, and the copy-on-write SCOPE — a key-pinned
  * statement must replace only the hit buckets' dirs, carrying every
  * other manifest entry forward untouched. */
class SnapshotRowLevelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val warehouse: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_rowlevel_wh")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.rlcat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.rlcat.warehouse", d.toString)
    d.toString
  }

  private def sqlDf(q: String): DataFrame = { warehouse; spark.sql(q) }

  private def asSet(df: DataFrame) =
    df.select("id", "tag", "v").as[(Long, String, Long)].collect().toSet

  /** Fresh 3-column table with rows id=0..n-1, tag="t<id>", v=id*2. */
  private def mkTable(name: String, buckets: Int, n: Int): String = {
    sqlDf(s"CREATE TABLE rlcat.$name (id BIGINT, tag STRING, v BIGINT) " +
      s"PARTITIONED BY (bucket($buckets, id))")
    sqlDf(s"INSERT INTO rlcat.$name " +
      s"SELECT id, concat('t', id), id * 2 FROM range($n) AS r(id)")
    s"$warehouse/$name"
  }

  test("UPDATE with a key-pinned predicate rewrites ONLY the hit " +
      "bucket's dirs; every other entry carries forward verbatim") {
    val root = mkTable("u1", 8, 400)
    val before = SnapshotTable.versions(spark, root).last
    sqlDf("UPDATE rlcat.u1 SET v = v + 10000, tag = 'upd' WHERE id = 7")
    val after = SnapshotTable.versions(spark, root).last
    assert(after.op === "update")
    assert(after.version === before.version + 1)
    // content: exactly one row changed
    assert(asSet(sqlDf("SELECT * FROM rlcat.u1 WHERE id = 7")) ===
      Set((7L, "upd", 10014L)))
    assert(sqlDf("SELECT count(*) AS c FROM rlcat.u1 WHERE tag = 'upd'")
      .as[Long].head === 1L)
    assert(sqlDf("SELECT sum(v) AS s FROM rlcat.u1").as[Long].head ===
      (0L until 400L).map(_ * 2).sum + 10000L)
    // scope: only bucket(7)'s dirs were replaced
    val beforeDirs = before.entries.toSet
    val afterDirs = after.entries.toSet
    val hitBuckets = (beforeDirs -- afterDirs).map(_._1) ++
      (afterDirs -- beforeDirs).map(_._1)
    assert(hitBuckets.size === 1,
      s"expected one replaced bucket, got $hitBuckets")
    assert((beforeDirs -- afterDirs).forall(e => hitBuckets(e._1)))
    // time travel: the pre-update version still reads the old row
    assert(asSet(sqlDf(
      s"SELECT * FROM rlcat.u1 VERSION AS OF ${before.version} " +
        "WHERE id = 7")) === Set((7L, "t7", 14L)))
    sqlDf("DROP TABLE rlcat.u1")
  }

  test("UPDATE with a non-key predicate (no pruning possible) still " +
      "commits one correct replacement") {
    val root = mkTable("u2", 4, 100)
    sqlDf("UPDATE rlcat.u2 SET tag = 'mod' WHERE v % 10 = 6")
    val after = SnapshotTable.versions(spark, root).last
    assert(after.op === "update")
    val expect = (0L until 100L).map(i =>
      (i, if ((i * 2) % 10 == 6) "mod" else s"t$i", i * 2)).toSet
    assert(asSet(sqlDf("SELECT * FROM rlcat.u2")) === expect)
    // object-API parity on the same root
    assert(asSet(SnapshotTable.read(spark, root)) === expect)
    sqlDf("DROP TABLE rlcat.u2")
  }

  test("MERGE INTO: matched-update + matched-delete + not-matched-insert " +
      "in one statement, committed as one 'merge' version") {
    mkTable("m1", 8, 50)
    sqlDf("CREATE TABLE rlcat.m1src (id BIGINT, nv BIGINT)")
    sqlDf("INSERT INTO rlcat.m1src VALUES " +
      "(3, 300), (4, -1), (60, 600), (61, 610)")
    sqlDf("""
      MERGE INTO rlcat.m1 t USING rlcat.m1src s ON t.id = s.id
      WHEN MATCHED AND s.nv < 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.nv, tag = 'merged'
      WHEN NOT MATCHED THEN INSERT (id, tag, v) VALUES (s.id, 'new', s.nv)
    """)
    val expect = (0L until 50L).flatMap {
      case 3L => Some((3L, "merged", 300L))
      case 4L => None // matched-delete
      case i => Some((i, s"t$i", i * 2))
    }.toSet ++ Set((60L, "new", 600L), (61L, "new", 610L))
    assert(asSet(sqlDf("SELECT * FROM rlcat.m1")) === expect)
    val hist = SnapshotTable.versions(spark, s"$warehouse/m1")
    assert(hist.last.op === "merge")
    // pre-merge version intact under time travel
    assert(asSet(sqlDf(
      s"SELECT * FROM rlcat.m1 VERSION AS OF ${hist.last.version - 1}"))
      === (0L until 50L).map(i => (i, s"t$i", i * 2)).toSet)
    sqlDf("DROP TABLE rlcat.m1"); sqlDf("DROP TABLE rlcat.m1src")
  }

  test("MERGE INTO with a small source: the runtime group filter prunes " +
      "the replacement to the matched keys' buckets") {
    val root = mkTable("m2", 16, 800)
    sqlDf("CREATE TABLE rlcat.m2src (id BIGINT, nv BIGINT)")
    sqlDf("INSERT INTO rlcat.m2src VALUES (5, 5000), (6, 6000)")
    val before = SnapshotTable.versions(spark, root).last
    sqlDf("""
      MERGE INTO rlcat.m2 t USING rlcat.m2src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.nv
    """)
    val after = SnapshotTable.versions(spark, root).last
    assert(after.op === "merge")
    assert(asSet(sqlDf("SELECT * FROM rlcat.m2 WHERE id IN (5, 6)")) ===
      Set((5L, "t5", 5000L), (6L, "t6", 6000L)))
    assert(sqlDf("SELECT count(*) AS c FROM rlcat.m2").as[Long].head === 800L)
    // scope: replaced dirs confined to the two matched keys' buckets
    val replaced = (before.entries.toSet -- after.entries.toSet).map(_._1)
    assert(replaced.size <= 2,
      s"expected <= 2 replaced buckets from a 2-key merge, got $replaced")
    sqlDf("DROP TABLE rlcat.m2"); sqlDf("DROP TABLE rlcat.m2src")
  }

  test("DELETE with an untranslatable predicate takes the group-based " +
      "path and deletes correctly; keyed DELETE keeps the metadata path") {
    val root = mkTable("d1", 4, 40)
    // length(tag) has no V1 filter translation -> canDeleteWhere is
    // false -> Spark keeps the rewritten group-based plan
    sqlDf("DELETE FROM rlcat.d1 WHERE length(tag) = 2")
    assert(asSet(sqlDf("SELECT * FROM rlcat.d1")) ===
      (10L until 40L).map(i => (i, s"t$i", i * 2)).toSet)
    // keyed delete afterwards: still the bucket-pruned metadata commit
    val preKeyed = SnapshotTable.versions(spark, root).last
    sqlDf("DELETE FROM rlcat.d1 WHERE id = 11")
    val after = SnapshotTable.versions(spark, root).last
    assert(after.op === "delete")
    val replaced = (preKeyed.entries.toSet -- after.entries.toSet).map(_._1)
    assert(replaced.size <= 1,
      s"keyed delete should touch <= 1 bucket, got $replaced")
    assert(sqlDf("SELECT count(*) AS c FROM rlcat.d1").as[Long].head === 29L)
    sqlDf("DROP TABLE rlcat.d1")
  }

  test("UPDATE that moves a key across buckets keeps the table " +
      "consistent: the row leaves its old bucket and lands in the new") {
    mkTable("u3", 8, 30)
    sqlDf("UPDATE rlcat.u3 SET id = 1000 WHERE id = 3")
    val expect = (0L until 30L).map {
      case 3L => (1000L, "t3", 6L)
      case i => (i, s"t$i", i * 2)
    }.toSet
    assert(asSet(sqlDf("SELECT * FROM rlcat.u3")) === expect)
    // the moved key is findable through the key-pruned point lookup
    assert(asSet(sqlDf("SELECT * FROM rlcat.u3 WHERE id = 1000")) ===
      Set((1000L, "t3", 6L)))
    assert(asSet(sqlDf("SELECT * FROM rlcat.u3 WHERE id = 3")) ===
      Set.empty[(Long, String, Long)])
    sqlDf("DROP TABLE rlcat.u3")
  }
}
